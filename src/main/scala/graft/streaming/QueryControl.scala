package graft.streaming

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQuery

/** ksql PAUSE / RESUME for persistent queries, Spark-first: pausing a
  * Structured Streaming query IS stopping it (offsets are committed in
  * its checkpoint), and resuming IS restarting the same sink/
  * checkpoint pair — the restart replays nothing and drops nothing
  * (exactly-once resume is the checkpoint contract, the same one
  * CheckpointRecoverySpec pins for crash recovery; pause is just the
  * voluntary case). ksqlDB's own PAUSE likewise stops the query's
  * processing while retaining its state and offsets.
  *
  * Queries become pausable by being STARTED through [[register]],
  * which records the restart thunk (the writeStream recipe closed
  * over its checkpointLocation). [[graft.ConnectorDdl]] dispatches the
  * `PAUSE <name|ALL>` / `RESUME <name|ALL>` statements here and merges
  * [[paused]] into SHOW QUERIES as PAUSED rows. Ad-hoc queries not
  * started through the registry cannot be resumed (their writer recipe
  * is unknown) — PAUSE refuses them with a message naming TERMINATE,
  * rather than stranding a query that can never restart.
  */
object QueryControl {

  final private class State {
    // name (lowercase) → restart thunk; present while registered,
    // whether running or paused
    val registry = new ConcurrentHashMap[String, () => StreamingQuery]()
    // names currently paused (stopped but resumable)
    val pausedSet = ConcurrentHashMap.newKeySet[String]()
  }

  // weak keys — a dropped SparkSession must not pin its registrations
  private val sessions =
    new java.util.WeakHashMap[SparkSession, State]()

  private def state(spark: SparkSession): State = sessions.synchronized {
    sessions.computeIfAbsent(spark, _ => new State)
  }

  /** Start a persistent query through the control registry: `start`
    * must create the StreamingQuery (same sink + checkpointLocation
    * every call — that pair is what makes resume exactly-once) and is
    * retained as the RESUME thunk. Re-registering a name replaces the
    * thunk (latest recipe wins, as with view re-declaration). */
  def register(spark: SparkSession, name: String,
               start: () => StreamingQuery): StreamingQuery = {
    val key = name.toLowerCase
    val st = state(spark)
    st.registry.put(key, start)
    st.pausedSet.remove(key)
    start()
  }

  /** Names currently paused (stopped, resumable), sorted. */
  def paused(spark: SparkSession): Seq[String] = {
    import scala.jdk.CollectionConverters._
    state(spark).pausedSet.asScala.toSeq.sorted
  }

  private def activeByName(spark: SparkSession,
                           name: String): Seq[StreamingQuery] =
    spark.streams.active.toSeq.filter(q =>
      Option(q.name).exists(_.equalsIgnoreCase(name)) ||
        q.id.toString.equalsIgnoreCase(name))

  /** PAUSE: stop the named registered queries (ALL = every registered
    * running query), marking them resumable. Returns (name, status)
    * rows. A running query that was never registered is refused — it
    * could not be resumed — with a message pointing at TERMINATE. */
  def pause(spark: SparkSession, target: String): Seq[(String, String)] = {
    import scala.jdk.CollectionConverters._
    val st = state(spark)
    val names =
      if (target.equalsIgnoreCase("ALL"))
        st.registry.keySet().asScala.toSeq.sorted
          .filter(n => activeByName(spark, n).nonEmpty)
      else Seq(target.toLowerCase)
    names.map { n =>
      if (!st.registry.containsKey(n)) {
        if (activeByName(spark, n).nonEmpty)
          throw new IllegalArgumentException(
            s"query $n was not started through QueryControl and cannot " +
              "be resumed once stopped — use TERMINATE to stop it for good")
        throw new IllegalArgumentException(s"no registered query named $n")
      }
      val running = activeByName(spark, n)
      if (running.isEmpty && !st.pausedSet.contains(n))
        throw new IllegalArgumentException(
          s"query $n is registered but not running (already paused?)")
      running.foreach(_.stop())
      st.pausedSet.add(n)
      (n, "PAUSED")
    }
  }

  /** RESUME: restart the named paused queries (ALL = every paused
    * query) from their checkpoints via the registered thunks. */
  def resume(spark: SparkSession, target: String): Seq[(String, String)] = {
    import scala.jdk.CollectionConverters._
    val st = state(spark)
    val names =
      if (target.equalsIgnoreCase("ALL")) st.pausedSet.asScala.toSeq.sorted
      else Seq(target.toLowerCase)
    names.map { n =>
      if (!st.pausedSet.contains(n))
        throw new IllegalArgumentException(
          if (st.registry.containsKey(n)) s"query $n is not paused"
          else s"no registered query named $n")
      st.registry.get(n).apply()
      st.pausedSet.remove(n)
      (n, "RUNNING")
    }
  }
}
