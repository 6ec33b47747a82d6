package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming SAX motif mining: symbolize a value stream against
  * BATCH-TRAINED breakpoints and track the most frequent letter
  * trigram per series incrementally — the trained-artifact +
  * stream-inference split the IVF lifecycle uses for ANN, applied to
  * symbolic time-series mining. Training (the rank-quartile
  * breakpoints, a global property of the series) cannot be computed
  * online; inference (window sums → letters → trigram counts) can,
  * in constant space.
  *
  * Per-key state is strictly bounded regardless of stream length:
  * the partial window (a running sum + count, never the events), the
  * last two letters, the trigram counter map (≤ 4³ = 64 entries — the
  * alphabet closes the key space), and the window count.
  *
  * Ordering contract matches [[PatternMatch]]: (us, event_id) sort
  * within each micro-batch, time-ordered arrival across batches. */
object SaxMotif {

  /** One symbolized input row: the event plus its series' trained
    * breakpoints (attached by a broadcast stream-static join — the
    * state function never sees a driver-side lookup table). */
  case class SaxIn(event_type: String, us: Long, event_id: Long,
                   cents: Long, b1: Long, b2: Long, b3: Long)

  case class SaxState(psum: Long, pcount: Int, l1: String, l2: String,
                      counts: Map[String, Long], nw: Long)

  val zero: SaxState = SaxState(0L, 0, null, null, Map.empty, 0L)

  case class MotifRow(event_type: String, motif: String, n_occ: Long,
                      n_windows: Long)

  private def letter(s: Long, b1: Long, b2: Long, b3: Long): String =
    if (s < b1) "a" else if (s < b2) "b" else if (s < b3) "c" else "d"

  /** Fold one event; emits a completed window's letter into the
    * trigram tracker when the partial window fills. */
  def step(st: SaxState, e: SaxIn, w: Int): SaxState = {
    val psum = st.psum + e.cents
    val pcount = st.pcount + 1
    if (pcount < w) st.copy(psum = psum, pcount = pcount)
    else {
      val l = letter(psum, e.b1, e.b2, e.b3)
      val counts =
        if (st.l1 != null && st.l2 != null) {
          val word = st.l1 + st.l2 + l
          st.counts.updated(word, st.counts.getOrElse(word, 0L) + 1L)
        } else st.counts
      SaxState(0L, 0, st.l2, l, counts, st.nw + 1L)
    }
  }

  def best(st: SaxState): Option[(String, Long)] =
    if (st.counts.isEmpty) None
    else Some(st.counts.toSeq.minBy { case (w, c) => (-c, w) })

  /** rows: [[SaxIn]] stream → one running [[MotifRow]] per series per
    * batch (series with < 3 complete windows emit nothing yet). */
  case class VocabRow(event_type: String, words: String)

  /** The similarity-side emission from the SAME automaton state: the
    * series' distinct trigram VOCABULARY (the counts map's key set,
    * ≤64 words — sorted and comma-joined so the row is a stable
    * scalar). Downstream, pairwise Jaccard over stored vocabularies
    * is plain set algebra — the streaming twin of `q_sax_similarity`. */
  def vocabTable(spark: SparkSession, rows: DataFrame,
                 w: Int): Dataset[VocabRow] = {
    require(w >= 1, s"PAA window must be >= 1 event, got $w")
    import spark.implicits._
    rows.as[SaxIn]
      .groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, in: Iterator[SaxIn], state: GroupState[SaxState]) =>
          val st0 = state.getOption.getOrElse(zero)
          val st = in.toSeq.sortBy(e => (e.us, e.event_id))
            .foldLeft(st0)(step(_, _, w))
          state.update(st)
          if (st.counts.isEmpty) Iterator.empty
          else Iterator.single(
            VocabRow(key, st.counts.keys.toSeq.sorted.mkString(",")))
      }
  }

  def table(spark: SparkSession, rows: DataFrame, w: Int): Dataset[MotifRow] = {
    require(w >= 1, s"PAA window must be >= 1 event, got $w")
    import spark.implicits._
    rows.as[SaxIn]
      .groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, in: Iterator[SaxIn], state: GroupState[SaxState]) =>
          val st0 = state.getOption.getOrElse(zero)
          val st = in.toSeq.sortBy(e => (e.us, e.event_id))
            .foldLeft(st0)(step(_, _, w))
          state.update(st)
          best(st) match {
            case Some((motif, n)) =>
              Iterator.single(MotifRow(key, motif, n, st.nw))
            case None => Iterator.empty
          }
      }
  }
}
