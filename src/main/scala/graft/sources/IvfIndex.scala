package graft.sources

import java.nio.file.{Files, Paths}

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.DataFrame

/** Persisted IVF (inverted-file) index layout: the index LIFECYCLE
  * half of the ANN story. The per-query probe (see
  * [[graft.queries.SimilarityQueries]]) is only scale-safe if the
  * coarse quantizer is built ONCE and the vectors are laid out so a
  * probe touches nprobe cells of data — never the corpus. This object
  * owns that build:
  *
  *   - `<root>/centroids`  — one row per cell (label, cemb): the tiny
  *     O(ncells) routing table every probe scores against the query.
  *   - `<root>/vectors`    — the corpus, hive-partitioned by `cell`,
  *     so a probe's `cell IN (...)` filter prunes to nprobe partition
  *     DIRECTORIES at scan planning time (the parquet-native analog of
  *     an inverted list; same pruning mechanism as
  *     [[graft.queries.SourceQueries.partitionedParquet]]).
  *
  * At 100 TB the build is one partitioned write (pay once), and each
  * ANN lookup reads ncells centroid rows + nprobe/ncells of the
  * corpus — compare the unindexed [[graft.queries.SimilarityQueries]]
  * `sim_ann_ivf`, whose every invocation re-derives the centroids from
  * a full corpus scan. Builds are memoized per (sfDir) within the JVM;
  * a fresh JVM rebuilds into the same fixed path (overwrite mode), so
  * repeated harness runs never accumulate stale copies.
  */
object IvfIndex {

  final case class Layout(centroids: String, vectors: String)

  private val built = TrieMap.empty[String, Layout]

  private def root(sfDir: String): java.nio.file.Path = {
    val tag = sfDir.replaceAll("[^A-Za-z0-9._-]", "_")
    Paths.get(System.getProperty("java.io.tmpdir"), "graft-ivf", tag)
  }

  /** Build (once per JVM per source dir) and return the index layout.
    * `centroids` must be (label, cemb) — one row per cell; `vectors`
    * must carry a `cell` column equal to its routing key plus the
    * payload columns the probe re-ranks on.
    */
  def ensure(sfDir: String, centroids: => DataFrame,
             vectors: => DataFrame): Layout =
    built.getOrElseUpdate(sfDir, {
      val r = root(sfDir)
      Files.createDirectories(r)
      val layout = Layout(
        centroids = r.resolve("centroids").toString,
        vectors = r.resolve("vectors").toString)
      centroids.write.mode("overwrite").parquet(layout.centroids)
      vectors.write.mode("overwrite").partitionBy("cell")
        .parquet(layout.vectors)
      layout
    })

  private val auxBuilt = TrieMap.empty[String, String]

  /** Persist an AUXILIARY per-corpus dataset of the index (e.g. the
    * PQ code table of an IVF-PQ layout) next to the memoized index,
    * partitioned so probes prune it the same way they prune the
    * vectors — built once per JVM per (sfDir, name), overwritten by a
    * fresh JVM. At 100 TB this is the point of IVF-PQ: the ENCODE is
    * paid once at build; a query scans only the probed cells' code
    * partitions (bytes per vector, not the raw floats). */
  def ensureAux(sfDir: String, name: String, df: => DataFrame,
                partitionCol: String): String =
    auxBuilt.getOrElseUpdate(s"$sfDir#$name", {
      val r = root(sfDir)
      Files.createDirectories(r)
      val path = r.resolve(name).toString
      df.write.mode("overwrite").partitionBy(partitionCol).parquet(path)
      path
    })

  /** Incremental maintenance: append newly-ingested vectors into the
    * existing cell layout (each row must carry its `cell` — assigned
    * by nearest centroid, exactly how the probe routes). An appended
    * vector lands as an extra file inside its cell DIRECTORY, so
    * probes see it immediately and partition pruning is unaffected —
    * no rebuild, no rewrite of existing files. This is standard IVF
    * ingest: the coarse quantizer (the centroid table) stays FIXED
    * between retrains — appends shift the true cell means, and the
    * retrain primitive is the distributed Lloyd step
    * ([[graft.queries.SimilarityQueries]] `sim_kmeans_step`) run on a
    * drift cadence, followed by a fresh `ensure` into a new root. */
  def append(layout: Layout, vectors: DataFrame): Unit =
    vectors.write.mode("append").partitionBy("cell")
      .parquet(layout.vectors)

  /** Replay-idempotent ingest for STREAMING writers: each micro-batch
    * lands as its own `batch=<id>` partition subtree, written with
    * overwrite — a foreachBatch epoch that re-executes after a partial
    * failure (the at-least-once contract) overwrites exactly its own
    * subtree instead of double-appending into shared cell directories,
    * the same idempotence bar [[graft.streaming.KeyedParquetSink]]
    * holds via its manifest. Probes are unaffected: partition
    * discovery sees `batch`/`cell`, and pruning on `cell` still skips
    * unprobed directories across every batch. A layout must stick to
    * ONE scheme ([[append]]'s flat cells or this batch-nested form) —
    * discovery rejects a mix. */
  def appendBatch(layout: Layout, vectors: DataFrame, batchId: Long): Unit =
    vectors.write.mode("overwrite").partitionBy("cell")
      .parquet(s"${layout.vectors}/batch=$batchId")

  // ----- versioned roots: the retrain lifecycle ---------------------
  //
  // A RETRAIN must replace the whole layout (routing table + cell
  // partitioning) at once: appends only add rows under the FIXED
  // quantizer, but new centroids re-home every vector, so readers must
  // never see new centroids with old cells (a probe would route to a
  // cell whose contents were laid out under different math — silent
  // recall loss, not an error). The versioned root makes the switch
  // atomic the same way [[graft.streaming.KeyedParquetSink]] publishes
  // snapshots: each retrain writes a COMPLETE layout under
  // `<root>/v<N>/` and then atomically moves a pointer file onto
  // `<root>/_CURRENT`. A reader resolves the pointer once at query
  // start and keeps a consistent (centroids, vectors) pair for the
  // whole query even if a retrain lands mid-scan — old versions stay
  // on disk until [[vacuumVersions]] reclaims them.

  private def pointerPath(root: String) = Paths.get(root, "_CURRENT")

  private def versionOf(root: String): Option[Int] = {
    val p = pointerPath(root)
    if (Files.exists(p))
      Some(new String(Files.readAllBytes(p), "UTF-8").trim.stripPrefix("v").toInt)
    else None
  }

  private def layoutOf(root: String, v: Int): Layout = {
    val d = Paths.get(root, s"v$v")
    Layout(d.resolve("centroids").toString, d.resolve("vectors").toString)
  }

  /** The layout the `_CURRENT` pointer names, if any version has been
    * published. Resolve once per query: the returned paths are
    * immutable (a retrain writes a NEW version directory). */
  def currentLayout(root: String): Option[Layout] =
    versionOf(root).map(layoutOf(root, _))

  /** Publish a complete (centroids, vectors) layout as the next
    * version and atomically repoint `_CURRENT` at it. The pointer move
    * is the commit: a crash before it leaves a dangling `v<N>`
    * directory that the next publish simply overwrites (versions are
    * claimed by pointer state, not directory existence). */
  def publish(root: String, centroids: DataFrame,
              vectors: DataFrame): Layout = {
    Files.createDirectories(Paths.get(root))
    val v = versionOf(root).getOrElse(0) + 1
    val layout = layoutOf(root, v)
    centroids.write.mode("overwrite").parquet(layout.centroids)
    vectors.write.mode("overwrite").partitionBy("cell")
      .parquet(layout.vectors)
    // the tmp pointer name carries a per-publisher nonce: two
    // publishers that read the same committed version compute the SAME
    // next v, and with a bare `_CURRENT.tmp$v` they would write and
    // move one shared path — the loser's ATOMIC_MOVE throws
    // NoSuchFileException instead of losing the last-move-wins race
    // cleanly. Unique names make same-version publishes collision-free.
    val nonce = java.util.UUID.randomUUID().toString.substring(0, 8)
    val tmp = Paths.get(root, s"_CURRENT.tmp$v.$nonce")
    Files.write(tmp, s"v$v".getBytes("UTF-8"))
    Files.move(tmp, pointerPath(root),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    // scratch hygiene (same bar as KeyedParquetSink): a crash between
    // writing a tmp pointer and its atomic move leaves `_CURRENT.tmpN*`
    // in the root forever — vacuumVersions only reclaims `v\d+`
    // directories. Sweep stale tmp pointers now that THIS publish has
    // committed, but ONLY those at versions STRICTLY below the one just
    // committed: a concurrent same-version publisher (same read of
    // `_CURRENT`, so same v) or a v+1 successor may still be in flight,
    // and deleting a live tmp file would crash its ATOMIC_MOVE
    // (overlapping publishers are last-move-wins by design). A crashed
    // publish's orphan at version v is reclaimed by the next publish to
    // commit a HIGHER version.
    val root0 = Paths.get(root)
    val stale = Files.list(root0)
    try stale.filter { p =>
        val n = p.getFileName.toString
        n.startsWith("_CURRENT.tmp") && {
          // version prefix of `<N>` or `<N>.<nonce>` (legacy + nonced)
          val ver = n.stripPrefix("_CURRENT.tmp").takeWhile(_.isDigit)
          ver.nonEmpty && scala.util.Try(ver.toInt).toOption.exists(_ < v)
        }
      }
      .forEach(p => Files.deleteIfExists(p))
    finally stale.close()
    layout
  }

  /** One drift-gated retrain pass over the CURRENT version — the
    * index-maintenance loop the layout doc promises, as a single
    * composable step: recompute each cell's true mean from the
    * vectors the layout actually holds, measure the L1 drift (micro
    * units, the [[graft.queries.SimilarityQueries]] `sim_centroid_
    * drift` metric) against the stored routing table, and iff any
    * cell drifted past `thresholdMicros`, run the Lloyd completion —
    * re-home every vector by its nearest NEW centroid — and
    * [[publish]] the result as the next version (atomic pointer
    * swap). Below threshold nothing is written and the current
    * layout is returned unchanged.
    *
    * Scale shape: the recompute is one narrow explode + grid-mean agg
    * over the corpus (the same shuffle a `sim_kmeans_step` pays); the
    * drift check joins two O(ncells × dim) relations and collects ONE
    * max row (the routing table, never the corpus); the re-assignment
    * broadcasts the O(ncells) centroid arrays and shuffles the corpus
    * once on vec_id for the per-vector argmax. Means are computed on
    * the 1e-6 integer grid (exact BIGINT sums), so drift and the
    * retrained centroids are bit-stable across engines and partition
    * counts. */
  private def layoutVectors(s: org.apache.spark.sql.SparkSession,
                            cur: Layout): DataFrame = {
    import org.apache.spark.sql.functions.col
    s.read.parquet(cur.vectors)
      .select(col("vec_id"), col("label"), col("emb"),
        col("cell").cast("int").as("cell"))
  }

  /** Per-(cell, dim) integer-grid means of what the layout holds now.
    * LAZY: [[measureDrift]] consumes it in a single collect, so only
    * [[maybeRetrain]] — which reads it twice (drift check + retrain) —
    * materializes it. */
  private def gridMeans(vecs: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    vecs
      .select(col("cell"), posexplode(col("emb")).as(Seq("d0", "x")))
      .select(col("cell"), (col("d0") + 1).cast("long").as("dim"),
        floor(col("x") * 1000000).cast("long").as("gx"))
      .groupBy(col("cell"), col("dim"))
      .agg((sum(col("gx")).cast("double") / (count(lit(1)) * 1000000.0))
        .as("centroid"))
  }

  /** Max per-cell L1 drift (micro units) between the stored routing
    * table and `means`. One O(ncells × dim) join; the collect reads a
    * single max row. */
  private def driftOf(s: org.apache.spark.sql.SparkSession, cur: Layout,
                      means: DataFrame): Long = {
    import org.apache.spark.sql.functions._
    val stored = s.read.parquet(cur.centroids)
      .select(col("label").cast("int").as("cell"),
        posexplode(col("cemb")).as(Seq("d0", "old")))
      .select(col("cell"), (col("d0") + 1).cast("long").as("dim"),
        col("old"))
    means.join(stored, Seq("cell", "dim"))
      .select(col("cell"),
        floor(abs(col("centroid") - col("old")) * 1000000).cast("long")
          .as("dgx"))
      .groupBy(col("cell")).agg(sum(col("dgx")).as("d"))
      .agg(max(col("d"))).collect().headOption
      .flatMap(r => Option(r.get(0)).map(_.asInstanceOf[Long]))
      .getOrElse(0L)
  }

  /** The standalone drift MONITOR: what an ingest pipeline calls on a
    * cadence (e.g. per appended batch) to decide when a retrain is
    * due, without committing to one. Cost: one grid-means pass over
    * the layout's current contents — the monitored quantity is
    * inherently corpus-wide, so a cheaper exact signal does not exist;
    * run it on the retrain-decision cadence, not per record. */
  def measureDrift(s: org.apache.spark.sql.SparkSession,
                   root: String): Long = {
    val cur = currentLayout(root).getOrElse(
      throw new IllegalStateException(s"no published version under $root"))
    driftOf(s, cur, gridMeans(layoutVectors(s, cur)))
  }

  def maybeRetrain(s: org.apache.spark.sql.SparkSession, root: String,
                   thresholdMicros: Long): (Layout, Boolean) = {
    import org.apache.spark.sql.functions._
    val cur = currentLayout(root).getOrElse(
      throw new IllegalStateException(s"no published version under $root"))
    val vecs = layoutVectors(s, cur)
    // materialized here, not in gridMeans: this path reads the means
    // twice (drift check, then the retrain's centroid arrays)
    val means = gridMeans(vecs).localCheckpoint()
    val maxDrift = driftOf(s, cur, means)
    if (maxDrift <= thresholdMicros) (cur, false)
    else {
      val newArr = means.groupBy(col("cell"))
        .agg(transform(
          array_sort(collect_list(struct(col("dim"), col("centroid")))),
          x => x.getField("centroid")).as("cemb"))
      // Lloyd completion: re-home by nearest NEW centroid through the
      // one shared argmax spelling (rounding + tie-break live there)
      val reassigned = graft.queries.SimilarityQueries.assignCells(
        vecs.drop("cell"),
        newArr.select(col("cell").as("cid"), col("cemb")))
      (publish(root,
        newArr.select(col("cell").as("label"), col("cemb")),
        reassigned), true)
    }
  }

  /** TOMBSTONE maintenance (VERDICT r15 next #6) — the third index
    * lifecycle verb after append and retrain: DELETE a set of vec_ids
    * (typically the dedup pipeline's removals — SemDeDup flags feeding
    * the vector store) and COMPACT the layout so probes stop paying
    * for dead rows. Published as the next version: the routing table
    * is carried over UNCHANGED (deletes do not retrain — the cells'
    * geometry is unaffected, only their contents thin; the drift
    * monitor decides separately whether the thinned means warrant a
    * retrain), the vectors are rewritten cell-partitioned minus the
    * tombstoned ids, and the `_CURRENT` pointer swaps atomically, so
    * in-flight probes keep their consistent pre-delete snapshot and
    * [[vacuumVersions]] reclaims it after the retention window — the
    * same crash/reader contract as a retrain publish.
    *
    * Scale shape: ONE anti-join of the layout against the tombstone
    * set (keyed on vec_id — at 100 TB the tombstones broadcast or
    * bloom-prune exactly like the decontamination joins) and one
    * partitioned rewrite. Production batches deletes and compacts on
    * a cadence; each call pays a full-layout rewrite by design — that
    * is what reclaims the space. */
  def deleteAndCompact(s: org.apache.spark.sql.SparkSession, root: String,
                       tombstones: DataFrame): Layout = {
    import org.apache.spark.sql.functions.col
    val cur = currentLayout(root).getOrElse(
      throw new IllegalStateException(s"no published version under $root"))
    val kept = layoutVectors(s, cur)
      .join(tombstones.select(col("vec_id")), Seq("vec_id"), "left_anti")
    publish(root, s.read.parquet(cur.centroids), kept)
  }

  /** Reclaim retired versions, keeping the newest `keepLast` (the
    * current version always survives: keepLast is clamped to ≥ 1).
    * Safe against in-flight readers only to the extent of the
    * deployment's query duration — like any snapshot vacuum, the
    * retention window must exceed the longest probe. Returns the
    * deleted version directories. */
  def vacuumVersions(root: String, keepLast: Int): Seq[String] = {
    val cur = versionOf(root).getOrElse(return Nil)
    val floor = cur - math.max(1, keepLast) + 1
    val dir = Paths.get(root)
    val victims = Option(dir.toFile.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.matches("v\\d+") &&
        f.getName.drop(1).toInt < floor)
      .map(_.toString).toSeq.sorted
    victims.foreach { v =>
      graft.queries.StreamingQueries.deleteRecursively(v)
    }
    victims
  }
}
