package graft
import org.apache.spark.sql.SparkSession
object Bench {
  private def usedHeapMb(): Long = {
    val rt = Runtime.getRuntime
    (rt.totalMemory() - rt.freeMemory()) / (1024 * 1024)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // The bounded rank/cumulation windows (RetrievalQueries' <=30-row
    // df-rank selections, SimilarityQueries' |bands|-bounded threshold
    // sweep, CurationQueries' bucket-total prefix sum) intentionally
    // run unpartitioned over tiny relations; WindowExec warns per
    // execution and the spam buries real warnings in this log
    // (VERDICT r13). partitionBy(lit(1)) is constant-folded away by
    // the optimizer, so silence the logger, not the plan.
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window.WindowExec",
      org.apache.logging.log4j.Level.ERROR)
    // JVM/session warm-up outside the timed region (codegen + scan
    // machinery JIT); queries run in stable name order
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/region.parquet").count()

    // Inter-run hygiene, OUTSIDE the timed region: a 134-query × 3-run
    // suite in one JVM must not let one run's session debris (temp
    // views over memory sinks, cached relations, terminated streaming
    // queries) stay reachable and degrade later queries (observed in
    // round 6: alphabetically-late queries inflated up to 60×). Every
    // query (re-)registers whatever views it needs per call, so
    // dropping them all between runs is safe. The GC nudge is
    // adaptive — ContextCleaner frees localCheckpoint blocks only
    // after their frames are collected, so when the heap is deep we
    // force a collection rather than letting block-manager memory
    // ratchet across the suite.
    val gcThresholdMb =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_GC_MB", "8192").toLong
    def sweep(): Unit = {
      spark.streams.resetTerminated()
      spark.catalog.clearCache()
      spark.catalog.listTables().collect()
        .filter(_.isTemporary)
        .foreach(t => spark.catalog.dropTempView(t.name))
      // Release finished queries' localCheckpoint blocks DETERMINISTICALLY:
      // ContextCleaner only frees them after a JVM GC collects the owning
      // frames, so in a 357-query × 3-run suite the block manager ratchets
      // to GBs of dead blocks and unified-memory pressure inflates later
      // stateful queries (r19 baseline: stream_tumbling_final 1.5 s → 6.2 s
      // purely from suite position; a forced-GC A/B recovered it to 1.3 s).
      // Every persistent RDD reachable here belongs to a COMPLETED query —
      // each catalog fn re-derives its frames per call — so unpersisting
      // between runs can never invalidate in-flight data. Explicit
      // unpersist beats leaning on System.gc(): it frees the blocks without
      // full-collection side effects (the gc-every-query A/B slowed batch
      // queries ~10% via codegen-class/code-cache churn).
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      if (usedHeapMb() > gcThresholdMb) System.gc()
    }

    // In-band hardware calibration: q1_pricing_summary standalone,
    // min-of-5, OUTSIDE the suite timings. Cross-round bench ratios
    // divide by this to separate box-speed drift from plan
    // regressions (round 9's ~1.6× hardware skew was only
    // recoverable from prose; this pins it in the artifact).
    val calibration = (1 to 5).map { _ =>
      sweep()
      val t0 = System.nanoTime()
      SparkEntry.queries("q1_pricing_summary")(spark, sfDir).count()
      (System.nanoTime() - t0) / 1e9
    }.min

    // Second, COMPUTE-BOUND calibration probe (VERDICT r15 next #8):
    // q1 is scan-bound, so it does not track compute-bound box drift —
    // the r13/r14/r15 driver-vs-quiet-box episodes all moved
    // compute-heavy fixtures while q1 held steady, leaving the drift
    // attributable only from prose. This probe is a fixed scan-free
    // arithmetic fold (4M rows x 64-step LCG fold over all cores,
    // zero I/O, deterministic result), min-of-5 like q1; cross-round
    // ratios of compute-heavy queries divide by THIS number.
    val calibrationCpu = (1 to 5).map { _ =>
      sweep()
      val t0 = System.nanoTime()
      spark.range(0, 1L << 22, 1, 32)
        .selectExpr("aggregate(sequence(0, 63), id, " +
          "(acc, x) -> (acc * 48271L + x) % 2147483647L) AS h")
        .selectExpr("sum(h)").collect()
      (System.nanoTime() - t0) / 1e9
    }.min

    val failed = scala.collection.mutable.ArrayBuffer.empty[String]
    // optional args: run only queries whose name contains any arg
    // (driver passes none → full suite)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1).filter { case (n, _) =>
      args.isEmpty || args.exists(n.contains)
    }
    // min-of-N per query: a single contended run on a shared box can
    // record 8× the real time (observed round 2); the min of three
    // runs is the contention-immune estimate of the query's cost
    val runsPerQuery =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt.max(1)
    val escalateRuns = 5
    def median(ts: Seq[Double]): Double = {
      val s = ts.sorted
      if (s.size % 2 == 1) s(s.size / 2)
      else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
    }
    // a query failing EVERY run is omitted from the timings map (its
    // name is in `failed`) — recording 0.0 would read as "instant";
    // a query that succeeded at least once reports its min and is NOT
    // in `failed`, so the two lists stay unambiguous
    var maxHeapMb = 0L
    var done = 0
    val escalated = scala.collection.mutable.ArrayBuffer.empty[String]
    val results = selected.flatMap { case (name, fn) =>
      var err: Throwable = null
      def run(): Option[Double] = {
        sweep()
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count(); Some((System.nanoTime() - t0) / 1e9) }
        catch { case e: Throwable => err = e; None }
      }
      val first = (1 to runsPerQuery).flatMap(_ => run())
      // Variance guard (VERDICT r14 next #5): the streaming fixtures
      // are micro-batch latency-sensitive to box state — the r13/r14
      // jitter episodes (stream_pipeline_golden, stream_interval_left)
      // were single readings 2×+ off on untouched code. When min and
      // median of the first runs diverge >1.5×, escalate to 5 total
      // runs so one noisy run can't dominate the per-query stat; the
      // reported stat stays the MIN over all runs (the contention-
      // immune cross-round comparison number — a median would still
      // carry sustained ambient load), with medians alongside.
      // Escalation gates on the CONFIGURED run count, not the
      // successful-run count (ADVICE r15): with SPARK_GRAFT_BENCH_RUNS
      // >= 5 the guard is already amortized by the base runs, but a
      // query with FAILED runs must not sneak into escalation off 2
      // samples when the operator asked for more — so the decision is
      // `runsPerQuery < escalateRuns`, and the log line records how
      // many of the base runs actually succeeded.
      val times =
        if (first.size >= 2 && runsPerQuery < escalateRuns &&
            median(first) > first.min * 1.5) {
          escalated += name
          System.err.println(f"[bench] $name%s variance guard: " +
            f"min=${first.min}%.2f median=${median(first)}%.2f " +
            s"(${first.size}/$runsPerQuery runs succeeded) — " +
            s"escalating to $escalateRuns runs")
          first ++ (first.size until escalateRuns).flatMap(_ => run())
        } else first
      maxHeapMb = math.max(maxHeapMb, usedHeapMb())
      done += 1
      if (done % 25 == 0)
        System.err.println(s"[bench] $done/${selected.size} done, " +
          s"heap ${usedHeapMb()} MB (max $maxHeapMb MB)")
      if (times.isEmpty) {
        failed += name
        System.err.println(s"[bench] $name FAILED: ${err.getMessage}")
        None
      } else Some(name -> times)
    }
    // per-query MIN (contention-immune cost estimate, the cross-round
    // comparison stat) AND MEDIAN (so one-off scheduler noise is
    // distinguishable from real regression IN-BAND — round 11's
    // variance cluster was undiagnosable from min alone)
    val qs = results.map { case (k, ts) => s"\"" + k + "\":" + ts.min }
      .mkString("{", ",", "}")
    val qsMedian = results.map { case (k, ts) => s"\"" + k + "\":" + median(ts) }
      .mkString("{", ",", "}")
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2.min).sum
    // the full per-query map goes to a FILE: the driver's tail capture
    // truncates one huge stdout line mid-key (BENCH_r07 recovered only
    // 57/143 timings), so stdout carries a short parseable line with a
    // pointer and the complete JSON lands in bench_out.json next to it
    val escalatedJson = escalated.map("\"" + _ + "\"").mkString("[", ",", "]")
    val meta = s""""failed":$failedJson,"runs":$runsPerQuery,""" +
      s""""escalated":$escalatedJson,""" +
      s""""calibration_q1_sec":$calibration,""" +
      s""""calibration_cpu_sec":$calibrationCpu,""" +
      s""""heap_max_mb":$maxHeapMb,"sf":"$sfDir""""
    val outFile = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json"))
    // both stats land in the FILE; the stdout line stays short (no
    // per-query maps — the driver's tail capture truncates long lines)
    java.nio.file.Files.write(outFile,
      (s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
        s""""queries_median":$qsMedian,$meta}""").getBytes("UTF-8"))
    println(s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${results.size},"queries_file":"${outFile.toAbsolutePath}",$meta}""")
    spark.stop()
  }
}
