package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Similarity search over the `embeddings` table (64-dim float
  * vectors). Cosine is computed in DOUBLE with a sequential left fold
  * (`aggregate` over `zip_with`) so Spark and the DuckDB oracle
  * (list_transform + list_sum) perform bit-identical IEEE operations;
  * a final round(…, 6) guards the last ulp.
  *
  * Scale design: the brute-force form is the correctness baseline (one
  * broadcast of the query vector, a single scan, a top-k merge — no
  * shuffle of the corpus). The sign-LSH form is the 100 TB path: bucket
  * by an 8-bit hyperplane-sign key so the scan prunes to one bucket
  * (~1/256 of the corpus) before exact re-ranking.
  */
object SimilarityQueries {

  /** Embedding dimensionality of the corpus. The Spark spellings are
    * dimension-agnostic (`zip_with`/`aggregate` fold whatever width
    * the array carries; the native CosineSimilarity checks widths
    * match at runtime) — this constant exists for the DuckDB oracle
    * spellings, whose `generate_series(1, dim)` bounds must agree
    * with the data. A 768-dim corpus is this one line. */
  private[graft] val EmbeddingDim = 64

  /** Target recall@5 (ppm) for [[annAutoprobe]] — 95%. */
  private[graft] val AutoprobeTargetPpm = 950000L

  private[graft] def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  private[graft] def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x * x), lit(0.0), (acc, x) => acc + x))

  private[queries] def withEmb(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"),
        col("label"))

  /** Brute-force exact cosine top-10 against the vec_id=0 query vector. */
  def bruteForceTopK(s: SparkSession, d: String): DataFrame = {
    val e = withEmb(s, d)
    val q = e.filter(col("vec_id") === 0).select(col("emb").as("qemb"))
    e.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(q))
      .select(col("vec_id"), col("label"),
        round(dot(col("emb"), col("qemb")) / (norm(col("emb")) * norm(col("qemb"))), 6)
          .as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(10)
  }

  val bruteForceTopKSql: String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] emb, label FROM embeddings),
      |q AS (SELECT emb qemb FROM e WHERE vec_id = 0),
      |sims AS (
      |  SELECT vec_id, label,
      |    list_sum(list_transform(generate_series(1, $EmbeddingDim), i -> emb[i]*qemb[i])) dot,
      |    sqrt(list_sum(list_transform(emb, x -> x*x))) en,
      |    sqrt(list_sum(list_transform(qemb, x -> x*x))) qn
      |  FROM e, q WHERE vec_id <> 0)
      |SELECT vec_id, label, round(dot/(en*qn), 6) AS cos_sim
      |FROM sims ORDER BY cos_sim DESC, vec_id LIMIT 10""".stripMargin

  /** Sign-LSH bucketed ANN: bucket key = sign pattern of dims 1..8
    * (8 fixed axis-aligned hyperplanes); search only the query's bucket,
    * then exact cosine re-rank, top 5. */
  def annSignLsh(s: SparkSession, d: String): DataFrame = {
    val bucket = concat((1 to 8).map(i =>
      when(element_at(col("emb"), i) >= 0, "1").otherwise("0")): _*)
    val e = withEmb(s, d).withColumn("bucket", bucket)
    val q = e.filter(col("vec_id") === 0)
      .select(col("emb").as("qemb"), col("bucket").as("qbucket"))
    e.filter(col("vec_id") =!= 0)
      .join(broadcast(q), col("bucket") === col("qbucket"))
      .select(col("vec_id"), col("label"),
        round(dot(col("emb"), col("qemb")) / (norm(col("emb")) * norm(col("qemb"))), 6)
          .as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(5)
  }

  val annSignLshSql: String =
    s"""WITH e AS (
      |  SELECT vec_id, embedding::DOUBLE[] emb, label,
      |    concat(
      |      CASE WHEN embedding[1] >= 0 THEN '1' ELSE '0' END,
      |      CASE WHEN embedding[2] >= 0 THEN '1' ELSE '0' END,
      |      CASE WHEN embedding[3] >= 0 THEN '1' ELSE '0' END,
      |      CASE WHEN embedding[4] >= 0 THEN '1' ELSE '0' END,
      |      CASE WHEN embedding[5] >= 0 THEN '1' ELSE '0' END,
      |      CASE WHEN embedding[6] >= 0 THEN '1' ELSE '0' END,
      |      CASE WHEN embedding[7] >= 0 THEN '1' ELSE '0' END,
      |      CASE WHEN embedding[8] >= 0 THEN '1' ELSE '0' END) bucket
      |  FROM embeddings),
      |q AS (SELECT emb qemb, bucket qbucket FROM e WHERE vec_id = 0),
      |sims AS (
      |  SELECT vec_id, label,
      |    list_sum(list_transform(generate_series(1, $EmbeddingDim), i -> emb[i]*qemb[i])) dot,
      |    sqrt(list_sum(list_transform(emb, x -> x*x))) en,
      |    sqrt(list_sum(list_transform(qemb, x -> x*x))) qn
      |  FROM e JOIN q ON e.bucket = q.qbucket WHERE vec_id <> 0)
      |SELECT vec_id, label, round(dot/(en*qn), 6) AS cos_sim
      |FROM sims ORDER BY cos_sim DESC, vec_id LIMIT 5""".stripMargin

  /** Brute-force top-k through the native fused CosineSimilarity
    * Catalyst expression (codegen'd, zero-allocation inner loop) —
    * must produce bit-identical results to the composable form, so it
    * shares that oracle's semantics. */
  def bruteForceTopKNative(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
    val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qemb"))
    e.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(q))
      .select(col("vec_id"), col("label"),
        round(graft.functions.GraftFunctions.cosineSim(s,
          col("embedding"), col("qemb")), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(10)
  }

  /** Per-label centroids: distributed vector averaging (the building
    * block of IVF coarse quantization). Vectors explode to
    * (label, dim, value) rows on an exact 1e-6 integer grid so the
    * per-dimension sums are order-independent; no driver-side
    * collection anywhere. Output: one row per (label, dim). */
  def labelCentroids(s: SparkSession, d: String): DataFrame = {
    val e = withEmb(s, d)
    e.select(col("label"), posexplode(col("emb")).as(Seq("dim0", "x")))
      .select(col("label"), (col("dim0") + 1).cast("long").as("dim"),
        floor(col("x") * 1000000).cast("long").as("gx"))
      .groupBy(col("label"), col("dim"))
      .agg((sum(col("gx")).cast("double") / (count(lit(1)) * 1000000.0))
        .as("centroid"))
  }

  val labelCentroidsSql: String =
    s"""WITH e AS (SELECT label, embedding::DOUBLE[] emb FROM embeddings),
      |g AS (
      |  SELECT label, CAST(t.i AS BIGINT) dim,
      |         CAST(floor(emb[t.i] * 1000000) AS BIGINT) gx
      |  FROM e, (SELECT unnest(generate_series(1, $EmbeddingDim)) i) t)
      |SELECT label, dim,
      |       CAST(SUM(gx) AS DOUBLE)/(COUNT(*)*1000000.0) AS centroid
      |FROM g GROUP BY label, dim""".stripMargin

  /** Embedding-cosine near-dup pairs: candidates restricted to the
    * same sign-LSH bucket (no all-pairs), exact cosine ≥ 0.9 via the
    * native fused expression. */
  def cosNearDup(s: SparkSession, d: String): DataFrame = {
    val bucketF = concat((1 to 8).map(i =>
      when(element_at(col("embedding"), i) >= 0, "1").otherwise("0")): _*)
    // persist feeds both join sides; released before return, with the
    // (small) pair result eagerly checkpointed off the cache
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding"), bucketF.as("bucket"))
      .persist()
    try {
      e.as("a").join(e.as("b"),
          col("a.bucket") === col("b.bucket") && col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
          round(graft.functions.GraftFunctions.cosineSim(s,
            col("a.embedding"), col("b.embedding")), 6).as("cos_sim"))
        .filter(col("cos_sim") >= 0.9)
        .localCheckpoint()
    } finally { e.unpersist(blocking = false); () }
  }

  /** SEMANTIC decontamination — the embedding-space tier of the
    * decontamination family (n-gram overlap → exact spans → THIS):
    * paraphrased or translated benchmark leakage shares no 5-gram
    * with the eval suite, but its embedding sits next to a benchmark
    * vector. Train vectors (the %20 split convention of
    * `curate_decontaminate`) are flagged when their cosine to ANY
    * benchmark vector reaches the threshold; candidates come ONLY
    * from the sign-LSH bucket join (the [[cosNearDup]] blocking — a
    * train vector meets benchmark vectors in its own bucket, never
    * all-pairs), so at 100 TB the comparison count is corpus ×
    * (bench-per-bucket), not corpus × bench. τ here is 0.2 — the
    * synthetic embeddings carry no true cross-split near-dups, so the
    * fixture exercises the full flag path at a low τ; production sets
    * τ ≈ 0.9 with the identical plan. Output: each flagged train
    * vector with its benchmark-hit count and maximum similarity (the
    * triage fields a decontamination review queue sorts by). */
  def decontamSemantic(s: SparkSession, d: String): DataFrame = {
    val bucketF = concat((1 to 8).map(i =>
      when(element_at(col("embedding"), i) >= 0, "1").otherwise("0")): _*)
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding"), bucketF.as("bucket"))
    val bench = e.filter(col("vec_id") % 20 === 0)
      .select(col("bucket").as("bbucket"), col("embedding").as("bemb"))
    e.filter(col("vec_id") % 20 =!= 0)
      .join(bench, col("bucket") === col("bbucket"))
      .withColumn("cos",
        round(graft.functions.GraftFunctions.cosineSim(s,
          col("embedding"), col("bemb")), 6))
      .filter(col("cos") >= 0.2)
      .groupBy(col("vec_id").as("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_bench_hits"),
        max(col("cos")).as("max_cos"))
  }

  /** Streaming twin of [[decontamSemantic]] (VERDICT r15 next #2) —
    * completing both-modes symmetry for all five decontamination
    * tiers: semantic contamination is flagged AT INGEST, as train
    * vectors arrive. The benchmark side is a STATIC artifact (the
    * frozen eval suite's vectors with their sign-LSH buckets — built
    * once, exactly [[streamDecontamSpan]]'s convention for the 5-gram
    * tier), broadcast stream-static under every micro-batch; each
    * arriving train vector meets ONLY the benchmark vectors in its
    * own bucket (the [[cosNearDup]] blocking — per-row work bounded
    * by bench-per-bucket, never corpus × bench), the exact cosine
    * verify runs in-flight, and the per-vector evidence (hit count +
    * max similarity — the triage fields) folds in an UPDATE-mode
    * grouped aggregation whose state is one (count, max) pair per
    * FLAGGED vector: bounded by contamination volume, not corpus
    * size. Finite input ⇒ the hit relation equals the batch join's,
    * so the SAME oracle verifies the streaming composition. */
  def streamDecontamSemantic(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.{DoubleType, LongType, StructField,
      StructType}
    val bucketF = concat((1 to 8).map(i =>
      when(element_at(col("embedding"), i) >= 0, "1").otherwise("0")): _*)
    val bench = Tables.embeddings(s, d)
      .filter(col("vec_id") % 20 === 0)
      .select(bucketF.as("bbucket"), col("embedding").as("bemb"))
      .localCheckpoint()
    val raw = s.read.parquet(s"$d/embeddings.parquet").schema
    val train = s.readStream.schema(raw)
      .parquet(s"$d/{embeddings}.parquet")
      .filter(col("vec_id") % 20 =!= 0)
      .withColumn("bucket", bucketF)
    val agg = train
      .join(broadcast(bench), col("bucket") === col("bbucket"))
      .withColumn("cos",
        round(graft.functions.GraftFunctions.cosineSim(s,
          col("embedding"), col("bemb")), 6))
      .filter(col("cos") >= 0.2)
      .groupBy(col("vec_id").as("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_bench_hits"),
        max(col("cos")).as("max_cos"))
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("n_bench_hits", LongType),
      StructField("max_cos", DoubleType)))
    val store = new graft.streaming.SnapshotStore(schema, keyField = "doc_id")
    val ckpt = StreamingQueries.scratchDir("graft-sq-")
    val q = graft.util.Confs.withShufflePartitions(s, 8) {
      agg.writeStream.outputMode("update")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: DataFrame, _: Long) => store.upsert(b) }
        .start()
    }
    try {
      q.processAllAvailable()
      store.df(s).localCheckpoint()
    } finally {
      q.stop()
      s.streams.resetTerminated()
      StreamingQueries.deleteRecursively(ckpt)
    }
  }

  val decontamSemanticSql: String =
    s"""WITH e AS (
       |  SELECT vec_id, embedding::DOUBLE[] emb,
       |    concat(
       |      CASE WHEN embedding[1] >= 0 THEN '1' ELSE '0' END,
       |      CASE WHEN embedding[2] >= 0 THEN '1' ELSE '0' END,
       |      CASE WHEN embedding[3] >= 0 THEN '1' ELSE '0' END,
       |      CASE WHEN embedding[4] >= 0 THEN '1' ELSE '0' END,
       |      CASE WHEN embedding[5] >= 0 THEN '1' ELSE '0' END,
       |      CASE WHEN embedding[6] >= 0 THEN '1' ELSE '0' END,
       |      CASE WHEN embedding[7] >= 0 THEN '1' ELSE '0' END,
       |      CASE WHEN embedding[8] >= 0 THEN '1' ELSE '0' END) bucket
       |  FROM embeddings),
       |p AS (
       |  SELECT t.vec_id, round(
       |    list_sum(list_transform(generate_series(1, $EmbeddingDim),
       |      i -> t.emb[i]*b.emb[i])) /
       |    (sqrt(list_sum(list_transform(t.emb, x -> x*x))) *
       |     sqrt(list_sum(list_transform(b.emb, x -> x*x)))), 6) AS c
       |  FROM e t JOIN e b
       |    ON t.bucket = b.bucket AND t.vec_id % 20 <> 0
       |   AND b.vec_id % 20 = 0)
       |SELECT vec_id AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_bench_hits,
       |       MAX(c) AS max_cos
       |FROM p WHERE c >= 0.2 GROUP BY vec_id""".stripMargin

  /** Near-dup THRESHOLD SWEEP — the tuning curve a pipeline runs
    * before committing to a dedup cutoff: for every cosine decile
    * band over the sign-LSH candidate pairs ([[cosNearDup]]'s bucket
    * join, unfiltered), the pair count, the distinct vectors
    * involved, and the cumulative pairs at-or-above the band (what a
    * threshold at that band would flag). ONE aggregation pass: each
    * pair contributes its two endpoints to the band's exploded rows,
    * so n_pairs = rows/2 and n_docs = COUNT(DISTINCT) ride the same
    * shuffle; the final cumulative window orders ≤ 21 band rows —
    * driver-scale, not corpus-scale. Banding floors the 6dp-rounded
    * cosine ×10: both engines floor the SAME double, so the band is
    * engine-portable wherever the rounded cosine is. */
  def thresholdSweep(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bucketF = concat((1 to 8).map(i =>
      when(element_at(col("embedding"), i) >= 0, "1").otherwise("0")): _*)
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding"), bucketF.as("bucket"))
      .persist()
    try {
      val banded = e.as("a").join(e.as("b"),
          col("a.bucket") === col("b.bucket") &&
            col("a.vec_id") < col("b.vec_id"))
        .select(
          floor(round(graft.functions.GraftFunctions.cosineSim(s,
            col("a.embedding"), col("b.embedding")), 6) * 10)
            .cast("long").as("band"),
          col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
        .select(col("band"),
          explode(array(col("vec_a"), col("vec_b"))).as("v"))
      val g = banded.groupBy(col("band"))
        .agg(expr("CAST(count(1) DIV 2 AS BIGINT)").as("n_pairs"),
          countDistinct(col("v")).cast("long").as("n_docs"))
      g.withColumn("cum_pairs",
          sum(col("n_pairs")).over(Window.orderBy(col("band").desc))
            .cast("long"))
        .localCheckpoint()
    } finally { e.unpersist(blocking = false); () }
  }

  val thresholdSweepSql: String =
    s"""WITH e AS (
       |  SELECT vec_id, embedding::DOUBLE[] emb,
       |    concat(
       |      CASE WHEN embedding[1] >= 0 THEN '1' ELSE '0' END,
       |      CASE WHEN embedding[2] >= 0 THEN '1' ELSE '0' END,
       |      CASE WHEN embedding[3] >= 0 THEN '1' ELSE '0' END,
       |      CASE WHEN embedding[4] >= 0 THEN '1' ELSE '0' END,
       |      CASE WHEN embedding[5] >= 0 THEN '1' ELSE '0' END,
       |      CASE WHEN embedding[6] >= 0 THEN '1' ELSE '0' END,
       |      CASE WHEN embedding[7] >= 0 THEN '1' ELSE '0' END,
       |      CASE WHEN embedding[8] >= 0 THEN '1' ELSE '0' END) bucket
       |  FROM embeddings),
       |banded AS (
       |  SELECT CAST(floor(round(
       |    list_sum(list_transform(generate_series(1, $EmbeddingDim),
       |      i -> a.emb[i]*b.emb[i])) /
       |    (sqrt(list_sum(list_transform(a.emb, x -> x*x))) *
       |     sqrt(list_sum(list_transform(b.emb, x -> x*x)))), 6) * 10)
       |    AS BIGINT) AS band,
       |    a.vec_id va, b.vec_id vb
       |  FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id < b.vec_id),
       |x AS (SELECT band, unnest([va, vb]) AS v FROM banded),
       |g AS (SELECT band, CAST(COUNT(*) // 2 AS BIGINT) AS n_pairs,
       |        CAST(COUNT(DISTINCT v) AS BIGINT) AS n_docs
       |      FROM x GROUP BY band)
       |SELECT band, n_pairs, n_docs,
       |  CAST(SUM(n_pairs) OVER (ORDER BY band DESC) AS BIGINT) AS cum_pairs
       |FROM g""".stripMargin

  /** SemDeDup-style semantic dedup: assign every vector to its
    * NEAREST per-label centroid (k-means-style cluster, NOT its own
    * label), then compare pairs only WITHIN a cluster and flag the
    * higher-id member of any pair above the similarity threshold —
    * keep-lowest-id, the SemDeDup rule. The cluster is the blocking
    * key: at 100 TB the pair join is per-cluster (corpus/k rows a
    * side), never all-pairs, and the centroid table broadcasts.
    * Determinism: centroids come from the exact 1e-6 grid
    * ([[labelCentroids]]); assignment and pair scores round to 6dp
    * with a label-ascending tie-break, so both engines pick identical
    * clusters. τ = 0.4 is calibrated to this synthetic corpus (max
    * pair cosine ≈ 0.51, so both branches are exercised; a production
    * SemDeDup would sit at ≈ 0.95). */
  def dedupSemantic(s: SparkSession, d: String): DataFrame = {
    val av = assignedVectors(s, d).persist()
    try dedupSemanticOver(av).localCheckpoint()
    finally { av.unpersist(blocking = false); () }
  }

  /** The un-checkpointed dataflow, for plan-property pinning: the
    * assignment (k-wide broadcast nested loop) feeding the
    * cluster-keyed pair join. */
  private[graft] def dedupSemanticPlanOnly(s: SparkSession,
                                           d: String): DataFrame =
    dedupSemanticOver(assignedVectors(s, d))

  /** (vec_id, emb, cluster): every vector labeled with its nearest
    * centroid by 6dp-rounded cosine, ties to the smallest label. */
  private def assignedVectors(s: SparkSession, d: String): DataFrame = {
    val e = withEmb(s, d)
    val cents = centroidArrays(s, d)
      .select(col("label").as("c_label"), col("cemb"))
    val assigned = e.crossJoin(broadcast(cents))
      .select(col("vec_id"),
        col("c_label"),
        round(dot(col("emb"), col("cemb")) /
          (norm(col("emb")) * norm(col("cemb"))), 6).as("score"))
      .groupBy(col("vec_id"))
      .agg(expr("max_by(c_label, struct(score, -c_label))").as("cluster"))
    e.select(col("vec_id"), col("emb")).join(assigned, "vec_id")
  }

  /** SemDeDup's scale path. The exact [[dedupSemantic]] pairs ALL
    * vectors sharing a cluster — correct, but when cluster COUNT is
    * fixed (here: the corpus's label set) cluster SIZE grows with the
    * corpus and the pair join is quadratic per cluster: measured
    * 1.5 s → 155 s for 10× vectors at the r12 sf1 decade. Production
    * SemDeDup caps effective cluster size; this variant adds a second
    * blocking level INSIDE each cluster — BANDED sign-LSH, the vector
    * analog of [[graft.queries.DedupQueries]]'s MinHash banding: 8
    * bands of 4 hyperplanes (sign of dims 1..32), a pair is a
    * candidate when ANY band's 4-bit signature matches within the
    * cluster. OR-of-ANDs keeps recall high where the single
    * 8-bit AND-bucket of [[annSignLsh]] would collapse it (for two
    * vectors at angle θ each hyperplane agrees with prob 1−θ/π; at
    * the 0.4 threshold an all-8 AND keeps ~2% of true pairs, 8
    * OR'd 4-bit bands ~75%). Candidates are generated as ID pairs
    * first and embeddings joined back once — the banding explode
    * never shuffles vector payloads. The band rule is deterministic,
    * so the DuckDB oracle replicates the approximation EXACTLY — a
    * verified approximate operator, not an unverifiable heuristic.
    * Same output contract as dedup_semantic: (vec_id, cluster,
    * is_dup). */
  def dedupSemanticLsh(s: SparkSession, d: String): DataFrame = {
    val bands = array((0 until 8).map { b =>
      struct(lit(b).as("band"),
        concat((1 to 4).map(j =>
          when(element_at(col("emb"), b * 4 + j) >= 0, "1")
            .otherwise("0")): _*).as("sig"))
    }: _*)
    val av = assignedVectors(s, d).persist()
    try {
      val sigs = av
        .select(col("vec_id"), col("cluster"), explode(bands).as("bd"))
        .select(col("vec_id"), col("cluster"),
          col("bd.band").as("band"), col("bd.sig").as("sig"))
      val cand = sigs.as("a").join(sigs.as("b"),
          col("a.cluster") === col("b.cluster") &&
            col("a.band") === col("b.band") &&
            col("a.sig") === col("b.sig") &&
            col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("ida"), col("b.vec_id").as("idb"))
        .distinct()
      val emb = av.select(col("vec_id"), col("emb"))
      val dups = cand
        .join(emb.select(col("vec_id").as("ida"), col("emb").as("ea")), "ida")
        .join(emb.select(col("vec_id").as("idb"), col("emb").as("eb")), "idb")
        .filter(round(dot(col("ea"), col("eb")) /
          (norm(col("ea")) * norm(col("eb"))), 6) >= 0.4)
        .select(col("idb").as("vec_id")).distinct()
        .withColumn("flag", lit(1L))
      av.select(col("vec_id"), col("cluster"))
        .join(dups, Seq("vec_id"), "left")
        .select(col("vec_id"), col("cluster").cast("long").as("cluster"),
          coalesce(col("flag"), lit(0L)).as("is_dup"))
        .localCheckpoint()
    } finally { av.unpersist(blocking = false); () }
  }

  private def dedupSemanticOver(av: DataFrame): DataFrame = {
    val dups = av.as("a").join(av.as("b"),
        col("a.cluster") === col("b.cluster") &&
          col("a.vec_id") < col("b.vec_id"))
      .filter(round(dot(col("a.emb"), col("b.emb")) /
        (norm(col("a.emb")) * norm(col("b.emb"))), 6) >= 0.4)
      .select(col("b.vec_id").as("vec_id")).distinct()
      .withColumn("flag", lit(1L))
    av.select(col("vec_id"), col("cluster"))
      .join(dups, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cluster").cast("long").as("cluster"),
        coalesce(col("flag"), lit(0L)).as("is_dup"))
  }

  /** Prototype selection (SSL-prototypes-style data pruning): the 3
    * most CENTRAL vectors of every k-means-style cluster — rank by
    * 6dp-rounded cosine to the assigned centroid, vec_id tie-break.
    * The other half of the [[dedupSemantic]] curation pair: semantic
    * dedup drops redundancy, prototype selection picks the exemplars
    * a data-pruning pipeline keeps or up-weights. Per-cluster windows
    * only — the corpus never sorts globally. */
  def curatePrototypes(s: SparkSession, d: String): DataFrame = {
    val cents = centroidArrays(s, d)
      .select(col("label").as("cluster"), col("cemb"))
    val scored = assignedVectors(s, d)
      .join(broadcast(cents), Seq("cluster"))
      .select(col("cluster").cast("long").as("cluster"), col("vec_id"),
        round(dot(col("emb"), col("cemb")) /
          (norm(col("emb")) * norm(col("cemb"))), 6).as("centrality"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cluster"))
      .orderBy(col("centrality").desc, col("vec_id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("cluster"), col("rk").cast("long").as("rk"),
        col("vec_id"), col("centrality"))
  }

  val curatePrototypesSql: String =
    s"""WITH c AS (SELECT * FROM ($labelCentroidsSql) x),
      |e AS (SELECT vec_id, embedding::DOUBLE[] emb FROM embeddings),
      |carr AS (SELECT label AS c_label, list(centroid ORDER BY dim) cemb
      |         FROM c GROUP BY label),
      |scored AS (
      |  SELECT e.vec_id, ca.c_label,
      |    round(
      |      list_sum(list_transform(generate_series(1, $EmbeddingDim), i -> emb[i]*cemb[i])) /
      |      (sqrt(list_sum(list_transform(emb, x -> x*x))) *
      |       sqrt(list_sum(list_transform(cemb, x -> x*x)))), 6) AS score
      |  FROM e CROSS JOIN carr ca),
      |r AS (SELECT vec_id, c_label,
      |        row_number() OVER (PARTITION BY vec_id
      |                           ORDER BY score DESC, c_label) rn
      |      FROM scored),
      |asg AS (SELECT vec_id, c_label AS cluster FROM r WHERE rn = 1),
      |cent AS (
      |  SELECT a.vec_id, a.cluster, s.score AS centrality
      |  FROM asg a JOIN scored s
      |    ON s.vec_id = a.vec_id AND s.c_label = a.cluster),
      |rk AS (SELECT *, row_number() OVER (PARTITION BY cluster
      |                 ORDER BY centrality DESC, vec_id) rk FROM cent)
      |SELECT CAST(cluster AS BIGINT) AS cluster, CAST(rk AS BIGINT) AS rk,
      |       vec_id, centrality
      |FROM rk WHERE rk <= 3""".stripMargin

  val dedupSemanticSql: String =
    s"""WITH c AS (SELECT * FROM ($labelCentroidsSql) x),
      |e AS (SELECT vec_id, embedding::DOUBLE[] emb FROM embeddings),
      |carr AS (SELECT label AS c_label, list(centroid ORDER BY dim) cemb
      |         FROM c GROUP BY label),
      |scored AS (
      |  SELECT e.vec_id, ca.c_label,
      |    round(
      |      list_sum(list_transform(generate_series(1, $EmbeddingDim), i -> emb[i]*cemb[i])) /
      |      (sqrt(list_sum(list_transform(emb, x -> x*x))) *
      |       sqrt(list_sum(list_transform(cemb, x -> x*x)))), 6) AS score
      |  FROM e CROSS JOIN carr ca),
      |r AS (SELECT vec_id, c_label,
      |        row_number() OVER (PARTITION BY vec_id
      |                           ORDER BY score DESC, c_label) rn
      |      FROM scored),
      |av AS (SELECT e.vec_id, e.emb, a.c_label AS cluster
      |       FROM e JOIN (SELECT vec_id, c_label FROM r WHERE rn = 1) a
      |       USING (vec_id)),
      |dup AS (
      |  SELECT DISTINCT b.vec_id
      |  FROM av a JOIN av b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
      |  WHERE round(
      |      list_sum(list_transform(generate_series(1, $EmbeddingDim), i -> a.emb[i]*b.emb[i])) /
      |      (sqrt(list_sum(list_transform(a.emb, x -> x*x))) *
      |       sqrt(list_sum(list_transform(b.emb, x -> x*x)))), 6) >= 0.4)
      |SELECT av.vec_id, CAST(cluster AS BIGINT) AS cluster,
      |  CAST(CASE WHEN av.vec_id IN (SELECT vec_id FROM dup)
      |       THEN 1 ELSE 0 END AS BIGINT) AS is_dup
      |FROM av""".stripMargin

  /** Oracle for [[dedupSemanticLsh]]: identical to the exact
    * dedup_semantic oracle except candidates come from the
    * deterministic 8×4-bit banded sign-LSH join. */
  val dedupSemanticLshSql: String =
    s"""WITH c AS (SELECT * FROM ($labelCentroidsSql) x),
      |e AS (SELECT vec_id, embedding::DOUBLE[] emb FROM embeddings),
      |carr AS (SELECT label AS c_label, list(centroid ORDER BY dim) cemb
      |         FROM c GROUP BY label),
      |scored AS (
      |  SELECT e.vec_id, ca.c_label,
      |    round(
      |      list_sum(list_transform(generate_series(1, $EmbeddingDim), i -> emb[i]*cemb[i])) /
      |      (sqrt(list_sum(list_transform(emb, x -> x*x))) *
      |       sqrt(list_sum(list_transform(cemb, x -> x*x)))), 6) AS score
      |  FROM e CROSS JOIN carr ca),
      |r AS (SELECT vec_id, c_label,
      |        row_number() OVER (PARTITION BY vec_id
      |                           ORDER BY score DESC, c_label) rn
      |      FROM scored),
      |av AS (SELECT e.vec_id, e.emb, a.c_label AS cluster
      |       FROM e JOIN (SELECT vec_id, c_label FROM r WHERE rn = 1) a
      |       USING (vec_id)),
      |sigs AS (
      |  SELECT vec_id, cluster, band,
      |    concat(
      |      CASE WHEN emb[band*4+1] >= 0 THEN '1' ELSE '0' END,
      |      CASE WHEN emb[band*4+2] >= 0 THEN '1' ELSE '0' END,
      |      CASE WHEN emb[band*4+3] >= 0 THEN '1' ELSE '0' END,
      |      CASE WHEN emb[band*4+4] >= 0 THEN '1' ELSE '0' END) sig
      |  FROM av, (SELECT unnest(generate_series(0, 7)) band) bnd),
      |cand AS (
      |  SELECT DISTINCT a.vec_id ida, b.vec_id idb
      |  FROM sigs a JOIN sigs b ON a.cluster = b.cluster
      |    AND a.band = b.band AND a.sig = b.sig AND a.vec_id < b.vec_id),
      |dup AS (
      |  SELECT DISTINCT cd.idb AS vec_id
      |  FROM cand cd JOIN av a ON a.vec_id = cd.ida
      |    JOIN av b ON b.vec_id = cd.idb
      |  WHERE round(
      |      list_sum(list_transform(generate_series(1, $EmbeddingDim), i -> a.emb[i]*b.emb[i])) /
      |      (sqrt(list_sum(list_transform(a.emb, x -> x*x))) *
      |       sqrt(list_sum(list_transform(b.emb, x -> x*x)))), 6) >= 0.4)
      |SELECT av.vec_id, CAST(cluster AS BIGINT) AS cluster,
      |  CAST(CASE WHEN av.vec_id IN (SELECT vec_id FROM dup)
      |       THEN 1 ELSE 0 END AS BIGINT) AS is_dup
      |FROM av""".stripMargin

  val cosNearDupSql: String =
    s"""WITH e AS (
      |  SELECT vec_id, embedding::DOUBLE[] emb,
      |    concat(
      |      CASE WHEN embedding[1] >= 0 THEN '1' ELSE '0' END,
      |      CASE WHEN embedding[2] >= 0 THEN '1' ELSE '0' END,
      |      CASE WHEN embedding[3] >= 0 THEN '1' ELSE '0' END,
      |      CASE WHEN embedding[4] >= 0 THEN '1' ELSE '0' END,
      |      CASE WHEN embedding[5] >= 0 THEN '1' ELSE '0' END,
      |      CASE WHEN embedding[6] >= 0 THEN '1' ELSE '0' END,
      |      CASE WHEN embedding[7] >= 0 THEN '1' ELSE '0' END,
      |      CASE WHEN embedding[8] >= 0 THEN '1' ELSE '0' END) bucket
      |  FROM embeddings),
      |pairs AS (
      |  SELECT a.vec_id va, b.vec_id vb, a.emb ea, b.emb eb
      |  FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
      |SELECT va AS vec_a, vb AS vec_b,
      |  round(
      |    list_sum(list_transform(generate_series(1, $EmbeddingDim), i -> ea[i]*eb[i])) /
      |    (sqrt(list_sum(list_transform(ea, x -> x*x))) *
      |     sqrt(list_sum(list_transform(eb, x -> x*x)))), 6) AS cos_sim
      |FROM pairs
      |WHERE round(
      |    list_sum(list_transform(generate_series(1, $EmbeddingDim), i -> ea[i]*eb[i])) /
      |    (sqrt(list_sum(list_transform(ea, x -> x*x))) *
      |     sqrt(list_sum(list_transform(eb, x -> x*x)))), 6) >= 0.9""".stripMargin

  /** IVF-style ANN: coarse cells = per-label centroids (computed
    * distributively, no driver collection); the query probes its
    * `nprobe` nearest cells, then exact-re-ranks within them — the
    * 100 TB shape where the corpus scan prunes to nprobe/ncells of the
    * data. nprobe is THE recall/cost knob: probe-1 misses neighbors
    * whose cell boundary the query sits on; each extra probed cell
    * widens the candidate scan linearly while the top-k merge stays a
    * TakeOrdered. */
  /** Per-label centroids as (label, 64-dim array) — the coarse cells
    * shared by the IVF index and the hard-negative miner. */
  private[queries] def centroidArrays(s: SparkSession, d: String): DataFrame =
    labelCentroids(s, d).groupBy(col("label"))
      .agg(transform(array_sort(collect_list(struct(col("dim"), col("centroid")))),
        x => x.getField("centroid")).as("cemb"))

  private def annIvfProbe(s: SparkSession, d: String, nprobe: Int): DataFrame = {
    val e = withEmb(s, d)
    val centArr = centroidArrays(s, d)
    val q = e.filter(col("vec_id") === 0).select(col("emb").as("qemb"))
    val best = centArr.crossJoin(broadcast(q))
      .select(col("label"),
        round(dot(col("cemb"), col("qemb")) /
          (norm(col("cemb")) * norm(col("qemb"))), 6).as("csim"))
      .orderBy(col("csim").desc, col("label"))
      .limit(nprobe)
      .select(col("label").as("best_label"))
    e.filter(col("vec_id") =!= 0)
      .join(broadcast(best), col("label") === col("best_label"))
      .crossJoin(broadcast(q))
      .select(col("vec_id"), col("label"),
        round(dot(col("emb"), col("qemb")) / (norm(col("emb")) * norm(col("qemb"))), 6)
          .as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(5)
  }

  def annIvf(s: SparkSession, d: String): DataFrame = annIvfProbe(s, d, 1)

  /** Multi-probe IVF (nprobe=2) — same index, double the probed cells. */
  def annIvfProbe2(s: SparkSession, d: String): DataFrame = annIvfProbe(s, d, 2)

  /** IVF probe against the PERSISTED index ([[graft.sources.IvfIndex]])
    * — the index-lifecycle fix for the one 100 TB gap in [[annIvf]]:
    * there, every lookup re-derives the centroids from a full corpus
    * scan; here the centroids + cell-partitioned vectors are written
    * once and a lookup touches (a) the O(ncells) centroid table to
    * route and (b) the nprobe probed cell DIRECTORIES of the vector
    * layout, pruned at scan planning time (`PartitionFilters` — pinned
    * in PlanPropertiesSpec). The router's collect reads ncells rows
    * (the centroid table, never the corpus) — the standard ANN
    * query-router step; at a billion vectors ncells is ~10^4-10^5 rows
    * while the corpus is 10^9. Same scores, ordering, and oracle as
    * [[annIvf]].
    */
  /** The lookup against an already-built layout — shared by the
    * memoized-index query and the streaming-ingest query, so both
    * probe identically. */
  private def probeLayout(s: SparkSession,
                          layout: graft.sources.IvfIndex.Layout,
                          d: String, nprobe: Int,
                          extraFilter: Column = lit(true)): DataFrame = {
    val q = withEmb(s, d).filter(col("vec_id") === 0)
      .select(col("emb").as("qemb"))
    // route: score the ncells-row centroid table against the query
    val probed: Seq[Int] = s.read.parquet(layout.centroids)
      .crossJoin(broadcast(q))
      .select(col("label"),
        round(dot(col("cemb"), col("qemb")) /
          (norm(col("cemb")) * norm(col("qemb"))), 6).as("csim"))
      .orderBy(col("csim").desc, col("label"))
      .limit(nprobe)
      .collect().toSeq.map(_.getAs[Number](0).intValue)
    // probe: static IN-filter on the partition column → the scan plans
    // with PartitionFilters and reads only the probed cell directories
    s.read.parquet(layout.vectors)
      .filter(col("cell").isin(probed: _*) && col("vec_id") =!= 0 &&
        extraFilter)
      .crossJoin(broadcast(q))
      .select(col("vec_id"), col("label"),
        round(dot(col("emb"), col("qemb")) / (norm(col("emb")) * norm(col("qemb"))), 6)
          .as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(5)
  }

  /** The ONE memoized per-corpus index build (cell = label) — shared
    * by the indexed ANN probe and the hybrid retrieval's dense leg, so
    * both query families probe the same published artifact. */
  private[queries] def sharedIvfLayout(s: SparkSession,
                                       d: String): graft.sources.IvfIndex.Layout =
    graft.sources.IvfIndex.ensure(d,
      centroidArrays(s, d),
      withEmb(s, d).withColumn("cell", col("label")))

  private def annIvfIndexedProbe(s: SparkSession, d: String,
                                 nprobe: Int): DataFrame =
    probeLayout(s, sharedIvfLayout(s, d), d, nprobe)

  def annIvfIndexed(s: SparkSession, d: String): DataFrame =
    annIvfIndexedProbe(s, d, 1)

  /** FILTERED vector search — the attribute-predicate composition
    * every production vector store must answer ("nearest neighbors
    * WHERE lang = 'en'"), and the classic correctness trap: POST-
    * filtering an unfiltered top-k loses recall (a selective predicate
    * can empty the unfiltered head entirely), so the predicate must
    * apply BEFORE the top-k gate, inside the probed cells. Here the
    * PRE-filter composes with the persisted layout's partition
    * pruning: the scan still reads only the nprobe routed cell
    * directories, the predicate (a deterministic stand-in attribute,
    * vec_id mod 3 = 1 — a real deployment filters any metadata column
    * riding the layout) filters rows inside those cells at the scan,
    * and the exact cosine top-5 ranks ONLY qualifying vectors. The
    * oracle replicates route→filter→rank declaratively, so a hash
    * match pins the filter's position in the pipeline — wrongly
    * post-filtered results rank vectors the predicate forbids and
    * cannot match. nprobe = 2 (the selective filter thins each cell,
    * so filtered search probes wider — the standard production
    * compensation). */
  def annIvfFiltered(s: SparkSession, d: String): DataFrame =
    probeLayout(s, sharedIvfLayout(s, d), d, nprobe = 2,
      extraFilter = col("vec_id") % 3 === 1)

  val annIvfFilteredSql: String = annIvfProbeSql(2, "e.vec_id % 3 = 1")

  /** IVF TOMBSTONE maintenance (VERDICT r15 next #6) — the dedup
    * pipeline's removals feeding the index lifecycle: publish the
    * corpus as v1, take the SemDeDup flags as tombstones,
    * [[graft.sources.IvfIndex.deleteAndCompact]] them into v2
    * (routing table carried over unchanged — deletes do not retrain;
    * atomic `_CURRENT` swap), VACUUM the retired v1, and probe the
    * compacted index. The tombstone feed is [[dedupSemanticLsh]] —
    * the SCALE path of the SemDeDup family, deliberately: the exact
    * all-pairs-per-cluster variant is quadratic in cluster size (the
    * documented r12 decade cliff, 1.5 s → 155 s for 10× vectors —
    * measured again at 29× HERE when this query briefly fed from it),
    * while the banded-LSH variant is the one a production maintenance
    * job would run; both are catalog-verified operators, so the feed
    * stays oracle-exact. The oracle re-derives route →
    * rank-over-REMAINING declaratively (the dedup SQL names the dead
    * set), so a hash match proves the whole maintenance cycle —
    * publish → delete → compact → swap → vacuum → probe — returns
    * exactly what the math says the post-delete index must. The
    * recall-after-delete assertion (probe-1 equals the exact top-5 of
    * the remaining corpus on the boundary fixture) lives in
    * IvfRetrainSpec, the [[annRecall]] protocol. */
  def ivfDeleteProbe(s: SparkSession, d: String): DataFrame = {
    val root = StreamingQueries.scratchDir("graft-ivf-del-")
    try {
      val e = withEmb(s, d)
      graft.sources.IvfIndex.publish(root,
        centroidArrays(s, d), e.withColumn("cell", col("label")))
      val dead = dedupSemanticLsh(s, d).filter(col("is_dup") === 1L)
        .select(col("vec_id"))
      val layout = graft.sources.IvfIndex.deleteAndCompact(s, root, dead)
      val vacuumed = graft.sources.IvfIndex.vacuumVersions(root, keepLast = 1)
      require(vacuumed.nonEmpty,
        s"vacuum reclaimed nothing after the compact under $root")
      probeLayout(s, layout, d, nprobe = 1).localCheckpoint()
    } finally StreamingQueries.deleteRecursively(root)
  }

  /** Route over the UNCHANGED full-corpus routing table, rank only
    * the surviving vectors — the dead set spelled by the dedup SQL. */
  lazy val ivfDeleteSql: String =
    s"""WITH dd AS (
       |  SELECT vec_id FROM ($dedupSemanticLshSql) z WHERE is_dup = 1)
       |SELECT * FROM (${annIvfProbeSql(1,
            "e.vec_id NOT IN (SELECT vec_id FROM dd)")}) y""".stripMargin

  /** Streaming index ingest: the embeddings arrive as a STREAM, each
    * micro-batch assigns its vectors' cells (a narrow projection — at
    * retrain-fixed centroids the assignment is per-row work) and
    * appends them into the cell-partitioned layout
    * ([[graft.sources.IvfIndex.append]] — new files inside cell
    * directories, no rewrite). After the finite input drains, the
    * standard probe over the streamed-in index must return exactly
    * what the batch-built index returns — same oracle as
    * [[annIvf]]/[[annIvfIndexed]], so the ingest path itself is
    * hash-verified. This is how a production vector store stays fresh:
    * ingest appends continuously, probes route through the fixed
    * quantizer, the quantizer retrains on a drift cadence
    * ([[kmeansStep]]). */
  /** The embeddings table as a stream — shared by every streaming
    * index path so the source handling (schema pin, single-file glob,
    * array cast) has one spelling. */
  private def embStream(s: SparkSession, d: String): DataFrame = {
    val schema = s.read.parquet(s"$d/embeddings.parquet").schema
    s.readStream.schema(schema)
      .parquet(s"$d/{embeddings}.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"),
        col("label"))
  }

  /** Drain a foreachBatch ingest over [[embStream]], then clear the
    * terminated-query reference (the session-hygiene contract pinned
    * in StreamingHygieneSpec — a stopped query otherwise stays
    * reachable through the manager for the session's lifetime). */
  private def runIngest(s: SparkSession, d: String, ckpt: String)(
      perBatch: (DataFrame, Long) => Unit): Unit = {
    val q = graft.util.Confs.withShufflePartitions(s, 4) {
      embStream(s, d).writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: DataFrame, id: Long) => perBatch(b, id) }
        .start()
    }
    try q.processAllAvailable()
    finally {
      q.stop()
      s.streams.resetTerminated()
    }
  }

  def streamIvfIngest(s: SparkSession, d: String): DataFrame = {
    val root = java.nio.file.Paths.get(
      StreamingQueries.scratchDir("graft-ivf-ingest-"))
    val layout = graft.sources.IvfIndex.Layout(
      centroids = root.resolve("centroids").toString,
      vectors = root.resolve("vectors").toString)
    // the routing table is the retrain artifact — written once, fixed
    // across the whole ingest
    centroidArrays(s, d).write.mode("overwrite").parquet(layout.centroids)
    val ckpt = StreamingQueries.scratchDir("graft-ivf-ck-")
    // scratch index + checkpoint are per-invocation; the cleanup runs
    // in finally so a failed streaming query doesn't leak /dev/shm
    try {
      runIngest(s, d, ckpt) { (b, id) =>
        // batch-keyed overwrite: a re-executed epoch (foreachBatch
        // is at-least-once) replaces its own subtree instead of
        // double-appending duplicate vectors into the cells
        graft.sources.IvfIndex.appendBatch(layout,
          b.withColumn("cell", col("label")), id)
      }
      probeLayout(s, layout, d, nprobe = 1).localCheckpoint()
    } finally Seq(root.toString, ckpt)
      .foreach(StreamingQueries.deleteRecursively)
  }

  /** The retrain lifecycle under STREAMING ingest — the production
    * shape end-to-end: vectors arrive as a stream, each micro-batch is
    * homed by the CURRENT (stale, seed) routing table and appended
    * into the versioned layout replay-idempotently (`batch=<id>`
    * overwrite, as [[streamIvfIngest]]), and the drift MONITOR runs on
    * the per-batch cadence ([[graft.sources.IvfIndex.measureDrift]] —
    * the number an index operator alerts on). When the ingest drains,
    * the drift-gated retrain fires ([[graft.sources.IvfIndex
    * .maybeRetrain]]): one Lloyd completion over everything ingested,
    * published as v2 with an atomic pointer swap, and the probe runs
    * against the retrained layout. Because per-batch homing under
    * FIXED centroids is per-row work, the incrementally-built v1
    * equals the batch-built one, so the final probe shares
    * [[ivfRetrainSql]] — the streaming composition is hash-verified
    * against the same declarative oracle as the batch lifecycle.
    * Monitor cost is one grid-means pass over the accumulated layout
    * per batch — the retrain-decision cadence, documented in
    * measureDrift; production tunes the cadence, the fixture runs it
    * every batch to pin monotone-growing drift. */
  def streamIvfRetrain(s: SparkSession, d: String): DataFrame = {
    val root = StreamingQueries.scratchDir("graft-ivf-sretrain-")
    val ckpt = StreamingQueries.scratchDir("graft-ivf-sr-ck-")
    try {
      val e = withEmb(s, d)
      val seeds = seedCentroids(e)
      // v1: routing table = the seeds, vector layout starts empty and
      // fills from the stream (the schema-only write carries no rows)
      val v1 = graft.sources.IvfIndex.publish(root,
        seeds.select(col("cid").as("label"), col("cemb")),
        e.limit(0).withColumn("cell", lit(0)))
      val drifts = scala.collection.mutable.ArrayBuffer.empty[Long]
      runIngest(s, d, ckpt) { (b, id) =>
        graft.sources.IvfIndex.appendBatch(v1, assignCells(b, seeds), id)
        drifts += graft.sources.IvfIndex.measureDrift(s, root)
      }
      require(drifts.nonEmpty && drifts.last > 0,
        s"ingest produced no drift signal under $d: $drifts")
      val (layout, retrained) =
        graft.sources.IvfIndex.maybeRetrain(s, root, thresholdMicros = 0L)
      require(retrained, s"accumulated ingest did not trigger a retrain")
      probeLayout(s, layout, d, nprobe = 1).localCheckpoint()
    } finally Seq(root, ckpt)
      .foreach(StreamingQueries.deleteRecursively)
  }

  /** Assign every vector to its nearest centroid (max rounded cosine,
    * deterministic cid tie-break) — the ONE spelling of the IVF homing
    * step, shared by the retrain query's v1 build and
    * [[graft.sources.IvfIndex.maybeRetrain]]'s Lloyd completion, so
    * the tie-break/rounding rules the oracle equivalence depends on
    * cannot drift between the two. Input `e` carries (vec_id, label,
    * emb); `cents` carries (cid, cemb). Broadcast of the O(ncells)
    * centroid table; one shuffle on vec_id for the argmax window. */
  private[graft] def assignCells(e: DataFrame, cents: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id")).orderBy(col("csim").desc, col("cid"))
    e.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("label"), col("emb"), col("cid"),
        round(dot(col("emb"), col("cemb")) /
          (norm(col("emb")) * norm(col("cemb"))), 6).as("csim"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("label"), col("emb"),
        col("cid").as("cell"))
  }

  /** The full drift→retrain lifecycle as ONE verifiable query: publish
    * the index as trained (v1: the k=8 seed vectors are the routing
    * table, every vector homed by nearest seed — exactly [[kmeansStep]]'s
    * assignment), then let [[graft.sources.IvfIndex.maybeRetrain]]
    * measure the drift of the stored centroids against the cell means
    * the layout actually holds and publish the retrained v2 (new
    * centroids = the Lloyd-step grid means, vectors re-homed, atomic
    * `_CURRENT` swap), and finally probe v2 for the query vector's
    * top-5. The oracle re-derives the same answer declaratively:
    * post-Lloyd centroids, re-assignment, route, re-rank — so a hash
    * match proves the persisted lifecycle (publish → drift gate →
    * retrain → swap → probe) computes exactly what the math says it
    * must. Threshold 0 here: the seeds are single vectors, so their
    * cells' means always move and the gate always fires on real data
    * (the below-threshold branch is spec-covered with synthetic
    * vectors in IvfRetrainSpec). */
  /** k=8 seed centroids (vectors 0..7) — the "index as trained"
    * routing table shared by both retrain lifecycles, and the same
    * seed rule as [[kmeansStep]]/the oracle. One spelling: the
    * streaming and batch v1 builds must be identical for the shared
    * oracle to hold. */
  private def seedCentroids(e: DataFrame): DataFrame =
    e.filter(col("vec_id") <= 7)
      .select(col("vec_id").cast("int").as("cid"), col("emb").as("cemb"))

  def ivfRetrainProbe(s: SparkSession, d: String): DataFrame = {
    val root = StreamingQueries.scratchDir("graft-ivf-retrain-")
    try {
      val e = withEmb(s, d)
      val seeds = seedCentroids(e)
      graft.sources.IvfIndex.publish(root,
        seeds.select(col("cid").as("label"), col("cemb")),
        assignCells(e, seeds))
      val (layout, retrained) =
        graft.sources.IvfIndex.maybeRetrain(s, root, thresholdMicros = 0L)
      require(retrained, s"seed centroids did not drift under $d")
      probeLayout(s, layout, d, nprobe = 1).localCheckpoint()
    } finally StreamingQueries.deleteRecursively(root)
  }

  /** Embeds [[kmeansStepSql]]: the retrained index must hold exactly
    * the post-Lloyd centroids, so the probe is spelled against them.
    * Lazy: [[kmeansStepSql]] is declared later in this object and a
    * strict val here would interpolate null at init. */
  lazy val ivfRetrainSql: String =
    s"""WITH km AS (SELECT * FROM ($kmeansStepSql) x),
       |carr AS (SELECT cid, list(centroid ORDER BY dim) cemb
       |         FROM km GROUP BY cid),
       |e AS (SELECT vec_id, embedding::DOUBLE[] emb, label FROM embeddings),
       |q AS (SELECT emb qemb FROM e WHERE vec_id = 0),
       |scored AS (
       |  SELECT e.vec_id, e.label, e.emb, c.cid,
       |    round(
       |      list_sum(list_transform(generate_series(1, $EmbeddingDim), i -> emb[i]*cemb[i])) /
       |      (sqrt(list_sum(list_transform(emb, x -> x*x))) *
       |       sqrt(list_sum(list_transform(cemb, x -> x*x)))), 6) csim
       |  FROM e CROSS JOIN carr c),
       |assigned AS (
       |  SELECT vec_id, label, emb, cid FROM (
       |    SELECT vec_id, label, emb, cid,
       |      row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cid) rn
       |    FROM scored) WHERE rn = 1),
       |route AS (
       |  SELECT cid FROM (
       |    SELECT c.cid,
       |      round(
       |        list_sum(list_transform(generate_series(1, $EmbeddingDim), i -> cemb[i]*qemb[i])) /
       |        (sqrt(list_sum(list_transform(cemb, x -> x*x))) *
       |         sqrt(list_sum(list_transform(qemb, x -> x*x)))), 6) csim
       |    FROM carr c, q)
       |  ORDER BY csim DESC, cid LIMIT 1)
       |SELECT a.vec_id, a.label,
       |  round(
       |    list_sum(list_transform(generate_series(1, $EmbeddingDim), i -> emb[i]*qemb[i])) /
       |    (sqrt(list_sum(list_transform(emb, x -> x*x))) *
       |     sqrt(list_sum(list_transform(qemb, x -> x*x)))), 6) AS cos_sim
       |FROM assigned a JOIN route r ON a.cid = r.cid, q
       |WHERE a.vec_id <> 0
       |ORDER BY cos_sim DESC, vec_id LIMIT 5""".stripMargin

  /** Recall@5 of every ANN variant against the exact brute-force
    * top-5 — the metric an ANN deployment actually tracks (an index
    * with unmeasured recall is a guess, not an index), computed
    * IN-ENGINE so the number ships with the corpus run. Each variant's
    * top-5 joins the exact set on vec_id; cost = the variants' own
    * (already pruned) plans plus a 5-row join each. Demonstrates the
    * recall/cost knob directly: probe-2 recall ≥ probe-1 by
    * construction. */
  /** Recall-targeted nprobe auto-tuning (r16 verdict next #5) — the
    * serving-config closure of the ANN loop: given a HELD-OUT query
    * set (vec_ids 0..4, excluded from the corpus) and a target
    * recall@5 ([[AutoprobeTargetPpm]]), sweep nprobe = 1..ncells and
    * emit each probe depth's measured recall plus the MINIMAL depth
    * meeting the target — the number a production store tunes by
    * hand. Deterministic and fully relational, so the oracle verifies
    * the whole sweep: per-query centroid ranks assign every corpus
    * vector its label's probe rank r (a vector is a candidate at
    * every nprobe ≥ r), each (query, r) cell reduces to its top-5
    * with the k-bounded LONG aggregator on the micro-cosine grid, the
    * per-depth results are a PREFIX MERGE of those ≤5-row partial
    * tops (the aggregator is a selection monoid — r17 verdict #5:
    * corpus rows are scored once and never replicated per depth), and
    * recall@5 joins against the exact top-5 from the same grid.
    * Cost: corpus × |queries| scored ONCE plus
    * O(queries × ncells × k) merge rows — the sweep is a tuning job
    * over a sample in production, not a serving path. Driver-side
    * work: the ncells count (router-collect bound). */
  def annAutoprobe(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = withEmb(s, d)
    val qs = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("emb").as("qemb"))
    val cents = centroidArrays(s, d)
    val nLabels = cents.count() // ncells rows — the router-collect bound
    val cm = round(dot(col("emb"), col("qemb")) /
      (norm(col("emb")) * norm(col("qemb"))) * 1000000).cast("long")
    val rnk = cents.withColumnRenamed("cemb", "emb")
      .crossJoin(broadcast(qs))
      .select(col("label"), col("qid"), cm.as("ccm"))
      .withColumn("r", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("ccm").desc, col("label"))))
      .select(col("qid"), col("label"), col("r"))
    val topk = udaf(new graft.functions.TopKByScoreLong(5))
    val scored = e.filter(col("vec_id") >= 5)
      .crossJoin(broadcast(qs))
      .select(col("qid"), col("vec_id"), col("label"), cm.as("cm"))
    val exact = scored.groupBy(col("qid"))
      .agg(topk(col("cm") * lit(4294967296L) - col("vec_id"),
        col("vec_id")).as("top"))
      .select(col("qid"), explode(col("top.ids")).as("vec_id"))
    // scale-tight sweep spelling (r17 verdict #5): the k-bounded LONG
    // top-k is a selection MONOID — top-5 at probe depth np equals
    // top-5 over the UNION of per-probe-rank top-5s with r <= np — so
    // aggregate each (qid, r) cell to its top-5 FIRST (one pass over
    // the scored corpus, no replication), then prefix-merge the <=5-row
    // partial tops across depths. The pre-merge candidate relation is
    // O(corpus + queries * ncells * k), not O(corpus * ncells); only
    // already-reduced top rows fan out over the remaining depths.
    val perRank = scored.join(broadcast(rnk), Seq("qid", "label"))
      .groupBy(col("qid"), col("r"))
      .agg(topk(col("cm") * lit(4294967296L) - col("vec_id"),
        col("vec_id")).as("top"))
      .select(col("qid"), col("r"),
        explode(arrays_zip(col("top.scores"), col("top.ids"))).as("z"))
      .select(col("qid"), col("r"), col("z.scores").as("pk"),
        col("z.ids").as("vec_id"))
    val appx = perRank
      .select(col("qid"), col("pk"), col("vec_id"),
        explode(expr(s"sequence(CAST(r AS BIGINT), ${nLabels}L)")).as("np"))
      .groupBy(col("qid"), col("np"))
      .agg(topk(col("pk"), col("vec_id")).as("top"))
      .select(col("qid"), col("np"), explode(col("top.ids")).as("vec_id"))
    val hits = appx.join(exact, Seq("qid", "vec_id"))
      .groupBy(col("np")).agg(count(lit(1)).as("h"))
    val rec = s.range(1, nLabels + 1).select(col("id").as("nprobe"))
      .join(hits, col("nprobe") === col("np"), "left")
      .select(col("nprobe"),
        expr("COALESCE(h, 0L) * 1000000L DIV 25").as("recall_ppm"))
    val chosen = rec.filter(col("recall_ppm") >= AutoprobeTargetPpm)
      .agg(min(col("nprobe")).as("mn"))
    rec.crossJoin(broadcast(chosen))
      .select(col("nprobe"), col("recall_ppm"),
        (col("recall_ppm") >= AutoprobeTargetPpm).cast("long")
          .as("meets_target"),
        coalesce((col("nprobe") === col("mn")).cast("long"), lit(0L))
          .as("chosen"))
  }

  val annAutoprobeSql: String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] emb, label FROM embeddings),
       |g AS (
       |  SELECT label, CAST(t.i AS BIGINT) dim,
       |         CAST(floor(emb[t.i] * 1000000) AS BIGINT) gx
       |  FROM e, (SELECT unnest(generate_series(1, $EmbeddingDim)) i) t),
       |c AS (
       |  SELECT label, dim,
       |         CAST(SUM(gx) AS DOUBLE)/(COUNT(*)*1000000.0) AS centroid
       |  FROM g GROUP BY label, dim),
       |carr AS (SELECT label, list(centroid ORDER BY dim) cemb
       |         FROM c GROUP BY label),
       |q AS (SELECT vec_id AS qid, emb AS qemb FROM e WHERE vec_id < 5),
       |rnk AS (
       |  SELECT qid, label,
       |         row_number() OVER (PARTITION BY qid ORDER BY ccm DESC, label)
       |           AS r
       |  FROM (SELECT q.qid, carr.label,
       |          CAST(round(
       |            list_sum(list_transform(generate_series(1, $EmbeddingDim),
       |              i -> cemb[i]*qemb[i])) /
       |            (sqrt(list_sum(list_transform(cemb, x -> x*x))) *
       |             sqrt(list_sum(list_transform(qemb, x -> x*x)))) * 1000000)
       |            AS BIGINT) AS ccm
       |        FROM carr, q) z),
       |sc AS (
       |  SELECT q.qid, e.vec_id, e.label,
       |         CAST(round(
       |           list_sum(list_transform(generate_series(1, $EmbeddingDim),
       |             i -> emb[i]*qemb[i])) /
       |           (sqrt(list_sum(list_transform(emb, x -> x*x))) *
       |            sqrt(list_sum(list_transform(qemb, x -> x*x)))) * 1000000)
       |           AS BIGINT) AS cm
       |  FROM e, q WHERE e.vec_id >= 5),
       |ex AS (
       |  SELECT qid, vec_id FROM (
       |    SELECT qid, vec_id,
       |           row_number() OVER (PARTITION BY qid ORDER BY cm DESC, vec_id)
       |             rn
       |    FROM sc) WHERE rn <= 5),
       |sweep AS (SELECT unnest(generate_series(1,
       |            (SELECT COUNT(*) FROM carr))) AS np),
       |ap AS (
       |  SELECT qid, np, vec_id FROM (
       |    SELECT s.qid, w.np, s.vec_id,
       |           row_number() OVER (PARTITION BY s.qid, w.np
       |             ORDER BY s.cm DESC, s.vec_id) rn
       |    FROM sc s JOIN rnk k ON k.qid = s.qid AND k.label = s.label
       |    JOIN sweep w ON k.r <= w.np) WHERE rn <= 5),
       |hits AS (SELECT np, COUNT(*) h FROM ap JOIN ex USING (qid, vec_id)
       |         GROUP BY np),
       |rec AS (
       |  SELECT CAST(w.np AS BIGINT) AS nprobe,
       |         CAST(COALESCE(h, 0) * 1000000 // 25 AS BIGINT) AS recall_ppm
       |  FROM sweep w LEFT JOIN hits ON hits.np = w.np),
       |ch AS (SELECT MIN(nprobe) mn FROM rec
       |       WHERE recall_ppm >= $AutoprobeTargetPpm)
       |SELECT nprobe, recall_ppm,
       |       CAST(CASE WHEN recall_ppm >= $AutoprobeTargetPpm THEN 1 ELSE 0 END
       |            AS BIGINT) AS meets_target,
       |       CAST(CASE WHEN nprobe = (SELECT mn FROM ch) THEN 1 ELSE 0 END
       |            AS BIGINT) AS chosen
       |FROM rec""".stripMargin

  def annRecall(s: SparkSession, d: String): DataFrame = {
    val exact = bruteForceTopK(s, d).limit(5).select(col("vec_id"))
    def recallOf(method: String, ann: DataFrame): DataFrame =
      ann.select(col("vec_id")).join(exact, "vec_id")
        .agg(count(lit(1)).cast("long").as("hits"))
        .select(lit(method).as("method"), col("hits"),
          floor(col("hits") * 1000000.0 / 5).cast("long").as("recall_ppm"))
    recallOf("sign_lsh", annSignLsh(s, d))
      .unionAll(recallOf("ivf_probe1", annIvf(s, d)))
      .unionAll(recallOf("ivf_probe2", annIvfProbe2(s, d)))
      // the compressed-domain arm: what the 32x-smaller PQ index costs
      // in recall — top-5 by approximate ADC score vs exact top-5
      .unionAll(recallOf("pq_adc", pqAdcTopK(s, d).limit(5)))
      // the composed production layout: residual-PQ inside probed IVF
      // cells — recall reflects BOTH the cell pruning and the
      // quantization error
      .unionAll(recallOf("ivfpq", annIvfPq(s, d).limit(5)))
      // two-stage: ADC shortlist + exact re-rank — the recall the
      // quantization gave up, bought back for a 20-row float read
      .unionAll(recallOf("ivfpq_rerank", annIvfPqRerank(s, d)))
  }

  /** Embeds the exact and ANN oracles so no spelling can drift. */
  lazy val annRecallSql: String = {
    def arm(method: String, cte: String): String =
      s"""SELECT '$method' AS method,
         |  CAST(COUNT(*) AS BIGINT) AS hits,
         |  CAST(floor(COUNT(*)*1000000.0/5) AS BIGINT) AS recall_ppm
         |FROM $cte JOIN ex ON $cte.vec_id = ex.vec_id""".stripMargin
    s"""WITH ex AS (SELECT vec_id FROM ($bruteForceTopKSql) x
       |            ORDER BY cos_sim DESC, vec_id LIMIT 5),
       |lsh AS (SELECT vec_id FROM ($annSignLshSql) a),
       |p1 AS (SELECT vec_id FROM (${annIvfProbeSql(1)}) b),
       |p2 AS (SELECT vec_id FROM (${annIvfProbeSql(2)}) c),
       |pq AS (SELECT vec_id FROM ($pqAdcTopKSql) e2
       |       ORDER BY adc_micros DESC, vec_id LIMIT 5),
       |ivfpq AS (SELECT vec_id FROM ($annIvfPqSql) f2
       |          ORDER BY ivfpq_micros DESC, vec_id LIMIT 5),
       |ivfpqrr AS (SELECT vec_id FROM ($annIvfPqRerankSql) g2)
       |${arm("sign_lsh", "lsh")}
       |UNION ALL
       |${arm("ivf_probe1", "p1")}
       |UNION ALL
       |${arm("ivf_probe2", "p2")}
       |UNION ALL
       |${arm("pq_adc", "pq")}
       |UNION ALL
       |${arm("ivfpq", "ivfpq")}
       |UNION ALL
       |${arm("ivfpq_rerank", "ivfpqrr")}""".stripMargin
  }

  private def annIvfProbeSql(nprobe: Int,
                             predicateSql: String = "TRUE"): String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] emb, label FROM embeddings),
      |g AS (
      |  SELECT label, CAST(t.i AS BIGINT) dim,
      |         CAST(floor(emb[t.i] * 1000000) AS BIGINT) gx
      |  FROM e, (SELECT unnest(generate_series(1, $EmbeddingDim)) i) t),
      |c AS (
      |  SELECT label, dim,
      |         CAST(SUM(gx) AS DOUBLE)/(COUNT(*)*1000000.0) AS centroid
      |  FROM g GROUP BY label, dim),
      |carr AS (SELECT label, list(centroid ORDER BY dim) cemb FROM c GROUP BY label),
      |q AS (SELECT emb qemb FROM e WHERE vec_id = 0),
      |scored AS (
      |  SELECT label,
      |    round(
      |      list_sum(list_transform(generate_series(1, $EmbeddingDim), i -> cemb[i]*qemb[i])) /
      |      (sqrt(list_sum(list_transform(cemb, x -> x*x))) *
      |       sqrt(list_sum(list_transform(qemb, x -> x*x)))), 6) csim
      |  FROM carr, q),
      |best AS (SELECT label FROM scored ORDER BY csim DESC, label LIMIT $nprobe),
      |cand AS (
      |  SELECT e.vec_id, e.label, e.emb FROM e
      |  JOIN best ON e.label = best.label
      |  WHERE e.vec_id <> 0 AND $predicateSql)
      |SELECT vec_id, label,
      |  round(
      |    list_sum(list_transform(generate_series(1, $EmbeddingDim), i -> emb[i]*qemb[i])) /
      |    (sqrt(list_sum(list_transform(emb, x -> x*x))) *
      |     sqrt(list_sum(list_transform(qemb, x -> x*x)))), 6) AS cos_sim
      |FROM cand, q
      |ORDER BY cos_sim DESC, vec_id LIMIT 5""".stripMargin

  val annIvfSql: String = annIvfProbeSql(1)
  val annIvfProbe2Sql: String = annIvfProbeSql(2)

  /** Hard-negative mining — the contrastive-training data miner: for
    * each label's centroid, the top-3 most-similar vectors carrying a
    * DIFFERENT label (the negatives a contrastive loss learns most
    * from). Scale shape: the ~nLabels centroid rows broadcast, the
    * corpus scans ONCE, and per-anchor top-3 runs through the
    * k-bounded [[graft.functions.TopKByScore]] aggregator — map-side
    * partials reduce every partition to ≤3 rows per anchor before the
    * shuffle, so the shuffle carries 3·labels rows, never the scored
    * corpus (the row_number window is only the oracle spelling). */
  def hardNegatives(s: SparkSession, d: String): DataFrame = {
    val e = withEmb(s, d)
    val cents = centroidArrays(s, d)
      .select(col("label").as("anchor_label"), col("cemb"))
    val topk = udaf(new graft.functions.TopKByScore(3))
    val mined = e.crossJoin(broadcast(cents))
      .filter(col("label") =!= col("anchor_label"))
      .select(col("anchor_label"), col("vec_id"),
        round(dot(col("emb"), col("cemb")) /
          (norm(col("emb")) * norm(col("cemb"))), 6).as("cos_sim"))
      .groupBy(col("anchor_label"))
      .agg(topk(col("cos_sim"), col("vec_id")).as("top"))
      .select(col("anchor_label"),
        posexplode(arrays_zip(col("top.scores"), col("top.ids")))
          .as(Seq("pos", "z")))
      .select(col("anchor_label"), col("z.ids").as("vec_id"),
        col("z.scores").as("cos_sim"))
    // recover the negative's label: 3·labels mined rows broadcast
    // against a 2-column corpus projection
    e.select(col("vec_id"), col("label").as("neg_label"))
      .join(broadcast(mined), "vec_id")
      .select(col("anchor_label"), col("vec_id"), col("neg_label"),
        col("cos_sim"))
  }

  val hardNegativesSql: String =
    s"""WITH c AS (SELECT * FROM ($labelCentroidsSql) x),
       |e AS (SELECT vec_id, embedding::DOUBLE[] emb, label FROM embeddings),
       |carr AS (SELECT label AS anchor_label, list(centroid ORDER BY dim) cemb
       |         FROM c GROUP BY label),
       |scored AS (
       |  SELECT ca.anchor_label, e.vec_id, e.label AS neg_label,
       |    round(
       |      list_sum(list_transform(generate_series(1, $EmbeddingDim), i -> emb[i]*cemb[i])) /
       |      (sqrt(list_sum(list_transform(emb, x -> x*x))) *
       |       sqrt(list_sum(list_transform(cemb, x -> x*x)))), 6) AS cos_sim
       |  FROM e CROSS JOIN carr ca WHERE e.label <> ca.anchor_label),
       |r AS (SELECT *, row_number() OVER (PARTITION BY anchor_label
       |                                   ORDER BY cos_sim DESC, vec_id) rn
       |      FROM scored)
       |SELECT anchor_label, vec_id, neg_label, cos_sim FROM r WHERE rn <= 3""".stripMargin

  /** One Lloyd iteration of k-means (k=8, seeds = vectors 0..7) — the
    * IVF coarse-quantizer training step as a distributed primitive:
    * broadcast the centroids, assign each vector by max cosine (min angular
    * distance) with a deterministic tie-break, recompute centroids as
    * per-dimension integer-grid means. No driver-side data path. */
  def kmeansStep(s: SparkSession, d: String): DataFrame = {
    val e = withEmb(s, d)
    val seeds = e.filter(col("vec_id") <= 7)
      .select(col("vec_id").as("cid"), col("emb").as("cemb"))
    val assigned = e.crossJoin(broadcast(seeds))
      .select(col("vec_id"), col("emb"), col("cid"),
        round(dot(col("emb"), col("cemb")) / (norm(col("emb")) * norm(col("cemb"))), 6)
          .as("csim"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("vec_id"))
          .orderBy(col("csim").desc, col("cid"))))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("cid"), col("emb"))
    assigned
      .select(col("cid"), posexplode(col("emb")).as(Seq("dim0", "x")))
      .select(col("cid"), (col("dim0") + 1).cast("long").as("dim"),
        floor(col("x") * 1000000).cast("long").as("gx"))
      .groupBy(col("cid"), col("dim"))
      .agg((sum(col("gx")).cast("double") / (count(lit(1)) * 1000000.0))
        .as("centroid"))
  }

  val kmeansStepSql: String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] emb FROM embeddings),
      |seeds AS (SELECT vec_id cid, emb cemb FROM e WHERE vec_id <= 7),
      |scored AS (
      |  SELECT e.vec_id, e.emb, s.cid,
      |    round(
      |      list_sum(list_transform(generate_series(1, $EmbeddingDim), i -> emb[i]*cemb[i])) /
      |      (sqrt(list_sum(list_transform(emb, x -> x*x))) *
      |       sqrt(list_sum(list_transform(cemb, x -> x*x)))), 6) csim
      |  FROM e CROSS JOIN seeds s),
      |assigned AS (
      |  SELECT vec_id, cid, emb FROM (
      |    SELECT vec_id, cid, emb,
      |      row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cid) rn
      |    FROM scored) WHERE rn = 1),
      |g AS (
      |  SELECT cid, CAST(t.i AS BIGINT) dim,
      |         CAST(floor(emb[t.i] * 1000000) AS BIGINT) gx
      |  FROM assigned, (SELECT unnest(generate_series(1, $EmbeddingDim)) i) t)
      |SELECT cid, dim,
      |       CAST(SUM(gx) AS DOUBLE)/(COUNT(*)*1000000.0) AS centroid
      |FROM g GROUP BY cid, dim""".stripMargin

  /** Product quantization (PQ) + ADC lookup — the memory format
    * billion-vector stores actually hold (FAISS's IVF_PQ payload):
    * the 64-dim vector splits into 8 subvectors of 8 dims, each
    * encoded as the id of its nearest codeword in that subspace's
    * 16-entry codebook, so a vector is 8 small codes (8 bytes at
    * k=256; here k=16) instead of 256 bytes of floats — a 32×
    * compression the re-rank then works on. The lookup is Asymmetric
    * Distance Computation: the query precomputes its dot product with
    * every codeword (8 × 16 = 128 values — the "distance table"), and
    * a candidate's approximate score is just 8 table lookups + a sum,
    * never a float loop over the raw vector.
    *
    * Determinism/oracle story: codebooks are the subvectors of
    * vectors 1..16 (training = the same seeded-codebook convention as
    * [[kmeansStep]]'s seeds; a production build would Lloyd-iterate
    * per subspace with the identical machinery). Encoding argmin is
    * on floor-micros L2 with code-id tie-break; the ADC table is
    * floor-micros dots summed as BIGINTs — every compared quantity is
    * an exact integer, so Spark and DuckDB hash-match bit-for-bit.
    *
    * Scale shape: the codebook (128 rows) and the query's distance
    * table (128 rows) BROADCAST; encoding is one corpus-×-16 narrow
    * expansion per subspace collapsed by a commutative min(struct)
    * agg with map-side partials (shuffle carries ≤ 8 rows per
    * vector); the ADC total is one grouped sum; top-10 is a
    * TakeOrdered. The corpus never shuffles raw vectors. */
  def pqAdcTopK(s: SparkSession, d: String): DataFrame =
    pqAdcOver(s, d, nSub = 8)

  /** [[pqAdcTopK]] parameterized by the subspace count — the knob
    * [[pqAutotune]] sweeps (same codebook convention, same exact
    * integer spelling at every split). */
  private def pqAdcOver(s: SparkSession, d: String, nSub: Int): DataFrame = {
    val e = withEmb(s, d)
    val subDim = EmbeddingDim / nSub
    // (vec_id, sub, subv): the corpus split into subvectors
    def subvectors(df: DataFrame): DataFrame = df
      .select(col("vec_id"), col("label"), col("emb"),
        explode(sequence(lit(0), lit(nSub - 1))).as("sub"))
      .select(col("vec_id"), col("label"), col("sub"),
        slice(col("emb"), col("sub") * subDim + 1, lit(subDim)).as("subv"))
    // codebook: code c (1..16) in subspace s = vector c's subvector s
    val codebook = subvectors(e.filter(col("vec_id").between(1, 16)))
      .select(col("sub"), col("vec_id").cast("int").as("code"),
        col("subv").as("cw"))
    def l2Micros(a: Column, b: Column): Column =
      floor(aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, x) => acc + x) * 1000000).cast("long")
    def dotMicros(a: Column, b: Column): Column =
      floor(aggregate(zip_with(a, b, (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x) * 1000000).cast("long")
    // encode: nearest codeword per (vector, subspace) — min(struct) is
    // commutative+associative, so the argmin runs map-side partial
    val encoded = subvectors(e).join(broadcast(codebook), "sub")
      .select(col("vec_id"), col("label"), col("sub"), col("code"),
        l2Micros(col("subv"), col("cw")).as("d2"))
      .groupBy(col("vec_id"), col("label"), col("sub"))
      .agg(min(struct(col("d2"), col("code"))).getField("code").as("code"))
    // ADC table: the query's dot with every codeword, in exact micros
    val q = subvectors(e.filter(col("vec_id") === 0))
      .select(col("sub").as("qsub"), col("subv").as("qsubv"))
    val adcTable = codebook.join(broadcast(q), col("sub") === col("qsub"))
      .select(col("sub"), col("code"),
        dotMicros(col("cw"), col("qsubv")).as("dot_micros"))
    // lookup: 8 table hits + a sum per candidate, top-10
    encoded.filter(col("vec_id") =!= 0)
      .join(broadcast(adcTable), Seq("sub", "code"))
      .groupBy(col("vec_id"), col("label"))
      .agg(sum(col("dot_micros")).cast("long").as("adc_micros"))
      .orderBy(col("adc_micros").desc, col("vec_id"))
      .limit(10)
  }

  val pqAdcTopKSql: String = pqAdcSqlFor(nSub = 8)

  private def pqAdcSqlFor(nSub: Int): String = {
    val subDim = EmbeddingDim / nSub
    s"""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] emb FROM embeddings),
       |sv AS (
       |  SELECT vec_id, label, t.s AS sub,
       |         emb[(t.s * $subDim + 1):(t.s * $subDim + $subDim)] AS subv
       |  FROM e, (SELECT unnest(generate_series(0, ${nSub - 1})) s) t),
       |cb AS (
       |  SELECT sub, CAST(vec_id AS INTEGER) code, subv cw
       |  FROM sv WHERE vec_id BETWEEN 1 AND 16),
       |enc AS (
       |  SELECT vec_id, label, sub, code FROM (
       |    SELECT sv.vec_id, sv.label, sv.sub, cb.code,
       |      row_number() OVER (
       |        PARTITION BY sv.vec_id, sv.sub
       |        ORDER BY CAST(floor(list_sum(list_transform(
       |            generate_series(1, $subDim),
       |            i -> (sv.subv[i] - cb.cw[i]) * (sv.subv[i] - cb.cw[i])))
       |          * 1000000) AS BIGINT), cb.code) rn
       |    FROM sv JOIN cb ON cb.sub = sv.sub) WHERE rn = 1),
       |q AS (SELECT sub, subv qsubv FROM sv WHERE vec_id = 0),
       |adc AS (
       |  SELECT cb.sub, cb.code,
       |    CAST(floor(list_sum(list_transform(generate_series(1, $subDim),
       |      i -> cb.cw[i] * q.qsubv[i])) * 1000000) AS BIGINT) dot_micros
       |  FROM cb JOIN q ON q.sub = cb.sub)
       |SELECT enc.vec_id, enc.label,
       |       CAST(SUM(adc.dot_micros) AS BIGINT) AS adc_micros
       |FROM enc JOIN adc ON adc.sub = enc.sub AND adc.code = enc.code
       |WHERE enc.vec_id <> 0
       |GROUP BY enc.vec_id, enc.label
       |ORDER BY adc_micros DESC, vec_id LIMIT 10""".stripMargin
  }

  /** Target recall@5 (ppm) for [[pqAutotune]]. */
  private[queries] val PqRecallTargetPpm = 600000L

  /** PQ compression auto-tune — the third member of the serving-loop
    * tuner family (nprobe: [[annAutoprobe]]; LSH banding:
    * DedupQueries.lshAutotune): sweep the subspace count
    * m ∈ {2, 4, 8, 16} (bytes per vector ∝ m — fewer subspaces is
    * MORE compression and worse recall), measure each config's ADC
    * top-5 recall against the exact top-5, and flag the MINIMAL m
    * (maximal compression) meeting the target — the
    * memory-vs-quality knob a production PQ deployment sets by
    * benchmark. Every arm is the verified [[pqAdcTopK]] machinery at
    * a different split; deterministic ⇒ one oracle verifies the
    * whole sweep. */
  def pqAutotune(s: SparkSession, d: String): DataFrame = {
    val exact = bruteForceTopK(s, d).limit(5).select(col("vec_id"))
    val arms = Seq(2, 4, 8, 16).map { m =>
      pqAdcOver(s, d, m).limit(5)
        .select(col("vec_id")).join(exact, "vec_id")
        .agg(count(lit(1)).as("hits"))
        .select(lit(m.toLong).as("n_sub"),
          expr("hits * 1000000 DIV 5").as("recall_ppm"))
    }.reduce(_ unionAll _)
    val chosen = arms.filter(col("recall_ppm") >= PqRecallTargetPpm)
      .agg(min(col("n_sub")).as("mn"))
    arms.crossJoin(broadcast(chosen))
      .select(col("n_sub"), col("recall_ppm"),
        (col("recall_ppm") >= PqRecallTargetPpm).cast("long")
          .as("meets_target"),
        coalesce((col("n_sub") === col("mn")).cast("long"), lit(0L))
          .as("chosen"))
  }

  lazy val pqAutotuneSql: String = {
    def armSql(m: Int): String =
      s"""SELECT CAST($m AS BIGINT) AS n_sub,
         |  CAST(COUNT(*) * 1000000 // 5 AS BIGINT) AS recall_ppm
         |FROM (SELECT vec_id FROM (${pqAdcSqlFor(m)}) t$m
         |      ORDER BY adc_micros DESC, vec_id LIMIT 5) a$m
         |JOIN ex ON a$m.vec_id = ex.vec_id""".stripMargin
    s"""WITH ex AS (SELECT vec_id FROM ($bruteForceTopKSql) x
       |            ORDER BY cos_sim DESC, vec_id LIMIT 5),
       |agg AS (
       |${Seq(2, 4, 8, 16).map(armSql).mkString("\nUNION ALL\n")}),
       |ch AS (SELECT MIN(n_sub) mn FROM agg
       |       WHERE recall_ppm >= $PqRecallTargetPpm)
       |SELECT n_sub, recall_ppm,
       |       CAST(CASE WHEN recall_ppm >= $PqRecallTargetPpm THEN 1 ELSE 0 END
       |            AS BIGINT) AS meets_target,
       |       CAST(CASE WHEN n_sub = (SELECT mn FROM ch) THEN 1 ELSE 0 END
       |            AS BIGINT) AS chosen
       |FROM agg""".stripMargin
  }

  /** IVF-PQ composed index — the standard production ANN layout when
    * raw vectors can't be read per probe (VERDICT r7 next #3): vectors
    * route into IVF cells, and WITHIN each cell the RESIDUAL
    * (vector − cell centroid) is product-quantized, so a probe (a)
    * prunes to nprobe cell partitions of the persisted CODE table —
    * bytes per vector, never the raw floats — and (b) scores
    * candidates by Asymmetric Distance Computation against the probed
    * cells' residual tables: q·v ≈ q·c + q·(v−c) where q·c is one
    * per-cell constant and q·(v−c) is nSub table lookups + a sum.
    * Residual encoding is what PQ gains from the IVF composition: a
    * cell's residuals are centered near zero, so the shared codebooks
    * spend their 16 codes on local structure instead of the coarse
    * geometry the centroid already captured.
    *
    * Build (paid once, memoized layout like [[annIvfIndexed]]'s): the
    * code table (vec_id, sub, code) persists hive-partitioned by
    * `cell` via [[graft.sources.IvfIndex.ensureAux]]. Query: route on
    * the O(ncells) centroid table, build the nprobe×nSub×16-row ADC
    * table (broadcast), scan ONLY the probed cells' code partitions
    * (PartitionFilters — plan-pinned), join-broadcast, one grouped
    * sum, TakeOrdered top-10.
    *
    * Determinism/oracle story: same exact-integer spelling as
    * [[pqAdcTopK]] — codebooks are the residual subvectors of vectors
    * 1..16, encode argmin on floor-micros L2 with code tie-break, ADC
    * dots and the q·c constants in floor-micros BIGINTs. */
  def annIvfPq(s: SparkSession, d: String): DataFrame =
    annIvfPqParts(s, d, 10)._1

  /** The IVF-PQ machinery with its routing exposed: returns (the ADC
    * top-k DataFrame, the probed cell ids, the index layout) so the
    * re-rank stage can scan the SAME probed partitions of the raw
    * vectors. */
  private def annIvfPqParts(s: SparkSession, d: String, k: Int)
      : (DataFrame, Seq[Int], graft.sources.IvfIndex.Layout) = {
    val nSub = 8
    val subDim = EmbeddingDim / nSub
    val nprobe = 2
    val e = withEmb(s, d)
    val layout = graft.sources.IvfIndex.ensure(d, centroidArrays(s, d),
      withEmb(s, d).withColumn("cell", col("label")))
    val cents = s.read.parquet(layout.centroids)
    def dotMicros(a: Column, b: Column): Column =
      floor(aggregate(zip_with(a, b, (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x) * 1000000).cast("long")
    def l2Micros(a: Column, b: Column): Column =
      floor(aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, x) => acc + x) * 1000000).cast("long")
    def subvecsOf(df: DataFrame, vcol: String, keep: Seq[Column]): DataFrame =
      df.select(keep :+ explode(sequence(lit(0), lit(nSub - 1))).as("sub")
          :+ col(vcol): _*)
        .select(keep :+ col("sub")
          :+ slice(col(vcol), col("sub") * subDim + 1, lit(subDim)).as("subv"): _*)
    // residuals against each vector's OWN cell centroid (cell = label)
    val resid = e.join(broadcast(cents), "label")
      .select(col("vec_id"), col("label"),
        zip_with(col("emb"), col("cemb"), (x, c) => x - c).as("remb"))
    val rsub = subvecsOf(resid, "remb", Seq(col("vec_id"), col("label")))
    // shared residual codebooks: subvectors of vectors 1..16 (the same
    // seeded-codebook convention as pqAdcTopK) — PERSISTED with the
    // index, so a query never touches raw embeddings to rebuild them
    val cbPath = graft.sources.IvfIndex.ensureAux(d, "pqcodebook",
      rsub.filter(col("vec_id").between(1, 16))
        .select(col("sub"), col("vec_id").cast("int").as("code"),
          col("subv").as("cw")),
      "sub")
    val codebook = s.read.parquet(cbPath)
    // the persisted compressed index: every vector's 8 residual codes,
    // partitioned by cell — built once per corpus
    val codesDf = rsub.join(broadcast(codebook), "sub")
      .select(col("vec_id"), col("label"), col("sub"), col("code"),
        l2Micros(col("subv"), col("cw")).as("d2"))
      .groupBy(col("vec_id"), col("label"), col("sub"))
      .agg(min(struct(col("d2"), col("code"))).getField("code").as("code"))
      .withColumn("cell", col("label"))
    val codesPath =
      graft.sources.IvfIndex.ensureAux(d, "pqcodes", codesDf, "cell")
    // route: nprobe nearest cells by centroid cosine (ncells rows)
    val q = e.filter(col("vec_id") === 0).select(col("emb").as("qemb"))
    val probed: Seq[Int] = cents.crossJoin(broadcast(q))
      .select(col("label"),
        round(dot(col("cemb"), col("qemb")) /
          (norm(col("cemb")) * norm(col("qemb"))), 6).as("csim"))
      .orderBy(col("csim").desc, col("label"))
      .limit(nprobe)
      .collect().toSeq.map(_.getAs[Number](0).intValue)
    val probedCents = cents.filter(col("label").isin(probed: _*))
      .crossJoin(broadcast(q))
    // per probed cell, from ONE query-vector subtree: the q·c constant
    // and the query-residual subvectors, folded into a single
    // nprobe × nSub × 16-row ADC table
    val qmeta = subvecsOf(
      probedCents.select(col("label").as("cell"),
        dotMicros(col("cemb"), col("qemb")).as("qc_micros"),
        zip_with(col("qemb"), col("cemb"), (x, c) => x - c).as("qr")),
      "qr", Seq(col("cell"), col("qc_micros")))
      .select(col("cell"), col("qc_micros"), col("sub"),
        col("subv").as("qsubv"))
    val adc = codebook.join(broadcast(qmeta), "sub")
      .select(col("cell"), col("sub"), col("code"),
        dotMicros(col("qsubv"), col("cw")).as("dot_micros"),
        col("qc_micros"))
    // compressed-domain scan: probed cell partitions of the CODES only
    val topk = s.read.parquet(codesPath)
      .filter(col("cell").isin(probed: _*) && col("vec_id") =!= 0)
      .join(broadcast(adc), Seq("cell", "sub", "code"))
      .groupBy(col("vec_id"), col("label"))
      .agg((sum(col("dot_micros")) + min(col("qc_micros"))).cast("long")
        .as("ivfpq_micros"))
      .orderBy(col("ivfpq_micros").desc, col("vec_id"))
      .limit(k)
    (topk, probed, layout)
  }

  /** Two-stage retrieval — the production IVF-PQ query shape: the
    * compressed-domain ADC scan shortlists 4k candidates (cheap,
    * approximate), then ONLY those rows' raw vectors are read back —
    * from the same probed cell partitions, a ~shortlist-sized read —
    * and exactly re-ranked by cosine. Re-ranking recovers the recall
    * the 8-byte codes gave up while the full corpus is still never
    * scanned in float domain; the `ivfpq_rerank` arm of
    * [[annRecall]] measures exactly that recovery. */
  def annIvfPqRerank(s: SparkSession, d: String): DataFrame = {
    val (shortlist, probed, layout) = annIvfPqParts(s, d, 20)
    val q = withEmb(s, d).filter(col("vec_id") === 0)
      .select(col("emb").as("qemb"))
    s.read.parquet(layout.vectors)
      .filter(col("cell").isin(probed: _*))
      .join(broadcast(shortlist.select(col("vec_id"))), "vec_id")
      .crossJoin(broadcast(q))
      .select(col("vec_id"), col("label"),
        round(dot(col("emb"), col("qemb")) /
          (norm(col("emb")) * norm(col("qemb"))), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(5)
  }

  lazy val annIvfPqSql: String = annIvfPqSqlK(10)

  private def annIvfPqSqlK(k: Int): String = {
    val nSub = 8
    val subDim = EmbeddingDim / nSub
    s"""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] emb FROM embeddings),
       |g AS (
       |  SELECT label, CAST(t.i AS BIGINT) dim,
       |         CAST(floor(emb[t.i] * 1000000) AS BIGINT) gx
       |  FROM e, (SELECT unnest(generate_series(1, $EmbeddingDim)) i) t),
       |c AS (
       |  SELECT label, dim,
       |         CAST(SUM(gx) AS DOUBLE)/(COUNT(*)*1000000.0) AS centroid
       |  FROM g GROUP BY label, dim),
       |carr AS (SELECT label, list(centroid ORDER BY dim) cemb FROM c GROUP BY label),
       |q AS (SELECT emb qemb FROM e WHERE vec_id = 0),
       |scored AS (
       |  SELECT label,
       |    round(
       |      list_sum(list_transform(generate_series(1, $EmbeddingDim), i -> cemb[i]*qemb[i])) /
       |      (sqrt(list_sum(list_transform(cemb, x -> x*x))) *
       |       sqrt(list_sum(list_transform(qemb, x -> x*x)))), 6) csim
       |  FROM carr, q),
       |best AS (SELECT label FROM scored ORDER BY csim DESC, label LIMIT 2),
       |r AS (
       |  SELECT e.vec_id, e.label,
       |         list_transform(generate_series(1, $EmbeddingDim),
       |           i -> e.emb[i] - carr.cemb[i]) remb
       |  FROM e JOIN carr ON carr.label = e.label),
       |rsv AS (
       |  SELECT vec_id, label, t.s AS sub,
       |         remb[(t.s * $subDim + 1):(t.s * $subDim + $subDim)] AS subv
       |  FROM r, (SELECT unnest(generate_series(0, ${nSub - 1})) s) t),
       |cb AS (
       |  SELECT sub, CAST(vec_id AS INTEGER) code, subv cw
       |  FROM rsv WHERE vec_id BETWEEN 1 AND 16),
       |enc AS (
       |  SELECT vec_id, label, sub, code FROM (
       |    SELECT rsv.vec_id, rsv.label, rsv.sub, cb.code,
       |      row_number() OVER (
       |        PARTITION BY rsv.vec_id, rsv.sub
       |        ORDER BY CAST(floor(list_sum(list_transform(
       |            generate_series(1, $subDim),
       |            i -> (rsv.subv[i] - cb.cw[i]) * (rsv.subv[i] - cb.cw[i])))
       |          * 1000000) AS BIGINT), cb.code) rn
       |    FROM rsv JOIN cb ON cb.sub = rsv.sub) WHERE rn = 1),
       |qcs AS (
       |  SELECT carr.label AS cell,
       |    CAST(floor(list_sum(list_transform(generate_series(1, $EmbeddingDim),
       |      i -> carr.cemb[i] * q.qemb[i])) * 1000000) AS BIGINT) qc_micros,
       |    list_transform(generate_series(1, $EmbeddingDim),
       |      i -> q.qemb[i] - carr.cemb[i]) qr
       |  FROM carr JOIN best ON best.label = carr.label, q),
       |qrsv AS (
       |  SELECT cell, t.s AS sub,
       |         qr[(t.s * $subDim + 1):(t.s * $subDim + $subDim)] AS qsubv
       |  FROM qcs, (SELECT unnest(generate_series(0, ${nSub - 1})) s) t),
       |adc AS (
       |  SELECT qrsv.cell, cb.sub, cb.code,
       |    CAST(floor(list_sum(list_transform(generate_series(1, $subDim),
       |      i -> qrsv.qsubv[i] * cb.cw[i])) * 1000000) AS BIGINT) dot_micros
       |  FROM cb JOIN qrsv ON qrsv.sub = cb.sub)
       |SELECT enc.vec_id, enc.label,
       |       CAST(SUM(adc.dot_micros) + MIN(qcs.qc_micros) AS BIGINT)
       |         AS ivfpq_micros
       |FROM enc
       |JOIN adc ON adc.cell = enc.label AND adc.sub = enc.sub
       |        AND adc.code = enc.code
       |JOIN qcs ON qcs.cell = enc.label
       |WHERE enc.vec_id <> 0
       |GROUP BY enc.vec_id, enc.label
       |ORDER BY ivfpq_micros DESC, vec_id LIMIT $k""".stripMargin
  }

  lazy val annIvfPqRerankSql: String =
    s"""WITH short AS (SELECT vec_id FROM (${annIvfPqSqlK(20)}) s2),
       |e AS (SELECT vec_id, label, embedding::DOUBLE[] emb FROM embeddings),
       |q AS (SELECT emb qemb FROM e WHERE vec_id = 0)
       |SELECT e.vec_id, e.label,
       |  round(
       |    list_sum(list_transform(generate_series(1, $EmbeddingDim), i -> emb[i]*qemb[i])) /
       |    (sqrt(list_sum(list_transform(emb, x -> x*x))) *
       |     sqrt(list_sum(list_transform(qemb, x -> x*x)))), 6) AS cos_sim
       |FROM e JOIN short ON short.vec_id = e.vec_id, q
       |ORDER BY cos_sim DESC, e.vec_id LIMIT 5""".stripMargin

  /** Int8 embedding quantization + quantized-cosine top-k: per-vector
    * symmetric quantization (scale = max|x|/127, the standard int8
    * scheme) and re-ranking in the QUANTIZED domain. The int8 dot
    * product is pure integer arithmetic — exactly reproducible on any
    * engine, unlike float dots — which is why the oracle can hash-match
    * it. Scale story: int8 is the production memory/bandwidth format
    * for billion-vector ANN (4× smaller than f32, SIMD-friendly
    * integer dots); this op proves the engine computes the same
    * quantized index a vector store would build. One narrow pass to
    * quantize, one broadcast of the query vector, TakeOrdered top-k —
    * the corpus never shuffles. */
  def quantizeInt8TopK(s: SparkSession, d: String): DataFrame = {
    val maxAbs = aggregate(transform(col("emb"), x => abs(x)), lit(0.0),
      (a, x) => greatest(a, x))
    val base = withEmb(s, d)
      .select(col("vec_id"), col("label"), col("emb"),
        (greatest(maxAbs, lit(1e-12)) / 127.0).as("qscale"))
    val q = base.select(col("vec_id"), col("label"), col("qscale"),
      transform(col("emb"), x => round(x / col("qscale"), 0).cast("long"))
        .as("qemb"))
    def idot(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, x) => acc + x)
    val qv = q.filter(col("vec_id") === 0).select(col("qemb").as("q2"))
    q.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(qv))
      .select(col("vec_id"), col("label"),
        round(col("qscale"), 6).as("qscale"),
        round(idot(col("qemb"), col("q2")).cast("double") /
          (sqrt(idot(col("qemb"), col("qemb"))) * sqrt(idot(col("q2"), col("q2")))), 6)
          .as("qcos"))
      .orderBy(col("qcos").desc, col("vec_id"))
      .limit(10)
  }

  val quantizeInt8TopKSql: String =
    s"""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] emb FROM embeddings),
      |m AS (
      |  SELECT vec_id, label, emb,
      |    greatest(list_max(list_transform(emb, x -> abs(x))), 1e-12) / 127.0 AS qscale
      |  FROM e),
      |q AS (
      |  SELECT vec_id, label, qscale,
      |    list_transform(emb, x -> CAST(round(x / qscale, 0) AS BIGINT)) qemb
      |  FROM m),
      |qv AS (SELECT qemb q2 FROM q WHERE vec_id = 0),
      |sims AS (
      |  SELECT vec_id, label, qscale,
      |    CAST(list_sum(list_transform(generate_series(1, $EmbeddingDim), i -> qemb[i]*q2[i])) AS DOUBLE) dot,
      |    sqrt(CAST(list_sum(list_transform(qemb, x -> x*x)) AS DOUBLE)) en,
      |    sqrt(CAST(list_sum(list_transform(q2, x -> x*x)) AS DOUBLE)) qn
      |  FROM q, qv WHERE vec_id <> 0)
      |SELECT vec_id, label, round(qscale, 6) AS qscale, round(dot/(en*qn), 6) AS qcos
      |FROM sims ORDER BY qcos DESC, vec_id LIMIT 10""".stripMargin

  /** Centroid drift after one Lloyd iteration — the index-maintenance
    * signal an IVF deployment monitors: when the data distribution
    * moves, re-assigned vectors pull the centroids away from the ones
    * the index was built with, and large drift means "rebuild the
    * routing table". Per centroid: the L1 distance (in exact micro
    * units) between the seed vector and the post-[[kmeansStep]]
    * centroid. Each per-dim delta is floored onto the 1e-6 grid BEFORE
    * the cross-dim sum, so the total is a BIGINT — order-independent
    * and hash-stable where a double summation over dims would not be.
    * Cost: the kmeans step itself plus one broadcast-sized join of
    * 8 × 64 centroid rows. */
  def centroidDrift(s: SparkSession, d: String): DataFrame = {
    val seeds = withEmb(s, d).filter(col("vec_id") <= 7)
      .select(col("vec_id").as("cid"), posexplode(col("emb")).as(Seq("d0", "old")))
      .select(col("cid"), (col("d0") + 1).cast("long").as("dim"), col("old"))
    kmeansStep(s, d).join(seeds, Seq("cid", "dim"))
      .select(col("cid"),
        floor(abs(col("centroid") - col("old")) * 1000000).cast("long")
          .as("dgx"))
      .groupBy(col("cid"))
      .agg(count(lit(1)).cast("long").as("n_dims"),
        sum(col("dgx")).cast("long").as("l1_drift_micros"))
  }

  /** Embeds [[kmeansStepSql]] so the step spelling cannot drift. */
  val centroidDriftSql: String =
    s"""WITH km AS (SELECT * FROM ($kmeansStepSql) x),
       |sd AS (
       |  SELECT vec_id cid, CAST(t.i AS BIGINT) dim, emb[t.i] AS old
       |  FROM (SELECT vec_id, embedding::DOUBLE[] emb FROM embeddings
       |        WHERE vec_id <= 7) e,
       |       (SELECT unnest(generate_series(1, $EmbeddingDim)) i) t)
       |SELECT km.cid, CAST(COUNT(*) AS BIGINT) AS n_dims,
       |       CAST(SUM(CAST(floor(abs(km.centroid - sd.old) * 1000000)
       |                     AS BIGINT)) AS BIGINT) AS l1_drift_micros
       |FROM km JOIN sd ON sd.cid = km.cid AND sd.dim = km.dim
       |GROUP BY km.cid""".stripMargin

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sim_centroid_drift" -> centroidDrift _,
    "sim_quantize_int8" -> quantizeInt8TopK _,
    "sim_pq_adc" -> pqAdcTopK _,
    "sim_ann_ivfpq" -> annIvfPq _,
    "sim_ann_ivfpq_rerank" -> annIvfPqRerank _,
    "sim_kmeans_step" -> kmeansStep _,
    "sim_topk_bruteforce" -> bruteForceTopK _,
    "sim_topk_native" -> bruteForceTopKNative _,
    "sim_ann_sign_lsh" -> annSignLsh _,
    "sim_ann_ivf" -> annIvf _,
    "sim_ann_ivf_probe2" -> annIvfProbe2 _,
    "sim_ann_ivf_indexed" -> annIvfIndexed _,
    "sim_ann_filtered" -> annIvfFiltered _,
    "curate_decontam_semantic" -> decontamSemantic _,
    "stream_decontam_semantic" -> streamDecontamSemantic _,
    "stream_ivf_ingest" -> streamIvfIngest _,
    "sim_ivf_retrain" -> ivfRetrainProbe _,
    "sim_ivf_delete" -> ivfDeleteProbe _,
    "stream_ivf_retrain" -> streamIvfRetrain _,
    "sim_ann_recall" -> annRecall _,
    "sim_ann_autoprobe" -> annAutoprobe _,
    "sim_pq_autotune" -> pqAutotune _,
    "sim_hard_negatives" -> hardNegatives _,
    "sim_cos_neardup" -> cosNearDup _,
    "sim_threshold_sweep" -> thresholdSweep _,
    "dedup_semantic" -> dedupSemantic _,
    "dedup_semantic_lsh" -> dedupSemanticLsh _,
    "curate_prototypes" -> curatePrototypes _,
    "sim_label_centroids" -> labelCentroids _)

  def oracles: Map[String, String] = Map(
    "sim_centroid_drift" -> centroidDriftSql,
    "sim_quantize_int8" -> quantizeInt8TopKSql,
    "sim_pq_adc" -> pqAdcTopKSql,
    "sim_ann_ivfpq" -> annIvfPqSql,
    "sim_ann_ivfpq_rerank" -> annIvfPqRerankSql,
    "sim_kmeans_step" -> kmeansStepSql,
    "sim_topk_bruteforce" -> bruteForceTopKSql,
    "sim_topk_native" -> bruteForceTopKSql,
    "sim_ann_sign_lsh" -> annSignLshSql,
    "sim_ann_ivf" -> annIvfSql,
    "sim_ann_ivf_probe2" -> annIvfProbe2Sql,
    "sim_ann_ivf_indexed" -> annIvfSql,
    "sim_ann_filtered" -> annIvfFilteredSql,
    "curate_decontam_semantic" -> decontamSemanticSql,
    "stream_decontam_semantic" -> decontamSemanticSql,
    "stream_ivf_ingest" -> annIvfSql,
    "sim_ivf_retrain" -> ivfRetrainSql,
    "sim_ivf_delete" -> ivfDeleteSql,
    "stream_ivf_retrain" -> ivfRetrainSql,
    "sim_ann_recall" -> annRecallSql,
    "sim_ann_autoprobe" -> annAutoprobeSql,
    "sim_pq_autotune" -> pqAutotuneSql,
    "sim_hard_negatives" -> hardNegativesSql,
    "sim_cos_neardup" -> cosNearDupSql,
    "sim_threshold_sweep" -> thresholdSweepSql,
    "dedup_semantic" -> dedupSemanticSql,
    "dedup_semantic_lsh" -> dedupSemanticLshSql,
    "curate_prototypes" -> curatePrototypesSql,
    "sim_label_centroids" -> labelCentroidsSql)
}
