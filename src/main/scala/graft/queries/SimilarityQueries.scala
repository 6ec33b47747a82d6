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

  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  private def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x * x), lit(0.0), (acc, x) => acc + x))

  private def withEmb(s: SparkSession, d: String): DataFrame =
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
    """WITH e AS (SELECT vec_id, embedding::DOUBLE[] emb, label FROM embeddings),
      |q AS (SELECT emb qemb FROM e WHERE vec_id = 0),
      |sims AS (
      |  SELECT vec_id, label,
      |    list_sum(list_transform(generate_series(1, 64), i -> emb[i]*qemb[i])) dot,
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
    """WITH e AS (
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
      |    list_sum(list_transform(generate_series(1, 64), i -> emb[i]*qemb[i])) dot,
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
    """WITH e AS (SELECT label, embedding::DOUBLE[] emb FROM embeddings),
      |g AS (
      |  SELECT label, CAST(t.i AS BIGINT) dim,
      |         CAST(floor(emb[t.i] * 1000000) AS BIGINT) gx
      |  FROM e, (SELECT unnest(generate_series(1, 64)) i) t)
      |SELECT label, dim,
      |       CAST(SUM(gx) AS DOUBLE)/(COUNT(*)*1000000.0) AS centroid
      |FROM g GROUP BY label, dim""".stripMargin

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sim_topk_bruteforce" -> bruteForceTopK _,
    "sim_topk_native" -> bruteForceTopKNative _,
    "sim_ann_sign_lsh" -> annSignLsh _,
    "sim_label_centroids" -> labelCentroids _)

  def oracles: Map[String, String] = Map(
    "sim_topk_bruteforce" -> bruteForceTopKSql,
    "sim_topk_native" -> bruteForceTopKSql,
    "sim_ann_sign_lsh" -> annSignLshSql,
    "sim_label_centroids" -> labelCentroidsSql)
}
