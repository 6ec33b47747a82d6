package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

import graft.functions.{CosineSimilarity, HashedShingles, MinHashSlices, SimHash16}

/** Session extension registering the engine's native functions at
  * session build — enable with
  * `spark.sql.extensions=graft.GraftExtensions` (or
  * `SparkSession.builder().withExtensions(new GraftExtensions)`), after
  * which `SELECT cosine_sim(a, b)`, `hashed_shingles(toks)`,
  * `minhash_slices(toks)`, `simhash16(toks)` work in plain SQL on every
  * session. This is the deployment path for a cluster: no per-session
  * manual registration. (The Aggregator-backed SQL aggregates are
  * per-session — see [[GraftSql.registerFunctions]].) */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  /** Shingle width: optional trailing integer literal, default 5. */
  private def widthArg(name: String, exprs: Seq[Expression]): Int =
    exprs.lift(1) match {
      case None => 5
      case Some(Literal(w: Int, IntegerType)) => w
      case Some(other) => throw new IllegalArgumentException(
        s"$name: shingle width must be an integer literal, got $other")
    }

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      exprs => CosineSimilarity(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("hashed_shingles"),
      new ExpressionInfo(classOf[HashedShingles].getName, "hashed_shingles"),
      exprs => HashedShingles(exprs.head, widthArg("hashed_shingles", exprs))))
    e.injectFunction((
      FunctionIdentifier("minhash_slices"),
      new ExpressionInfo(classOf[MinHashSlices].getName, "minhash_slices"),
      exprs => MinHashSlices(exprs.head, widthArg("minhash_slices", exprs))))
    e.injectFunction((
      FunctionIdentifier("simhash16"),
      new ExpressionInfo(classOf[SimHash16].getName, "simhash16"),
      exprs => SimHash16(exprs.head)))
    e.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}
