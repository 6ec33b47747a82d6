package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Catalog integrity: the driver contract requires every oracle key to
  * name a query, stable unique names, and (engine policy) every query
  * to carry an oracle unless explicitly rows-only. */
class CatalogSpec extends AnyFunSuite {

  test("every oracle key has a query") {
    val missing = Catalog.oracles.keySet -- Catalog.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("every query has an oracle — no rows-only exemptions") {
    // q_sketch_agg is gated too: it emits exact aggregates plus
    // within-tolerance booleans, so the sketch surface hash-compares
    val missing = Catalog.queries.keySet -- Catalog.oracles.keySet
    assert(missing.isEmpty, s"queries without oracles: $missing")
  }

  test("no duplicate names across query groups") {
    val all = Seq(PipelineQueries.defs, BatchSqlQueries.defs,
      BatchSqlQueries2.defs, BatchSqlQueries3.defs, DedupQueries.defs,
      SimilarityQueries.defs, TextQueries.defs, MultimodalQueries.defs,
      StreamingQueries.defs, SourceQueries.defs, CleaningQueries.defs,
      CurationQueries.defs, TableJoinQueries.defs, KsqlFunctionQueries.defs,
      KsqlFunctionQueries2.defs, SketchQueries.defs, RetrievalQueries.defs,
      HybridQueries.defs, ChangePointQueries.defs, SeasonalQueries.defs)
    val names = all.flatMap(_.keys)
    val dups = names.groupBy(identity).filter(_._2.size > 1).keys
    assert(dups.isEmpty, s"duplicate query names: $dups")
    assert(names.size == Catalog.queries.size)
  }
}
