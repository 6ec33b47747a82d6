package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The full query inventory: every operator from SURVEY.md §2 plus the
  * north-star LLM-data-pipeline operators, each as a (name → builder)
  * with, where SQL-expressible, a DuckDB oracle statement. */
object Catalog {
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    PipelineQueries.defs ++ BatchSqlQueries.defs ++ BatchSqlQueries2.defs ++
      BatchSqlQueries3.defs ++ DedupQueries.defs ++ SimilarityQueries.defs ++
      TextQueries.defs ++ MultimodalQueries.defs ++ StreamingQueries.defs ++
      SourceQueries.defs ++ CleaningQueries.defs ++ CurationQueries.defs ++
      TableJoinQueries.defs ++ KsqlFunctionQueries.defs ++
      KsqlFunctionQueries2.defs ++ SketchQueries.defs ++
      RetrievalQueries.defs ++ HybridQueries.defs ++ ChangePointQueries.defs ++
      SeasonalQueries.defs

  def oracles: Map[String, String] =
    PipelineQueries.oracles ++ BatchSqlQueries.oracles ++
      BatchSqlQueries2.oracles ++ BatchSqlQueries3.oracles ++
      DedupQueries.oracles ++ SimilarityQueries.oracles ++
      TextQueries.oracles ++ MultimodalQueries.oracles ++
      StreamingQueries.oracles ++ SourceQueries.oracles ++
      CleaningQueries.oracles ++ CurationQueries.oracles ++
      TableJoinQueries.oracles ++ KsqlFunctionQueries.oracles ++
      KsqlFunctionQueries2.oracles ++ SketchQueries.oracles ++
      RetrievalQueries.oracles ++ HybridQueries.oracles ++ ChangePointQueries.oracles ++
      SeasonalQueries.oracles
}
