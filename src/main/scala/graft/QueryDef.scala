package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named, oracle-checkable query in the engine's library.
  *
  * @param name   stable key; shows up in Verify/Bench output
  * @param covers SURVEY.md §2 operator IDs this query stands in for
  * @param oracle equivalent SQL runnable by DuckDB over the same tables;
  *               None for operators whose results are declared stochastic or
  *               not SQL-expressible (driver then records a rows-only check)
  * @param build  the Spark implementation; second arg is the sf directory
  */
final case class QueryDef(
    name: String,
    covers: String,
    oracle: Option[String],
    build: (SparkSession, String) => DataFrame)

object QueryDef {
  /** All query modules, in presentation order. */
  def all: Seq[QueryDef] =
    operators.Relational.defs ++
      operators.Skew.defs ++
      operators.AsOf.defs ++
      operators.TextAnalysis.defs ++
      operators.Tokenize.defs ++
      operators.Dedup.defs ++
      operators.Mix.defs ++
      operators.Sketches.defs ++
      operators.Similarity.defs ++
      operators.Lake.defs ++
      operators.Multimodal.defs ++
      operators.CitationQuality.defs ++
      operators.EvalSuite.defs ++
      operators.Pipelines.defs ++
      streaming.StreamQueries.defs
}
