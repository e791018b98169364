package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The V3 surface (SURVEY.md §3.3): the reference's MCP host is an
  * LLM-driven planner choosing among coarse stages that communicate **by
  * checkpoint path, not by value** (tool results are file paths;
  * llm_search_mcp_server.py:292-347). The deterministic half of that
  * contract is a stage registry over parquet checkpoints: run a named stage
  * on a checkpoint directory, emit a new checkpoint directory. Any host —
  * LLM or human — sequences the stages.
  *
  * Checkpoints double as lineage truncation (each stage reads a fresh scan)
  * and as restart points — exactly the reference's query/URL cache behavior
  * (S9).
  */
object StageRunner {

  type Stage = (SparkSession, DataFrame) => DataFrame

  private val registry = scala.collection.concurrent.TrieMap.empty[String, Stage]

  def register(name: String, stage: Stage): Unit = registry.put(name, stage)

  def stages: Seq[String] = registry.keys.toSeq.sorted

  /** Run `stage` on the parquet checkpoint at `inPath`, write the result as
    * a new checkpoint at `outPath`, return the output row count. */
  def run(
      spark: SparkSession,
      stage: String,
      inPath: String,
      outPath: String): Long = {
    val fn = registry.getOrElse(stage,
      throw new IllegalArgumentException(
        s"unknown stage '$stage'; known: ${stages.mkString(", ")}"))
    val out = fn(spark, spark.read.parquet(inPath))
    out.write.mode("overwrite").parquet(outPath)
    spark.read.parquet(outPath).count()
  }
}
