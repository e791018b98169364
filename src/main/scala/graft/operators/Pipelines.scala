package graft.operators

import graft.{QueryDef, Tables}
import graft.infer.MockInference
import graft.pipeline.{V1Pipeline, V2Pipeline}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pipeline-level queries: the reference's flagship dataflows run end-to-end
  * on mock inference over the testdata, with oracle-checkable outputs.
  */
object Pipelines {

  def defs: Seq[QueryDef] = Seq(
    // V1 chunk→map→filter→collapse→reduce over documents with a passkey
    // planted mid-text: the pipeline must recover `doc-<id>` for every doc.
    // The oracle states exactly that — an end-to-end correctness check of
    // the whole dataflow (SURVEY.md §3.1), not just of one operator.
    QueryDef(
      "p01_v1_qa_pipeline",
      covers = "A1 A2 A3 F1 T2 T4 W7 D5 D10",
      oracle = Some("""
        SELECT doc_id, 'doc-' || CAST(doc_id AS VARCHAR) AS answer
        FROM documents ORDER BY doc_id"""),
      build = (s, d) => {
        val docs = Tables.documents(s, d).select(
          col("doc_id"),
          lit("What is the passkey?").as("question"),
          concat(
            substring(col("text"), 1, 100),
            lit(" ANSWER[doc-"), col("doc_id").cast("string"), lit("] "),
            substring(col("text"), 101, 1000000)).as("text"))
        V1Pipeline.run(docs, new MockInference,
          V1Pipeline.Config(chunkBudget = 32, collapseBudget = 400,
            binBudget = 200))
          .orderBy("doc_id")
      }),

    // V2 survey pipeline end-to-end: one survey per document source (papers
    // capped at 16 — the reference's data_num limit, W5). The mock protocol
    // cites every paper from every leaf, so cite_ratio is exactly 1.0 and
    // n_papers is the capped count — both SQL-expressible, giving the whole
    // encode→group→skeleton→digest→refine→decode dataflow a DuckDB oracle.
    QueryDef(
      "p02_v2_survey_pipeline",
      covers = "S1 S2 S3 F2 X3 A4 A5 A6 J1 J2 A8 W1 W2 W5 W6 D5 D11",
      oracle = Some("""
        SELECT source AS survey_id, least(count(*), 16) AS n_papers,
               CAST(1.0 AS DOUBLE) AS cite_ratio
        FROM documents GROUP BY source ORDER BY survey_id"""),
      build = (s, d) => {
        val w = Window.partitionBy("source").orderBy("doc_id")
        val surveys = Tables.documents(s, d)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 16)
          .select(col("source"),
            struct(
              concat(lit("doc "), col("doc_id").cast("string")).as("title"),
              col("text").as("txt")).as("paper"))
          .groupBy(col("source").as("survey_id"))
          .agg(collect_list(col("paper")).as("papers"))
          .withColumn("title", concat(lit("Survey of "), col("survey_id")))
        V2Pipeline.run(surveys, new MockInference,
          V2Pipeline.Config(nGroups = 2, blockCount = 1, convLayers = 1,
            kernelWidth = 2, poolSize = 3))
          .select("survey_id", "n_papers", "cite_ratio")
          .orderBy("survey_id")
      })
  )
}
