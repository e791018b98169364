package graft.operators

import graft.{QueryDef, Tables}
import graft.infer.MockInference
import graft.pipeline.V1Pipeline
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
      })
  )
}
