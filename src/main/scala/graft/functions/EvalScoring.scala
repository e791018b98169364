package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's InfiniteBench scoring semantics as DataFrame operators
  * (SURVEY.md §5; /root/reference/LLMxMapReduce_V1/eval/infinitebench/
  * compute_scores.py): given prediction rows (id, prediction,
  * ground_truths ARRAY<STRING>), score per task family. Written fresh as
  * column expressions + the pure [[TextFunctions.tokenF1]] kernel.
  */
object EvalScoring {

  /** Retrieval tasks (:143-164): correct iff some gold answer appears in the
    * prediction (substring on normalized text). */
  def retrievalScore(preds: DataFrame): DataFrame =
    scored(preds, expr(
      "exists(ground_truths, g -> contains(lower(prediction), lower(g)))"))

  /** math_find (:230-250): first number in the prediction equals the gold. */
  def firstNumberScore(preds: DataFrame): DataFrame =
    scored(preds, expr(
      """exists(ground_truths,
        |  g -> regexp_extract(prediction, '-?\\d+\\.\\d+|-?\\d+', 0) = g)"""
        .stripMargin))

  /** code_debug / multiple choice (:185-228): first standalone capital
    * letter A-D in the prediction matches the gold label. */
  def letterScore(preds: DataFrame): DataFrame =
    scored(preds, expr(
      "exists(ground_truths, g -> regexp_extract(prediction, '\\\\b([A-D])\\\\b', 1) = g)"))

  /** QA token-F1 (:52-79): max F1 over the gold set, averaged. */
  def tokenF1Score(preds: DataFrame): DataFrame = {
    val f1 = udf((p: String, gs: Seq[String]) =>
      if (gs.isEmpty) 0.0 else gs.map(TextFunctions.tokenF1(p, _)).max)
    preds
      .withColumn("score", f1(col("prediction"), col("ground_truths")))
      .agg(avg("score").as("accuracy"), count(lit(1)).as("n"))
  }

  /** zh QA (compute_scores.py:82-104): char-level token F1, max over the
    * gold set, averaged — the scorer behind longbook_qa_chn that
    * [[TextFunctions.normalizeAnswerZh]] existed for. */
  def zhQaScore(preds: DataFrame): DataFrame = {
    val f1 = udf((p: String, gs: Seq[String]) =>
      if (gs.isEmpty) 0.0 else gs.map(TextFunctions.tokenF1Zh(p, _)).max)
    preds
      .withColumn("score", f1(col("prediction"), col("ground_truths")))
      .agg(avg("score").as("accuracy"), count(lit(1)).as("n"))
  }

  /** En.Sum (compute_scores.py:317-325): ROUGE-Lsum F-measure against the
    * gold summary, averaged. Also exposes rouge1/rouge2/rougeL means, the
    * standard reporting set. */
  def rougeScore(preds: DataFrame): DataFrame = {
    val r = udf((p: String, gs: Seq[String]) =>
      if (gs.isEmpty) Seq(0.0, 0.0, 0.0, 0.0)
      else Seq(
        gs.map(TextFunctions.rougeN(p, _, 1)).max,
        gs.map(TextFunctions.rougeN(p, _, 2)).max,
        gs.map(TextFunctions.rougeL(p, _)).max,
        gs.map(TextFunctions.rougeLsum(p, _)).max))
    preds
      .withColumn("r", r(col("prediction"), col("ground_truths")))
      .agg(
        avg(col("r")(0)).as("rouge1"),
        avg(col("r")(1)).as("rouge2"),
        avg(col("r")(2)).as("rougeL"),
        avg(col("r")(3)).as("rougeLsum"),
        count(lit(1)).as("n"))
  }

  /** Answer post-processing (process_answer.py:28-57) as a native column
    * transform: text after the LAST answer prefix, re-prefixed for
    * choice-style tasks, confidence-annotation-stripped for QA/sum tasks.
    * Pure `regexp_extract` (greedy `.*` anchors the LAST occurrence) so it
    * stays inside codegen and has a DuckDB-identical twin for the oracle.
    * The full edge-case kernel (empty-after-prefix, 答案： path) is
    * [[TextFunctions.stripAnswerPrefix]], spec-tested; this column form
    * assumes well-formed predictions (prefix followed by ≥1 char). */
  def postProcessAnswer(pred: org.apache.spark.sql.Column,
      task: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val afterLast = regexp_extract(pred, "(?s).*Answer:.(.*)$", 1)
    val noConf    = when(afterLast.contains("Confidence Score:"),
        regexp_extract(afterLast, "(?s)^(.*)Confidence Score:", 1))
      .otherwise(afterLast)
    when(!pred.contains("Answer:"), pred)
      .when(task.isin("code_debug", "longbook_choice_eng"),
        concat(lit("answer: "), afterLast))
      .when(task.isin("longbook_qa_eng", "longbook_qa_chn",
          "longdialogue_qa_eng", "longbook_sum_eng"), noConf)
      .otherwise(pred)
  }

  /** UDF form of [[TextFunctions.stripAnswerPrefix]] — the full edge-case
    * kernel, for callers that need the 答案：/ prefix-at-end semantics the
    * column form above trades away for codegen. */
  val stripAnswerPrefixUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((p: String, task: String) => TextFunctions.stripAnswerPrefix(p, task))

  private def scored(preds: DataFrame, correct: org.apache.spark.sql.Column) =
    preds
      .withColumn("score", when(correct, 1.0).otherwise(0.0))
      .agg(avg("score").as("accuracy"), count(lit(1)).as("n"))
}
