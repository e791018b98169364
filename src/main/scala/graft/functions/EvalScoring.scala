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

  private def scored(preds: DataFrame, correct: org.apache.spark.sql.Column) =
    preds
      .withColumn("score", when(correct, 1.0).otherwise(0.0))
      .agg(avg("score").as("accuracy"), count(lit(1)).as("n"))
}
