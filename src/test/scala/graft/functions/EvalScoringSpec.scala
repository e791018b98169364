package graft.functions

import graft.SparkTestBase

class EvalScoringSpec extends SparkTestBase {
  import spark.implicits._

  private def preds(rows: (String, Seq[String])*) =
    rows.zipWithIndex
      .map { case ((p, g), i) => (i.toLong, p, g) }
      .toDF("id", "prediction", "ground_truths")

  test("retrieval: gold substring membership (compute_scores.py:143-164)") {
    val df = preds(
      ("The pass key is 71432.", Seq("71432")),
      ("I could not find it.", Seq("99999")))
    val Array(r) = EvalScoring.retrievalScore(df).collect()
    assert(r.getDouble(0) == 0.5 && r.getLong(1) == 2)
  }

  test("math_find: first number match (:230-250)") {
    val df = preds(
      ("The answer is 42.5 probably", Seq("42.5")),
      ("It is -7 not 8", Seq("8")))
    val Array(r) = EvalScoring.firstNumberScore(df).collect()
    assert(r.getDouble(0) == 0.5)
  }

  test("code_debug: first standalone letter (:185-228)") {
    val df = preds(
      ("The buggy function is B , clearly", Seq("B")),
      ("ANSWER: D", Seq("C")))
    val Array(r) = EvalScoring.letterScore(df).collect()
    assert(r.getDouble(0) == 0.5)
  }

  test("QA token-F1 (max over gold set, averaged)") {
    val df = preds(
      ("the quick brown fox", Seq("quick brown fox", "unrelated")),
      ("nothing in common", Seq("quick brown fox")))
    val Array(r) = EvalScoring.tokenF1Score(df).collect()
    assert(r.getDouble(0) > 0.45 && r.getDouble(0) < 0.55)
  }
}
