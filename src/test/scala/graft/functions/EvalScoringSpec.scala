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

  // ---- ROUGE kernels (compute_scores.py:317-325; Lin 2004 definitions)

  private val eps = 1e-9

  test("ROUGE-1: clipped unigram overlap F-measure") {
    val f = TextFunctions.rougeN("the cat sat on the mat", "the cat was on the mat", 1)
    assert(math.abs(f - 5.0 / 6.0) < eps) // overlap the,the,cat,on,mat = 5
  }

  test("ROUGE-2: bigram overlap F-measure") {
    val f = TextFunctions.rougeN("the cat sat on the mat", "the cat was on the mat", 2)
    assert(math.abs(f - 0.6) < eps) // 3 of 5 bigrams shared
  }

  test("ROUGE-L: token LCS F-measure") {
    val f = TextFunctions.rougeL("the cat sat on the mat", "the cat was on the mat")
    assert(math.abs(f - 5.0 / 6.0) < eps) // LCS = the cat on the mat
    assert(TextFunctions.rougeL("abc", "xyz") == 0.0)
    assert(math.abs(TextFunctions.rougeL("same text", "same text") - 1.0) < eps)
  }

  test("ROUGE-Lsum: newline-sentence union LCS") {
    assert(math.abs(TextFunctions.rougeLsum("a b\nc d", "a b\nc d") - 1.0) < eps)
    // single-sentence texts degrade to plain ROUGE-L
    val pred = "the cat sat on the mat"
    val ref  = "the cat was on the mat"
    assert(math.abs(
      TextFunctions.rougeLsum(pred, ref) - TextFunctions.rougeL(pred, ref)) < eps)
    // a ref sentence's hits union across pred sentences
    val f = TextFunctions.rougeLsum("a b\nc d", "a b c d")
    assert(math.abs(f - 1.0) < eps) // all 4 ref tokens hit across the 2 pred sentences
  }

  test("rougeScore aggregates per-row maxima over the gold set") {
    val df = preds(
      ("the cat sat on the mat", Seq("the cat was on the mat", "zzz")),
      ("identical summary", Seq("identical summary")))
    val Array(r) = EvalScoring.rougeScore(df).collect()
    assert(math.abs(r.getDouble(0) - (5.0 / 6.0 + 1.0) / 2) < eps) // rouge1
    assert(r.getLong(4) == 2)
  }

  // ---- zh QA scorer (compute_scores.py:82-104)

  test("zh QA: char-level F1 after CJK normalization") {
    assert(math.abs(TextFunctions.tokenF1Zh("答案是北京", "北京") - 4.0 / 7.0) < eps)
    assert(TextFunctions.tokenF1Zh("北京。", "北京") == 1.0) // punct stripped
    val df = preds(("答案是北京", Seq("北京")), ("北京", Seq("北京")))
    val Array(r) = EvalScoring.zhQaScore(df).collect()
    assert(math.abs(r.getDouble(0) - (4.0 / 7.0 + 1.0) / 2) < eps)
  }

  // ---- answer post-processing (process_answer.py:28-57)

  test("stripAnswerPrefix: choice tasks re-prefix after the LAST Answer:") {
    assert(TextFunctions.stripAnswerPrefix(
      "Thinking. Answer: B is right", "code_debug") == "answer: B is right")
    assert(TextFunctions.stripAnswerPrefix(
      "Answer: X. Final Answer: C", "longbook_choice_eng") == "answer: C")
  }

  test("stripAnswerPrefix: QA/sum tasks keep tail, drop confidence") {
    assert(TextFunctions.stripAnswerPrefix(
      "Foo Answer: Paris Confidence Score: 5", "longbook_qa_eng") == "Paris ")
    assert(TextFunctions.stripAnswerPrefix(
      "答案： 北京", "longbook_qa_chn") == "北京")
  }

  test("stripAnswerPrefix: passthrough tasks and edge cases unchanged") {
    assert(TextFunctions.stripAnswerPrefix(
      "Foo Answer: 12345", "passkey") == "Foo Answer: 12345")
    assert(TextFunctions.stripAnswerPrefix(
      "No prefix here", "longbook_qa_eng") == "No prefix here")
    assert(TextFunctions.stripAnswerPrefix(
      "ends with Answer:", "longbook_qa_eng") == "ends with Answer:")
  }

  test("postProcessAnswer column form matches the kernel on well-formed rows") {
    val df = Seq(
      ("r. Answer: B ok", "code_debug"),
      ("r. Answer: Paris Confidence Score: 3", "longbook_qa_eng"),
      ("r. Answer: keep", "passkey"),
      ("no prefix", "longbook_qa_eng"))
      .toDF("prediction", "task")
    val got = df.select(
      org.apache.spark.sql.functions.col("prediction"),
      org.apache.spark.sql.functions.col("task"),
      EvalScoring.postProcessAnswer(
        org.apache.spark.sql.functions.col("prediction"),
        org.apache.spark.sql.functions.col("task")).as("processed"))
      .collect()
    got.foreach { r =>
      assert(r.getString(2) ==
        TextFunctions.stripAnswerPrefix(r.getString(0), r.getString(1)))
    }
  }
}
