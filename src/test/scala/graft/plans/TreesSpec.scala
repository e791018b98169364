package graft.plans

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class TreesSpec extends SparkTestBase {
  import Trees._

  private val outline =
    """# Introduction
      |Overview text.
      |## Background
      |## Motivation
      |Why it matters.
      |# Methods
      |## Pipeline
      |### Details
      |# Conclusion""".stripMargin

  test("parseOutline builds materialized paths in preorder") {
    val rows = parseOutline("s1", outline)
    assert(rows.map(_.path) == Seq(
      Seq(1), Seq(1, 1), Seq(1, 2), Seq(2), Seq(2, 1), Seq(2, 1, 1), Seq(3)))
    assert(rows.map(_.depth) == Seq(1, 2, 2, 1, 2, 3, 1))
    assert(rows.head.description == "Overview text.")
    assert(rows(2).description == "Why it matters.")
  }

  test("parse/render round-trip (skeleton.py:86-124 vs 147-169)") {
    val rows = parseOutline("s1", outline)
    val rendered = renderOutline(rows)
    assert(parseOutline("s1", rendered) == rows)
  }

  test("structuralJoin matches mirrored trees (J1)") {
    val sk = toDF(spark, parseOutline("s1", outline))
    val dg = toDF(spark, parseOutline("s1", outline)
      .map(r => r.copy(description = s"digest of ${r.title}")))
    val joined = structuralJoin(sk, dg)
    assert(joined.count() == 7)
    assert(joined.columns.contains("dg_description"))
  }

  test("structuralJoin raises on shape mismatch (digest.py:143-146)") {
    val sk = toDF(spark, parseOutline("s1", outline))
    val dg = toDF(spark, parseOutline("s1", outline).drop(1))
    intercept[StructureNotCorrespondingException] {
      structuralJoin(sk, dg)
    }
  }

  test("assembleBottomUp composes children into parents level by level (D11)") {
    import spark.implicits._
    val sections = parseOutline("s1", outline)
      .map(r => (r.survey_id, r.path, r.depth, s"<${r.title}>"))
      .toDF("survey_id", "path", "depth", "content")
    val out = assembleBottomUp(sections,
      (own, kids) => own + kids.mkString("(", "+", ")"))
    val byPath = out.collect()
      .map(r => r.getSeq[Int](1) -> r.getString(3)).toMap
    assert(byPath(Seq(2)) == "<Methods>(<Pipeline>(<Details>))")
    assert(byPath(Seq(1)) == "<Introduction>(<Background>+<Motivation>)")
    assert(byPath(Seq(3)) == "<Conclusion>")
  }
}
