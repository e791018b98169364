package graft.operators

import graft.SparkTestBase
import graft.infer.InferenceClient

class CitationQualitySpec extends SparkTestBase {
  import spark.implicits._

  /** NLI stub with a readable rule: entailed iff the source text contains
    * the word "fact". (The QueryDef e01 uses the md5-based MockInference so
    * the DuckDB oracle can reproduce it; here readability wins.) */
  private object ContainsFactNli extends InferenceClient {
    override def complete(prompt: String): String = {
      val source = prompt.split("\\|", 3).last
      if (source.contains("fact")) "Yes, entailed." else "No."
    }
  }

  test("claimPairs extracts sentences, strips brackets, dedups id sets (T15)") {
    val surveys = Seq(
      (1L, "### Intro Alpha holds [1]. No citation here. Beta holds [1, 2] " +
        "and also [2]. ## References [99] ignored tail."))
      .toDF("survey_id", "content")
    val rows = CitationQuality.claimPairs(surveys)
      .orderBy("sentence", "citation_idx")
      .collect()
      .map(r => (r.getString(2).trim, r.getInt(3)))
    // sentence 1: "Alpha holds [1]." -> claim "Alpha holds ." ids {0}
    //   (the "### " marker is consumed by the section split; "Intro " stays)
    // sentence 2: "Beta holds [1, 2] and also [2]." -> ids {0, 1} (set!)
    // the [99] after "## References" is stripped with the tail
    assert(rows.toSeq == Seq(
      ("Beta holds  and also .", 0),
      ("Beta holds  and also .", 1),
      ("Intro Alpha holds .", 0)))
  }

  test("metrics match hand computation (judge.py:360-433 semantics)") {
    // 1 survey, 3 papers: paper 0/1 contain "fact" (entail), paper 2 not.
    val papers = Seq(
      (1L, 0, "source with fact zero"),
      (1L, 1, "source with fact one"),
      (1L, 2, "source lacking it"))
      .toDF("survey_id", "idx", "text")
    // claims: c1 cites [1] (ok), c2 cites [3] (not), c3 cites [1, 3] (mixed),
    // plus one uncited sentence -> 5 sentences total in the body
    val surveys = Seq(
      (1L, "c1 holds [1]. c2 holds [3]. plain sentence. c3 holds [1, 3]. " +
        "last plain. ## References tail"))
      .toDF("survey_id", "content")
    val m = CitationQuality.metrics(surveys, papers, ContainsFactNli)
      .collect().head
    // pairs: (c1,0,Y) (c2,2,N) (c3,0,Y) (c3,2,N) -> 4 pairs, 2 entailed
    // (metrics are rounded to 6 dp)
    assert(m.getDouble(1) == 0.666667) // claim_precision: c1, c3 of 3
    assert(m.getDouble(2) == 0.5)      // citation_precision: 2/4
    assert(m.getDouble(3) == 0.333333) // reference_precision: {0} of 3 papers
    assert(m.getDouble(4) == 0.666667) // reference_coverage: {0, 2} of 3
    assert(m.getDouble(5) == 0.8)      // density: 4 pairs / 5 sentences
    assert(m.getDouble(6) == 1.333333) // avg citations per claim
  }

  test("e01 fixture runs end-to-end on sf0.001") {
    val df = CitationQuality.defs.head.build(spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    assert(rows.length == 5) // 5 surveys
    rows.foreach { r =>
      (1 to 6).foreach(i => assert(!r.isNullAt(i), s"null metric col $i"))
      assert(r.getDouble(4) > 0.0) // coverage: every survey cites something
    }
  }

  test("dimensionScores averages NON-ZERO section scores (judge.py:334)") {
    // scripted judge: section "1 ..." scores 0, "2 ..." scores 4, "3 ..."
    // scores 2 for language; critical always 0
    val scripted = new InferenceClient {
      override def complete(p: String): String = {
        val Array(_, dim, _, sec) = p.split("\\|", 4)
        val n =
          if (dim == "critical") 0
          else sec.trim.take(1) match {
            case "1" => 0; case "2" => 4; case _ => 2
          }
        s"<SCORE>$n</SCORE>"
      }
    }
    val surveys = Seq(
      (1L, "Topic X", "Intro.\n## 1 first\n## 2 second\n## 3 third\n## References x"))
      .toDF("survey_id", "topic", "content")
    val Array(r) = CitationQuality.dimensionScores(surveys, scripted).collect()
    assert(r.getDouble(1) == 3.0) // language: mean(4, 2) — the 0 filtered out
    assert(r.getDouble(2) == 0.0) // critical: all zero -> 0.0, not null
  }
}
