package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Text-analysis invariants beyond what the sf oracles pin: BM25 keyword
  * extraction semantics (budget, ranking monotonicity, idf direction). */
class TextAnalysisSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("bm25 keywords keep at most 5 ranked terms per document") {
    val q = TextAnalysis.defs.find(_.name == "t10_bm25_keywords").get
    val out = q.build(spark, dir).collect()
    assert(out.nonEmpty)
    out.groupBy(_.getAs[Long]("doc_id")).foreach { case (_, rows) =>
      assert(rows.length <= 5)
      // rn is dense from 1 and follows (bm25 desc, tok) exactly
      val ordered = rows.sortBy(_.getAs[Int]("rn"))
      assert(ordered.map(_.getAs[Int]("rn")).toSeq == (1 to rows.length))
      ordered.sliding(2).foreach {
        case Array(a, b) =>
          val (sa, sb) = (a.getAs[Double]("bm25"), b.getAs[Double]("bm25"))
          assert(sa > sb || (sa == sb &&
            a.getAs[String]("tok") < b.getAs[String]("tok")))
        case _ => ()
      }
    }
    // every document with text gets keywords
    val nDocs = graft.Tables.documents(spark, dir)
      .filter(col("text").isNotNull).count()
    assert(out.map(_.getAs[Long]("doc_id")).distinct.length == nDocs)
  }

  test("bm25 favors rarer terms at equal tf and doc length") {
    // a term appearing in fewer documents must outscore a term with the
    // same within-doc tf from the same doc (idf is strictly decreasing in
    // df): check across the emitted rows of each doc
    val q = TextAnalysis.defs.find(_.name == "t10_bm25_keywords").get
    val out = q.build(spark, dir)
    val v = TextAnalysis.vocabFrame(spark, dir).select("tok", "df")
    val joined = out.join(v, "tok").collect()
    joined.groupBy(_.getAs[Long]("doc_id")).foreach { case (_, rows) =>
      for {
        a <- rows; b <- rows
        if a.getAs[Long]("tfd") == b.getAs[Long]("tfd") &&
          a.getAs[Long]("df") < b.getAs[Long]("df")
      } assert(a.getAs[Double]("bm25") >= b.getAs[Double]("bm25"))
    }
  }

  test("t14 LM quality scores every corpus doc with >= 2 tokens, integer milli-units") {
    val q = TextAnalysis.defs.find(_.name == "t14_lm_quality").get
    val out = q.build(spark, dir).collect()
    assert(out.nonEmpty)
    val docs = graft.Tables.documents(spark, dir)
    val expected = docs
      .filter(col("source") =!= "src0" && size(split(col("text"), " ")) >= 2)
      .count()
    assert(out.length == expected)
    out.foreach { r =>
      // n_bigrams = token count - 1; scores positive (ipb >= 1 always)
      assert(r.getAs[Long]("n_bigrams") >= 1L)
      assert(r.getAs[Long]("score_milli") >= 1000L)
    }
  }

  test("t14 scores respect the smoothed-probability bounds and discriminate") {
    // per-bigram cost ipb = ((C(w1)+V)*1000) div (C(w1 w2)+1) is bounded
    // by (maxC+V)*1000 above (unseen bigram after the most frequent seen
    // unigram) and 1000 below (P <= 1); docs seen by the LM must not all
    // collapse to one score
    val q = TextAnalysis.defs.find(_.name == "t14_lm_quality").get
    val out = q.build(spark, dir)
    val lmToks = graft.Tables.documents(spark, dir)
      .filter(col("source") === "src0")
      .select(explode(split(col("text"), " ")).as("w"))
    val vocabSize = lmToks.distinct().count()
    val maxC = lmToks.groupBy("w").count()
      .agg(max(col("count"))).head().getLong(0)
    val ceiling = (maxC + vocabSize) * 1000L
    val worst = out.agg(max(col("score_milli"))).head().getLong(0)
    val best  = out.agg(min(col("score_milli"))).head().getLong(0)
    assert(worst <= ceiling)
    assert(best >= 1000L)
    assert(best < worst, "scores must discriminate across corpus docs")
  }

  test("t15 pii scrub: every injected token is found, redaction is total") {
    val q = TextAnalysis.defs.find(_.name == "t15_pii_scrub").get
    val out = q.build(spark, dir).collect()
    // expected per-source match counts follow the injection rule exactly:
    // one email per doc_id%7==0 doc, one phone per %11, one ip per %13
    val docs = graft.Tables.documents(spark, dir)
      .select("doc_id", "source").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source")))
    val bySource = docs.groupBy(_._2)
    assert(out.nonEmpty)
    out.foreach { r =>
      val ids = bySource(r.getAs[String]("source")).map(_._1)
      assert(r.getAs[Long]("n_docs") == ids.length)
      assert(r.getAs[Long]("n_emails") == ids.count(_ % 7 == 0))
      assert(r.getAs[Long]("n_phones") == ids.count(_ % 11 == 0))
      assert(r.getAs[Long]("n_ips") == ids.count(_ % 13 == 0))
      assert(r.getAs[Long]("n_pii_docs") ==
        ids.count(i => i % 7 == 0 || i % 11 == 0 || i % 13 == 0))
    }
    // redaction is total: run the ACTUAL scrubber and assert no un-redacted
    // email/phone/ip survives in any redacted text, and that a known
    // injected doc carries the <EMAIL> placeholder (ADVICE r7: the previous
    // probe read the ORIGINAL text, which only proved the corpus is
    // pii-free — redaction itself went untested here).
    val emailRe = "[a-z0-9]+@[a-z0-9]+\\.[a-z]+".r
    val phoneRe = "555-[0-9]{4}".r
    val ipRe    = "10\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}".r
    val reds = TextAnalysis.piiScrubbed(graft.Tables.documents(spark, dir))
      .select("doc_id", "red").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("red")))
    assert(reds.nonEmpty)
    reds.foreach { case (_, t) =>
      assert(emailRe.findFirstIn(t).isEmpty, s"email survived redaction: $t")
      assert(phoneRe.findFirstIn(t).isEmpty, s"phone survived redaction: $t")
      assert(ipRe.findFirstIn(t).isEmpty, s"ip survived redaction: $t")
    }
    assert(reds.collectFirst { case (id, t) if id % 7 == 0 => t }
      .exists(_.contains("<EMAIL>")))
  }

  test("t16 blocklist gate: kept+dropped partitions the corpus, hits match") {
    val q = TextAnalysis.defs.find(_.name == "t16_blocklist_gate").get
    val out = q.build(spark, dir).collect()
    assert(out.nonEmpty)
    val re = "\\b(slow|big|crash)\\b".r
    val expect = graft.Tables.documents(spark, dir)
      .select("source", "text").collect()
      .groupBy(_.getAs[String]("source"))
      .map { case (src, rows) =>
        src -> rows.map { r =>
          val t = r.getAs[String]("text")
          val hits = re.findAllIn(t).length
          // split limit -1 keeps trailing empty strings — the semantics BOTH
          // engines use (Spark split / DuckDB string_split); Java's default
          // limit-0 drops them (ADVICE r7 latent mismatch)
          val rate = hits.toLong * 1000 / t.split(" ", -1).length
          (hits.toLong, rate)
        }
      }
    out.foreach { r =>
      val e = expect(r.getAs[String]("source"))
      assert(r.getAs[Long]("n_docs") == e.length)
      assert(r.getAs[Long]("n_hits") == e.map(_._1).sum)
      assert(r.getAs[Long]("n_dropped") == e.count(_._2 >= 60))
      assert(r.getAs[Long]("n_kept") + r.getAs[Long]("n_dropped")
        == r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("max_rate_milli") == e.map(_._2).max)
    }
  }
}
