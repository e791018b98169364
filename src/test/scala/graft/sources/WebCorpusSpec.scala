package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class WebCorpusSpec extends SparkTestBase {
  import spark.implicits._

  /** Deterministic mock fetch edge: URLs containing "bad" fail. */
  private object MockFetcher extends WebCorpus.Fetcher {
    override def fetch(url: String): String =
      if (url.contains("bad")) throw new RuntimeException(s"boom:$url")
      else s"content of $url " + ("x" * (url.length * 10))
  }

  test("crawl dedups URLs, fetches in partition workers, envelopes errors (X1/D12/F8)") {
    val urls = Seq("http://a/1", "http://a/1", "http://a/2", "http://bad/3")
      .toDF("url")
    val fetched = WebCorpus.crawl(urls, MockFetcher, parallelism = 3)
    assert(fetched.count() == 3) // dup gone
    val (ok, dead) = WebCorpus.splitErrors(fetched)
    assert(ok.count() == 2)
    val d = dead.collect()
    assert(d.length == 1 && d.head.getString(1).startsWith("boom:"))
  }

  test("filterAndRank keeps passing docs first, backfills to topN (F6/W4)") {
    val docs = Seq(
      ("t", "u1", "x" * 400, 95.0),   // passes
      ("t", "u2", "x" * 500, 85.0),   // passes
      ("t", "u3", "x" * 100, 99.0),   // too short -> backfill candidate
      ("t", "u4", "x" * 400, 10.0),   // low similarity -> backfill candidate
      ("t", "u5", "x" * 30000, 90.0)) // too long -> backfill candidate
      .toDF("topic", "url", "content", "similarity")
    val top3 = WebCorpus.filterAndRank(docs, perTopic = Seq("topic"), topN = 3)
    val urls = top3.orderBy(desc("passes"), desc("similarity")).select("url")
      .collect().map(_.getString(0)).toSeq
    assert(urls.length == 3)
    assert(urls.take(2).toSet == Set("u1", "u2")) // passers first
    assert(!urls.drop(2).contains("u2"))          // backfill is a reject
  }

  test("per-topic ranking keeps topics independent") {
    val docs = Seq(
      ("t1", "u1", "x" * 400, 90.0), ("t1", "u2", "x" * 400, 80.0),
      ("t2", "u3", "x" * 400, 70.0), ("t2", "u4", "x" * 400, 60.0))
      .toDF("topic", "url", "content", "similarity")
    val top1 = WebCorpus.filterAndRank(docs, perTopic = Seq("topic"),
      topN = 1, minSimilarity = 50.0)
    assert(top1.select("url").collect().map(_.getString(0)).toSet ==
      Set("u1", "u3"))
  }

  test("filterAndRank refuses an empty partition-column list") {
    val docs = Seq(("t", "u1", "x" * 400, 95.0))
      .toDF("topic", "url", "content", "similarity")
    intercept[IllegalArgumentException] {
      WebCorpus.filterAndRank(docs, perTopic = Seq.empty)
    }
  }

  // ---- search front end (S5/F7 — LLM_search.py:95-151,307-334,336-445)

  private val mock = new graft.infer.MockInference

  test("expandQueries parses the fenced ;-separated list, strips quotes (S5)") {
    val topics = Seq(("spark", "distributed engines")).toDF("topic", "description")
    val qs = WebCorpus.expandQueries(topics, mock)
      .orderBy("query_idx").collect()
    assert(qs.length == 4)
    val texts = qs.map(_.getString(2)).toSeq
    assert(texts.head == "spark overview")
    assert(texts.contains("spark survey"))       // quotes stripped
    assert(texts.forall(q => q.nonEmpty && !q.contains("\"")))
    assert(qs.map(_.getInt(1)).toSeq == Seq(0, 1, 2, 3))
  }

  test("scoreSnippets parses the LAST <SCORE> tag, drops null snippets (F7)") {
    val snips = Seq(
      ("t", 0, "http://a", "relevant text about t"),
      ("t", 0, "http://b", null.asInstanceOf[String]),
      ("t", 1, "http://c", ""))
      .toDF("topic", "query_idx", "url", "snippet")
    val scored = WebCorpus.scoreSnippets(snips, mock).collect()
    assert(scored.length == 1) // null/empty snippets never reach the model
    val s = scored.head.getAs[Double]("score")
    assert(s >= 0 && s <= 100) // decoy <SCORE>999</SCORE> was not taken
  }

  test("malformed score responses clamp to 0.0 (F7 error default)") {
    val noTag = new graft.infer.InferenceClient {
      override def complete(p: String) = "no tag here"
    }
    val outOfRange = new graft.infer.InferenceClient {
      override def complete(p: String) = "<SCORE>101</SCORE>"
    }
    val snips = Seq(("t", 0, "http://a", "text")).toDF("topic", "query_idx", "url", "snippet")
    assert(WebCorpus.scoreSnippets(snips, noTag).head().getAs[Double]("score") == 0.0)
    assert(WebCorpus.scoreSnippets(snips, outOfRange).head().getAs[Double]("score") == 0.0)
  }

  test("rankSearchResults: first-query-wins URL dedup, per-topic top-n") {
    val scored = Seq(
      ("t1", 0, "http://a", 90.0),
      ("t1", 2, "http://a", 99.0), // same url, later query -> dropped
      ("t1", 1, "http://b", 80.0),
      ("t1", 1, "http://c", 70.0),
      ("t2", 0, "http://d", 10.0))
      .toDF("topic", "query_idx", "url", "score")
    val top2 = WebCorpus.rankSearchResults(scored, topN = 2).collect()
    val t1 = top2.filter(_.getString(0) == "t1").map(r => (r.getString(1), r.getDouble(2)))
    assert(t1.toSet == Set(("http://a", 90.0), ("http://b", 80.0))) // first-seen score kept
    assert(top2.exists(_.getString(0) == "t2")) // topics rank independently
  }

  test("searchFrontEnd composes expansion -> edge -> score -> rank") {
    val topics = Seq(("graphs", "graph processing")).toDF("topic", "description")
    // fixture search edge: 2 urls per query, one with a null snippet
    val edge: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
      qs => qs.select(col("topic"), col("query_idx"),
          concat(lit("http://site/"), col("query_idx")).as("url"),
          concat(lit("snippet for "), col("query")).as("snippet"))
        .unionAll(qs.select(col("topic"), col("query_idx"),
          concat(lit("http://dead/"), col("query_idx")).as("url"),
          lit(null).cast("string").as("snippet")))
    val out = WebCorpus.searchFrontEnd(topics, edge, mock, topN = 3)
    val rows = out.collect()
    assert(rows.length == 3)
    assert(rows.forall(_.getString(1).startsWith("http://site/"))) // dead snippets never ranked
    // deterministic: re-running yields the identical ranking
    assert(out.collect().toSeq == rows.toSeq)
  }
}
