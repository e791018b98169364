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
}
