package graft.sources

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Engine-side half of the reference's search→crawl front end (SURVEY.md
  * S5/S6/F6/F7/W3/W4/X1; /root/reference/LLMxMapReduce_V2/src/
  * LLM_search.py:336-445 and async_crawl.py:40-436).
  *
  * Network access itself is pluggable ([[Fetcher]]) — this container is
  * zero-egress, so tests bind a deterministic mock; a production binding
  * would wrap an async HTTP client. Everything around the fetch is real
  * Spark dataflow:
  *
  *   - URL dedup before any fetch (X1 — dedup-before-expensive-work)
  *   - partition-parallel fetching via `mapPartitions`, `repartition(n)` as
  *     the concurrency knob (D12 — the crawler's 10-way worker pool)
  *   - error envelope rows instead of exceptions (F8): a failed fetch is a
  *     (url, null, error) row; downstream filters split the dead letters
  *   - length/similarity filtering with top-n backfill (F6/W4)
  */
object WebCorpus {

  /** The pluggable fetch edge. Implementations must be Serializable; one
    * instance runs per partition-task (connection pooling lives inside). */
  trait Fetcher extends Serializable {
    /** Fetch one URL → page content. Throwing marks the row as an error. */
    def fetch(url: String): String
  }

  val fetchedSchema: StructType = StructType(Seq(
    StructField("url", StringType),
    StructField("content", StringType),
    StructField("error", StringType)))

  /** Crawl deduplicated URLs with `parallelism` partition-workers.
    * Returns (url, content, error) — exactly one of content/error is null. */
  def crawl(
      urls: DataFrame, // one column: url
      fetcher: Fetcher,
      parallelism: Int = 10): DataFrame = {
    val enc = Encoders.row(fetchedSchema)
    urls.select("url")
      .dropDuplicates("url")         // X1: never fetch a URL twice
      .repartition(parallelism)      // D12: worker-pool width
      .mapPartitions { it =>
        it.map { r =>
          val url = r.getString(0)
          try Row(url, fetcher.fetch(url), null)
          catch { case e: Exception => Row(url, null, e.getMessage) }
        }
      }(enc)
  }

  /** F8: split fetch results into (ok, deadLetters). */
  def splitErrors(fetched: DataFrame): (DataFrame, DataFrame) =
    (fetched.filter(col("error").isNull).drop("error"),
      fetched.filter(col("error").isNotNull).drop("content"))

  /** F6/W4 (async_crawl.py:392-436): keep docs with
    * minLen ≤ length ≤ maxLen and similarity ≥ threshold, rank by
    * (similarity desc, length desc), take topN; if fewer than topN survive,
    * backfill with the best-ranked rejects (the reference's "top up to n"
    * behavior).
    *
    * `perTopic` is REQUIRED and non-empty: ranking is always within one
    * survey/topic's crawl (the reference never ranks across surveys), and an
    * unpartitioned window would funnel the whole corpus through one task —
    * the single-partition trap this signature now makes unexpressible.
    * Callers with genuinely one topic pass a constant topic column. */
  def filterAndRank(
      docs: DataFrame, // url, content, similarity + partition cols
      perTopic: Seq[String],
      minLen: Int = 350,
      maxLen: Int = 20000,
      minSimilarity: Double = 80.0,
      topN: Int = 10): DataFrame = {
    require(perTopic.nonEmpty,
      "filterAndRank requires partition columns: a global window is a " +
        "single-partition bottleneck at scale")
    val ranked = docs
      .withColumn("doc_len", length(col("content")))
      .withColumn("passes",
        col("doc_len").between(minLen, maxLen) &&
          col("similarity") >= minSimilarity)
    val w = Window.partitionBy(perTopic.map(col): _*).orderBy(
      col("passes").desc, col("similarity").desc, col("doc_len").desc,
      col("url"))
    ranked
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= topN)
      .drop("rn")
  }
}
