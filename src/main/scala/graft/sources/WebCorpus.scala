package graft.sources

import graft.infer.{InferOps, InferenceClient}
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

  // ------------------------------------------------------------------
  // Search front end (S5/F7 — LLM_search.py:95-151 get_queries,
  // :307-334 snippet_filter, :336-445 batch_web_search). The web-search
  // API call itself is an external edge like [[Fetcher]]; everything
  // deterministic around it is Spark dataflow below.

  /** S5 front half: query expansion. One row per topic in, one row per
    * (topic, query_idx, query) out. The model answers with a
    * ```markdown``` fenced block of `;`-separated queries
    * (LLM_search.py:113-121): parse = extract fence, split on `;`, strip
    * quotes/whitespace, drop empties. Parsing is native column work; only
    * the completion crosses the inference seam. */
  def expandQueries(
      topics: DataFrame, // topic, description
      client: InferenceClient): DataFrame = {
    val asked = InferOps.complete(
      topics.withColumn("prompt",
        concat(lit("SEARCH|"), col("topic"), lit("|"),
          coalesce(col("description"), lit("")))),
      "prompt", "response", client)
    val fence = regexp_extract(
      col("response"), "(?s)```markdown\\s*\\n(.*?)```", 1)
    asked
      .withColumn("q",
        filter(
          transform(split(fence, ";"), s => trim(regexp_replace(s, "\"", ""))),
          s => s =!= ""))
      .select(col("topic"),
        posexplode(col("q")).as(Seq("query_idx", "query")))
  }

  /** F7: snippet relevance scoring (snippet_filter): ask the model
    * `SNIPPET|topic|snippet`, parse the LAST `<SCORE>n</SCORE>` tag, and
    * clamp malformed / out-of-range answers to 0.0 (the reference's
    * error-swallowing default). Null/empty snippets never reach the model
    * (batch_web_search only enqueues truthy snippets). */
  def scoreSnippets(
      snippets: DataFrame, // topic, url, snippet + carried cols
      client: InferenceClient): DataFrame = {
    val live = snippets.filter(col("snippet").isNotNull && col("snippet") =!= "")
    val scoredRaw = InferOps.complete(
      live.withColumn("prompt",
        concat(lit("SNIPPET|"), col("topic"), lit("|"), col("snippet"))),
      "prompt", "score_response", client)
    // greedy .* anchors the LAST <SCORE> tag, like the reference's
    // re.findall(...)[-1]
    val parsed = regexp_extract(
      col("score_response"), "(?s).*<SCORE>(\\d+)</SCORE>", 1)
    scoredRaw
      .withColumn("score",
        when(parsed === "", 0.0)
          .otherwise(
            when(parsed.cast("double").between(0, 100), parsed.cast("double"))
              .otherwise(0.0)))
      .drop("prompt", "score_response")
  }

  /** Batch search back half (batch_web_search:336-445): URL dedup is
    * FIRST-query-wins (`if url in snippet_by_url: continue` — query_idx
    * order), then scored snippets rank per topic and the top-n URLs
    * survive. Ties break on url (the reference inherits dict insertion
    * order; a total order keeps the operator deterministic). All window
    * work is per-topic — no global sort. */
  def rankSearchResults(
      scored: DataFrame, // topic, query_idx, url, score
      topN: Int = 20): DataFrame = {
    val firstSeen = Window.partitionBy("topic", "url")
      .orderBy(col("query_idx"))
    val rank = Window.partitionBy("topic")
      .orderBy(col("score").desc, col("url"))
    scored
      .withColumn("seen", row_number().over(firstSeen))
      .filter(col("seen") === 1)
      .withColumn("rn", row_number().over(rank))
      .filter(col("rn") <= topN)
      .select("topic", "url", "score")
  }

  /** The composed deterministic front end: topics → expanded queries →
    * (caller-supplied search edge) → scored snippets → top-n URLs per
    * topic. `searchEdge` plays the web-search API: it receives the
    * (topic, query_idx, query) frame and returns (topic, query_idx, url,
    * snippet) rows — tests bind a fixture table, production binds an HTTP
    * client mapPartitions like [[crawl]]. */
  def searchFrontEnd(
      topics: DataFrame,
      searchEdge: DataFrame => DataFrame,
      client: InferenceClient,
      topN: Int = 20): DataFrame = {
    val queries = expandQueries(topics, client)
    val results = searchEdge(queries)
    val scored  = scoreSnippets(results, client)
    rankSearchResults(scored, topN)
  }
}
