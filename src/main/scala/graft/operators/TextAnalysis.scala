package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Text-analysis operators over the `documents` table — the quality /
  * language-ID / token-counting / fingerprinting family a training-data
  * pipeline runs before filtering at scale (SURVEY.md T10/T11/T17/T18 and the
  * north-star text-analysis surface).
  *
  * Everything here is a per-row projection built from codegen'd string and
  * higher-order functions: embarrassingly parallel, zero shuffles, filters
  * and column pruning pushed into the parquet scan — the shape that holds at
  * 100 TB (score first, shuffle never).
  */
object TextAnalysis {

  /** Stopword list shared by the Spark plan and the DuckDB oracle. */
  private val stopwords =
    Seq("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")
  private val stopArr  = array(stopwords.map(lit): _*)
  private val stopSqlList = stopwords.map(w => s"'$w'").mkString("[", ", ", "]")

  /** One corpus-vocabulary aggregation (tok, tf, df), shared by t08 and t09
    * — the same memoized-index pattern as the MinHash signature frame: at
    * 100 TB the vocabulary is computed once per corpus snapshot and every
    * frequency-derived score reads it. */
  private[operators] def vocabFrame(
      s: org.apache.spark.sql.SparkSession, d: String) =
    ResultMemo.materialized("vocab_frame", s, d) {
      Tables.documents(s, d)
        .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("tok"))
        .groupBy("tok")
        .agg(count(lit(1)).as("tf"), countDistinct(col("doc_id")).as("df"))
    }

  /** Materialize the vocabulary index for the session (Bench setup — same
    * posture as the signature index: computed once per corpus snapshot,
    * read by every frequency-derived score: q44's exact top-50, t08, t09). */
  private[graft] def warmVocabIndex(
      s: org.apache.spark.sql.SparkSession, d: String): Unit =
    vocabFrame(s, d).count(): Unit

  /** The t14s broadcast LM is PRUNED to the top-K n-grams by count before
    * the driver collect (ties broken by token string, so both engines cap
    * identically): prune-and-smooth, the KenLM/CCNet practice. This is the
    * driver-memory bound (VERDICT r7 #2): an open-vocabulary 100 TB
    * held-out slice would otherwise make |bigrams| a driver-killer — with
    * the cap the model is ≤ LmTopUni + LmTopBg entries REGARDLESS of corpus
    * vocabulary. Tokens outside the kept tables score through the same
    * Laplace-smoothing unseen path (cw = 0 / cbg = 0), and the smoothing V
    * is the CAPPED unigram-table size, so the arithmetic stays exactly
    * reproducible by the oracle's capped CTEs. The caps deliberately BIND
    * at every test SF (src0 has 31 unigrams / 700+ bigrams) — the pruned
    * path is what the oracle checks, not a latent branch. */
  private[graft] val LmTopUni = 24
  private[graft] val LmTopBg  = 512

  /** The t14-shaped bigram LM as a driver-built broadcast model for the
    * ingest gate (t14s), capped per [[LmTopUni]]/[[LmTopBg]]. Memoized per
    * (session, dir): the model is a per-corpus-snapshot artifact, never
    * rebuilt per query. */
  private val lmModelMemo = scala.collection.concurrent.TrieMap
    .empty[(String, String), org.apache.spark.broadcast.Broadcast[
      graft.functions.LmKernel.LmModel]]

  private[graft] def lmModelBroadcast(
      s: org.apache.spark.sql.SparkSession, d: String)
    : org.apache.spark.broadcast.Broadcast[graft.functions.LmKernel.LmModel] =
    lmModelMemo.getOrElseUpdate((s.sparkContext.applicationId, d), {
      val base = Tables.documents(s, d)
        .filter(col("source") === "src0")
        .select(split(col("text"), " ").as("t"))
      // orderBy+limit plans as TakeOrdered: only the K survivors reach the
      // driver, whatever the vocabulary
      val uni = base.select(explode(col("t")).as("w"))
        .groupBy("w").agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("w").asc).limit(LmTopUni)
        .collect().map(r => r.getString(0) -> r.getLong(1))
      val bg = base.filter(size(col("t")) >= 2)
        .select(explode(transform(sequence(lit(1), size(col("t")) - 1),
          i => concat(element_at(col("t"), i), lit(" "),
            element_at(col("t"), i + 1)))).as("bg"))
        .groupBy("bg").agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("bg").asc).limit(LmTopBg)
        .collect().map(r => r.getString(0) -> r.getLong(1))
      s.sparkContext.broadcast(graft.functions.LmKernel.model(uni, bg))
    })

  def defs: Seq[QueryDef] = Seq(
    // Language ID by stopword density — the n-gram-free heuristic the V3
    // crawler cleaner uses (T17); deterministic, hence oracle-checkable.
    QueryDef(
      "t01_language_id",
      covers = "T17",
      oracle = Some(s"""
        SELECT doc_id,
               CASE WHEN len(list_filter(string_split(lower(text), ' '),
                          t -> list_contains($stopSqlList, t))) * 1.0
                    / greatest(len(string_split(text, ' ')), 1) > 0.05
                    THEN 'en' ELSE 'unknown' END AS lang_guess
        FROM documents ORDER BY doc_id"""),
      build = (s, d) => {
        // one-pass codegen kernel (TokenCountKernel, round-13 HofBanSpec
        // find): the old size(filter(split(lower(text)))) chain ran an
        // interpreted lambda per token and materialized two arrays per row
        // to read one int — the t06 class
        val nStop = graft.functions.TokenCountKernel
          .stopwordCountCol(s, col("text"), stopwords)
        // denominator via spaces+1 — no token array for a count
        val nWs = graft.functions.TokenCountKernel
          .wsTokenCountCol(s, col("text"))
        Tables.documents(s, d)
          .select(
            col("doc_id"),
            when(nStop * 1.0 / greatest(nWs, lit(1))
              > 0.05, "en").otherwise("unknown").as("lang_guess"))
          .orderBy("doc_id")
      }),

    // Quality scoring: length band + lexical-richness ratio (T18-adjacent).
    QueryDef(
      "t02_quality_score",
      covers = "T18 F6",
      oracle = Some("""
        SELECT doc_id, n_chars,
               len(string_split(text, ' ')) AS n_words,
               round(len(list_filter(string_split(text, ' '), w -> len(w) >= 6)) * 1.0
                     / greatest(len(string_split(text, ' ')), 1), 6) AS long_word_ratio,
               CASE WHEN n_chars BETWEEN 200 AND 2000 THEN 1 ELSE 0 END AS len_ok
        FROM documents ORDER BY doc_id"""),
      build = (s, d) => {
        // codegen kernels instead of the interpreted filter-HOF count and
        // the split-array size (round-13 HofBanSpec find, same class as t01)
        val nLong = graft.functions.TokenCountKernel
          .longTokenCountCol(s, col("text"), 6)
        val nWs = graft.functions.TokenCountKernel
          .wsTokenCountCol(s, col("text"))
        Tables.documents(s, d)
          .select(
            col("doc_id"), col("n_chars"),
            nWs.as("n_words"),
            round(nLong * 1.0 /
              greatest(nWs, lit(1)), 6).as("long_word_ratio"),
            when(col("n_chars").between(200, 2000), 1).otherwise(0).as("len_ok"))
          .orderBy("doc_id")
      }),

    // Token counting: whitespace tokens, regex word tokens, and a BPE-ish
    // chars/3.7 estimate (the reference's TOKEN_RATIO heuristic, T18).
    QueryDef(
      "t03_token_count",
      covers = "T2 T11 T18",
      oracle = Some("""
        SELECT doc_id,
               len(string_split(text, ' ')) AS ws_tokens,
               len(list_filter(regexp_split_to_array(text, '[^a-zA-Z0-9]+'),
                               x -> len(x) > 0)) AS re_tokens,
               CAST(ceil(n_chars / 3.7) AS BIGINT) AS est_bpe_tokens
        FROM documents ORDER BY doc_id"""),
      build = (s, d) =>
        Tables.documents(s, d)
          .select(
            col("doc_id"),
            graft.functions.TokenCountKernel
              .wsTokenCountCol(s, col("text")).as("ws_tokens"),
            // maximal-alnum-run count kernel: same integer as counting the
            // nonempty regex-split pieces, with no regex engine and no
            // arrays (round-13 HofBanSpec find)
            graft.functions.TokenCountKernel
              .alnumRunCountCol(s, col("text")).as("re_tokens"),
            ceil(col("n_chars") / 3.7).cast("bigint").as("est_bpe_tokens"))
          .orderBy("doc_id")),

    // Boilerplate-removing HTML cleaner (T17 full form — jusText-semantics
    // block classification, HtmlClean.scala). The fixture wraps each
    // document's words in content paragraphs (stopword glue → GOOD blocks)
    // between boilerplate: a link-dense nav, a short promo with a link, a
    // copyright footer, plus script/head noise. en-path output keeps the
    // heading + paragraphs; the zh path keeps every block (the reference's
    // non-spaced-language rule). The oracle reconstructs both expectations
    // from the raw words.
    QueryDef(
      "t05_html_clean",
      covers = "T17 F6",
      oracle = Some("""
        WITH w AS (
          SELECT doc_id, lang, string_split(text, ' ') AS ws
          FROM documents WHERE len(string_split(text, ' ')) >= 45),
        paras AS (
          SELECT doc_id, lang,
            array_to_string(list_slice(ws, 1, 15), ' and of the in to ') AS p1,
            array_to_string(list_slice(ws, 16, 30), ' and of the in to ') AS p2,
            array_to_string(list_slice(ws, 31, 45), ' and of the in to ') AS p3
          FROM w)
        SELECT doc_id,
          CASE WHEN lang = 'zh'
            THEN 'Home About Contact' || chr(10) || chr(10) ||
                 'Document ' || doc_id || chr(10) || chr(10) ||
                 p1 || chr(10) || chr(10) || p2 || chr(10) || chr(10) || p3 ||
                 chr(10) || chr(10) || 'Short promo text with a link here' ||
                 chr(10) || chr(10) || '© 2026 Example Corp all rights reserved'
            ELSE 'Document ' || doc_id || chr(10) || chr(10) ||
                 p1 || chr(10) || chr(10) || p2 || chr(10) || chr(10) || p3
          END AS cleaned
        FROM paras ORDER BY doc_id"""),
      build = (s, d) => {
        val cleanUdf = udf((html: String, lang: String) =>
          graft.functions.HtmlClean.clean(html, lang))
        val words = split(col("text"), " ")
        val glue  = " and of the in to "
        def para(start: Int) =
          array_join(slice(words, start, 15), glue)
        val html = concat(
          lit("<html><head><title>T</title></head><body><script>var x=1;</script>"),
          lit("<div><a href=\"/\">Home</a> <a href=\"/about\">About</a> <a href=\"/contact\">Contact</a></div>"),
          lit("<h1>Document "), col("doc_id").cast("string"), lit("</h1>"),
          lit("<p>"), para(1), lit("</p><p>"), para(16), lit("</p><p>"), para(31), lit("</p>"),
          lit("<div>Short promo text with a <a href=\"/buy\">link</a> here</div>"),
          lit("<div>© 2026 Example Corp all rights reserved</div>"),
          lit("</body></html>"))
        Tables.documents(s, d)
          .filter(size(words) >= 45)
          .select(col("doc_id"),
            cleanUdf(html, col("lang")).as("cleaned"))
          .orderBy("doc_id")
      }),

    // Gopher-style repetition stats: fraction of repeated words / 2-grams /
    // 3-grams per document — the within-document quality rule (a doc whose
    // n-grams are mostly repeats is boilerplate or degenerate generation).
    // Per-row HOFs off the scan: zero shuffles, same shape as t01-t03.
    QueryDef(
      "t06_repetition_stats",
      covers = "T18 F6 north-star",
      oracle = Some("""
        WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        g AS (SELECT doc_id, ws,
                list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1]) AS g2,
                list_transform(range(1, len(ws)-1),
                  i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]) AS g3
              FROM w)
        SELECT doc_id,
          round(1 - len(list_distinct(ws)) * 1.0 / greatest(len(ws), 1), 6)
            AS dup_word_frac,
          round(1 - len(list_distinct(g2)) * 1.0 / greatest(len(g2), 1), 6)
            AS dup_2gram_frac,
          round(1 - len(list_distinct(g3)) * 1.0 / greatest(len(g3), 1), 6)
            AS dup_3gram_frac
        FROM g ORDER BY doc_id"""),
      build = (s, d) => {
        // one-pass codegen kernel (exact interned n-gram distinct counts —
        // graft.functions.RepetitionKernel) instead of the interpreted
        // transform(sequence(...))+array_distinct HOF chain: bit-identical
        // fractions, ~4x cheaper per row, and the terminal orderBy's
        // boundary-sampling re-run of this projection becomes cheap too
        val r = graft.functions.RepetitionKernel
          .repetitionStatsCol(s, col("text"))
        Tables.documents(s, d)
          .select(col("doc_id"), r.as("r"))
          .select(col("doc_id"),
            round(element_at(col("r"), 1), 6).as("dup_word_frac"),
            round(element_at(col("r"), 2), 6).as("dup_2gram_frac"),
            round(element_at(col("r"), 3), 6).as("dup_3gram_frac"))
          .orderBy("doc_id")
      }),

    // PII scrub: redact emails/phones and count redactions (the C4-style
    // compliance pass). The corpus is synthetic and PII-free by
    // construction, so a fifth of the docs get a planted, deterministic
    // email+phone suffix IN BOTH ENGINES — the operator under test is the
    // scrub, not the plant. Regexes stay in the Spark∩RE2 common subset.
    QueryDef(
      "t07_pii_scrub",
      covers = "T18 F9 north-star",
      oracle = Some("""
        WITH src AS (
          SELECT doc_id,
                 CASE WHEN doc_id % 5 = 0
                      THEN text || ' contact: user' || doc_id ||
                           '@example.com or +01 555-01' ||
                           lpad((doc_id % 100)::VARCHAR, 2, '0') || ' now'
                      ELSE text END AS text
          FROM documents)
        SELECT doc_id,
          len(regexp_extract_all(text,
            '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
          len(regexp_extract_all(text,
            '\+[0-9]{2} [0-9]{3}-[0-9]{4}')) AS n_phones,
          md5(regexp_replace(regexp_replace(text,
            '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
            '\+[0-9]{2} [0-9]{3}-[0-9]{4}', '[PHONE]', 'g')) AS scrub_hash
        FROM src ORDER BY doc_id"""),
      build = (s, d) => {
        val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
        val phoneRe = "\\+[0-9]{2} [0-9]{3}-[0-9]{4}"
        val planted = when(col("doc_id") % 5 === 0,
          concat(col("text"), lit(" contact: user"),
            col("doc_id").cast("string"), lit("@example.com or +01 555-01"),
            lpad((col("doc_id") % 100).cast("string"), 2, "0"), lit(" now")))
          .otherwise(col("text"))
        Tables.documents(s, d)
          .select(col("doc_id"), planted.as("text"))
          .select(col("doc_id"),
            size(regexp_extract_all(col("text"), lit(emailRe), lit(0))).as("n_emails"),
            size(regexp_extract_all(col("text"), lit(phoneRe), lit(0))).as("n_phones"),
            md5(regexp_replace(
              regexp_replace(col("text"), emailRe, "[EMAIL]"),
              phoneRe, "[PHONE]").cast("binary")).as("scrub_hash"))
          .orderBy("doc_id")
      }),

    // Document fingerprint: md5 of the canonical text form (T16/X5 exact
    // half) — the key exact-dedup runs on.
    QueryDef(
      "t04_fingerprint",
      covers = "T16 X5",
      oracle = Some("""
        SELECT doc_id,
               md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fp
        FROM documents ORDER BY doc_id"""),
      build = (s, d) =>
        Tables.documents(s, d)
          .select(
            col("doc_id"),
            md5(trim(regexp_replace(lower(col("text")), "[^a-z0-9]+", " "))
              .cast("binary")).as("fp"))
          .orderBy("doc_id")),

    // Corpus vocabulary: term frequency, document frequency and Zipf share
    // for the top-100 tokens — the vocab-building pass before tokenizer
    // training. Scale shape: one token-keyed exchange with map-side partial
    // aggregation (the explode never leaves its task), then a distributed
    // TakeOrdered for the top-k — no global window/sort ever sees the full
    // vocabulary. The rank column is derived on the 100 survivors by a
    // broadcast pair-count so the "no unpartitioned window" invariant holds.
    QueryDef(
      "t08_vocab_topk",
      covers = "T2 T11 W1 north-star",
      oracle = Some("""
        WITH w AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
                   FROM documents),
        agg AS (SELECT tok, count(*) AS tf, count(DISTINCT doc_id) AS df
                FROM w GROUP BY tok),
        tot AS (SELECT sum(tf) AS n FROM agg),
        ranked AS (SELECT tok, tf, df,
                     row_number() OVER (ORDER BY tf DESC, tok) AS rank
                   FROM agg)
        SELECT rank, tok, tf, df,
               round(tf * 1.0 / (SELECT n FROM tot), 6) AS freq_share
        FROM ranked WHERE rank <= 100 ORDER BY rank"""),
      build = (s, d) => {
        val agg = vocabFrame(s, d)
        val top = agg.orderBy(col("tf").desc, col("tok")).limit(100)
        val total = agg.agg(sum(col("tf")).as("n"))
        // rank = 1 + |{survivors strictly before in (tf desc, tok)}| —
        // a 100×100 broadcast pair-count, never a global window
        val before = top.select(col("tok").as("tok2"), col("tf").as("tf2"))
        top.join(broadcast(before),
            col("tf2") > col("tf") ||
              (col("tf2") === col("tf") && col("tok2") < col("tok")), "left")
          .groupBy("tok", "tf", "df")
          .agg((count(col("tok2")) + 1).as("rank"))
          .crossJoin(broadcast(total))
          .select(col("rank"), col("tok"), col("tf"), col("df"),
            round(col("tf") * 1.0 / col("n"), 6).as("freq_share"))
          .orderBy("rank")
      }),

    // Token-rarity scoring: per-doc corpus-frequency statistics — the
    // deterministic core of a CCNet-style unigram-LM quality filter (the
    // -log transform is monotone in these and applied downstream; summing
    // floats would make the hash depend on aggregation order, so the
    // per-doc aggregates stay INTEGER until the final division). A doc full
    // of rare tokens (low mean_tf, high n_rare) reads as noise; a doc of
    // only stop-level tokens (high mean_tf) reads as boilerplate. Scale
    // shape: one token-keyed vocab aggregation, then the vocab — zipfian,
    // so tokenizer-scale corpora keep it broadcastable — joins back without
    // shuffling the corpus side; one doc-keyed aggregation ends the plan.
    QueryDef(
      "t09_token_rarity",
      covers = "T18 F6 north-star",
      oracle = Some("""
        WITH w AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
                   FROM documents),
        v AS (SELECT tok, count(*) AS tf FROM w GROUP BY tok),
        tot AS (SELECT sum(tf) AS n FROM v)
        SELECT w.doc_id,
               count(*) AS n_toks,
               CAST(sum(v.tf) AS BIGINT) AS sum_tf,
               round(sum(v.tf) * 1.0 / count(*), 6) AS mean_tf,
               min(v.tf) AS min_tf,
               CAST(sum(CASE WHEN v.tf * 1000 < (SELECT n FROM tot)
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_rare
        FROM w JOIN v USING (tok)
        GROUP BY w.doc_id ORDER BY w.doc_id"""),
      build = (s, d) => {
        val w = Tables.documents(s, d)
          .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("tok"))
        val v = vocabFrame(s, d).select("tok", "tf")
        val total = v.agg(sum(col("tf")).as("n"))
        w.join(broadcast(v), "tok")
          .crossJoin(broadcast(total))
          .groupBy("doc_id")
          .agg(
            count(lit(1)).as("n_toks"),
            sum(col("tf")).cast("bigint").as("sum_tf"),
            round(sum(col("tf")) * 1.0 / count(lit(1)), 6).as("mean_tf"),
            min(col("tf")).as("min_tf"),
            sum(when(col("tf") * 1000 < col("n"), 1).otherwise(0))
              .cast("bigint").as("n_rare"))
          .orderBy("doc_id")
      }),

    // BM25 keyword extraction: the classic retrieval score repurposed the
    // way curation pipelines use it — surface each document's top-k most
    // characteristic terms (tf saturated by k1=1.2, length-normalized by
    // b=0.75 against the corpus mean). The idf factor stays the RAW ratio
    // (N - df + 0.5)/(df + 0.5) rather than its logarithm: ln is monotone,
    // so per-document ranking is identical, and the score stays a pure
    // +,*,/ composition — IEEE-exact in both engines, so the 6dp rounding
    // (applied BEFORE ranking, ties broken on tok) can never diverge.
    // Scale shape: one (doc, tok) aggregation, dl as a doc-partitioned
    // integer window over it (no second corpus pass, no doc-keyed join),
    // the zipfian vocab broadcast back, one bounded per-doc top-k window.
    QueryDef(
      "t10_bm25_keywords",
      covers = "T11 W1 F6 north-star (keyword extraction)",
      oracle = Some("""
        WITH w AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
                   FROM documents),
        wd AS (SELECT doc_id, tok, count(*) AS tfd FROM w GROUP BY doc_id, tok),
        v AS (SELECT tok, count(DISTINCT doc_id) AS df FROM w GROUP BY tok),
        st AS (SELECT (SELECT count(*) FROM documents) AS n_docs,
                      sum(tfd) * 1.0 / (SELECT count(*) FROM documents) AS avgdl
               FROM wd),
        sc AS (SELECT wd.doc_id, wd.tok, wd.tfd,
                 round(((st.n_docs - v.df + 0.5) / (v.df + 0.5)) *
                       ((wd.tfd * 2.2) /
                        (wd.tfd + 1.2 * (0.25 + 0.75 *
                          (sum(wd.tfd) OVER (PARTITION BY wd.doc_id)
                             / st.avgdl)))), 6) AS bm25
               FROM wd JOIN v USING (tok), st),
        ranked AS (SELECT doc_id, tok, tfd, bm25,
                     row_number() OVER (PARTITION BY doc_id
                       ORDER BY bm25 DESC, tok) AS rn
                   FROM sc)
        SELECT doc_id, rn, tok, tfd, bm25 FROM ranked
        WHERE rn <= 5 ORDER BY doc_id, rn"""),
      build = (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val docs = Tables.documents(s, d)
        val w = docs.select(col("doc_id"),
          explode(split(lower(col("text")), " ")).as("tok"))
        // ONE explicit doc-keyed RANGE exchange serves the whole chain:
        // range partitioning on doc_id satisfies the (doc_id, tok)
        // aggregation's clustering (subset rule), the dl window, the top-k
        // window, AND the output order — the planner's default would
        // shuffle hash(doc_id, tok) for the agg, reshuffle hash(doc_id)
        // for the windows, then range-shuffle a third time for the sort
        // (whose boundary sampling would re-run the whole BM25 pipeline).
        // Its own sampling re-runs only the token explode. Per-doc groups
        // are bounded by document length, so doc-keyed partitioning
        // carries no skew risk at any corpus size.
        val wd = w.repartitionByRange(col("doc_id"))
          .groupBy("doc_id", "tok").agg(count(lit(1)).as("tfd"))
        val v = vocabFrame(s, d).select(col("tok"), col("df"))
        val st = wd.agg(sum(col("tfd")).as("sum_dl"))
          .crossJoin(broadcast(docs.agg(count(lit(1)).as("n_docs"))))
          .select(col("n_docs"),
            (col("sum_dl") * 1.0 / col("n_docs")).as("avgdl"))
        val wDoc = Window.partitionBy("doc_id")
        val sc = wd
          .withColumn("dl", sum(col("tfd")).over(wDoc))
          .join(broadcast(v), "tok")
          .crossJoin(broadcast(st))
          .select(col("doc_id"), col("tok"), col("tfd"),
            round(((col("n_docs") - col("df") + lit(0.5)) /
                     (col("df") + lit(0.5))) *
                  ((col("tfd") * lit(2.2)) /
                   (col("tfd") + lit(1.2) * (lit(0.25) + lit(0.75) *
                     (col("dl") / col("avgdl"))))), 6).as("bm25"))
        sc.withColumn("rn", row_number().over(
            Window.partitionBy("doc_id")
              .orderBy(col("bm25").desc, col("tok"))))
          .filter(col("rn") <= 5)
          .select("doc_id", "rn", "tok", "tfd", "bm25")
          .sortWithinPartitions("doc_id", "rn")
      }),

    // ------------------------------------------- bigram-LM quality scoring
    // CCNet/KenLM-style quality filter: train a bigram language model on
    // the held-out high-quality slice (source = 'src0', the same eval-side
    // convention as d08/d11) and score every corpus document by its mean
    // Laplace-smoothed INVERSE conditional bigram probability — low score
    // = in-domain fluent text, high score = out-of-domain/garbled. True
    // perplexity would exponentiate a float log-prob sum; summing floats
    // across rows is banned by the oracle-determinism rules, so the score
    // keeps the SAME ordering signal in pure integer arithmetic: per
    // bigram ipb = ((C(w1) + V) * 1000) div (C(w1 w2) + 1) — the
    // reciprocal of the add-one-smoothed P(w2|w1) in milli-units — and
    // the doc score is the integer mean. Scale shape: the LM count tables
    // are per-corpus artifacts (at 100 TB maintained at ingest next to
    // the vocab index) and broadcast — the corpus side streams once
    // scan-side, explodes bigrams row-locally, probes the broadcast
    // tables, and pays exactly one doc-keyed partial aggregation. No
    // shuffle ever carries a gram string. Reference analog: the quality
    // gate of the corpus curation path (F6,
    // LLMxMapReduce_V2/src/LLM_search.py similarity filtering).
    QueryDef(
      "t14_lm_quality",
      covers = "F6 T17 T18 north-star (LM quality filter)",
      oracle = Some("""
        WITH toks AS (SELECT doc_id, source, string_split(text, ' ') AS t
                      FROM documents),
        uni AS (SELECT w, CAST(count(*) AS BIGINT) AS cw
                FROM (SELECT unnest(t) AS w FROM toks WHERE source = 'src0')
                GROUP BY w),
        v AS (SELECT CAST(count(*) AS BIGINT) AS v FROM uni),
        lm_bg AS (SELECT bg, CAST(count(*) AS BIGINT) AS cbg
                  FROM (SELECT t[i] || ' ' || t[i+1] AS bg
                        FROM toks, unnest(range(1, len(t))) AS u(i)
                        WHERE source = 'src0')
                  GROUP BY bg),
        corpus AS (SELECT doc_id, t[i] AS w1, t[i] || ' ' || t[i+1] AS bg
                   FROM toks, unnest(range(1, len(t))) AS u(i)
                   WHERE source <> 'src0'),
        scored AS (SELECT c.doc_id,
                     ((COALESCE(u.cw, 0) + v.v) * 1000)
                       // (COALESCE(b.cbg, 0) + 1) AS ipb
                   FROM corpus c
                   LEFT JOIN uni u ON u.w = c.w1
                   LEFT JOIN lm_bg b ON b.bg = c.bg
                   CROSS JOIN v)
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
               CAST(sum(ipb) AS BIGINT) // count(*) AS score_milli
        FROM scored GROUP BY doc_id ORDER BY doc_id"""),
      // the RAW (unmemoized) scoring path: t14 is the query that CLAIMS
      // the LM-scoring cost, so its timed run must pay the full bigram
      // explode + model join every pass — through round 8 it read the
      // warmed `lmScoredFrame` checkpoint while its DuckDB oracle scored
      // inline, the exact warm-vs-cold skew the bench design documents
      // itself as preventing (ADVICE r8). p04's gate keeps the memoized
      // frame (the persisted quality-score column a curation pipeline
      // shares), and pays its build at first use per pass.
      build = (s, d) => lmScoredFrameRaw(s, d).orderBy("doc_id"))

,
    // PII scrubbing — the redaction pass every training-corpus pipeline
    // runs before release (the C4/CCNet cleanup family): regex-redact
    // emails, phone numbers, and IPs scan-side and emit the per-source
    // audit (docs touched, matches per class, a content fingerprint of
    // the redacted corpus). The synthetic documents carry no natural PII,
    // so the query INJECTS it deterministically from doc_id first (the
    // media family's synthesize-then-operate posture, m01-m06) — both
    // engines inject identically, so redaction and audit are
    // oracle-checked end to end. Scale shape: injection, three
    // regexp_replaces, and three counts are one codegen projection in the
    // scan stage; only (source, 5 ints, 1 hash) rows reach the shuffle.
    // The fingerprint is bit_xor of per-doc md5-prefix hashes —
    // order-independent and overflow-free (STATE sketch invariant).
    QueryDef(
      "t15_pii_scrub",
      covers = "F6 T8 T17 north-star (PII redaction)",
      oracle = Some("""
        WITH inj AS (
          SELECT doc_id, source, text
            || CASE WHEN doc_id % 7 = 0 THEN ' contact user'
                 || doc_id::VARCHAR || '@example.com' ELSE '' END
            || CASE WHEN doc_id % 11 = 0 THEN ' call 555-'
                 || lpad(((doc_id * 37) % 10000)::VARCHAR, 4, '0') ELSE '' END
            || CASE WHEN doc_id % 13 = 0 THEN ' from 10.'
                 || (doc_id % 256)::VARCHAR || '.'
                 || ((doc_id * 7) % 256)::VARCHAR || '.'
                 || ((doc_id * 13) % 256)::VARCHAR ELSE '' END AS t
          FROM documents),
        cnt AS (
          SELECT doc_id, source,
            len(regexp_extract_all(t, '[a-z0-9]+@[a-z0-9]+\.[a-z]+')) AS ne,
            len(regexp_extract_all(t, '555-[0-9]{4}')) AS np,
            len(regexp_extract_all(t, '10\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}')) AS ni,
            regexp_replace(regexp_replace(regexp_replace(t,
              '[a-z0-9]+@[a-z0-9]+\.[a-z]+', '<EMAIL>', 'g'),
              '555-[0-9]{4}', '<PHONE>', 'g'),
              '10\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}', '<IP>', 'g') AS red
          FROM inj)
        SELECT source, count(*) AS n_docs,
               CAST(sum(ne) AS BIGINT) AS n_emails,
               CAST(sum(np) AS BIGINT) AS n_phones,
               CAST(sum(ni) AS BIGINT) AS n_ips,
               CAST(sum(CASE WHEN ne + np + ni > 0 THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_pii_docs,
               bit_xor(('0x' || substr(md5(red), 1, 15))::BIGINT)
                 AS fingerprint
        FROM cnt GROUP BY source ORDER BY source"""),
      build = (s, d) =>
        piiScrubbed(Tables.documents(s, d))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum(col("ne")).as("n_emails"),
            sum(col("np")).as("n_phones"),
            sum(col("ni")).as("n_ips"),
            sum(when(col("ne") + col("np") + col("ni") > 0, 1)
              .otherwise(0)).as("n_pii_docs"),
            expr("bit_xor(CAST(conv(substring(md5(red), 1, 15), 16, 10)" +
              " AS BIGINT))").as("fingerprint"))
          .orderBy("source")),

    // Blocklist gating — the C4 badwords filter: drop a document when
    // blocklisted terms exceed a token-rate threshold, keep the rest, and
    // emit the per-source gate audit. The list rides the regex (compiled
    // once, codegen'd scan-side — for the 100 TB list form the same gate
    // probes a broadcast set; this face pins the small-list fast path).
    // Rates are integer milli-units (STATE invariant: no cross-row float
    // state); 'crash' never occurs in the corpus, pinning the zero-hit
    // path alongside the live terms.
    QueryDef(
      "t16_blocklist_gate",
      covers = "F1 F6 T17 north-star (blocklist gate)",
      oracle = Some("""
        WITH c AS (
          SELECT source,
            len(regexp_extract_all(text, '\b(slow|big|crash)\b')) AS hits,
            len(string_split(text, ' ')) AS n_tok
          FROM documents),
        g AS (SELECT source, hits, n_tok,
                     (hits * 1000) // n_tok AS rate_milli FROM c)
        SELECT source, count(*) AS n_docs,
               CAST(sum(CASE WHEN rate_milli >= 60 THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_dropped,
               CAST(sum(CASE WHEN rate_milli < 60 THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_kept,
               CAST(sum(hits) AS BIGINT) AS n_hits,
               CAST(max(rate_milli) AS BIGINT) AS max_rate_milli
        FROM g GROUP BY source ORDER BY source"""),
      build = (s, d) => {
        val hitRe = "\\b(slow|big|crash)\\b"
        Tables.documents(s, d)
          .select(col("source"),
            regexp_count(col("text"), lit(hitRe)).as("hits"),
            size(split(col("text"), " ")).as("n_tok"))
          .withColumn("rate_milli", expr("(hits * 1000) div n_tok"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("rate_milli") >= 60, 1).otherwise(0)).as("n_dropped"),
            sum(when(col("rate_milli") < 60, 1).otherwise(0)).as("n_kept"),
            sum(col("hits")).as("n_hits"),
            max(col("rate_milli")).cast("long").as("max_rate_milli"))
          .orderBy("source")
      })
  )

  /** t15's per-row injection + detection + redaction as one codegen
    * projection over any (doc_id, source, text) frame — shared by the
    * batch audit (t15) and the streaming ingest gate (t15s) so the two
    * faces cannot drift. Returns (doc_id, source, ne, np, ni, red). */
  private[graft] def piiScrubbed(
      docs: org.apache.spark.sql.DataFrame)
    : org.apache.spark.sql.DataFrame = {
    val emailRe = "[a-z0-9]+@[a-z0-9]+\\.[a-z]+"
    val phoneRe = "555-[0-9]{4}"
    val ipRe    = "10\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"
    def tag(cond: org.apache.spark.sql.Column,
            parts: org.apache.spark.sql.Column*) =
      when(cond, concat(parts: _*)).otherwise(lit(""))
    val injected = concat(col("text"),
      tag(col("doc_id") % 7 === 0, lit(" contact user"),
        col("doc_id").cast("string"), lit("@example.com")),
      tag(col("doc_id") % 11 === 0, lit(" call 555-"),
        lpad((col("doc_id") * 37 % 10000).cast("string"), 4, "0")),
      tag(col("doc_id") % 13 === 0, lit(" from 10."),
        (col("doc_id") % 256).cast("string"), lit("."),
        (col("doc_id") * 7 % 256).cast("string"), lit("."),
        (col("doc_id") * 13 % 256).cast("string")))
    docs
      .select(col("doc_id"), col("source"), injected.as("t"))
      .select(col("doc_id"), col("source"),
        regexp_count(col("t"), lit(emailRe)).as("ne"),
        regexp_count(col("t"), lit(phoneRe)).as("np"),
        regexp_count(col("t"), lit(ipRe)).as("ni"),
        regexp_replace(regexp_replace(regexp_replace(col("t"),
          lit(emailRe), lit("<EMAIL>")),
          lit(phoneRe), lit("<PHONE>")),
          lit(ipRe), lit("<IP>")).as("red"))
  }

  /** t14's scored frame (doc_id, n_bigrams, score_milli) unordered —
    * shared with the p04 composition pipeline's quality gate. */
  private[graft] def lmScoredFrame(
      s: org.apache.spark.sql.SparkSession, d: String)
    : org.apache.spark.sql.DataFrame =
    // memoized: t14 and p04's gate both consume the same per-doc scores,
    // and the corpus bigram explode is the expensive half of each — the
    // persisted quality-score column a curation pipeline writes once
    ResultMemo.materialized("lm_scored", s, d)(lmScoredFrameRaw(s, d))

  private def lmScoredFrameRaw(
      s: org.apache.spark.sql.SparkSession, d: String)
    : org.apache.spark.sql.DataFrame = {
    val base = Tables.documents(s, d)
      .select(col("doc_id"), col("source"),
        split(col("text"), " ").as("t"))
    // (w1, bigram) pairs positionally, exploded row-locally. The
    // size >= 2 guard is load-bearing: sequence(1, 0) is a DESCENDING
    // ramp, not empty (STATE invariant).
    def bigramRows(df: org.apache.spark.sql.DataFrame) = df
      .filter(size(col("t")) >= 2)
      .select(col("doc_id"), col("source"),
        explode(transform(sequence(lit(1), size(col("t")) - 1),
          i => struct(
            element_at(col("t"), i).as("w1"),
            concat(element_at(col("t"), i), lit(" "),
              element_at(col("t"), i + 1)).as("bg")))).as("p"))
      .select(col("doc_id"), col("source"), col("p.w1"), col("p.bg"))
    val uni = base.filter(col("source") === "src0")
      .select(explode(col("t")).as("w1"))
      .groupBy("w1").agg(count(lit(1)).as("cw"))
    val vocab = uni.agg(count(lit(1)).as("v"))
    val bgCounts = bigramRows(base.filter(col("source") === "src0"))
      .groupBy("bg").agg(count(lit(1)).as("cbg"))
    bigramRows(base.filter(col("source") =!= "src0"))
      .join(broadcast(uni), Seq("w1"), "left")
      .join(broadcast(bgCounts), Seq("bg"), "left")
      .crossJoin(broadcast(vocab))
      .select(col("doc_id"),
        expr("((coalesce(cw, 0) + v) * 1000) div (coalesce(cbg, 0) + 1)")
          .as("ipb"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum(col("ipb")).as("s"))
      .select(col("doc_id"), col("n_bigrams"),
        expr("s div n_bigrams").as("score_milli"))
  }
}
