package graft.operators

import graft.{QueryDef, Tables}
import graft.infer.MockInference
import graft.pipeline.{V1Pipeline, V2Pipeline}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pipeline-level queries: the reference's flagship dataflows run end-to-end
  * on mock inference over the testdata, with oracle-checkable outputs.
  */
object Pipelines {

  /** p06's per-source quantile gate: keep each source's lowest-scored
    * (most fluent) `pct`% by the integer-rank-target cut
    * rank ≤ (n·pct + 99) div 100 — selectivity is a fixed fraction at any
    * corpus size, unlike p04's absolute threshold (which measurably
    * starves to 0 rows at a 100×-scaled corpus). One source-keyed window
    * over the compact (doc, score) frame. */
  private[graft] def quantileGate(
      docs: org.apache.spark.sql.DataFrame,
      scored: org.apache.spark.sql.DataFrame,
      pct: Int): org.apache.spark.sql.DataFrame = {
    val gw = Window.partitionBy("source")
    docs
      .join(scored, "doc_id")
      .withColumn("grk", row_number().over(
        gw.orderBy(col("score_milli"), col("doc_id"))))
      .withColumn("gn", count(lit(1)).over(gw))
      .filter(col("grk") <= expr(s"(gn * $pct + 99) div 100"))
      .select("doc_id", "source", "text", "n_chars")
  }

  def defs: Seq[QueryDef] = Seq(
    // V1 chunk→map→filter→collapse→reduce over documents with a passkey
    // planted mid-text: the pipeline must recover `doc-<id>` for every doc.
    // The oracle states exactly that — an end-to-end correctness check of
    // the whole dataflow (SURVEY.md §3.1), not just of one operator.
    QueryDef(
      "p01_v1_qa_pipeline",
      covers = "A1 A2 A3 F1 T2 T4 W7 D5 D10",
      oracle = Some("""
        SELECT doc_id, 'doc-' || CAST(doc_id AS VARCHAR) AS answer
        FROM documents ORDER BY doc_id"""),
      build = (s, d) => {
        val docs = Tables.documents(s, d).select(
          col("doc_id"),
          lit("What is the passkey?").as("question"),
          concat(
            substring(col("text"), 1, 100),
            lit(" ANSWER[doc-"), col("doc_id").cast("string"), lit("] "),
            substring(col("text"), 101, 1000000)).as("text"))
        V1Pipeline.run(docs, new MockInference,
          V1Pipeline.Config(chunkBudget = 32, collapseBudget = 400,
            binBudget = 200))
          .orderBy("doc_id")
      }),

    // V2 survey pipeline end-to-end: one survey per document source (papers
    // capped at 16 — the reference's data_num limit, W5). The mock protocol
    // cites every paper from every leaf, so cite_ratio is exactly 1.0 and
    // n_papers is the capped count — both SQL-expressible, giving the whole
    // encode→group→skeleton→digest→refine→decode dataflow a DuckDB oracle.
    QueryDef(
      "p02_v2_survey_pipeline",
      covers = "S1 S2 S3 F2 X3 A4 A5 A6 J1 J2 A8 W1 W2 W5 W6 D5 D11",
      oracle = Some("""
        SELECT source AS survey_id, least(count(*), 16) AS n_papers,
               CAST(1.0 AS DOUBLE) AS cite_ratio
        FROM documents GROUP BY source ORDER BY survey_id"""),
      build = (s, d) => {
        val w = Window.partitionBy("source").orderBy("doc_id")
        val surveys = Tables.documents(s, d)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 16)
          .select(col("source"),
            struct(
              concat(lit("doc "), col("doc_id").cast("string")).as("title"),
              col("text").as("txt")).as("paper"))
          .groupBy(col("source").as("survey_id"))
          .agg(collect_list(col("paper")).as("papers"))
          .withColumn("title", concat(lit("Survey of "), col("survey_id")))
        V2Pipeline.run(surveys, new MockInference,
          V2Pipeline.Config(nGroups = 2, blockCount = 1, convLayers = 1,
            kernelWidth = 2, poolSize = 3))
          .select("survey_id", "n_papers", "cite_ratio")
          .orderBy("survey_id")
      }),

    // ------------------------------------- end-to-end training-mix pipeline
    // The full curation-to-loader path as ONE dataflow: LM quality gate
    // (t14's broadcast-LM score, keep fluent docs) → exact content dedup
    // (first doc_id per md5) → per-source A-Res quota sample (x01's
    // deterministic weighted draw, quota 15) → per-(source, reader)
    // sequence packing (x06's cursor). This is what the engine exists to
    // do at 100 TB: every stage is either row-local against a broadcast
    // artifact (gate, reader assignment) or one keyed exchange (dedup
    // hash, source quota, pack window) — four shuffles total for the whole
    // pipeline, none carrying more than the surviving rows. The oracle
    // replays all four stages in one SQL chain.
    QueryDef(
      "p04_training_mix_pipeline",
      covers = "D6 F6 X5 W6 W7 W8 mix north-star",
      oracle = Some("""
        WITH toks AS (SELECT doc_id, source, text, n_chars,
                             string_split(text, ' ') AS t
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
                     CAST(sum(((COALESCE(u.cw, 0) + v.v) * 1000)
                       // (COALESCE(b.cbg, 0) + 1)) AS BIGINT)
                       // count(*) AS score_milli
                   FROM corpus c
                   LEFT JOIN uni u ON u.w = c.w1
                   LEFT JOIN lm_bg b ON b.bg = c.bg
                   CROSS JOIN v GROUP BY c.doc_id),
        gated AS (SELECT d.doc_id, d.source, d.text, d.n_chars
                  FROM documents d JOIN scored s USING (doc_id)
                  WHERE s.score_milli < 45000),
        dedup AS (SELECT * FROM (
                    SELECT *, row_number() OVER (PARTITION BY md5(text)
                                                 ORDER BY doc_id) AS rn
                    FROM gated) WHERE rn = 1),
        quota AS (SELECT source, doc_id, text FROM (
                    SELECT source, doc_id, text,
                           row_number() OVER (PARTITION BY source ORDER BY
                             pow(((doc_id * 2654435761) % 4294967296)
                                 / 4294967296.0, 1.0 / n_chars) DESC,
                             doc_id) AS rk
                    FROM dedup) WHERE rk <= 15),
        packed AS (SELECT source, doc_id,
                          CAST(('0x' || substr(md5('p|' || doc_id::VARCHAR),
                            1, 8))::UBIGINT % 8 AS INT) AS reader,
                          CAST(len(string_split(text, ' ')) AS BIGINT)
                            AS doc_tokens
                   FROM quota)
        SELECT source, reader, doc_id, doc_tokens,
               CAST(sum(doc_tokens) OVER (PARTITION BY source, reader
                    ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
                    AND CURRENT ROW) - doc_tokens AS BIGINT) AS tok_start
        FROM packed ORDER BY source, reader, doc_id"""),
      build = (s, d) => {
        val gateIds = TextAnalysis.lmScoredFrame(s, d)
          .filter(col("score_milli") < 45000)
          .select("doc_id")
        val gated = Tables.documents(s, d)
          .join(gateIds, "doc_id")
          .select("doc_id", "source", "text", "n_chars")
        val dedup = gated
          .withColumn("rn", row_number().over(
            Window.partitionBy(md5(col("text").cast("binary")))
              .orderBy("doc_id")))
          .filter(col("rn") === 1)
        val ares = pow(
          (col("doc_id") * lit(2654435761L)) % lit(4294967296L) /
            lit(4294967296.0),
          lit(1.0) / col("n_chars"))
        val quota = dedup
          .withColumn("rk", row_number().over(
            Window.partitionBy("source").orderBy(ares.desc, col("doc_id"))))
          .filter(col("rk") <= 15)
        val w = Window.partitionBy("source", "reader").orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        quota
          .select(col("source"), col("doc_id"),
            Mix.readerCol(col("doc_id")).as("reader"),
            size(split(col("text"), " ")).cast("long").as("doc_tokens"))
          .select(col("source"), col("reader"), col("doc_id"),
            col("doc_tokens"),
            (sum(col("doc_tokens")).over(w) - col("doc_tokens"))
              .as("tok_start"))
          .orderBy("source", "reader", "doc_id")
      }),

    // --------------------------- quantile-gated training-mix pipeline
    // p04 with the PRODUCTION form of its LM quality gate (VERDICT r9 #2):
    // p04 keeps docs under an ABSOLUTE score threshold (reference-shaped,
    // checkable), but an absolute cut starves as the corpus grows — at a
    // 100×-scaled run add-V smoothing dilutes every score past the
    // threshold and the gate passes 0 rows (measured, SCALE.md). A
    // production mix cuts at a per-source score QUANTILE instead: keep
    // each source's most-fluent 60%, a fixed fraction at ANY corpus size.
    // The cut is the integer-rank-target pattern (the house invariant —
    // never a float quantile): rank per source by (score, doc_id) and keep
    // rank ≤ (n·60 + 99) div 100, so both engines agree exactly and the
    // gate's selectivity is scale-invariant by construction. Downstream
    // stages (exact dedup → A-Res quota → sequence packing) are p04's.
    // Scale shape: the gate adds ONE source-keyed window over the compact
    // (doc, score) frame — the same exchange the quota stage already pays.
    QueryDef(
      "p06_quantile_mix_pipeline",
      covers = "D6 F6 X5 W6 W7 W8 mix north-star (quantile gate)",
      oracle = Some("""
        WITH toks AS (SELECT doc_id, source, text, n_chars,
                             string_split(text, ' ') AS t
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
                     CAST(sum(((COALESCE(u.cw, 0) + v.v) * 1000)
                       // (COALESCE(b.cbg, 0) + 1)) AS BIGINT)
                       // count(*) AS score_milli
                   FROM corpus c
                   LEFT JOIN uni u ON u.w = c.w1
                   LEFT JOIN lm_bg b ON b.bg = c.bg
                   CROSS JOIN v GROUP BY c.doc_id),
        gated AS (SELECT doc_id, source, text, n_chars FROM (
                    SELECT d.doc_id, d.source, d.text, d.n_chars,
                           row_number() OVER (PARTITION BY d.source
                             ORDER BY s.score_milli, d.doc_id) AS grk,
                           count(*) OVER (PARTITION BY d.source) AS gn
                    FROM documents d JOIN scored s USING (doc_id))
                  WHERE grk <= (gn * 60 + 99) // 100),
        dedup AS (SELECT * FROM (
                    SELECT *, row_number() OVER (PARTITION BY md5(text)
                                                 ORDER BY doc_id) AS rn
                    FROM gated) WHERE rn = 1),
        quota AS (SELECT source, doc_id, text FROM (
                    SELECT source, doc_id, text,
                           row_number() OVER (PARTITION BY source ORDER BY
                             pow(((doc_id * 2654435761) % 4294967296)
                                 / 4294967296.0, 1.0 / n_chars) DESC,
                             doc_id) AS rk
                    FROM dedup) WHERE rk <= 15),
        packed AS (SELECT source, doc_id,
                          CAST(('0x' || substr(md5('p|' || doc_id::VARCHAR),
                            1, 8))::UBIGINT % 8 AS INT) AS reader,
                          CAST(len(string_split(text, ' ')) AS BIGINT)
                            AS doc_tokens
                   FROM quota)
        SELECT source, reader, doc_id, doc_tokens,
               CAST(sum(doc_tokens) OVER (PARTITION BY source, reader
                    ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
                    AND CURRENT ROW) - doc_tokens AS BIGINT) AS tok_start
        FROM packed ORDER BY source, reader, doc_id"""),
      build = (s, d) => {
        // the memoized score frame is the persisted quality-score column a
        // curation run shares with t14/p04 — same artifact, different cut
        val gated = quantileGate(
          Tables.documents(s, d),
          TextAnalysis.lmScoredFrame(s, d).select("doc_id", "score_milli"),
          pct = 60)
        val dedup = gated
          .withColumn("rn", row_number().over(
            Window.partitionBy(md5(col("text").cast("binary")))
              .orderBy("doc_id")))
          .filter(col("rn") === 1)
        val ares = pow(
          (col("doc_id") * lit(2654435761L)) % lit(4294967296L) /
            lit(4294967296.0),
          lit(1.0) / col("n_chars"))
        val quota = dedup
          .withColumn("rk", row_number().over(
            Window.partitionBy("source").orderBy(ares.desc, col("doc_id"))))
          .filter(col("rk") <= 15)
        val w = Window.partitionBy("source", "reader").orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        quota
          .select(col("source"), col("doc_id"),
            Mix.readerCol(col("doc_id")).as("reader"),
            size(split(col("text"), " ")).cast("long").as("doc_tokens"))
          .select(col("source"), col("reader"), col("doc_id"),
            col("doc_tokens"),
            (sum(col("doc_tokens")).over(w) - col("doc_tokens"))
              .as("tok_start"))
          .orderBy("source", "reader", "doc_id")
      })
  )
}
