package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-mix construction over `documents`: per-source quota sampling and
  * token-budget shard packing — the two operations that turn a cleaned
  * corpus into an actual training mixture (mix weights per source, then
  * fixed-budget shards for the loader). North-star additions beyond the
  * reference's own surface (its pipelines stop at cleaned documents).
  *
  * Scale design: both are one window shuffle keyed by `source`; the shard
  * manifest reuses that partitioning for its aggregation (no second
  * exchange). Sampling keys are multiplicative hashes of doc_id —
  * partition-layout-independent (same posture as q18/the refine loop: never
  * rand(), which seeds per partition), and cross-engine reproducible, so
  * both queries hash-match DuckDB.
  */
object Mix {

  /** Deterministic 8-way reader/loader assignment (x06 and its streaming
    * twin x06s): md5-derived so any engine reproduces it, never rand(). */
  private[graft] def readerCol(docId: org.apache.spark.sql.Column)
    : org.apache.spark.sql.Column =
    (conv(substring(md5(concat(lit("p|"), docId.cast("string"))
      .cast("binary")), 1, 8), 16, 10).cast("long") % 8).cast("int")

  /** Materialize the shard layout x02 plans: write the corpus partitioned
    * by (source, shard) and return the manifest of what was actually
    * written (read back from the layout). The sink-side twin of
    * `x02_shard_manifest` — a loader consumes the shard directories and
    * the manifest is their index. Same one `source`-keyed window shuffle
    * as x02, then a partitioned write; at 100 TB each (source, shard)
    * directory is a bounded-token unit a loader can fetch independently. */
  def writeShards(
      s: org.apache.spark.sql.SparkSession,
      d: String,
      out: String,
      budget: Int = 512): org.apache.spark.sql.DataFrame = {
    val w = Window.partitionBy("source").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.documents(s, d)
      .select(col("source"), col("doc_id"), col("text"),
        size(split(col("text"), " ")).as("tokens"))
      .withColumn("shard",
        floor(sum(col("tokens")).over(w).cast("double") / budget.toDouble)
          .cast("bigint"))
      .write.mode("overwrite").partitionBy("source", "shard").parquet(out)
    s.read.parquet(out)
      // partition-dir values read back type-inferred (int) — restore bigint
      .withColumn("shard", col("shard").cast("bigint"))
      .groupBy("source", "shard")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("tokens")).cast("bigint").as("total_tokens"))
  }

  def defs: Seq[QueryDef] = Seq(
    // --------------------------------------------------------------- X-mix 1
    // Per-source quota sample (A-Res weighted by document length): keep the
    // `quota` highest A-Res keys per source, where the uniform draw is a
    // multiplicative hash of doc_id. This IS the mix-weighting step of a
    // training-data pipeline: quotas per source, biased toward long docs,
    // deterministic under any cluster shape.
    QueryDef(
      "x01_quota_sample",
      covers = "W6 W5 mix north-star",
      oracle = Some("""
        SELECT source, rn, doc_id, n_chars FROM (
          SELECT source, doc_id, n_chars,
                 ROW_NUMBER() OVER (PARTITION BY source ORDER BY
                   pow(((doc_id * 2654435761) % 4294967296) / 4294967296.0,
                       1.0 / n_chars) DESC, doc_id) AS rn
          FROM documents)
        WHERE rn <= 10 ORDER BY source, rn"""),
      build = (s, d) => {
        val u = (col("doc_id") * lit(2654435761L)) % lit(4294967296L) /
          lit(4294967296.0)
        val w = Window.partitionBy("source")
          .orderBy(col("ares").desc, col("doc_id"))
        Tables.documents(s, d)
          .withColumn("ares", pow(u, lit(1.0) / col("n_chars")))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 10)
          .select("source", "rn", "doc_id", "n_chars")
          .orderBy("source", "rn")
      }),

    // --------------------------------------------------------------- X-mix 3
    // Deterministic train/val/test split assignment: the split is a pure
    // function of doc_id (multiplicative hash → 80/10/10 thresholds), so
    // membership is stable across runs, cluster shapes, and re-ingests —
    // a row never migrates between splits when the corpus around it
    // changes. Zero shuffle for the assignment itself; the report is one
    // groupBy.
    QueryDef(
      "x03_split_assign",
      covers = "W6 mix north-star",
      oracle = Some("""
        SELECT source, split, count(*) AS n_docs, min(doc_id) AS min_doc
        FROM (
          SELECT source, doc_id,
                 CASE WHEN u < 0.8 THEN 'train'
                      WHEN u < 0.9 THEN 'val' ELSE 'test' END AS split
          FROM (SELECT source, doc_id,
                       ((doc_id * 2654435761) % 4294967296) / 4294967296.0 AS u
                FROM documents))
        GROUP BY source, split ORDER BY source, split"""),
      build = (s, d) => {
        val u = (col("doc_id") * lit(2654435761L)) % lit(4294967296L) /
          lit(4294967296.0)
        Tables.documents(s, d)
          .withColumn("split",
            when(u < 0.8, lit("train"))
              .when(u < 0.9, lit("val"))
              .otherwise(lit("test")))
          .groupBy("source", "split")
          .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("min_doc"))
          .orderBy("source", "split")
      }),

    // --------------------------------------------------------------- X-mix 4
    // Temperature-scaled mix weights (the multinomial sampling weights of
    // multilingual/multi-source training: p_s ∝ n_s^α, α < 1 upweights
    // small sources): per-source counts, then a global normalization. The
    // global sum is a single scalar — at 100 TB this is one tiny
    // all-to-one aggregate over |sources| rows, not over documents.
    QueryDef(
      "x04_mix_weights",
      covers = "A10 mix north-star",
      oracle = Some("""
        SELECT source, n_docs,
               round(pow(n_docs, 0.7) /
                     sum(pow(n_docs, 0.7)) OVER (), 6) AS p_sample
        FROM (SELECT source, count(*) AS n_docs FROM documents GROUP BY source)
        ORDER BY source"""),
      build = (s, d) => {
        // the normalizer rides a broadcast 1-row aggregate, not a
        // WindowExec that would drag the frame to a single partition —
        // same values, Exchange-free shape
        val c = Tables.documents(s, d)
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"))
        val z = c.agg(sum(pow(col("n_docs"), lit(0.7))).as("z"))
        c.crossJoin(broadcast(z))
          .select(col("source"), col("n_docs"),
            round(pow(col("n_docs"), lit(0.7)) / col("z"), 6).as("p_sample"))
          .orderBy("source")
      }),

    // --------------------------------------------------------------- X-mix 2
    // Token-budget shard manifest: greedy running-sum packing (the q04/W7
    // pattern generalized from lineitem bins to corpus shards) of each
    // source's documents into ~512-token shards, emitting the manifest a
    // loader consumes: doc count, token total, and the doc_id span per
    // shard. The window and the groupBy share the `source` hash
    // partitioning — one exchange end-to-end.
    QueryDef(
      "x02_shard_manifest",
      covers = "W7 A2 mix north-star",
      oracle = Some("""
        SELECT source, shard, count(*) AS n_docs,
               CAST(sum(tokens) AS BIGINT) AS total_tokens,
               min(doc_id) AS first_doc, max(doc_id) AS last_doc
        FROM (
          SELECT source, doc_id, tokens,
                 CAST(floor(CAST(sum(tokens) OVER (PARTITION BY source
                        ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                      AS DOUBLE) / 512.0) AS BIGINT) AS shard
          FROM (SELECT source, doc_id,
                       len(string_split(text, ' ')) AS tokens
                FROM documents))
        GROUP BY source, shard ORDER BY source, shard"""),
      build = (s, d) => {
        val w = Window.partitionBy("source").orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.documents(s, d)
          .select(col("source"), col("doc_id"),
            size(split(col("text"), " ")).as("tokens"))
          .withColumn("shard",
            floor(sum(col("tokens")).over(w).cast("double") / 512.0)
              .cast("bigint"))
          .groupBy("source", "shard")
          .agg(count(lit(1)).as("n_docs"),
            sum(col("tokens")).cast("bigint").as("total_tokens"),
            min(col("doc_id")).as("first_doc"),
            max(col("doc_id")).as("last_doc"))
          .orderBy("source", "shard")
      }),

    // Epoch-deterministic loader ordering: each epoch assigns every doc to
    // one of 8 readers and a position within that reader — a fresh global
    // permutation per epoch with NO global sort: reader assignment and
    // order keys are md5 hashes of (epoch, doc_id), so the only exchange
    // is the (epoch, reader)-keyed window. At scale readers map to loader
    // workers, each consuming its own hash-ordered shard; re-running an
    // epoch reproduces its exact order (the property that makes training
    // runs resumable and elastic).
    QueryDef(
      "x05_epoch_order",
      covers = "W6 W8 mix north-star",
      oracle = Some("""
        WITH e AS (SELECT doc_id, u.epoch FROM documents,
                   unnest([0, 1]) AS u(epoch)),
        k AS (SELECT epoch, doc_id,
                CAST(('0x' || substr(md5('r|' || epoch::VARCHAR || '|' ||
                        doc_id::VARCHAR), 1, 8))::UBIGINT % 8 AS INT) AS reader,
                md5('o|' || epoch::VARCHAR || '|' || doc_id::VARCHAR) AS ok
              FROM e)
        SELECT epoch, reader,
               row_number() OVER (PARTITION BY epoch, reader
                                  ORDER BY ok, doc_id) AS seq,
               doc_id
        FROM k ORDER BY epoch, reader, seq"""),
      build = (s, d) => {
        def key(tag: String) = md5(concat_ws("|", lit(tag),
          col("epoch").cast("string"), col("doc_id").cast("string"))
          .cast("binary"))
        val k = Tables.documents(s, d)
          .select(col("doc_id"), explode(array(lit(0), lit(1))).as("epoch"))
          .select(col("epoch"), col("doc_id"),
            (conv(substring(key("r"), 1, 8), 16, 10).cast("long") % 8)
              .cast("int").as("reader"),
            key("o").as("ok"))
        val w = Window.partitionBy("epoch", "reader")
          .orderBy(col("ok"), col("doc_id"))
        k.select(col("epoch"), col("reader"),
            row_number().over(w).as("seq"), col("doc_id"))
          .orderBy("epoch", "reader", "seq")
      }),

    // --------------------------------------------------------------- X-mix 7
    // Temperature-scaled RESAMPLING (materializing the mix x04 only weighs):
    // each source's target row count is floor(N · p_s) with p_s ∝ n_s^0.7,
    // met by repeating every doc `target div n` times plus a hash-threshold
    // fractional epoch — doc_id's 40-bit md5 value against an integer
    // threshold ⌊(target mod n) · 2^40 / n⌋. Selection is a pure per-row
    // function (no per-source rank window, so no skew when one source is
    // 100× another); the only aggregates are the |sources|-row weight table
    // and the per-source audit counts this query emits.
    QueryDef(
      "x07_temperature_sample",
      covers = "W6 A10 mix north-star",
      oracle = Some("""
        WITH c AS (SELECT source, count(*) AS n_docs FROM documents
                   GROUP BY source),
        w AS (SELECT source, n_docs,
                round(pow(n_docs, 0.7) /
                      sum(pow(n_docs, 0.7)) OVER (), 6) AS p_sample,
                sum(n_docs) OVER () AS n_total
              FROM c),
        t AS (SELECT source, n_docs, p_sample,
                CAST(floor(n_total * p_sample) AS BIGINT) AS target
              FROM w),
        t2 AS (SELECT source, n_docs, p_sample, target,
                 target // n_docs AS repeat_full,
                 CAST(floor((target % n_docs) * 1099511627776.0 / n_docs)
                   AS BIGINT) AS thr
               FROM t),
        sel AS (SELECT d.source,
                  CASE WHEN ('0x' || substr(md5('x7|' || d.doc_id::VARCHAR),
                              1, 10))::BIGINT < t2.thr
                       THEN 1 ELSE 0 END AS picked
                FROM documents d JOIN t2 ON d.source = t2.source),
        f AS (SELECT source, CAST(sum(picked) AS BIGINT) AS n_frac
              FROM sel GROUP BY source)
        SELECT t2.source, t2.n_docs, t2.p_sample, t2.target, t2.repeat_full,
               f.n_frac, t2.repeat_full * t2.n_docs + f.n_frac AS n_emitted
        FROM t2 JOIN f ON t2.source = f.source
        ORDER BY t2.source"""),
      build = (s, d) => {
        val docs = Tables.documents(s, d)
        val c = docs.groupBy("source").agg(count(lit(1)).as("n_docs"))
        // normalizer + corpus size ride one broadcast 1-row aggregate (no
        // single-partition WindowExec)
        val z = c.agg(sum(pow(col("n_docs"), lit(0.7))).as("z"),
          sum(col("n_docs")).as("n_total"))
        val t = c.crossJoin(broadcast(z))
          .withColumn("p_sample",
            round(pow(col("n_docs"), lit(0.7)) / col("z"), 6))
          .withColumn("target",
            floor(col("n_total") * col("p_sample")).cast("bigint"))
          .withColumn("repeat_full", expr("target div n_docs"))
          // integer threshold from a double product — exceeds 2^53 only past
          // 2^13 docs/source × 2^40, where IEEE rounding is still identical
          // in both engines (same two doubles, same product)
          .withColumn("thr",
            floor((col("target") % col("n_docs")).cast("double") *
              lit(1099511627776.0) / col("n_docs").cast("double"))
              .cast("bigint"))
        val u40 = conv(substring(md5(concat(lit("x7|"),
          col("doc_id").cast("string")).cast("binary")), 1, 10), 16, 10)
          .cast("long")
        val f = docs.select(col("source"), u40.as("u40"))
          .join(broadcast(t.select("source", "thr")), Seq("source"))
          .groupBy("source")
          .agg(sum(when(col("u40") < col("thr"), 1L).otherwise(0L))
            .cast("bigint").as("n_frac"))
        t.join(f, Seq("source"))
          .select(col("source"), col("n_docs"), col("p_sample"),
            col("target"), col("repeat_full"), col("n_frac"),
            (col("repeat_full") * col("n_docs") + col("n_frac"))
              .as("n_emitted"))
          .orderBy("source")
      }),

    // --------------------------------------------------------------- X-mix 9
    // Hashed-feature importance scoring (the DSIR shape: Xie et al. 2023,
    // "Data Selection for Language Models via Importance Resampling" —
    // score every raw document by how target-like its hashed n-gram
    // distribution is, then keep the highest-importance slice). Tokens hash
    // into 64 md5-derived buckets; the target distribution is the lang='en'
    // slice of the corpus. Bucket log-ratio weights ln(p_tgt/p_src) are
    // add-one smoothed and QUANTIZED to integer milli-units at the 64-row
    // weight table, so the per-document score is an INTEGER dot product —
    // no float ever sums across rows (the oracle-determinism house rule).
    // Scale shape: two 64-row bucket aggregations (map-side combined), the
    // weight table broadcast back over a (doc, bucket) aggregation, then a
    // TakeOrdered top-50 ranked by the t08 broadcast pair-count trick — no
    // global window, no driver loop; the corpus streams once.
    QueryDef(
      "x09_importance_resample",
      covers = "W6 F6 A10 north-star (DSIR importance resampling)",
      oracle = Some("""
        WITH w AS (SELECT doc_id, lang,
                          unnest(string_split(lower(text), ' ')) AS tok
                   FROM documents),
        wb AS (SELECT doc_id, lang,
                 ('0x' || substr(md5('x9|' || tok), 1, 8))::BIGINT % 64 AS b
               FROM w),
        db AS (SELECT doc_id, lang, b, count(*) AS n_b FROM wb
               GROUP BY doc_id, lang, b),
        s_cnt AS (SELECT b, CAST(sum(n_b) AS BIGINT) AS s_n FROM db GROUP BY b),
        t_cnt AS (SELECT b, CAST(sum(n_b) AS BIGINT) AS t_n FROM db
                  WHERE lang = 'en' GROUP BY b),
        tot AS (SELECT CAST(sum(n_b) AS BIGINT) AS s_tot,
                       CAST(sum(CASE WHEN lang = 'en' THEN n_b ELSE 0 END)
                         AS BIGINT) AS t_tot
                FROM db),
        wt AS (SELECT s.b,
                 CAST(round(1000 * ln(
                     ((COALESCE(t.t_n, 0) + 1) * 1.0 / (tot.t_tot + 64)) /
                     ((s.s_n + 1) * 1.0 / (tot.s_tot + 64))))
                   AS BIGINT) AS w_milli
               FROM s_cnt s LEFT JOIN t_cnt t USING (b), tot),
        sc AS (SELECT db.doc_id,
                 CAST(sum(db.n_b * wt.w_milli) AS BIGINT) AS score_milli,
                 CAST(sum(db.n_b) AS BIGINT) AS n_tok
               FROM db JOIN wt USING (b) GROUP BY db.doc_id),
        top AS (SELECT doc_id, score_milli, n_tok FROM sc
                ORDER BY score_milli DESC, doc_id LIMIT 50),
        ranked AS (SELECT a.doc_id, a.score_milli, a.n_tok,
                     1 + (SELECT count(*) FROM top b
                          WHERE b.score_milli > a.score_milli
                             OR (b.score_milli = a.score_milli
                                 AND b.doc_id < a.doc_id)) AS rn
                   FROM top a)
        SELECT r.rn, r.doc_id, d.source, d.lang, r.n_tok, r.score_milli
        FROM ranked r JOIN documents d USING (doc_id)
        ORDER BY r.rn"""),
      build = (s, d) => {
        val docs = Tables.documents(s, d)
        val wb = docs
          .select(col("doc_id"), col("lang"), col("source"),
            explode(split(lower(col("text")), " ")).as("tok"))
          .select(col("doc_id"), col("lang"), col("source"),
            pmod(conv(substring(md5(concat(lit("x9|"), col("tok"))
              .cast("binary")), 1, 8), 16, 10).cast("long"), lit(64)).as("b"))
        // ONE corpus explode feeds everything: the (doc, lang, bucket)
        // aggregation's exchange is shared by all consumers below — the
        // token scan + md5 kernel runs once, and the distribution/weight
        // aggregates read ≤64·|docs| compact rows. Lazy-checkpointed:
        // Catalyst only reuses identical exchanges, and the consumers
        // aggregate db differently — without the cut the token explode +
        // md5 kernel re-runs per consumer (12-scan plan). source/lang ride
        // the key (functionally dependent on doc_id) so the top-50 output
        // needs no second corpus scan.
        val db = wb.groupBy("doc_id", "lang", "source", "b")
          .agg(count(lit(1)).as("n_b"))
          .localCheckpoint(false)
        // Both per-bucket distributions in ONE pass over db (the en slice
        // as a conditional sum), then totals from the 64-row frame itself —
        // one db-wide aggregation instead of three.
        val perB = db.groupBy("b")
          .agg(sum(col("n_b")).cast("long").as("s_n"),
            sum(when(col("lang") === "en", col("n_b")).otherwise(0L))
              .cast("long").as("t_n"))
          .localCheckpoint(false)
        val tots = perB.agg(sum(col("s_n")).cast("long").as("s_tot"),
          sum(col("t_n")).cast("long").as("t_tot"))
        val wt = perB
          .crossJoin(broadcast(tots))
          .select(col("b"),
            round(lit(1000) * log(
              ((col("t_n") + 1) * 1.0 / (col("t_tot") + 64)) /
              ((col("s_n") + 1) * 1.0 / (col("s_tot") + 64))))
              .cast("long").as("w_milli"))
        val sc = db
          .join(broadcast(wt), "b")
          .groupBy("doc_id")
          .agg(sum(col("n_b") * col("w_milli")).cast("long").as("score_milli"),
            sum(col("n_b")).cast("long").as("n_tok"),
            max(col("source")).as("source"), max(col("lang")).as("lang"))
        val top = sc.orderBy(col("score_milli").desc, col("doc_id")).limit(50)
        val before = top.select(col("doc_id").as("id2"),
          col("score_milli").as("sc2"))
        top.join(broadcast(before),
            col("sc2") > col("score_milli") ||
              (col("sc2") === col("score_milli") &&
                col("id2") < col("doc_id")), "left")
          .groupBy("doc_id", "score_milli", "n_tok", "source", "lang")
          .agg((count(col("id2")) + 1).as("rn"))
          .select("rn", "doc_id", "source", "lang", "n_tok", "score_milli")
          .orderBy("rn")
      }),

    // --------------------------------------------------------------- X-mix 6
    // Fixed-length sequence packing (concat-and-chunk): the pretraining
    // loader's actual layout — documents are concatenated in a deterministic
    // stream and cut every L=256 tokens, so a document may STRADDLE sequence
    // boundaries (unlike q04/x02's greedy whole-doc bins). Emits each doc's
    // packing coordinates: which sequence and offset its first and last
    // token land on. Packing runs per (source, reader) stream — the md5
    // reader assignment from x05 — so every window covers one loader
    // worker's slice, never a whole source: the shuffle is (source, reader)-
    // keyed and the cumulative sum stays parallel at any corpus size.
    QueryDef(
      "x06_sequence_pack",
      covers = "W7 W8 mix north-star",
      // NOTE the CAST(sum(...) AS BIGINT): DuckDB widens sum(BIGINT) to
      // HUGEINT (int128). A Python fetchall() still yields exact ints, but
      // an Arrow-path fetch (which Arrow-less int128 forces to double)
      // canonicalizes "0" as "0.000000" — r6's driver-only hash mismatch on
      // this query while every local re-run passed. x02 already casts its
      // sums for the same reason; every oracle output column here is now a
      // plain BIGINT in any DuckDB fetch path.
      oracle = Some("""
        SELECT source, reader, doc_id, doc_tokens,
               (tok_start // 256) AS start_seq, (tok_start % 256) AS start_off,
               (tok_end // 256)   AS end_seq,   (tok_end % 256)   AS end_off
        FROM (
          SELECT source, reader, doc_id, doc_tokens,
                 CAST(sum(doc_tokens) OVER (PARTITION BY source, reader
                     ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   - doc_tokens AS BIGINT) AS tok_start,
                 CAST(sum(doc_tokens) OVER (PARTITION BY source, reader
                     ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   - 1 AS BIGINT) AS tok_end
          FROM (SELECT source, doc_id,
                       CAST(('0x' || substr(md5('p|' || doc_id::VARCHAR),
                         1, 8))::UBIGINT % 8 AS INT) AS reader,
                       CAST(len(string_split(text, ' ')) AS BIGINT)
                         AS doc_tokens
                FROM documents))
        ORDER BY source, reader, doc_id"""),
      build = (s, d) => {
        val reader = readerCol(col("doc_id"))
        val w = Window.partitionBy("source", "reader").orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val cum = sum(col("doc_tokens")).over(w)
        Tables.documents(s, d)
          .select(col("source"), col("doc_id"), reader.as("reader"),
            size(split(col("text"), " ")).cast("bigint").as("doc_tokens"))
          .select(col("source"), col("reader"), col("doc_id"),
            col("doc_tokens"),
            (cum - col("doc_tokens")).as("tok_start"),
            (cum - 1).as("tok_end"))
          .select(col("source"), col("reader"), col("doc_id"),
            col("doc_tokens"),
            expr("tok_start div 256").as("start_seq"),
            (col("tok_start") % 256).as("start_off"),
            expr("tok_end div 256").as("end_seq"),
            (col("tok_end") % 256).as("end_off"))
          .orderBy("source", "reader", "doc_id")
      })
  )
}
