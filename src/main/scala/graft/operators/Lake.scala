package graft.operators

import graft.{QueryDef, Tables}
import graft.sources.LakeLayout
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed-lake queries: the "pay the shuffle once, at write time" posture
  * for joins that repeat on the same key (SURVEY.md §4; the 100 TB answer to
  * "this join shuffles every run"). The bucketed tables are laid out once
  * per (session, sf dir) and every subsequent join on the bucket key is
  * co-located — no Exchange on either side (plan-asserted in
  * LakeLayoutSpec).
  */
object Lake {

  private val ready =
    scala.collection.concurrent.TrieMap.empty[(Int, String), Boolean]

  /** Lay out documents ⋈ embeddings as co-bucketed tables, once per
    * (session, dir). Table names carry the dir hash so several sf dirs can
    * coexist in one warehouse. */
  private def ensureTables(s: SparkSession, d: String): (String, String) = {
    val tag  = (d.hashCode & Int.MaxValue).toString
    val docs = s"graft_docs_bkt_$tag"
    val embs = s"graft_embs_bkt_$tag"
    ready.getOrElseUpdate((System.identityHashCode(s), d), {
      // a previous JVM's warehouse dir survives while the in-memory catalog
      // does not — clear both, or saveAsTable fails LOCATION_ALREADY_EXISTS
      Seq(docs, embs).foreach { t =>
        s.sql(s"DROP TABLE IF EXISTS $t")
        val p = new org.apache.hadoop.fs.Path(
          s.conf.get("spark.sql.warehouse.dir"), t)
        val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
        if (fs.exists(p)) fs.delete(p, true)
      }
      LakeLayout.writeBucketed(
        Tables.documents(s, d), docs, "doc_id", 8)
      LakeLayout.writeBucketed(
        Tables.embeddings(s, d).withColumnRenamed("vec_id", "doc_id"),
        embs, "doc_id", 8)
      true
    })
    (docs, embs)
  }

  /** Lay the bucketed tables out ahead of time (idempotent per session+dir).
    * Bench calls this in session setup so q35 times the co-located JOIN —
    * the lake's steady state — not the one-time layout write, which ranged
    * 2-5 s run-to-run and drowned the signal it was meant to carry. */
  def warmLayout(s: SparkSession, d: String): Unit = {
    ensureTables(s, d)
    ensureZOrder(s, d)
    ensureCompacted(s, d)
    ()
  }

  private val zReady =
    scala.collection.concurrent.TrieMap.empty[(Int, String), String]

  /** Z-ordered (user_id, value) projection of `events`, written once per
    * (session, dir) — the OPTIMIZE ZORDER pass a lake runs offline so that
    * 2-D range scans prune files (LakeLayoutSpec measures the skipping).
    * Deterministic data → safe to overwrite the same path each session. */
  private def ensureZOrder(s: SparkSession, d: String): String =
    zReady.getOrElseUpdate((System.identityHashCode(s), d), {
      // collision-resistant path tag: two sf dirs with colliding
      // String.hashCode must not overwrite each other's projection
      val tag = org.apache.commons.codec.digest.DigestUtils.md5Hex(d)
      val out = s"${System.getProperty("java.io.tmpdir")}/graft_zorder_$tag"
      LakeLayout.writeZOrdered(
        Tables.events(s, d).select("user_id", "value", "event_id"),
        out, "user_id", "value", files = 16)
      out
    })

  private val compactReady =
    scala.collection.concurrent.TrieMap.empty[(Int, String), (String, Long, Long)]

  /** The OPTIMIZE/compaction pass as a once-per-(session, dir) artifact:
    * fragment documents into 64 tiny files (what a fine-grained streaming
    * sink or over-partitioned ingest leaves behind), then
    * [[LakeLayout.compact]] them to 8 full-size files. Returns
    * (compactedPath, filesBefore, filesAfter) — both counts deterministic
    * by construction (repartition is exact), so q48 can hash-pin them. */
  private def ensureCompacted(
      s: SparkSession, d: String): (String, Long, Long) =
    compactReady.getOrElseUpdate((System.identityHashCode(s), d), {
      val tag  = org.apache.commons.codec.digest.DigestUtils.md5Hex(d)
      val tiny = s"${System.getProperty("java.io.tmpdir")}/graft_tiny_$tag"
      val out  = s"${System.getProperty("java.io.tmpdir")}/graft_compact_$tag"
      Tables.documents(s, d).repartition(64)
        .write.mode("overwrite").parquet(tiny)
      val (before, after) = LakeLayout.compact(s, tiny, out, targetFiles = 8)
      (out, before, after)
    })

  def defs: Seq[QueryDef] = Seq(
    // --------------------------------------------------------------- Q48
    // Small-files compaction surfaced in the correctness gate: the query
    // reads the COMPACTED layout back and reports, per source, the row
    // count, an order-independent 60-bit content fingerprint (bit_xor of
    // md5-derived text hashes), and the measured before/after file counts.
    // The oracle computes the same aggregates off the ORIGINAL table with
    // the file counts as the contract constants (64 fragmented → 8
    // compacted, exact because repartition is exact) — so a compaction
    // that lost/duplicated/corrupted one row, or wrote the wrong file
    // count, hash-mismatches. This is the OPTIMIZE pass streaming sinks
    // and fine partitions need at 100 TB; rewrite work scales with data
    // touched, one round-robin exchange, never in place.
    QueryDef(
      "q48_compaction",
      covers = "engine-complete (lake OPTIMIZE) north-star",
      oracle = Some("""
        SELECT source, CAST(count(*) AS BIGINT) AS n_rows,
               CAST(bit_xor(('0x' || substr(md5(text), 1, 15))::BIGINT)
                 AS BIGINT) AS content_sig,
               CAST(64 AS BIGINT) AS files_before,
               CAST(8 AS BIGINT) AS files_after
        FROM documents GROUP BY source ORDER BY source"""),
      build = (s, d) => {
        val (path, before, after) = ensureCompacted(s, d)
        s.read.parquet(path)
          .groupBy("source")
          .agg(count(lit(1)).as("n_rows"),
            expr("bit_xor(cast(conv(substring(md5(text), 1, 15), 16, 10)" +
              " as long))").as("content_sig"))
          .select(col("source"), col("n_rows"), col("content_sig"),
            lit(before).as("files_before"), lit(after).as("files_after"))
          .orderBy("source")
      }),

    // --------------------------------------------------------------- Q35
    // Co-located join over the bucketed lake: documents ⋈ embeddings on the
    // shared bucket key. First run pays the bucketed write (the amortized
    // shuffle); the join itself plans with no Exchange below it. The oracle
    // is the plain relational equivalent — bucketing must not change
    // results, only the plan.
    QueryDef(
      "q35_bucketed_colocated_join",
      covers = "S9 J1 scale-layout",
      oracle = Some("""
        SELECT d.doc_id, length(d.text) AS text_len,
               len(e.embedding) AS dims, e.label
        FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
        ORDER BY d.doc_id"""),
      build = (s, d) => {
        val (docsT, embsT) = ensureTables(s, d)
        LakeLayout.bucketedJoin(s, docsT, embsT, "doc_id")
          .select(col("doc_id"), length(col("text")).as("text_len"),
            size(col("embedding")).as("dims"), col("label"))
          .orderBy("doc_id")
      }),

    // --------------------------------------------------------------- Q42
    // 2-D rectangle scan over the z-ordered events projection: the layout
    // concentrates the rectangle's rows in a few files, so the scan reads
    // a rectangle, not the table (file skipping measured in
    // LakeLayoutSpec). The oracle is the plain filter over raw events —
    // layout must never change results, only which files a scan touches.
    QueryDef(
      "q42_zorder_scan",
      covers = "S9 scale-layout north-star",
      oracle = Some("""
        SELECT event_id FROM events
        WHERE user_id BETWEEN 0 AND 3 AND value BETWEEN 10 AND 100
        ORDER BY event_id"""),
      build = (s, d) => {
        val path = ensureZOrder(s, d)
        s.read.parquet(path)
          .filter(col("user_id").between(0, 3) &&
            col("value").between(10, 100))
          .select("event_id")
          .orderBy("event_id")
      })
  )
}
