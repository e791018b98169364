package graft.sources

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

/** Bucketed layout must remove the join-time shuffle: the one-time write
  * shuffle buys every subsequent co-located join. */
class LakeLayoutSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("z-ordered layout localizes a 2-D rectangle filter to fewer files") {
    val events = Tables.events(spark, dir)
      .select(col("user_id"), col("value"), col("event_id"))
    val zPath = "/tmp/graft-test-zorder"
    val basePath = "/tmp/graft-test-zorder-base"
    // baseline: the same rows round-robined across the same file count —
    // every file spans the full value space
    events.repartition(16)
      .write.mode("overwrite").parquet(basePath)
    LakeLayout.writeZOrdered(events, zPath, "user_id", "value", files = 16)
    // a rectangle covering ~1/4 of each dimension
    val stats = events.agg(
      min("user_id"), max("user_id"), min("value"), max("value")).head()
    val (uLo, uHi) = (stats.getLong(0), stats.getLong(1))
    val (vLo, vHi) = (stats.getDouble(2), stats.getDouble(3))
    val pred =
      col("user_id").between(uLo, uLo + (uHi - uLo) / 4) &&
        col("value").between(vLo, vLo + (vHi - vLo) / 4)
    // correctness: both layouts return the same rows
    val zRows = spark.read.parquet(zPath).filter(pred)
      .select("event_id").collect().map(_.getLong(0)).sorted.toSeq
    val bRows = spark.read.parquet(basePath).filter(pred)
      .select("event_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(zRows == bRows && zRows.nonEmpty)
    // skipping: the rectangle's rows concentrate in a fraction of the
    // z-ordered files, but spread across (almost) all round-robin files
    val zTouched = LakeLayout.filesTouched(spark, zPath, pred)
    val bTouched = LakeLayout.filesTouched(spark, basePath, pred)
    assert(zTouched * 2 <= bTouched,
      s"z-order should at least halve files touched: z=$zTouched base=$bTouched")
  }

  test("compaction rewrites many tiny files into few, content-identical") {
    val events = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("value"))
    val tiny = "/tmp/graft-test-compact-in"
    val out  = "/tmp/graft-test-compact-out"
    events.repartition(64).write.mode("overwrite").parquet(tiny)
    val (before, after) = LakeLayout.compact(spark, tiny, out, targetFiles = 4)
    assert(before >= 32, s"fixture should start fragmented, had $before files")
    assert(after <= 4, s"compaction must hit the target, wrote $after files")
    // content is a multiset-identical rewrite
    val a = spark.read.parquet(tiny).select("event_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    val b = spark.read.parquet(out).select("event_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(a == b)
  }

  test("join of co-bucketed tables plans without Exchange") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val docs = Tables.documents(spark, dir)
      val embs = Tables.embeddings(spark, dir)
        .withColumnRenamed("vec_id", "doc_id")
      LakeLayout.writeBucketed(docs, "t_docs_b", "doc_id", 4)
      LakeLayout.writeBucketed(embs, "t_embs_b", "doc_id", 4)

      val joined = LakeLayout.bucketedJoin(spark, "t_docs_b", "t_embs_b", "doc_id")
      val plan = joined.queryExecution.executedPlan.toString()
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        plan.take(1500))
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffles:\n${plan.take(2000)}")
      assert(joined.count() > 0)

      // contrast: the same join on raw (unbucketed) reads DOES shuffle
      val raw = docs.join(embs, "doc_id")
      assert(raw.queryExecution.executedPlan.toString().contains("Exchange"))
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS t_docs_b")
      spark.sql("DROP TABLE IF EXISTS t_embs_b")
    }
  }

  test("dynamic partition pruning reaches the fact scan through a join") {
    import spark.implicits._
    try {
      LakeLayout.writeBucketed(
        Tables.documents(spark, dir), "t_docs_dpp", "doc_id", 2,
        partitionCols = Seq("source"))
      // dim arrives as a TABLE (DPP needs a scan-side dim, not a local
      // relation) carrying a selective filter on the partition key
      Seq(("src0", "keep"), ("src1", "drop"), ("src2", "drop"))
        .toDF("source", "tag")
        .write.mode("overwrite").saveAsTable("t_src_dim")
      val joined = spark.table("t_docs_dpp")
        .join(spark.table("t_src_dim").filter(col("tag") === "keep"), "source")
      val n = joined.count()
      assert(n > 0)
      val plan = joined.queryExecution.executedPlan.toString()
      assert(plan.toLowerCase.contains("dynamicpruning"),
        s"fact scan not dynamically pruned:\n${plan.take(2500)}")
    } finally {
      spark.sql("DROP TABLE IF EXISTS t_docs_dpp")
      spark.sql("DROP TABLE IF EXISTS t_src_dim")
    }
  }

  test("partitioned write prunes partitions on read") {
    try {
      LakeLayout.writeBucketed(
        Tables.documents(spark, dir), "t_docs_p", "doc_id", 2,
        partitionCols = Seq("source"))
      val one = spark.table("t_docs_p").filter(col("source") === "src0")
      val scan = one.queryExecution.executedPlan.toString()
      assert(one.count() > 0)
      // partition filter must land in PartitionFilters, not a row Filter
      assert(scan.contains("PartitionFilters") &&
        scan.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1")
          .contains("src0"),
        scan.take(2000))
    } finally spark.sql("DROP TABLE IF EXISTS t_docs_p")
  }
}
