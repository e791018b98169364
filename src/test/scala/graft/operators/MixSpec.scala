package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Training-mix construction: quota sampling and shard packing semantics
  * beyond what the sf oracles pin (budget/coverage invariants, plan shape). */
class MixSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("quota sample keeps at most the quota per source, deterministically") {
    val q = Mix.defs.find(_.name == "x01_quota_sample").get
    val out = q.build(spark, dir)
    val perSource = out.groupBy("source").count().collect()
    assert(perSource.nonEmpty)
    assert(perSource.forall(_.getLong(1) <= 10))
    // hashed A-Res keys: a second run is byte-identical (no rand())
    assert(out.collect().toSeq == q.build(spark, dir).collect().toSeq)
  }

  test("shard manifest covers every document exactly once per source") {
    val q = Mix.defs.find(_.name == "x02_shard_manifest").get
    val out = q.build(spark, dir).collect()
    val docTotal = graft.Tables.documents(spark, dir).count()
    assert(out.map(_.getAs[Long]("n_docs")).sum == docTotal)
    // shards are consecutive from 0 within each source (greedy running sum)
    out.groupBy(_.getAs[String]("source")).foreach { case (src, rows) =>
      val shards = rows.map(_.getAs[Long]("shard")).sorted.toSeq
      assert(shards == (0L until shards.length.toLong),
        s"source $src shards not consecutive: $shards")
    }
  }

  test("shard totals respect the greedy budget bound") {
    // greedy running-sum packing: a shard's total can exceed the budget by
    // at most its final document (the one that crossed the boundary), so
    // every shard except a source's last must end at-or-past the budget
    // line while starting under it — equivalently, total_tokens < 512 + the
    // max single-doc token count of that source
    val q = Mix.defs.find(_.name == "x02_shard_manifest").get
    val out = q.build(spark, dir)
    val maxDoc = graft.Tables.documents(spark, dir)
      .select(max(size(split(col("text"), " ")))).head().getInt(0)
    val over = out.filter(col("total_tokens") >= lit(512 + maxDoc)).count()
    assert(over == 0)
  }
}
