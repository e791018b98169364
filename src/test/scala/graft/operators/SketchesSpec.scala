package graft.operators

import graft.{SparkEntry, SparkTestBase, Tables}
import org.apache.spark.sql.functions._

/** The sketch operators' load-bearing properties:
  *   - the histogram sketch MERGES by integer addition (partial sketches of
  *     any data split combine into the full sketch) — the property that
  *     makes it distributable and streamable;
  *   - CMS error is one-sided (estimate ≥ true count, always);
  *   - quantile estimates are monotone in the quantile level and live
  *     inside the data's [min, max] span.
  */
class SketchesSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("histogram sketch merges by addition across any data split") {
    val full = Sketches.eventHistogram(spark, dir)
    // partial sketches over an arbitrary 2-way split of the same rows,
    // bucketed on the SAME [lo, hi] domain (the deploy-time-fixed grid)
    val ev = Tables.events(spark, dir).select(col("event_id"), col("value"))
      .filter(col("value").isNotNull)
    val bounds = ev.agg(min(col("value")).as("lo"), max(col("value")).as("hi"))
    def sketch(side: org.apache.spark.sql.DataFrame) =
      side.crossJoin(broadcast(bounds))
        .select(least(lit(255L), greatest(lit(0L),
          floor((col("value") - col("lo")) / (col("hi") - col("lo")) * 256)))
          .cast("long").as("bucket"))
        .groupBy("bucket").agg(count(lit(1)).as("cnt"))
    val merged = sketch(ev.filter(col("event_id") % 2 === 0))
      .unionByName(sketch(ev.filter(col("event_id") % 2 === 1)))
      .groupBy("bucket").agg(sum(col("cnt")).as("cnt"))
    assert(merged.exceptAll(full).isEmpty && full.exceptAll(merged).isEmpty)
  }

  test("cms estimate is never below the true count (one-sided error)") {
    val sk = Sketches.cmsSketch(spark, dir)
    val truth = Tables.documents(spark, dir)
      .select(explode(split(lower(col("text")), " ")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("tf"))
    val under = Sketches.cmsEstimate(truth, sk)
      .filter(col("est") < col("tf"))
    assert(under.isEmpty, "CMS must only ever overcount")
  }

  test("q44 overcount column is the est-tf gap and non-negative") {
    val out = SparkEntry.queries("q44_heavy_hitters_cms")(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (tf, est, over) =
        (r.getAs[Long]("tf"), r.getAs[Long]("est"), r.getAs[Long]("overcount"))
      assert(est >= tf && over == est - tf)
    }
  }

  test("q43 quantile estimates are monotone and inside the value span") {
    val rows = SparkEntry.queries("q43_quantile_sketch")(spark, dir).collect()
    assert(rows.map(_.getAs[Int]("pct")).toSeq == Seq(25, 50, 75, 90, 99))
    val ests = rows.map(_.getAs[Double]("est"))
    assert(ests.sliding(2).forall { case Array(a, b) => a <= b })
    val r = Tables.events(spark, dir).filter(col("value").isNotNull)
      .agg(min(col("value")), max(col("value"))).head()
    assert(ests.forall(e => e >= r.getDouble(0) && e <= r.getDouble(1)))
  }

  test("kmv sketches of a 2-way data split merge into the full sketch") {
    val o = Tables.load(spark, dir, "orders")
    def keyed(side: org.apache.spark.sql.DataFrame) =
      side.select(col("o_orderpriority").as("prio"),
        Sketches.kmvHash(col("o_custkey")).as("h"))
    val full = Sketches.kmvSketch(keyed(o)).select("prio", "h", "rk")
    // sketch each half independently, then sketch the union of the two
    // sketches — must equal the full sketch (merge = k smallest of union)
    val a = Sketches.kmvSketch(keyed(o.filter(col("o_orderkey") % 2 === 0)))
    val b = Sketches.kmvSketch(keyed(o.filter(col("o_orderkey") % 2 === 1)))
    val merged = Sketches.kmvSketch(
      a.select("prio", "h").unionByName(b.select("prio", "h")))
      .select("prio", "h", "rk")
    assert(merged.exceptAll(full).isEmpty && full.exceptAll(merged).isEmpty)
  }

  test("kmv estimate lands within 40% of the exact distinct count") {
    val rows = SparkEntry.queries("q45_kmv_distinct")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, est) = (r.getAs[Long]("n_exact"), r.getAs[Double]("est"))
      assert(math.abs(est - n) / n < 0.4, s"est $est vs exact $n")
    }
  }

  test("kmv set ops: union estimate tracks exact, intersection is bounded") {
    val rows = SparkEntry.queries("q46_kmv_set_ops")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nU   = r.getAs[Long]("n_union")
      val eU   = r.getAs[Double]("est_union")
      val eI   = r.getAs[Double]("est_inter")
      val shrd = r.getAs[Long]("n_shared")
      assert(shrd >= 0 && shrd <= 64)
      assert(eI >= 0.0 && eI <= eU + 1e-9,
        s"intersection estimate $eI above union $eU")
      assert(math.abs(eU - nU) / nU < 0.4, s"union est $eU vs exact $nU")
    }
  }

  test("sketch shuffles carry only bounded keys (constant-size aggregates)") {
    // the histogram groupBy must plan a partial -> final aggregate so each
    // task ships at most 256 rows, and CMS at most 3*512 — the property
    // that makes a 100 TB profile a constant-size shuffle
    val p = ResultMemo.bypass(Sketches.eventHistogram(spark, dir))
      .queryExecution.executedPlan.toString()
    assert(p.contains("partial_count") || p.contains("HashAggregate"),
      p.take(1500))
    val c = Sketches.cmsSketch(spark, dir)
      .queryExecution.executedPlan.toString()
    assert(c.contains("HashAggregate"), c.take(1500))
  }
}
