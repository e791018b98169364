package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** IVF quantizer behavior: the sampled coarse centroids used by s04 are
  * partition-layout-independent, and Lloyd refinement (the quality knob on
  * top, `Similarity.lloydRefine`) monotonically improves the quantizer. */
class SimilaritySpec extends SparkTestBase {

  private def embedded = {
    import spark.implicits._
    // 3 well-separated synthetic clusters, 30 vectors, dim 4
    val rows = (0 until 30).map { i =>
      val c = i % 3
      val base = Array(c * 10.0, c * -10.0, c * 5.0, 1.0)
      (i.toLong, base.zipWithIndex.map { case (x, j) =>
        (x + ((i * 31 + j * 7) % 10) / 10.0).toFloat
      }.toSeq)
    }
    rows.toDF("vec_id", "embedding")
  }

  private def sse(df: org.apache.spark.sql.DataFrame,
                  cents: Seq[Seq[Double]]): Double =
    df.select("embedding").collect().map { r =>
      val v = r.getSeq[Float](0).map(_.toDouble)
      cents.map(c => c.zip(v).map { case (a, b) =>
        (a - b) * (a - b) }.sum).min
    }.sum

  test("lloydRefine strictly improves a sampled quantizer on clustered data") {
    val e = embedded
    // deliberately poor init: 3 vectors from the SAME cluster
    val init = e.filter(col("vec_id").isin(0L, 3L, 6L))
      .select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toSeq).toSeq
    val refined = Similarity.lloydRefine(e, init, iters = 5)
    assert(sse(e, refined) < sse(e, init) * 0.5,
      "5 Lloyd passes should at least halve SSE from a degenerate init")
  }

  test("lloydRefine is stable under repartitioning (quantized merges)") {
    val e = embedded
    val init = Seq(
      Seq(0.0, 0.0, 0.0, 0.0),
      Seq(10.0, -10.0, 5.0, 1.0),
      Seq(20.0, -20.0, 10.0, 1.0))
    val a = Similarity.lloydRefine(e.repartition(1), init, iters = 3)
    val b = Similarity.lloydRefine(e.repartition(7), init, iters = 3)
    assert(a == b, "refined centroids must not depend on partition layout")
  }

  test("s07 PQ top-k: well-formed ranks, ordered distances, nonzero recall") {
    val dir = "/root/testdata/sf0.001"
    val pq = ResultMemo.bypass(
      Similarity.defs.find(_.name == "s07_ann_pq_topk").get.build(spark, dir))
      .collect()
    val byQ = pq.groupBy(_.getLong(0))
    assert(byQ.size == 10 && byQ.values.forall(_.length == 5),
      "each of the 10 queries must return exactly k=5 neighbors")
    byQ.values.foreach { rows =>
      val sorted = rows.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).toSeq == (1 to 5),
        "ranks must be 1..k")
      // approximate distances must be non-decreasing in rank
      assert(sorted.map(_.getDouble(3)).sliding(2)
        .forall(p => p.head <= p.last + 1e-9), "adist must increase with rn")
    }
    // sanity: PQ at 64× compression still overlaps the exact top-k
    val exact = ResultMemo.bypass(
      Similarity.defs.find(_.name == "s01_cosine_topk").get.build(spark, dir))
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val hits = pq.map(r => (r.getLong(0), r.getLong(2))).count(exact.contains)
    assert(hits > 0, "PQ top-k should intersect the exact top-k somewhere")
  }
}
