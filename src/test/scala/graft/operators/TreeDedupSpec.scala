package graft.operators

import graft.SparkTestBase
import graft.infer.MockInference

class TreeDedupSpec extends SparkTestBase {

  test("pairwise halving dedup converges to globally unique claims (A9)") {
    import spark.implicits._
    // 120 claims, each duplicated ~3x with case/punct variation; spread so
    // duplicates land in DIFFERENT initial groups (forcing cross-group
    // merges to catch them)
    val base = (0 until 40).map(i => s"claim number $i states fact $i")
    val claims = (base ++ base.map(_.toUpperCase) ++ base.map(_ + "!!"))
      .toDF("claim")
    val out = TreeDedup.run(claims, "claim", new MockInference, groupSize = 16)
      .collect().map(_.getString(0))
    // one representative per underlying fact
    val keys = out.map(_.toLowerCase.replaceAll("[^a-z0-9]+", " ").trim)
    assert(keys.distinct.length == 40, s"got ${out.length}: ${out.take(5).toSeq}")
    assert(out.length == 40)
  }

  test("single small group needs no halving rounds") {
    import spark.implicits._
    val out = TreeDedup.run(
      Seq("a fact", "A FACT", "other fact").toDF("claim"),
      "claim", new MockInference, groupSize = 300)
      .collect().map(_.getString(0))
    assert(out.length == 2)
  }
}
