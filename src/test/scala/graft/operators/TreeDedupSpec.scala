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

  test("fused and unfused merge schedules produce identical results") {
    import spark.implicits._
    // random-ish claims with planted dups; fuseLevels=1 replays the classic
    // one-round-per-shuffle schedule, so 1 vs 3 pins fusion invariance
    val rnd = new scala.util.Random(7)
    val claims = Seq.fill(90)(s"fact ${rnd.nextInt(30)} holds").toDF("claim")
    def run(fuse: Int) =
      TreeDedup.run(claims, "claim", new MockInference,
        groupSize = 8, fuseLevels = fuse)
        .collect().map(_.getString(0)).sorted.toSeq
    assert(run(1) == run(3))
  }

  test("single small group needs no halving rounds") {
    import spark.implicits._
    val out = TreeDedup.run(
      Seq("a fact", "A FACT", "other fact").toDF("claim"),
      "claim", new MockInference, groupSize = 300)
      .collect().map(_.getString(0))
    assert(out.length == 2)
  }

  test("halving schedule is ceil(log2(k0)) rounds of theoretical halving") {
    assert(TreeDedup.rounds(0, 300) == Seq((0L, 1L)))
    assert(TreeDedup.rounds(100, 300) == Seq((0L, 1L)))
    assert(TreeDedup.rounds(900, 300) == Seq((0L, 3L), (1L, 2L), (2L, 1L)))
    val r5 = TreeDedup.rounds(1500, 300) // k0=5 -> 3,2,1
    assert(r5.map(_._2) == Seq(5L, 3L, 2L, 1L))
    assert(r5.length - 1 == 3) // == ceil(log2(5))
  }

  test("group assignment is hash-based: no window, no sort in the plan") {
    import spark.implicits._
    val claims = spark.range(100000L)
      .selectExpr("concat('claim ', id % 50000) AS claim")
    val plan = TreeDedup.assignGroups(claims, "claim", 64L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    assert(!plan.contains("Sort"), plan)
    assert(!plan.contains("Exchange"), plan)
  }

  test("100k claims dedup end-to-end without a global window") {
    import spark.implicits._
    // 100k rows, 50k distinct claims after normalization
    val claims = spark.range(100000L)
      .selectExpr("concat('claim ', id % 50000) AS claim")
    val out = TreeDedup.run(claims, "claim", new MockInference,
      groupSize = 5000)
    assert(out.count() == 50000L)
  }
}
