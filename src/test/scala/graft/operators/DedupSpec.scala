package graft.operators

import graft.SparkTestBase

/** Dedup clustering: min-label propagation must handle shapes deeper than
  * the shallow clusters the sf oracles produce — chains (diameter > 2),
  * bridged stars, and disjoint components. */
class DedupSpec extends SparkTestBase {

  private def components(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    Dedup.connectedComponents(pairs.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  private def componentsMinLabel(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    Dedup.connectedComponentsMinLabel(pairs.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("a chain propagates the min label across its full diameter") {
    // 10-20-30-40-50-60: diameter 5, needs multiple propagation rounds
    val got = components(Seq((10L, 20L), (20L, 30L), (30L, 40L),
      (40L, 50L), (50L, 60L)))
    assert(got == Map(10L -> 10L, 20L -> 10L, 30L -> 10L, 40L -> 10L,
      50L -> 10L, 60L -> 10L))
  }

  test("disjoint clusters keep distinct representatives") {
    val got = components(Seq((1L, 2L), (2L, 3L), (7L, 9L), (9L, 8L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      7L -> 7L, 8L -> 7L, 9L -> 7L))
  }

  test("a bridge node merges two stars into one component") {
    // star A {1,2,3} centered on 1; star B {8,9,10} centered on 8;
    // bridge 3-8 joins them: everything labels to 1
    val got = components(Seq((1L, 2L), (1L, 3L), (8L, 9L), (8L, 10L),
      (3L, 8L)))
    assert(got.values.toSet == Set(1L))
    assert(got.keySet == Set(1L, 2L, 3L, 8L, 9L, 10L))
  }

  test("a 600-node chain converges in logarithmic star rounds") {
    import spark.implicits._
    // worst-case shape for label propagation: one chain of diameter 599.
    // Min-label would need ~600 rounds; the star algorithm's round count
    // must stay logarithmic — this is the observable that justifies it.
    val pairs = (0L until 599L).map(i => (i * 2, i * 2 + 2))
    val (labels, iters) = Dedup.connectedComponentsWithStats(
      pairs.toDF("src", "dst"), maxIters = 32)
    assert(iters <= 15, s"expected O(log) star rounds on a chain, got $iters")
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(got.length == 600 && got.forall(_._2 == 0L),
      "every chain node must label to the minimum")
  }

  test("random graphs agree with a reference union-find (50 seeds)") {
    val rnd = new scala.util.Random(42)
    (1 to 50).foreach { trial =>
      val n = 4 + rnd.nextInt(12)
      val pairs = Seq.fill(2 + rnd.nextInt(10))(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      if (pairs.nonEmpty) {
        // driver-side union-find ground truth
        val parent = scala.collection.mutable.Map.empty[Long, Long]
        def find(x: Long): Long = {
          val p = parent.getOrElseUpdate(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        pairs.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val want = parent.keys.map(k => k -> find(k)).toMap
        val got = components(pairs)
        assert(got == want, s"trial $trial (star), pairs=$pairs")
        // the O(diameter) propagation variant must agree too
        if (trial <= 10) {
          val gotML = componentsMinLabel(pairs)
          assert(gotML == want, s"trial $trial (min-label), pairs=$pairs")
        }
      }
    }
  }
}
