package graft.functions

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.scalatest.funsuite.AnyFunSuite

/** Kernel-level pins for the two-level IVF argmin (IvfProbe's engine —
  * the measured form of d16's documented assignment mitigation). The
  * distributional cost/recall trade is measured by the probe at scale;
  * these pin the invariants that make the index SOUND: exhaustive probing
  * equals the exact kernel, every centroid is reachable, and duplicate
  * coarse vectors can't orphan a list. */
class IvfIndexSpec extends AnyFunSuite {

  private val dim = 8
  private def table(k: Int, seed: Int): CentroidTable = {
    val rnd = new scala.util.Random(seed)
    val cvs = Array.fill(k * dim)(rnd.nextGaussian())
    val ccs = (0 until k).map { i =>
      (0 until dim).map(j => cvs(i * dim + j) * cvs(i * dim + j)).sum
    }.toArray
    CentroidTable.build(Seq((7, cvs, ccs)))
  }
  private def probe(seed: Int): GenericArrayData = {
    val rnd = new scala.util.Random(seed)
    new GenericArrayData(Array.fill(dim)(rnd.nextGaussian()))
  }

  test("every centroid lands in exactly one list; lists are never empty") {
    val t = table(100, 1)
    val idx = IvfIndex.build(t)
    val lists = idx.coarseLists(7)
    assert(lists.length == 10) // ceil(sqrt(100))
    assert(lists.forall(_.nonEmpty)) // each coarse owns at least itself
    val all = lists.flatten.sorted
    assert(all.toSeq == (0 until 100))
  }

  test("exhaustive probing (nprobe = m) equals the exact argmin") {
    val t = table(100, 2)
    val idx = IvfIndex.build(t)
    (0 until 200).foreach { s =>
      val e = probe(1000 + s)
      val exact = ArrayMath.nearestCellIn(7, e, embIsFloat = false, t)
      val ivf = ArrayMath.nearestCellIvf(7, e, embIsFloat = false, idx, 10)
      assert(ivf == exact, s"probe $s")
    }
  }

  test("nprobe = 1 returns a valid cell from the nearest coarse list") {
    val t = table(64, 3)
    val idx = IvfIndex.build(t)
    (0 until 50).foreach { s =>
      val c = ArrayMath.nearestCellIvf(7, probe(2000 + s),
        embIsFloat = false, idx, 1)
      assert(c >= 0 && c < 64)
    }
  }

  test("duplicate coarse vectors: no orphaned list, exhaustive == exact") {
    // all-identical centroids force every coarse vector to be a duplicate
    val cvs = Array.fill(20 * dim)(1.0)
    val ccs = Array.fill(20)(dim.toDouble)
    val t = CentroidTable.build(Seq((7, cvs, ccs)))
    val idx = IvfIndex.build(t)
    assert(idx.coarseLists(7).forall(_.nonEmpty))
    val e = probe(42)
    assert(ArrayMath.nearestCellIvf(7, e, embIsFloat = false, idx, 5) ==
      ArrayMath.nearestCellIn(7, e, embIsFloat = false, t))
  }
}
