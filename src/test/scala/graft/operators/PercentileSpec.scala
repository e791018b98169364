package graft.operators

import graft.SparkTestBase

/** Property pin for Relational.bracketedPercentiles — the q31 engine.
  *
  * The sketch-bracket construction is exact only if the bracket provably
  * contains the interpolation neighbors for EVERY group shape; the
  * dangerous inputs are exactly the ones a TPC-H-shaped oracle run never
  * produces: single-element groups, h = p·(n−1) landing on an integer
  * (frac = 0, v_hi must equal v_lo), heavy duplicate runs straddling the
  * bracket boundaries, and groups smaller than the sketch accuracy where
  * percentile_approx degenerates to exact. Brute-force reference: sort
  * the group, interpolate v[⌊h⌋] + frac·(v[⌈h⌉] − v[⌊h⌋]), round 4 dp —
  * quantile_cont's definition verbatim.
  */
class PercentileSpec extends SparkTestBase {
  import org.apache.spark.sql.functions._

  private def reference(vs: Seq[Double], p: Double): Double = {
    val s = vs.sorted
    val h = p * (s.length - 1)
    val lo = math.floor(h).toInt
    val frac = h - lo
    val hi = if (frac > 0) lo + 1 else lo
    BigDecimal(s(lo) + frac * (s(hi) - s(lo)))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  private def run(groups: Map[String, Seq[Double]], ps: Seq[Double])
      : Map[String, Seq[Double]] = {
    import spark.implicits._
    val df = groups.toSeq
      .flatMap { case (g, vs) => vs.map(v => (g, v)) }
      .toDF("g", "v")
      .repartition(7) // layout-independence: never one tidy partition
    Relational.bracketedPercentiles(df, ps)
      .collect()
      .map(r => r.getString(0) ->
        ps.indices.map(i => r.getDouble(i + 1)).toSeq)
      .toMap
  }

  private val rng = new scala.util.Random(0xC0FFEE)

  test("bracketed percentiles match brute-force interpolation on adversarial shapes") {
    val shapes: Map[String, Seq[Double]] = Map(
      "single"   -> Seq(42.0),
      "pairtie"  -> Seq(7.0, 7.0),
      "alldup"   -> Seq.fill(97)(3.25),
      "intfrac"  -> (1 to 11).map(_.toDouble),      // 0.5*(11-1)=5 exact
      "dupruns"  -> (Seq.fill(40)(1.0) ++ Seq.fill(40)(2.0) ++ Seq.fill(40)(3.0)),
      "skewed"   -> (1 to 200).map(i => math.pow(1.05, i)),
      "negmix"   -> (1 to 50).map(_ => rng.nextGaussian() * 100 - 50),
      "uniform"  -> (1 to 500).map(_ => rng.nextDouble() * 1000),
      "bigdups"  -> (1 to 300).map(_ => (rng.nextInt(5) + 1).toDouble)
    )
    val ps = Seq(0.0, 0.1, 0.5, 0.9, 0.99, 1.0)
    val got = run(shapes, ps)
    shapes.foreach { case (g, vs) =>
      val expect = ps.map(reference(vs, _))
      assert(got(g) === expect, s"group $g: got ${got(g)}, want $expect")
    }
  }

  test("random fuzz: 30 groups of random sizes against brute force") {
    val shapes = (1 to 30).map { i =>
      val n = 1 + rng.nextInt(400)
      // mix continuous and heavily-duplicated value domains
      val vs =
        if (i % 3 == 0) (1 to n).map(_ => (rng.nextInt(7) + 1).toDouble)
        else (1 to n).map(_ => rng.nextDouble() * 10 - 5)
      s"grp$i" -> vs
    }.toMap
    val ps = Seq(0.25, 0.5, 0.75, 0.95)
    val got = run(shapes, ps)
    shapes.foreach { case (g, vs) =>
      val expect = ps.map(reference(vs, _))
      assert(got(g) === expect, s"group $g (n=${vs.size})")
    }
  }
}
