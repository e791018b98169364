package graft.tools

import graft._

/** Adjudicates the bench contention canary ITSELF (round 14): across
  * r13+r14, 25 of 26 in-bench pass canaries read "contended"
  * (0.14-0.52 s vs the ~0.09-0.12 s standalone clean reference) on a box
  * whose host-wide loadavg frequently sits <1 between draws. Two
  * hypotheses the bench artifact cannot separate:
  *
  *   (a) host-level bursts reliably land inside the ~11-minute draws
  *       (the r13 adjudication), or
  *   (b) the canary reads high IN-BENCH for JVM-internal reasons — heap
  *       history from ~130 queries, G1 concurrent phases still running
  *       after the pass boundary's System.gc(), streaming state/listener
  *       background threads — i.e. the clean-draw criterion
  *       (canary ≤~0.15 on every pass) is partially unsatisfiable by
  *       construction and needs recalibration.
  *
  * One JVM, three phases, same probe plan as the bench (verbatim):
  *   fresh      — canary distribution on a just-warmed session;
  *   post-heat  — after a representative heavy slice (batch + streaming)
  *                run exactly like the bench runs queries (Force +
  *                per-query clearCache/gc) and an exact pass-boundary
  *                replica (ResultMemo clear, clearCache, System.gc,
  *                index warm-up);
  *   cooled-60s — after 60 s idle, catching decaying background work.
  *
  * Read: post-heat ≈ fresh on an idle box → the canary is honest and the
  * twelve contended draws were genuinely contended (hypothesis a).
  * post-heat ≫ fresh → pass-2+ canaries self-inflate (hypothesis b);
  * the criterion should read pass-1's canary only, or the canary should
  * move before the boundary work.
  *
  *   sbt "runMain graft.tools.CanaryProbe /root/testdata/sf0.1 10"
  */
object CanaryProbe {
  def main(args: Array[String]): Unit = {
    val d    = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 10
    val spark = GraftSession.builder("canary-probe",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // the bench's probe, verbatim (Bench.scala canaryOnce)
    def canaryOnce(): Double = {
      val t0 = System.nanoTime()
      spark.range(0L, 256000000L, 1L, 32)
        .selectExpr("sum((id * 2654435761) % 1000000007)").collect()
      (System.nanoTime() - t0) / 1e9
    }
    canaryOnce() // codegen warm, like the bench

    def phase(tag: String): Unit = {
      val xs = (1 to reps).map(_ => canaryOnce())
      val s = xs.sorted
      println(f"[canary] $tag%-11s min ${s.head}%.3f med ${s(s.size / 2)}%.3f " +
        f"max ${s.last}%.3f  all " + xs.map(x => f"$x%.3f").mkString(","))
    }

    phase("fresh")

    // suite-heat: heavy batch + streaming slice, run like the bench runs it
    val heavy = Seq("q04_", "d04_", "d13_", "d16_", "d07_", "t10_", "p02_",
      "p03_", "x09_", "q12_", "q26s", "q40s", "d10s")
    val qs = SparkEntry.queries
    heavy.foreach { p =>
      qs.keys.find(_.startsWith(p)).foreach { name =>
        try {
          Force(qs(name)(spark, d))
          spark.sqlContext.clearCache(); System.gc(); Thread.sleep(50L)
        } catch { case e: Throwable =>
          println(s"[canary] heat $name failed: ${e.getClass.getSimpleName}")
        }
      }
    }
    // exact pass-boundary replica (what precedes an in-bench pass-2 canary)
    operators.ResultMemo.clearSession(spark)
    spark.sqlContext.clearCache()
    System.gc()
    Warm.indexes(spark, d, tag = "canary-probe")

    phase("post-heat")
    Thread.sleep(60000L)
    phase("cooled-60s")
    spark.stop()
  }
}
