package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerTaskEnd}
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Interleaved A-B for the KMV sketch-construction variant (r14): "window"
  * (r13 form — distinct + salted rank windows) vs "agg" (bounded
  * k-min-distinct TypedImperativeAggregate, functions.KmvTopKAgg) behind
  * q45_kmv_distinct and q46_kmv_set_ops.
  *
  * Methodology is D12Ab's: variants alternate A-B-A-B in ONE JVM, rep 1
  * excluded as warm-up, build+execute timed together at the bench's exact
  * boundary, job counts AND per-rep shuffle bytes printed as deterministic
  * cost-shape evidence (the variant's claim is a §2.3 byte claim, so the
  * shuffle-byte column is the one that must move).
  *
  * "check" mode: assert both variants' rows identical (including order)
  * before trusting any timing.
  *
  * Usage: runMain graft.tools.KmvAb [sfDir] [reps|check]
  */
object KmvAb {
  def main(args: Array[String]): Unit = {
    val d = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val modes = Set("check", "q46", "q46check")
    val reps =
      if (args.length > 1 && !modes(args(1))) args(1).toInt else 6
    // rep 1 is excluded as warm-up, so reps=1 would run all the work and
    // then crash on the empty accumulators (ADVICE r14)
    require(args.lift(1).exists(modes) || reps >= 2,
      "need reps >= 2: rep 1 is warm-up and is never accumulated")
    val spark = graft.GraftSession.get("kmv-ab")
    spark.sparkContext.setLogLevel("WARN")

    val jobs = new AtomicInteger(0)
    val shuffleBytes = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null)
          shuffleBytes.addAndGet(m.shuffleReadMetrics.totalBytesRead +
            m.shuffleWriteMetrics.bytesWritten)
      }
    })

    val queries = Seq[(String, (org.apache.spark.sql.SparkSession, String,
      String) => org.apache.spark.sql.DataFrame)](
      ("q45", graft.operators.Sketches.q45Build(_, _, _)),
      ("q46", graft.operators.Sketches.q46Build(_, _, _)))

    // r15 mode "q46": interleave the exact-union × sketch-source knobs of
    // q46Build (variant fixed to the adjudicated "agg") — the VERDICT r14 #3
    // re-measure. "q46check" asserts all combos row-identical to the r14
    // head (cdist+scan) first. Same methodology: A-B-A-B in one JVM, rep 1
    // warm-up, build+execute timed together, jobs + shuffle deltas printed.
    if (args.lift(1).exists(a => a == "q46" || a == "q46check")) {
      val reps46 = if (args.length > 2) args(2).toInt else 6
      val combos = Seq(
        ("cdist", "scan"), // r14 head
        ("arith", "scan"),
        ("arith", "dc"),
        ("cdist", "dc"))
      def build(c: (String, String)) = graft.operators.Sketches
        .q46Build(spark, d, "agg", exu = c._1, sketchSrc = c._2)
      if (args.lift(1).contains("q46check")) {
        val ref = build(combos.head).collect().toSeq
        combos.tail.foreach { c =>
          val rows = build(c).collect().toSeq
          println(s"[kmvab] q46 check ${c._1}+${c._2}: rows=${rows.size} " +
            s"identical_ordered=${rows == ref}")
        }
        spark.stop(); return
      }
      require(reps46 >= 2, "need reps >= 2: rep 1 is warm-up")
      val acc = scala.collection.mutable.Map.empty[(String, String), List[Double]]
      val jc = scala.collection.mutable.Map.empty[(String, String), List[Int]]
      val sb = scala.collection.mutable.Map.empty[(String, String), List[Long]]
      for (r <- 1 to reps46; c <- combos) {
        val j0 = jobs.get(); val b0 = shuffleBytes.get()
        val t0 = System.nanoTime()
        graft.Force(build(c))
        val sec = (System.nanoTime() - t0) / 1e9
        Thread.sleep(50L)
        if (r > 1) {
          acc(c) = sec :: acc.getOrElse(c, Nil)
          jc(c) = (jobs.get() - j0) :: jc.getOrElse(c, Nil)
          sb(c) = (shuffleBytes.get() - b0) :: sb.getOrElse(c, Nil)
        }
        spark.sqlContext.clearCache()
      }
      combos.foreach { c =>
        val name = s"${c._1}+${c._2}"
        println(f"[kmvab] q46 $name%-11s best=${acc(c).min}%.3f s  " +
          f"median=${acc(c).sorted.apply(acc(c).size / 2)}%.3f s  " +
          f"(reps ${acc(c).reverse.map(x => f"$x%.3f").mkString(",")})  " +
          s"jobs=${jc(c).reverse.mkString(",")}  " +
          s"shuffleRWMB=${sb(c).reverse.map(b => f"${b / 1e6}%.2f").mkString(",")}")
      }
      spark.stop(); return
    }

    if (args.lift(1).contains("check")) {
      for ((qn, fn) <- queries) {
        val head = fn(spark, d, "window").collect().toSeq
        val agg = fn(spark, d, "agg").collect().toSeq
        val ok = agg == head
        println(s"[kmvab] check $qn: window=${head.size} agg=${agg.size} " +
          s"identical_ordered=$ok")
        if (!ok) {
          val bad = agg.zip(head).zipWithIndex
            .filter { case ((a, b), _) => a != b }
          println(s"[kmvab]   first diffs: ${bad.take(3).map {
            case ((a, b), i) => s"row $i: $a vs $b" }.mkString(" | ")}")
        }
      }
      spark.stop(); return
    }

    val variants = Seq("window", "agg")
    for ((qn, fn) <- queries) {
      val acc = scala.collection.mutable.Map.empty[String, List[Double]]
      val jc = scala.collection.mutable.Map.empty[String, List[Int]]
      val sb = scala.collection.mutable.Map.empty[String, List[Long]]
      for (r <- 1 to reps; v <- variants) {
        val j0 = jobs.get(); val b0 = shuffleBytes.get()
        val t0 = System.nanoTime()
        val df = fn(spark, d, v)
        graft.Force(df)
        val sec = (System.nanoTime() - t0) / 1e9
        Thread.sleep(50L) // listener bus drains async
        if (r > 1) {
          acc(v) = sec :: acc.getOrElse(v, Nil)
          jc(v) = (jobs.get() - j0) :: jc.getOrElse(v, Nil)
          sb(v) = (shuffleBytes.get() - b0) :: sb.getOrElse(v, Nil)
        }
        spark.sqlContext.clearCache()
        if (r == reps && v == variants.last) variants.foreach { name =>
          println(f"[kmvab] $qn $name%-7s best=${acc(name).min}%.3f s  " +
            f"median=${acc(name).sorted.apply(acc(name).size / 2)}%.3f s  " +
            f"(reps ${acc(name).reverse.map(x => f"$x%.3f").mkString(",")})  " +
            s"jobs=${jc(name).reverse.mkString(",")}  " +
            // read+write COMBINED (every exchange counts twice): valid for
            // relative A/B deltas, roughly 2× the absolute volume (ADVICE r14)
            s"shuffleRWMB=${sb(name).reverse.map(b => f"${b / 1e6}%.2f").mkString(",")}")
        }
      }
    }
    spark.stop()
  }
}
