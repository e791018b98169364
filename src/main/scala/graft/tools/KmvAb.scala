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
    val reps =
      if (args.length > 1 && args(1) != "check") args(1).toInt else 6
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
            s"shuffleMB=${sb(name).reverse.map(b => f"${b / 1e6}%.2f").mkString(",")}")
        }
      }
    }
    spark.stop()
  }
}
