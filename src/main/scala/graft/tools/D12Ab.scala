package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import java.util.concurrent.atomic.AtomicInteger

/** Interleaved A-B for d12's pre-sort materialization boundary (VERDICT
  * r13 #2: d12 was the only >1 s batch query whose job shape was
  * adjudicated by inspection, not by an A/B of a concrete alternative).
  *
  * Variants (semantics + trade-offs documented at Dedup.d12SpanDedup):
  * head (declared r13 form), ckpt (pre-sort checkpoint of the 5-column
  * output), fused (no base join, bottom range exchange), fused_ckpt.
  *
  * Variants alternate A-B-A-B in one JVM (the measurement-discipline
  * rule: JVM warm-up drift must not masquerade as a variant effect);
  * rep 1 of each is warm-up and excluded. Job counts per rep are printed
  * as the deterministic cost-shape evidence beside the wall-clock.
  *
  * Usage: runMain graft.tools.D12Ab [sfDir] [reps]
  */
object D12Ab {
  def main(args: Array[String]): Unit = {
    val d = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps =
      if (args.length > 1 && args(1) != "check") args(1).toInt else 6
    val spark = graft.GraftSession.get("d12-ab")
    spark.sparkContext.setLogLevel("WARN")

    val jobs = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    })

    // "check" as the reps arg: no timing — assert every variant's rows
    // (including output ORDER, which the oracle gate compares) equal the
    // declared head form's, then exit. Run before trusting any timing.
    if (args.lift(1).contains("check")) {
      val head = graft.operators.Dedup.d12SpanDedup(spark, d, "head")
        .collect().toSeq
      for (v <- Seq("ckpt", "fused", "fused_ckpt")) {
        val rows = graft.operators.Dedup.d12SpanDedup(spark, d, v)
          .collect().toSeq
        val ok = rows == head
        println(s"[d12ab] check $v: rows=${rows.size} head=${head.size} " +
          s"identical_ordered=$ok")
        if (!ok) {
          val bad = rows.zip(head).zipWithIndex.filter { case ((a, b), _) => a != b }
          println(s"[d12ab]   first diffs: ${bad.take(3).map { case ((a, b), i) =>
            s"row $i: $a vs $b" }.mkString(" | ")}")
        }
      }
      spark.stop(); return
    }

    val variants = Seq("head", "ckpt", "fused", "fused_ckpt")
    val acc = scala.collection.mutable.Map.empty[String, List[Double]]
    val jobCounts = scala.collection.mutable.Map.empty[String, List[Int]]
    for (r <- 1 to reps; name <- variants) {
      // Time BUILD + EXECUTE, exactly the bench's boundary (t0 before
      // fn(spark, sfDir)): a lazy localCheckpoint's toRdd under AQE
      // EAGERLY executes the child's stages at frame-construction time —
      // the first draft of this tool built the frame outside the timer
      // and credited ckpt with a 10x phantom win. Fresh frame per rep: a
      // localCheckpoint caches per DataFrame instance, so reusing one
      // would time a block read from rep 2.
      val j0 = jobs.get()
      val t0 = System.nanoTime()
      val df = graft.operators.Dedup.d12SpanDedup(spark, d, name)
      graft.Force(df)
      val sec = (System.nanoTime() - t0) / 1e9
      val nj = jobs.get() - j0
      if (r > 1) {
        acc(name) = sec :: acc.getOrElse(name, Nil)
        jobCounts(name) = nj :: jobCounts.getOrElse(name, Nil)
      }
      // checkpointed blocks die with the frame; make sure nothing lingers
      spark.sqlContext.clearCache()
      if (r == reps)
        println(f"[d12ab] $name%-10s best=${acc(name).min}%.3f s  " +
          f"median=${acc(name).sorted.apply(acc(name).size / 2)}%.3f s  " +
          f"(reps ${acc(name).reverse.map(x => f"$x%.3f").mkString(",")})  " +
          s"jobs=${jobCounts(name).reverse.mkString(",")}")
    }
    spark.stop()
  }
}
