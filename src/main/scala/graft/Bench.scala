package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import java.util.concurrent.atomic.AtomicLong

/** Driver-run benchmark: times every SparkEntry query on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line (driver contract).
  * Alongside wall-clock, reports per-query shuffle bytes (read+write) —
  * the number that actually predicts 100 TB behavior. */
object Bench {

  /** Global shuffle-byte counter; queries run sequentially, so per-query
    * deltas are exact. */
  private final class ShuffleListener extends SparkListener {
    val bytes = new AtomicLong(0L)
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val m = t.taskMetrics
      if (m != null) {
        bytes.addAndGet(m.shuffleReadMetrics.totalBytesRead +
          m.shuffleWriteMetrics.bytesWritten)
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus  = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder("graft-bench", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warm-up outside timed region: JVM/codegen spin-up + parquet footer
    // reads, so per-query numbers measure the queries, not session startup.
    spark.range(1000000L).selectExpr("sum(id)").collect()
    Tables.names.foreach { t =>
      val df = if (t == "events") Tables.events(spark, sfDir)
               else Tables.load(spark, sfDir, t)
      df.count()
    }

    val listener = new ShuffleListener
    spark.sparkContext.addSparkListener(listener)

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val s0 = listener.bytes.get()
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      val sec = (System.nanoTime() - t0) / 1e9
      // listener events are async; give the bus a beat before snapshotting
      Thread.sleep(50L)
      (name, sec, (listener.bytes.get() - s0) / 1e6)
    }
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val sh = results.map { case (k, _, mb) => "\"" + k + "\":" + f"$mb%.2f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
        s""""shuffle_mb":$sh,"sf":"$sfDir"}""")
    spark.stop()
  }
}
