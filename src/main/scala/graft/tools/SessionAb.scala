package graft.tools

import graft._

/** A/B harness for the streaming sessionization variants (VERDICT r9 #4):
  * q28s's native `session_window` aggregate (complete mode — the oracle
  * twin) vs the custom-state `Streams.sessionUpdates`
  * (flatMapGroupsWithState, update mode — partial results per trigger),
  * optionally under a different state-store provider.
  *
  * q28s is the suite's state-volume outlier at a 100×-scaled corpus
  * (~30 s: state ∝ active users, and complete mode re-materializes the
  * whole result per trigger); this tool measures which form a deployment
  * should run at that scale, interleaved A-B-A-B in one session so draws
  * stay comparable.
  *
  *   sbt "runMain graft.tools.SessionAb target/sf10 2"
  *   SPARK_GRAFT_CONF="spark.sql.streaming.stateStore.providerClass=\
  *     org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider" \
  *   sbt "runMain graft.tools.SessionAb target/sf10 2"
  */
object SessionAb {
  def main(args: Array[String]): Unit = {
    val d    = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 2

    val b = GraftSession.builder("session-ab", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    // generic lever, as in ConfExperiment: SPARK_GRAFT_CONF="k=v;k2=v2"
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(";").filter(_.contains("="))
      .foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        b.config(k.trim, v.trim)
      })
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val provider = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass").getOrElse("default(HDFS)")
    println(s"[ab] provider=$provider sf=$d reps=$reps")

    Tables.events(spark, d).count() // footer warm-up

    def time(tag: String, rep: Int)(run: String => Unit): Double = {
      val name = s"ab_${tag}_$rep"
      val t0 = System.nanoTime()
      run(name)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[ab] rep$rep $tag%-16s $sec%7.3f s")
      sec
    }
    val best = scala.collection.mutable.Map.empty[String, Double]
    (0 until reps).foreach { r =>
      // interleave the variants within each rep (the house A/B discipline)
      val a = time("native_complete", r) { n =>
        streaming.Streams.runToMemory(
          streaming.Streams.sessionCounts(
            streaming.Streams.eventsStream(spark, d)), n).count(): Unit
      }
      val u = time("updates_custom", r) { n =>
        streaming.Streams.runToMemory(
          streaming.Streams.sessionUpdates(
            streaming.Streams.eventsStream(spark, d)), n,
          mode = "update").count(): Unit
      }
      Seq("native_complete" -> a, "updates_custom" -> u).foreach {
        case (k, v) => if (v < best.getOrElse(k, Double.MaxValue)) best(k) = v
      }
    }
    println(best.toSeq.sortBy(_._1)
      .map { case (k, v) => f""""$k":$v%.3f""" }
      .mkString(s"""{"sf":"$d","provider":"$provider",""", ",", "}"))
    spark.stop()
  }
}
