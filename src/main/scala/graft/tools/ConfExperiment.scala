package graft.tools

import graft._

/** A/B harness for session-conf levers: runs a query subset twice in one
  * session (2nd run = warm, codegen + memo amortized) and prints per-query
  * warm times plus the total. Compare totals across env-var conf toggles:
  *
  *   SPARK_GRAFT_LOCAL_DIR=/dev/shm/graft_local \
  *   SPARK_GRAFT_AQE=false \
  *   sbt "runMain graft.tools.ConfExperiment sfDir q01,q02,..."
  *
  * Usage: ConfExperiment [sfDir] [names-csv|all] [reps]
  */
object ConfExperiment {
  def main(args: Array[String]): Unit = {
    val d     = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val names =
      if (args.length > 1 && args(1) != "all") args(1).split(",").toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val reps  = if (args.length > 2) args(2).toInt else 2

    val b = GraftSession.builder("conf-exp", "32")
    sys.env.get("SPARK_GRAFT_LOCAL_DIR").foreach(p => b.config("spark.local.dir", p))
    sys.env.get("SPARK_GRAFT_AQE").foreach(v => b.config("spark.sql.adaptive.enabled", v))
    sys.env.get("SPARK_GRAFT_CKPT").foreach(p =>
      b.config("spark.sql.streaming.checkpointLocation", p))
    // generic lever: SPARK_GRAFT_CONF="key=value;key2=value2"
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(";").filter(_.contains("="))
      .foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        b.config(k.trim, v.trim)
      })
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // A query that ERRORS is excluded from EVERY rep's total (ADVICE r7: a
    // conf change that makes queries fail fast must not win the A/B on the
    // strength of its fast failures) — totals from different conf runs stay
    // comparable only over the queries that succeeded everywhere, so the
    // error count is printed next to TOTAL and any nonzero count means the
    // comparison is void for those queries.
    val totals = Array.fill(reps)(0.0)
    var errored = List.empty[String]
    val qs = SparkEntry.queries
    names.foreach { n =>
      val fn = qs(n)
      var last = 0.0
      var failed = false
      val secs = (0 until reps).map { r =>
        val t0 = System.nanoTime()
        try { Force(fn(spark, d)) } catch { case e: Throwable =>
          failed = true
          println(s"[exp] $n ERR ${e.getClass.getSimpleName}") }
        last = (System.nanoTime() - t0) / 1e9
        last
      }
      if (failed) errored ::= n
      else secs.zipWithIndex.foreach { case (s, r) => totals(r) += s }
      println(f"[exp] $n%-28s warm $last%6.3f s${if (failed) "  [EXCLUDED: error]" else ""}")
    }
    totals.zipWithIndex.foreach { case (t, i) =>
      println(f"[exp] TOTAL rep${i + 1} $t%8.2f s  " +
        f"(${names.size - errored.size} queries, ${errored.size} errored" +
        (if (errored.nonEmpty) s": ${errored.reverse.mkString(",")})" else ")"))
    }
    spark.stop()
  }
}
