package graft.tools

import graft._

/** Dump `.explain("formatted")` for named declared queries to files — the
  * per-query plan evidence the optimization rounds commit under plans/rNN/.
  * Unlike DumpPlans (PLANS.md, headline set + cost-shape table), this writes
  * one file per query so a round can pin before/after plans for exactly the
  * queries it touched.
  *
  * Usage: runMain graft.tools.ExplainDump <outDir> <suffix> <q1,q2,...|all>
  *        [sfDir] [raw]
  * Writes <outDir>/<query>_<suffix>.txt containing the formatted plan of the
  * query frame as built (pre-execution, AQE initial plan — deterministic and
  * diffable round over round; the executed AQE-final shape is covered by
  * PLANS.md's jobs/exchange table).
  *
  * `raw` (r15): build under ResultMemo.bypass so the file shows the REAL
  * dataflow — scans, exchanges, windows — instead of a checkpoint-scan stub
  * wherever a memo/localCheckpoint would otherwise hide the subtree (q04's
  * window pass, q46's shared distinct). Plan-structure claims in the
  * optimization reports cite the raw files.
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: ExplainDump <outDir> <suffix> <q1,q2,...|all> [sfDir]")
    val outDir = java.nio.file.Paths.get(args(0))
    val suffix = args(1)
    val d      = if (args.length > 3) args(3) else "/root/testdata/sf0.1"
    val names  =
      if (args(2) == "all") SparkEntry.queries.keys.toSeq.sorted
      else args(2).split(",").toSeq.map(_.trim).filter(_.nonEmpty)
    java.nio.file.Files.createDirectories(outDir)

    val raw = args.length > 4 && args(4) == "raw"
    val spark = GraftSession.get("graft-explain")
    names.foreach { n =>
      val fn = SparkEntry.queries.getOrElse(n,
        sys.error(s"unknown query $n"))
      val df = if (raw) graft.operators.ResultMemo.bypass(fn(spark, d))
               else fn(spark, d)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(
        outDir.resolve(s"${n}_$suffix.txt"),
        plan.getBytes("UTF-8"))
      println(s"[explain] wrote ${n}_$suffix.txt (${plan.length} chars)")
    }
    spark.stop()
  }
}
