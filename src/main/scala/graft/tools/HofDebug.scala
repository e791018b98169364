package graft.tools

import org.apache.spark.sql.catalyst.expressions.HigherOrderFunction
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.Exchange

/** One-off debug main for the HofBanSpec detector. */
object HofDebug {
  def main(args: Array[String]): Unit = {
    val name = if (args.length > 0) args(0) else "t14_lm_quality"
    val d = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = graft.GraftSession.get("hof-debug")
    graft.operators.ResultMemo.bypass {
      val df = graft.SparkEntry.queries(name)(spark, d)
      val p = df.queryExecution.sparkPlan
      def hasExchange(n: SparkPlan): Boolean =
        n.collectFirst { case e: Exchange => e }.isDefined
      p.foreach { node =>
        val scanSide = node.children.forall(c => !hasExchange(c))
        val hofs = node.expressions.flatMap(_.collect {
          case h: HigherOrderFunction => h.prettyName })
        if (hofs.nonEmpty)
          println(s"[hof] node=${node.nodeName} scanSide=$scanSide " +
            s"hofs=${hofs.mkString(",")}")
      }
      if (sys.env.contains("SPARK_GRAFT_HOF_TREE"))
        println(p.treeString.linesIterator.map("[tree] " + _).mkString("\n"))
    }
    spark.stop()
  }
}
