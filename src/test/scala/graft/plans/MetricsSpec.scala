package graft.plans

import graft.SparkTestBase

class MetricsSpec extends SparkTestBase {

  test("query listener records per-action durations and rows (D9)") {
    val l = GraftQueryListener.install(spark)
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.range(10).collect()
    // listener bus is async
    Thread.sleep(300)
    val s = l.snapshot
    assert(s.nonEmpty)
    assert(s.forall(_.durationNs >= 0))
    assert(l.report.contains("actions="))
  }
}
