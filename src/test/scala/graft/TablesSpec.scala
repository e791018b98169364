package graft

/** The degenerate-scan guard: single-row-group testdata files must fan out
  * before kernel-heavy per-row work, and only for the tables that need it —
  * dimensions stay plain scans so they remain broadcast-friendly. */
class TablesSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("kernel-heavy tables fan out to cluster parallelism") {
    val para = spark.sparkContext.defaultParallelism
    val docs = Tables.documents(spark, dir)
    assert(docs.rdd.getNumPartitions >= para / 2,
      s"documents scan still degenerate: ${docs.rdd.getNumPartitions} of $para")
    assert(docs.count() > 0)
  }

  test("dimension tables stay plain single-split scans") {
    val nation = Tables.nation(spark, dir)
    assert(nation.rdd.getNumPartitions <= 2,
      s"nation should not fan out: ${nation.rdd.getNumPartitions}")
  }

  test("fan-out preserves rows and filter pushdown still reaches the scan") {
    import org.apache.spark.sql.functions._
    val filtered = Tables.documents(spark, dir).filter(col("doc_id") < 10)
    val plan = filtered.queryExecution.executedPlan.toString()
    assert(plan.contains("PushedFilters") && plan.contains("LessThan(doc_id,10)"),
      plan.take(1500))
    assert(filtered.count() == 10)
  }
}
