package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SkewSpec extends SparkTestBase {

  test("salted join result equals plain join under a hot key") {
    import spark.implicits._
    // 10k rows, 90% on one hot key
    val big = spark.range(10000).toDF("i")
      .withColumn("key", when(col("i") % 10 =!= 0, lit("hot"))
        .otherwise(concat(lit("k"), col("i").cast("string"))))
    val small = Seq(("hot", "H"), ("k0", "Z0"), ("k10", "Z10"))
      .toDF("key", "payload")

    val plain  = big.join(small, "key")
    val salted = Skew.saltedJoin(big, small, "key", salt = 8)
    assert(salted.count() == plain.count())
    val a = plain.groupBy("key").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = salted.groupBy("key").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a == b)
  }

  test("q37 joins on (key, salt): the hot key scatters across salt buckets") {
    val q = graft.QueryDef.all.find(_.name == "q37_salted_skew_join").get
    val df = ResultMemo.bypass(q.build(spark, "/root/testdata/sf0.001"))
    val plan = df.queryExecution.optimizedPlan.toString
    // the join condition must include the salt column — that IS the
    // scatter: one hot user key becomes 8 distinct shuffle keys
    assert(plan.contains("graft_salt"),
      s"expected graft_salt in the join keys:\n$plan")
    // and the salt never leaks into the result schema
    assert(!df.columns.contains("graft_salt"))
  }
}
