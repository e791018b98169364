package graft.plans

import graft.GraftSession
import graft.infer.{InferOps, MockInference}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The filter-below-inference optimizer rule must (a) rewrite the plan and
  * (b) actually skip model calls for filtered-out rows. */
class ExtensionsSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = GraftSession.builder("graft-ext-test", "4").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  test("rule pushes deterministic filters below graft_infer projections") {
    import spark.implicits._
    val metrics = InferOps.TokenMetrics(spark)
    InferOps.registerUdf(spark, new MockInference, Some(metrics))

    val df = spark.range(1, 101).toDF("id")
      .withColumn("prompt", concat(lit("prompt-"), col("id").cast("string")))
      .select(col("id"), expr("graft_infer(prompt)").as("reply"))
      .filter(col("id") <= 10) // references only a pass-through column

    val optimized = df.queryExecution.optimizedPlan.toString()
    // Filter must sit below the Project carrying the UDF
    val fIdx = optimized.indexOf("Filter")
    val uIdx = optimized.indexOf("graft_infer")
    assert(fIdx > uIdx, s"filter not pushed:\n$optimized")

    // collect (not count — count would prune the udf column entirely)
    val rows = df.collect()
    assert(rows.length == 10)
    // behavioral proof: only surviving rows paid for inference
    assert(metrics.calls.value == 10,
      s"expected 10 inference calls, got ${metrics.calls.value}")
  }

  test("rule leaves filters on inference OUTPUT in place") {
    import spark.implicits._
    InferOps.registerUdf(spark, new MockInference)
    val df = spark.range(1, 6).toDF("id")
      .withColumn("prompt", concat(lit("p"), col("id").cast("string")))
      .select(col("id"), expr("graft_infer(prompt)").as("reply"))
      .filter(col("reply").isNotNull) // depends on the UDF result
    val optimized = df.queryExecution.optimizedPlan.toString()
    val fIdx = optimized.indexOf("Filter")
    val uIdx = optimized.indexOf("graft_infer")
    assert(fIdx >= 0 && (uIdx < 0 || fIdx < uIdx),
      s"unsafe push happened:\n$optimized")
    assert(df.count() == 5)
  }

  test("token metrics account batched inference traffic (A11)") {
    import spark.implicits._
    val metrics = InferOps.TokenMetrics(spark)
    val docs = (1 to 20).map(i => (i.toLong, s"MAP|q|chunk $i ANSWER[x$i]"))
      .toDF("id", "prompt")
    InferOps.complete(docs, "prompt", "reply", new MockInference,
      batchSize = 4, metrics = Some(metrics)).count()
    assert(metrics.calls.value == 20)
    assert(metrics.promptTokens.value > 0)
    assert(metrics.completionTokens.value > 0)
  }
}
