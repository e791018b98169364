package graft.streaming

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.streaming.Trigger

/** File-source backpressure: `maxFilesPerTrigger` is the streaming analog of
  * the reference's bounded work queues (D1 queue_size) — it caps how much a
  * micro-batch admits, so state growth and per-trigger latency stay bounded
  * no matter how deep the ingest backlog is. */
class BackpressureSpec extends SparkTestBase {

  test("maxFilesPerTrigger bounds each micro-batch's intake") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bp").toString
    val events = Tables.events(spark, "/root/testdata/sf0.001")
    val total = 400
    // a 4-file backlog: without throttling, AvailableNow would take it in
    // one micro-batch
    events.limit(total).repartition(4)
      .write.mode("overwrite").parquet(dir)

    val stream = spark.readStream
      .schema(events.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(dir)
    val q = stream.groupBy("event_type").count()
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName("bp_counts")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val batches = q.recentProgress.filter(_.numInputRows > 0)
    assert(batches.map(_.numInputRows).sum == total.toLong)
    // the backlog drained as ≥4 bounded micro-batches, not one gulp
    assert(batches.length >= 4,
      s"expected >=4 throttled micro-batches, got ${batches.length}")
    assert(batches.forall(_.numInputRows < total),
      batches.map(_.numInputRows).mkString(","))
  }
}
