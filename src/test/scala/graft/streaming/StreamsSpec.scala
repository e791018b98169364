package graft.streaming

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Streaming twins of q26-q28 must agree with their batch equivalents when
  * driven to completion over the same finite input (AvailableNow). */
class StreamsSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  private def batchEvents = Tables.events(spark, dir)

  test("streaming tumbling counts == batch q26") {
    val stream = Streams.eventsStream(spark, dir)
    val got = Streams.runToMemory(
      Streams.tumblingCounts(stream), "t_tumble")
      .orderBy("wstart", "event_type").collect()
    val want = batchEvents
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("wstart"),
        col("event_type"), col("n"))
      .orderBy("wstart", "event_type").collect()
    assert(got.toSeq == want.toSeq)
  }

  test("streaming session windows == batch q28") {
    val stream = Streams.eventsStream(spark, dir)
    val got = Streams.runToMemory(
      Streams.sessionCounts(stream), "t_sess")
      .orderBy("user_id", "session_start").collect()
    val want = batchEvents
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"),
        date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss")
          .as("session_start"), col("n"))
      .orderBy("user_id", "session_start").collect()
    assert(got.toSeq == want.toSeq)
  }

  test("streaming sliding counts == batch q27") {
    val stream = Streams.eventsStream(spark, dir)
    val got = Streams.runToMemory(
      Streams.slidingCounts(stream), "t_slide")
      .orderBy("wstart").collect()
    val want = batchEvents
      .groupBy(window(col("ts"), "10 minutes", "5 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("wstart"),
        col("n"))
      .orderBy("wstart").collect()
    assert(got.toSeq == want.toSeq)
  }

  test("streaming V1 QA: documents stream through the pipeline to JSONL") {
    import org.apache.spark.sql.functions.{col, concat, lit}
    val out  = Files.createTempDirectory("graft_v1s_out_").toString
    val ckpt = Files.createTempDirectory("graft_v1s_ck_").toString
    // stage a small docs dir with planted passkeys
    val staged = Files.createTempDirectory("graft_v1s_in_").toString
    Tables.documents(spark, dir).limit(20)
      .withColumn("text", concat(col("text"),
        lit(" ANSWER[stream-"), col("doc_id").cast("string"), lit("]")))
      .coalesce(1).write.mode("overwrite").parquet(staged + "/docs")
    val q = Streams.v1QaStream(spark, staged + "/docs",
      "What is the passkey?", out, ckpt, glob = "*.parquet")
    q.awaitTermination()
    val res = spark.read.json(out)
    assert(res.count() == 20)
    assert(res.filter(col("answer") ===
      concat(lit("stream-"), col("doc_id").cast("string"))).count() == 20)
  }

  test("foreachBatch JSONL sink appends one line per row (S3)") {
    val out  = Files.createTempDirectory("graft_jsonl_").toString
    val ckpt = Files.createTempDirectory("graft_ckpt_").toString
    val stream = Streams.eventsStream(spark, dir)
      .select("event_id", "event_type")
    val q = Streams.jsonlSink(stream, out, ckpt)
    q.awaitTermination()
    val written = spark.read.json(out)
    assert(written.count() == batchEvents.count())
    assert(written.columns.sorted.toSeq == Seq("event_id", "event_type"))
  }
}
