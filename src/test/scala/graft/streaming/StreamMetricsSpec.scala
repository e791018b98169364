package graft.streaming

import graft.{SparkTestBase, Tables}

/** The streaming monitor must see every micro-batch: input-row totals,
  * batch counts, stateful-operator state size, and termination. */
class StreamMetricsSpec extends SparkTestBase {

  test("listener aggregates batches, rows, and state size per query") {
    val dir = "/root/testdata/sf0.001"
    val listener = StreamMetrics.attach(spark)
    try {
      val expected = Tables.events(spark, dir).count()
      val agg = Streams.tumblingCounts(Streams.eventsStream(spark, dir))
      val q = agg.writeStream
        .outputMode("complete")
        .format("memory")
        .queryName("sm_counts")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      // listener events arrive on a separate async bus; poll briefly
      val deadline = System.nanoTime() + 10e9.toLong
      def ready = listener.snapshot(q.id).filter(_.batches >= 1)
      while (ready.isEmpty && System.nanoTime() < deadline) Thread.sleep(100)
      val snap = ready.getOrElse(fail("no snapshot recorded"))
      assert(snap.batches >= 1)
      assert(snap.inputRows == expected)
      assert(snap.stateRows > 0) // windowed agg keeps state
      assert(snap.exception.isEmpty)
    } finally spark.streams.removeListener(listener)
  }
}
