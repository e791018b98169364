package graft.tools

import org.apache.spark.sql.streaming.Trigger
import graft.GraftSession
import graft.streaming.Streams

/** Per-trigger lifecycle profiler for the streaming twins (VERDICT r12 #1).
  *
  * The 19-21 AvailableNow twins each pay ~0.85-1.2 s of machinery their
  * DuckDB batch twins never see. This tool decomposes ONE twin's wall into
  * the engine's own lifecycle stages so the shave-vs-irreducible
  * adjudication is component-level, not per-query:
  *
  *   build      — DataFrame construction (schema probe memoized)
  *   start      — StreamingQueryManager.startQuery: checkpoint dir create,
  *                offset/commit WAL init, analysis, thread spawn
  *   triggers   — sum of triggerExecution from StreamingQueryProgress,
  *                itself decomposed via durationMs (latestOffset /
  *                queryPlanning / walCommit / addBatch / commitOffsets)
  *   drain      — awaitTermination wall minus the triggers sum: no-data
  *                batches, AvailableNow end-detection, thread teardown
  *   read       — final memory-table collect
  *
  * Usage: runMain graft.tools.StreamProfile [sfDir] [reps] [query]
  *   query ∈ {q26s (default), q27s, d10s}
  */
object StreamProfile {

  /** Suite mode: run EVERY streaming twin (SparkEntry queries ending in a
    * stream suffix) with a session-level StreamingQueryListener, printing
    * per-twin batch counts and durationMs component sums — the machinery
    * census across all 21 twins, not just the three single-query shapes. */
  private def suite(sfDir: String, reps: Int): Unit = {
    val spark = GraftSession.get("stream-profile-suite")
    import org.apache.spark.sql.streaming.StreamingQueryListener
    import org.apache.spark.sql.streaming.StreamingQueryListener._
    val acc = new java.util.concurrent.ConcurrentHashMap[
      String, (Int, Map[String, Long], Long)]()
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit = {
        val p = e.progress
        val key = p.name
        import scala.jdk.CollectionConverters._
        val d = p.durationMs.asScala.map { case (k, v) => k -> v.toLong }.toMap
        acc.merge(key, (1, d, p.numInputRows), (a, b) =>
          (a._1 + b._1,
            (a._2.keySet ++ b._2.keySet).map(k =>
              k -> (a._2.getOrElse(k, 0L) + b._2.getOrElse(k, 0L))).toMap,
            a._3 + b._3))
      }
    })
    val streamDefs = graft.streaming.StreamQueries.defs.map(_.name)
    val qs = graft.SparkEntry.queries
    for (r <- 1 to reps; n <- streamDefs) {
      acc.clear()
      val t0 = System.nanoTime()
      graft.Force(qs(n)(spark, sfDir))
      val wall = (System.nanoTime() - t0) / 1e9
      if (r == reps) {
        import scala.jdk.CollectionConverters._
        acc.asScala.foreach { case (qn, (batches, d, rows)) =>
          def g(k: String) = d.getOrElse(k, 0L)
          println(f"[sps] $n%-28s wall $wall%6.3f  batches $batches%2d  rows $rows%8d  " +
            f"trigger ${g("triggerExecution")}%5d ms = latestOffset ${g("latestOffset")}%4d + " +
            f"plan ${g("queryPlanning")}%4d + wal ${g("walCommit")}%3d + " +
            f"addBatch ${g("addBatch")}%5d + commit ${g("commitOffsets")}%4d (sink $qn)")
        }
      }
    }
    spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps  = if (args.length > 1) args(1).toInt else 4
    val which = if (args.length > 2) args(2) else "q26s"
    if (which == "suite") { suite(sfDir, reps); return }

    val spark = GraftSession.get("stream-profile")
    import org.apache.spark.sql.DataFrame

    def build(): DataFrame = which match {
      case "q26s" => Streams.tumblingCounts(Streams.eventsStream(spark, sfDir))
      case "q27s" => Streams.slidingCounts(Streams.eventsStream(spark, sfDir))
      case "d10s" => Streams.dedupStream(Streams.documentsStream(spark, sfDir))
      case "q40s" => Streams.clickPurchaseJoin(Streams.eventsStream(spark, sfDir))
      case other  => sys.error(s"unknown: $other")
    }
    val mode = if (which == "d10s" || which == "q40s") "append" else "complete"

    // Warm the batch-side machinery once (parquet footer probe, codegen)
    spark.read.parquet(s"$sfDir/events.parquet").limit(1).count()

    // SPARK_GRAFT_STATE_PARTS may be a comma list ("8,2") — reps interleave
    // the settings A-B-A-B so JVM warm-up drift doesn't masquerade as a
    // config effect (the measurement-discipline rule from STATE.md).
    val partsChoices = sys.env.getOrElse("SPARK_GRAFT_STATE_PARTS", "8")
      .split(",").map(_.trim).filter(_.nonEmpty)
    for (r <- 1 to reps) {
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      val parts = partsChoices((r - 1) % partsChoices.length)
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      val name = s"prof_${which}_$r"
      val t0 = System.nanoTime()
      val agg = build()
      val t1 = System.nanoTime()
      val q = agg.writeStream
        .outputMode(mode)
        .format("memory")
        .queryName(name)
        .trigger(Trigger.AvailableNow())
        .start()
      val t2 = System.nanoTime()
      q.awaitTermination()
      val t3 = System.nanoTime()
      spark.conf.set("spark.sql.shuffle.partitions", prev)
      val n = spark.table(name).count()
      val t4 = System.nanoTime()

      def s(a: Long, b: Long) = (b - a) / 1e9
      val progress = q.recentProgress
      val trigSum = progress.map(_.durationMs.getOrDefault("triggerExecution", 0L).toLong).sum / 1e3
      println(f"[sp] rep $r $which parts=$parts: total ${s(t0, t4)}%6.3f  build ${s(t0, t1)}%6.3f  " +
        f"start ${s(t1, t2)}%6.3f  await ${s(t2, t3)}%6.3f  read ${s(t3, t4)}%6.3f  rows $n")
      println(f"[sp]   batches ${progress.length}  triggerSum $trigSum%6.3f  " +
        f"drain(await-triggers) ${s(t2, t3) - trigSum}%6.3f")
      progress.zipWithIndex.foreach { case (p, i) =>
        val d = p.durationMs
        def g(k: String) = d.getOrDefault(k, -1L)
        println(f"[sp]   batch ${p.batchId}%2d ($i): trigger ${g("triggerExecution")}%5d ms | " +
          s"latestOffset ${g("latestOffset")} getBatch ${g("getBatch")} " +
          s"queryPlanning ${g("queryPlanning")} walCommit ${g("walCommit")} " +
          s"addBatch ${g("addBatch")} commitOffsets ${g("commitOffsets")} " +
          s"stateCommit ${g("stateStoreCommit")} rows=${p.numInputRows}")
        p.stateOperators.foreach { so =>
          println(s"[sp]     state op ${so.operatorName}: rowsTotal ${so.numRowsTotal} " +
            s"updated ${so.numRowsUpdated} updTime ${so.allUpdatesTimeMs}ms " +
            s"rmTime ${so.allRemovalsTimeMs}ms commit ${so.commitTimeMs}ms " +
            s"memUsed ${so.memoryUsedBytes}")
        }
      }
    }
    spark.stop()
  }
}
