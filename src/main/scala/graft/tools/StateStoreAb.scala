package graft.tools

/** Interleaved A-B of the state-store provider for the 21 streaming twins
  * (VERDICT r14 #4): default HDFS-backed in-memory store vs RocksDB.
  *
  * The provider class is a runtime SQL conf read at QUERY START, so the two
  * settings alternate A-B-A-B inside ONE JVM (the measurement-discipline
  * rule); each rep runs every streaming twin once, rep 1 per setting is
  * warm-up and excluded. Per-twin and total wall printed per setting.
  *
  * Usage: runMain graft.tools.StateStoreAb [sfDir] [reps]
  */
object StateStoreAb {
  def main(args: Array[String]): Unit = {
    val d = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 6
    require(reps >= 2, "need reps >= 2: rep 1 per setting is warm-up")
    val spark = graft.GraftSession.get("state-store-ab")
    spark.sparkContext.setLogLevel("WARN")

    val key = "spark.sql.streaming.stateStore.providerClass"
    val hdfs = "org.apache.spark.sql.execution.streaming.state." +
      "HDFSBackedStateStoreProvider"
    val rocks = "org.apache.spark.sql.execution.streaming.state." +
      "RocksDBStateStoreProvider"
    val settings = Seq("hdfs" -> hdfs, "rocksdb" -> rocks)

    val twins = graft.streaming.StreamQueries.defs.map(_.name)
    val qs = graft.SparkEntry.queries
    val acc = scala.collection.mutable.Map.empty[String, List[Double]]
    val per = scala.collection.mutable.Map.empty[(String, String), List[Double]]
    for (r <- 1 to reps; (tag, cls) <- settings) {
      spark.conf.set(key, cls)
      var total = 0.0
      twins.foreach { n =>
        val t0 = System.nanoTime()
        graft.Force(qs(n)(spark, d))
        val sec = (System.nanoTime() - t0) / 1e9
        total += sec
        if (r > 1) per((tag, n)) = sec :: per.getOrElse((tag, n), Nil)
        spark.sqlContext.clearCache()
      }
      graft.operators.ResultMemo.clearSession(spark)
      if (r > 1) acc(tag) = total :: acc.getOrElse(tag, Nil)
      println(f"[ssab] rep $r $tag%-8s total $total%7.3f s")
    }
    settings.foreach { case (tag, _) =>
      println(f"[ssab] TOTAL $tag%-8s best=${acc(tag).min}%.3f s  " +
        f"median=${acc(tag).sorted.apply(acc(tag).size / 2)}%.3f s  " +
        f"(reps ${acc(tag).reverse.map(x => f"$x%.3f").mkString(",")})")
      val worst = twins.map(n => n -> {
        val h = per.getOrElse(("hdfs", n), Nil)
        val o = per.getOrElse((tag, n), Nil)
        if (h.isEmpty || o.isEmpty) 0.0 else o.min - h.min
      }).sortBy(-_._2).take(5)
      if (tag != "hdfs")
        println(s"[ssab]   biggest per-twin deltas vs hdfs (best-vs-best): " +
          worst.map { case (n, dl) => f"$n=+$dl%.3f" }.mkString("  "))
    }
    spark.stop()
  }
}
