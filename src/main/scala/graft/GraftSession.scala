package graft

import org.apache.spark.sql.SparkSession

/** Session factory for the graft engine.
  *
  * Tuned for the harness's local[32] single-JVM mode but with settings that
  * transfer to a multi-executor cluster: AQE handles runtime re-planning
  * (coalescing post-shuffle partitions, skew-join splitting), shuffle
  * partition count matches local parallelism instead of the 200 default,
  * and broadcast join threshold is left at default so Catalyst promotes
  * small dimensions (region/nation/part at test SFs) automatically.
  */
object GraftSession {
  def builder(appName: String = "graft", cores: String = "32"): SparkSession.Builder =
    SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // Respect the advisory target size when coalescing instead of
      // stopping at defaultParallelism (the Spark-docs-recommended
      // setting): a small reduce stage collapses to a few right-sized
      // tasks instead of always launching `cores` tiny ones. At cluster
      // scale shuffles exceed the advisory size so coalescing is
      // size-driven either way; this only removes the small-stage
      // scheduling floor (measured -6% on the 116-query suite).
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // Oracle parity: testdata timestamps are timezone-less; with the session
      // pinned to UTC their values match DuckDB's. Queries emit timestamps as
      // formatted strings so parquet logical types never diverge.
      .config("spark.sql.session.timeZone", "UTC")
      // graft optimizer rules (filter-below-inference pushdown)
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      // Heartbeat/timeout headroom (VERDICT r14 #1): in local mode the
      // executor lives in the driver JVM and a long GC or host-level steal
      // stall can miss enough 10 s heartbeats that the executor
      // System.exit(56)s the WHOLE process (ExecutorExitCode
      // HEARTBEAT_FAILURE) — BENCH_r14's 32-core record died exactly this
      // way after 25 min of clean running. A stall on a shared box must
      // degrade a pass, never forfeit the record: heartbeat every 60 s and
      // a 20 min receiver expiry ride out any survivable pause. Stability
      // config only — no query plan or timing semantics change.
      .config("spark.executor.heartbeatInterval", "60s")
      .config("spark.network.timeout", "1200s")
      .config("spark.ui.enabled", "false")

  def get(appName: String = "graft"): SparkSession = {
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = builder(appName, cores).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
