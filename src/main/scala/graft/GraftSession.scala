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
      .config("spark.ui.enabled", "false")

  def get(appName: String = "graft"): SparkSession = {
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = builder(appName, cores).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
