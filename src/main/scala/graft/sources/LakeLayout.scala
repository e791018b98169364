package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Lake layout helpers for the 100 TB posture: partitioned + bucketed
  * tables so repeated joins/aggregations on the bucket key are co-located
  * (no exchange on either side) and partition pruning handles the
  * time/category axis.
  *
  * Bucketing is Spark's durable answer to "this join shuffles every run":
  * pay one shuffle at write time, then every join/groupBy on the bucket key
  * reads pre-hashed files. On a cluster the same code lays out the lake;
  * locally it writes to the session warehouse dir.
  */
object LakeLayout {

  /** Write `df` as a managed table bucketed by `bucketCol` into `buckets`
    * buckets (sorted within buckets for merge-friendly scans), partitioned
    * by `partitionCols` when given. */
  def writeBucketed(
      df: DataFrame,
      table: String,
      bucketCol: String,
      buckets: Int,
      partitionCols: Seq[String] = Seq.empty): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Join two tables bucketed on the same key with the same bucket count:
    * Catalyst plans a bucket-local join (no Exchange on either side). */
  def bucketedJoin(
      spark: SparkSession,
      leftTable: String,
      rightTable: String,
      key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
