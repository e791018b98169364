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

  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions._

  /** Z-order (Morton) key over two numeric columns: each value maps to a
    * fixed-width bucket on its [min, max] span (driver-side 2-row agg, the
    * same bounded-collect posture as the IVF centroids), and the two
    * `bits`-wide bucket ids interleave bitwise. Rows close in EITHER
    * dimension land close in zkey order. */
  def zKey(df: DataFrame, colA: String, colB: String, bits: Int = 8)
      : Column = {
    val r = df.agg(
      min(col(colA)).cast("double"), max(col(colA)).cast("double"),
      min(col(colB)).cast("double"), max(col(colB)).cast("double")).head()
    require(!r.isNullAt(0) && !r.isNullAt(2),
      s"zKey: input has no non-null ($colA, $colB) rows — cannot derive span")
    val buckets = (1 << bits) - 1
    def bucketOf(c: String, lo: Double, hi: Double): Column = {
      val span = math.max(hi - lo, Double.MinPositiveValue)
      least(lit(buckets),
        floor((col(c).cast("double") - lit(lo)) / lit(span) * buckets))
        .cast("long")
    }
    val a = bucketOf(colA, r.getDouble(0), r.getDouble(1))
    val b = bucketOf(colB, r.getDouble(2), r.getDouble(3))
    (0 until bits).map { i =>
      (shiftright(a, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i))) +
        (shiftright(b, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1)))
    }.reduce(_ + _)
  }

  /** Z-ordered rewrite — the OPTIMIZE ZORDER of this lake: range-partition
    * by the Morton key of (colA, colB), so every output file covers a
    * small rectangle of the 2-D value space and a filter on EITHER column
    * prunes most files via parquet min/max. One range exchange at write
    * time buys data-skipping on two dimensions for every later scan —
    * bucketing's analogue for range/point predicates instead of join keys.
    * At 100 TB this (with partition pruning above it) is the difference
    * between scanning a table and scanning a rectangle. */
  def writeZOrdered(
      df: DataFrame,
      out: String,
      colA: String,
      colB: String,
      files: Int = 16): Unit =
    df.withColumn("__zkey", zKey(df, colA, colB))
      .repartitionByRange(files, col("__zkey"))
      .sortWithinPartitions("__zkey")
      .drop("__zkey")
      .write.mode(SaveMode.Overwrite).parquet(out)

  /** Count the files a filtered scan actually reads — the observable that
    * z-ordering improves (distinct input_file_name() under the filter). */
  def filesTouched(spark: SparkSession, path: String, predicate: Column): Long =
    spark.read.parquet(path).filter(predicate)
      .select(input_file_name()).distinct().count()

  /** Compaction pass — the small-files fix: rewrite a directory of many
    * tiny parquet files into `targetFiles` full-size ones. Streaming sinks
    * and fine-grained partition writes accumulate footer-dominated files
    * whose open/plan cost swamps the read at scan time; one round-robin
    * rewrite restores bounded file counts. Writes to a NEW path (never in
    * place over files being read) and returns (filesBefore, filesAfter). */
  def compact(
      spark: SparkSession,
      inPath: String,
      outPath: String,
      targetFiles: Int): (Long, Long) = {
    require(inPath != outPath,
      "compact: outPath must differ from inPath — never rewrite in place " +
        "over files being read")
    def parquetFiles(p: String): Long = {
      val hp = new org.apache.hadoop.fs.Path(p)
      val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      // recursive: partitioned layouts nest files under partition dirs
      val it = fs.listFiles(hp, true)
      var n = 0L
      while (it.hasNext) {
        if (it.next().getPath.getName.endsWith(".parquet")) n += 1
      }
      n
    }
    val before = parquetFiles(inPath)
    spark.read.parquet(inPath)
      .repartition(targetFiles)
      .write.mode(SaveMode.Overwrite).parquet(outPath)
    (before, parquetFiles(outPath))
  }
}
