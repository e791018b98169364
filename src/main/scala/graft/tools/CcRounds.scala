package graft.tools

import graft.GraftSession
import org.apache.spark.sql.functions._

/** One-off probe: star-round count and wall-clock of the hybrid CC at
  * each pre-round setting, over d09's real LSH candidate pairs. */
object CcRounds {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.builder("cc-rounds", "32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val pairs = graft.SparkEntry.queries("d03_minhash_lsh")(spark, d)
      .select(col("id_a").as("src"), col("id_b").as("dst"))
      .localCheckpoint()
    for (pre <- Seq(0, 1, 2); rep <- Seq(1, 2)) {
      val t0 = System.nanoTime()
      val (labels, iters) = graft.operators.Dedup
        .connectedComponentsWithStats(pairs, 32, pre)
      val n = labels.count()
      println(f"[cc] preRounds=$pre rep=$rep starRounds=$iters labels=$n " +
        f"t=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
