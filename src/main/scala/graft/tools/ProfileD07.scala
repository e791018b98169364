package graft.tools

import graft._
import graft.operators.TreeDedup
import org.apache.spark.sql.functions._

/** Where does d07's wall-clock go: initial count, round chain, distinct,
  * final sort? */
object ProfileD07 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("profile-d07", "32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    Tables.documents(spark, d).count()

    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"PROF $tag ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
    }

    val docs = Tables.documents(spark, d)
      .select(trim(regexp_replace(col("text"), "\\s+", " ")).as("claim"))
      .filter(length(col("claim")) > 0)

    time("docs_count")(docs.count())
    val n = docs.count()
    println(s"PROF schedule ${TreeDedup.rounds(n, 100)}")

    for (ck <- Seq(8, 3, 2, 1); rep <- Seq(1, 2)) {
      time(s"run_ck${ck}_rep$rep") {
        TreeDedup.run(docs, "claim", new graft.infer.MockInference,
          groupSize = 100, knownCount = Some(n), checkpointEvery = ck).count()
      }
    }
    // cost of round-0 only (50 groups, one inference pass)
    time("round0_only") {
      val g = docs.withColumn("group_id",
        pmod(xxhash64(col("claim")), lit(50L)))
      graft.infer.InferOps.complete(
        g.groupBy("group_id")
          .agg(array_join(array_sort(collect_list(col("claim"))), "\n").as("joined"))
          .withColumn("prompt", concat(lit("DEDUP|"), col("joined"))),
        "prompt", "reply", new graft.infer.MockInference)
        .select(col("group_id"), explode(split(col("reply"), "\n")).as("claim"))
        .filter(length(col("claim")) > 0).count()
    }
    spark.stop()
  }
}
