package graft

import graft.streaming.Streams
import org.apache.spark.sql.functions._

/** Runnable tour of the engine's surfaces on sf0.001: a relational query,
  * the V1/V2 pipelines on mock inference, and a streaming window driven to
  * completion. `sbt "runMain graft.Demo [sfDir]"`. */
object Demo {
  def main(args: Array[String]): Unit = {
    val dir   = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.get("graft-demo")

    println("=== q13 pricing summary ===")
    SparkEntry.queries("q13_pricing_summary")(spark, dir).show(5, truncate = false)

    println("=== V1 QA pipeline (first 3 docs) ===")
    SparkEntry.queries("p01_v1_qa_pipeline")(spark, dir).show(3, truncate = false)

    println("=== V2 survey pipeline (per-source surveys) ===")
    SparkEntry.queries("p02_v2_survey_pipeline")(spark, dir).show(3, truncate = false)

    println("=== streaming tumbling counts (AvailableNow) ===")
    Streams.runToMemory(
      Streams.tumblingCounts(Streams.eventsStream(spark, dir)), "demo_tumble")
      .orderBy(desc("n")).show(5, truncate = false)

    println("=== MinHash-LSH near-dup candidates ===")
    SparkEntry.queries("d03_minhash_lsh")(spark, dir).show(5, truncate = false)

    spark.stop()
  }
}
