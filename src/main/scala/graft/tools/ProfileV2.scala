package graft.tools

import graft.{GraftSession, Tables}
import graft.infer.MockInference
import graft.pipeline.V2Pipeline
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Stage timing for the V2 pipeline ("runMain graft.tools.ProfileV2 <sfDir>"). */
object ProfileV2 {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = GraftSession.get("graft-profile-v2")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $name%-18s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    s.range(1000000L).selectExpr("sum(id)").collect()
    val client = new MockInference
    val cfg = V2Pipeline.Config(nGroups = 2, blockCount = 1, convLayers = 1,
      kernelWidth = 2, poolSize = 3)
    val w = Window.partitionBy("source").orderBy("doc_id")
    val surveys = Tables.documents(s, d)
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 16)
      .select(col("source"),
        struct(concat(lit("doc "), col("doc_id").cast("string")).as("title"),
          col("text").as("txt")).as("paper"))
      .groupBy(col("source").as("survey_id"))
      .agg(collect_list(col("paper")).as("papers"))
      .withColumn("title", concat(lit("Survey of "), col("survey_id")))

    val papers = time("encode+group")(
      V2Pipeline.group(V2Pipeline.encode(surveys), cfg).localCheckpoint())
    var skeleton = time("skeletonInit")(
      V2Pipeline.skeletonInit(papers, client).localCheckpoint())
    var digests = time("digest-1")(
      V2Pipeline.digest(papers, skeleton, client).localCheckpoint())
    skeleton = time("refine")(
      V2Pipeline.refineSkeleton(skeleton, digests, client, cfg).localCheckpoint())
    digests = time("digest-2")(
      V2Pipeline.digest(papers, skeleton, client).localCheckpoint())
    val out = time("decode")(
      V2Pipeline.decode(skeleton, digests, papers, client)
        .join(skeleton.select("survey_id", "skeleton_md"), "survey_id"))
    time("materialize")(out.count())
    s.stop()
  }
}
