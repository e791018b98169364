package graft.tools
import graft.operators.Similarity
import graft.GraftSession
object S02Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("probe", "8").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def run(name: String): Double = {
      val t0 = System.nanoTime()
      Similarity.defs.find(_.name == name).get.build(spark, "/root/testdata/sf0.1").count()
      (System.nanoTime() - t0) / 1e9
    }
    // mimic Bench: session-level warm-up, then each query COLD (first build)
    spark.range(1000000L).selectExpr("sum(id)").collect()
    println(f"bench-like: s01=${run("s01_cosine_topk")}%.2f s02=${run("s02_ann_lsh_topk")}%.2f s03=${run("s03_ann_recall")}%.2f s04=${run("s04_ann_ivf_topk")}%.2f")
    val s03 = Similarity.defs.find(_.name == "s03_ann_recall").get
      .build(spark, "/root/testdata/sf0.1")
    s03.collect().foreach(r => println(s"R ${r.mkString(",")}"))
    spark.stop()
  }
}
