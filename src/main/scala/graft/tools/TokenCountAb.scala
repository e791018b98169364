package graft.tools

import org.apache.spark.sql.functions._
import graft.functions.TokenCountKernel

/** Interleaved A-B microbench: t01/t02/t03's old interpreted-filter HOF
  * projections vs the TokenCountKernel forms, same JVM, alternating reps
  * (the measurement-discipline pattern). Times a Force-style full scan of
  * each projection over the documents table.
  *
  * Usage: runMain graft.tools.TokenCountAb [sfDir] [reps]
  */
object TokenCountAb {
  def main(args: Array[String]): Unit = {
    val d = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 6
    val spark = graft.GraftSession.get("tokencount-ab")
    val stopwords =
      Seq("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")
    val docs = graft.Tables.documents(spark, d).select("doc_id", "text")
      .localCheckpoint()
    docs.count()

    val stopArr = array(stopwords.map(lit): _*)
    val variants: Seq[(String, org.apache.spark.sql.Column)] = Seq(
      "t01_hof" -> size(filter(split(lower(col("text")), " "),
        t => array_contains(stopArr, t))),
      "t01_kernel" -> TokenCountKernel.stopwordCountCol(spark, col("text"), stopwords),
      "t02_hof" -> size(filter(split(col("text"), " "), w => length(w) >= 6)),
      "t02_kernel" -> TokenCountKernel.longTokenCountCol(spark, col("text"), 6),
      "t03_hof" -> size(filter(split(col("text"), "[^a-zA-Z0-9]+"),
        x => length(x) > 0)),
      "t03_kernel" -> TokenCountKernel.alnumRunCountCol(spark, col("text")))

    val acc = scala.collection.mutable.Map.empty[String, List[Double]]
    for (r <- 1 to reps; (name, c) <- variants) {
      val t0 = System.nanoTime()
      val s = docs.select(sum(c.cast("long"))).collect()(0).getLong(0)
      val sec = (System.nanoTime() - t0) / 1e9
      if (r > 1) acc(name) = sec :: acc.getOrElse(name, Nil)
      if (r == reps)
        println(f"[tcab] $name%-12s best=${acc(name).min}%.3f s " +
          f"(reps ${acc(name).reverse.map(x => f"$x%.3f").mkString(",")}) sum=$s")
    }
    spark.stop()
  }
}
