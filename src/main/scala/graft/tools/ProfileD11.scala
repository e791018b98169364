package graft.tools

import graft._
import org.apache.spark.sql.functions._

/** Stage-by-stage timing of d11_ngram_decontaminate — where do its seconds
  * go at sf0.1? Compares: eval-gram distinct, the bloom build, the full
  * query, and a no-bloom plain-join variant. */
object ProfileD11 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("profile-d11", "32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r  = f
      println(f"[d11] $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }

    val n = 5
    val toks = split(col("text"), " ")
    val grams = array_distinct(transform(
      sequence(lit(1), size(toks) - (n - 1)),
      i => array_join(slice(toks, i, lit(n)), " ")))
    def docs = Tables.documents(spark, d)
      .filter(size(split(col("text"), " ")) >= n)
      .select(col("doc_id"), col("source"), explode(grams).as("gram"))

    time("scan+explode count")(docs.count())
    time("scan+explode count (2nd)")(docs.count())
    val eval = docs.filter(col("source") === "src0").select("gram").distinct()
    time("eval distinct count")(eval.count())
    val bf = time("bloom build")(eval.stat.bloomFilter("gram", 1 << 20, 0.01))
    val bfB = spark.sparkContext.broadcast(bf)
    val mightHit = udf((g: String) => g != null && bfB.value.mightContain(g))
    time("udf filter count")(
      docs.filter(col("source") =!= "src0").filter(mightHit(col("gram"))).count())
    time("plain join variant")(
      docs.filter(col("source") =!= "src0")
        .join(broadcast(eval), Seq("gram"))
        .groupBy("doc_id").agg(count(lit(1)).as("n_shared")).count())
    // job-level decomposition of the shipped query
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.put(j.jobId, (System.nanoTime(),
            Option(j.properties.getProperty("spark.job.description"))
              .getOrElse("").take(60)))
        override def onJobEnd(
            j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val (t0, desc) = jobs.getOrDefault(j.jobId, (0L, "?"))
          println(f"[d11]   job ${j.jobId}%3d ${(System.nanoTime() - t0) / 1e9}%6.2f s  $desc")
        }
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val si = sc.stageInfo
          val secs = (for {
            a <- si.completionTime; b <- si.submissionTime
          } yield (a - b) / 1e3).getOrElse(-1.0)
          if (secs > 0.5)
            println(f"[d11]     stage ${si.stageId}%3d ${secs}%6.2f s " +
              f"${si.numTasks}%3d tasks  ${si.name.take(70)}")
        }
      })
    time("full query (as shipped)")(
      SparkEntry.queries("d11_ngram_decontaminate")(spark, d).count())
    time("full query (2nd)")(
      SparkEntry.queries("d11_ngram_decontaminate")(spark, d).count())
    spark.stop()
  }
}
