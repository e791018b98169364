package graft.tools

import graft.GraftSession
import graft.infer.MockInference
import graft.operators.CitationQuality
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Stage-level timing scratch for e01 ("runMain graft.tools.ProfileE01 <sfDir>"). */
object ProfileE01 {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    val s = GraftSession.get("graft-profile-e01")
    s.sparkContext.setLogLevel("WARN")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    s.range(1000000L).selectExpr("sum(id)").collect() // warm

    val w = Window.partitionBy("survey_id").orderBy("doc_id")
    val papersPlan = graft.Tables.documents(s, d)
      .select((col("doc_id") % 5).as("survey_id"), col("doc_id"), col("text"))
      .withColumn("idx", row_number().over(w) - 1)
      .filter(col("idx") < 20)
    val papers = time("papers+checkpoint")(papersPlan.localCheckpoint())

    // fixtureSurveys is private; rebuild inline
    val sgroup = concat(
      lit("Claim derived from paper "), col("doc_id").cast("string"),
      lit(" ["), (col("idx") + 1).cast("string"), lit("]."),
      when(col("idx") % 3 === 2,
        concat(lit(" Filler sentence number "), col("idx").cast("string"),
          lit(" with no reference."))).otherwise(lit("")),
      when(col("idx") % 5 === 4,
        concat(lit(" Joint claim for papers near "), col("doc_id").cast("string"),
          lit(" ["), col("idx").cast("string"), lit(", "),
          (col("idx") + 1).cast("string"), lit("]."))).otherwise(lit("")))
    val surveys = papers
      .select(col("survey_id"), struct(col("idx"), sgroup.as("sgroup")).as("p"))
      .groupBy("survey_id")
      .agg(array_join(
        transform(array_sort(collect_list(col("p"))), x => x.getField("sgroup")),
        " ").as("mid"))
      .select(col("survey_id"),
        concat(lit("### Part A "), col("mid"),
          lit(" ## References trailing refs")).as("content"))

    time("surveys.count")(surveys.count())
    val pairs = CitationQuality.claimPairs(surveys)
    time("claimPairs.count")(pairs.count())
    val nli = CitationQuality.nliPairs(pairs, papers, new MockInference)
    time("nliPairs.count")(nli.count())
    time("metrics e2e")(
      CitationQuality.metrics(surveys, papers, new MockInference).count())
    time("metrics again")(
      CitationQuality.metrics(surveys, papers, new MockInference).count())
    s.stop()
  }
}
