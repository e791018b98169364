package graft.operators

import graft.{SparkTestBase, Tables}
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

/** The distributed exact-greedy packer must agree with the pure-Scala
  * reference kernel on real data, and must differ from the window
  * running-sum form exactly at boundary-crossing elements. */
class PackingSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("exactBins matches packBins group-by-group on lineitem") {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_suppkey"),
        ceil(col("l_extendedprice") / 100.0).cast("long").as("len"))
    val got = Packing.exactBins(li, "l_orderkey",
      Seq("l_linenumber", "l_partkey", "l_suppkey"), "len", budget = 900L)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
      .groupBy(_._1)

    got.foreach { case (_, rows) =>
      val ordered = rows.sortBy(t => (t._2, t._3, t._4))
      val want = TextFunctions.packBins(ordered.map(_._5.toInt).toSeq, 900)
      assert(ordered.map(_._6.toInt).toSeq == want)
    }
  }

  test("greedy restart differs from window running-sum at boundary crossings") {
    import spark.implicits._
    // lens 5,5,5 with budget 8: greedy -> bins 0,1,2 ; floor(runsum/8) -> 0,1,1
    val df = Seq(("g", 1, 5L), ("g", 2, 5L), ("g", 3, 5L))
      .toDF("grp", "ord", "len")
    val exact = Packing.exactBins(df, "grp", Seq("ord"), "len", 8L)
      .orderBy("ord").select("bin").collect().map(_.getLong(0)).toSeq
    assert(exact == Seq(0L, 1L, 2L))
    val windowed = df.withColumn("bin",
      floor(sum(col("len")).over(
        org.apache.spark.sql.expressions.Window.partitionBy("grp")
          .orderBy("ord").rowsBetween(Long.MinValue, 0)) / 8))
      .orderBy("ord").select("bin").collect().map(_.getLong(0)).toSeq
    assert(windowed == Seq(0L, 1L, 1L)) // the documented divergence
  }

  test("packTextBins bins documents by estimated tokens") {
    val out = Packing.packTextBins(
      Tables.documents(spark, dir)
        .select(col("source"), col("doc_id"), col("text")),
      "source", Seq("doc_id"), "text", tokenBudget = 300)
    assert(out.columns.contains("bin"))
    // bins start at 0 per group and are contiguous
    val perGroup = out.groupBy("source")
      .agg(min("bin").as("mn"), max("bin").as("mx"),
        countDistinct("bin").as("nd"))
      .collect()
    perGroup.foreach { r =>
      assert(r.getLong(1) == 0L)
      assert(r.getLong(3) == r.getLong(2) + 1)
    }
  }
}
