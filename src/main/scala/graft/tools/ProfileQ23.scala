package graft.tools

import graft.{GraftSession, Tables}
import org.apache.spark.sql.functions._

/** A/B the q23 JSON roundtrip forms ("runMain graft.tools.ProfileQ23 <sfDir>"). */
object ProfileQ23 {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = GraftSession.get("graft-profile-q23")
    s.sparkContext.setLogLevel("WARN")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $name%-16s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    s.range(1000000L).selectExpr("sum(id)").collect()
    Tables.orders(s, d).count()
    val base = Tables.orders(s, d).withColumn("j", to_json(struct(
      col("o_orderkey").as("k"), col("o_orderstatus").as("s"))))
    (1 to 2).foreach { i =>
      time(s"get_json x2 #$i")(base.filter(
        get_json_object(col("j"), "$.k").cast("bigint") === col("o_orderkey") &&
          get_json_object(col("j"), "$.s") === col("o_orderstatus"))
        .agg(count(lit(1))).collect())
      time(s"from_json   #$i")(base
        .withColumn("p", from_json(col("j"),
          org.apache.spark.sql.types.StructType.fromDDL("k BIGINT, s STRING")))
        .filter(col("p.k") === col("o_orderkey") &&
          col("p.s") === col("o_orderstatus"))
        .agg(count(lit(1))).collect())
      time(s"json_tuple  #$i")(base
        .select(col("o_orderkey"), col("o_orderstatus"),
          json_tuple(col("j"), "k", "s").as(Seq("jk", "js")))
        .filter(col("jk").cast("bigint") === col("o_orderkey") &&
          col("js") === col("o_orderstatus"))
        .agg(count(lit(1))).collect())
    }
    s.stop()
  }
}
