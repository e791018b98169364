package graft.tools

import graft.{GraftSession, Tables}
import org.apache.spark.sql.functions._

/** Stage-level timing scratch for heavy queries ("runMain graft.tools.Profile <sfDir>"). */
object Profile {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = GraftSession.get("graft-profile")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    s.range(1000000L).selectExpr("sum(id)").collect() // warm
    Tables.documents(s, d).count()

    val sh = Tables.documents(s, d)
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= 3)
      .select(col("doc_id"), expr(
        "array_distinct(transform(sequence(0, size(t)-3)," +
          " i -> concat(t[i], ' ', t[i+1], ' ', t[i+2])))").as("shingles"))
    time("shingle")(sh.count())
    val pairs = sh.select(col("doc_id"), explode(col("shingles")).as("sh"))
    time("explode")(pairs.count())
    val hashCols = (0 until 8).map(h => md5(concat(lit(s"$h|"), col("sh")).cast("binary")).as(s"mh$h"))
    val hashed = pairs.select(col("doc_id") +: hashCols: _*)
    time("md5x8")(hashed.count())
    val minAggs = (0 until 8).map(h => min(col(s"mh$h")).as(s"sig$h"))
    val sig = hashed.groupBy("doc_id").agg(minAggs.head, minAggs.tail: _*)
    time("sig-agg")(sig.count())
    val bandStructs = (0 until 4).map { b =>
      struct(lit(b).as("b"), md5(concat(col(s"sig${2*b}"), col(s"sig${2*b+1}")).cast("binary")).as("bkey"))
    }
    val bands = sig.select(col("doc_id"), explode(array(bandStructs: _*)).as("band"))
      .select(col("doc_id"), col("band.b").as("b"), col("band.bkey").as("bkey"))
    time("bands")(bands.count())
    val a = bands.select(col("doc_id").as("id_a"), col("b"), col("bkey"))
    val c = bands.select(col("doc_id").as("id_b"), col("b"), col("bkey"))
    val cand = a.join(c, Seq("b", "bkey")).filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    time("join+distinct")(cand.count())
    s.stop()
  }
}
