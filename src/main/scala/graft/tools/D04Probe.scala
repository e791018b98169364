package graft.tools

import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.operators.Dedup

/** Measures the SPARK_GRAFT_D04_BANDS=24x12 deployment path against the
  * declared 4×16 d04 at a given SF — the flag-path twin of BandProbe's
  * scheme rows (VERDICT r12 #5 done-criterion): tight-pair recall
  * (h ≤ 4 declared pairs recovered by the wide path), total pair counts,
  * and per-path wall. Calls [[Dedup.d04PairsWide]] directly (the exact
  * frame the flag dispatches to) beside the declared QueryDef build, so
  * both run in ONE JVM without env juggling.
  *
  * Usage: runMain graft.tools.D04Probe [sfDir]
  */
object D04Probe {
  def main(args: Array[String]): Unit = {
    val d = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = GraftSession.get("d04-probe")

    def run(tag: String, df: org.apache.spark.sql.DataFrame) = {
      val t0 = System.nanoTime()
      val f = df.select("id_a", "id_b", "hamming").localCheckpoint()
      val n = f.count()
      val tight = f.filter(col("hamming") <= 4).count()
      println(f"[d04] $tag%-10s pairs=$n%12d tight(h<=4)=$tight%10d " +
        f"wall=${(System.nanoTime() - t0) / 1e9}%.1f s")
      f
    }
    val declared = run("declared",
      Dedup.defs.find(_.name == "d04_simhash_pairs").get.build(spark, d))
    val wide = run("wide24x12", Dedup.d04PairsWide(spark, d))
    val tightDecl = declared.filter(col("hamming") <= 4)
      .select("id_a", "id_b")
    val recovered = wide.select("id_a", "id_b")
      .join(tightDecl, Seq("id_a", "id_b"), "left_semi").count()
    val denom = tightDecl.count()
    println(f"[d04] tight-pair recall through the wide path: " +
      f"$recovered%d/$denom%d = ${recovered.toDouble / math.max(denom, 1)}%.4f")
    spark.stop()
  }
}
