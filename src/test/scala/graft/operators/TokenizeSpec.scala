package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** BPE semantics: the textbook Sennrich example hand-checked, tokenizer
  * round-trip, monotone compression, and layout independence (the fixture
  * pin's precondition). */
class TokenizeSpec extends SparkTestBase {

  import org.apache.spark.sql.catalyst.util.ArrayData
  import org.apache.spark.unsafe.types.UTF8String

  private def toks(word: String, ranks: Map[(String, String), Int]): Seq[String] = {
    val a = graft.functions.Bpe.tokenize(UTF8String.fromString(word), ranks)
      .asInstanceOf[ArrayData]
    (0 until a.numElements()).map(a.getUTF8String(_).toString)
  }

  test("training reproduces the hand-computed Sennrich example") {
    import spark.implicits._
    // word-type vocab {low:5, lower:2, newest:6, widest:3}:
    //   round 1 pair counts peak at (e,s)=9 tied with (s,t)=9 -> lexicographic
    //   tie-break picks (e,s); then (es,t)=9; then (l,o)=7 tied with (o,w)
    val words = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
      .toDF("word", "n")
    val merges = Tokenize.trainMergesFrom(words, rounds = 3)
    assert(merges.map(m => (m._1, m._2)) ==
      Seq(("e", "s"), ("es", "t"), ("l", "o")))
    assert(merges.map(_._3) == Seq(9L, 9L, 7L))
  }

  test("tokenize applies merges by rank priority and round-trips") {
    val ranks = Map(("e", "s") -> 0, ("es", "t") -> 1, ("l", "o") -> 2)
    // "lowest": l o w e s t -> l o w es t -> l o w est -> lo w est
    assert(toks("lowest", ranks) == Seq("lo", "w", "est"))
    // unseen word: only applicable merges fire
    assert(toks("stone", ranks) == Seq("s", "t", "o", "n", "e"))
    // round-trip: concatenating tokens always reconstructs the word
    Seq("lowest", "stone", "estes", "x", "").foreach { w =>
      assert(toks(w, ranks).mkString == w)
    }
  }

  test("more merges never increase the corpus token count") {
    val dir = "/root/testdata/sf0.001"
    val full = Tokenize.trainMerges(spark, dir)
    val words = graft.Tables.documents(spark, dir)
      .select(explode(split(lower(col("text")), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .collect().map(_.getString(0))
    def total(nRules: Int): Long = {
      val ranks = full.take(nRules).zipWithIndex
        .map { case ((l, r, _), i) => (l, r) -> i }.toMap
      words.map(w => toks(w, ranks).length.toLong).sum
    }
    val counts = Seq(0, 4, 8, 16).map(total)
    assert(counts == counts.sorted.reverse,
      s"token counts not monotone under more merges: $counts")
    // zero merges = symbol (code point) count
    assert(counts.head ==
      words.map(w => w.codePointCount(0, w.length).toLong).sum)
  }

  test("training is layout-independent (3 vs 8 partitions)") {
    import spark.implicits._
    val base = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L),
      ("wider", 4L), ("news", 7L), ("widow", 1L))
    val a = Tokenize.trainMergesFrom(
      base.toDF("word", "n").repartition(3), rounds = 8)
    val b = Tokenize.trainMergesFrom(
      base.toDF("word", "n").repartition(8), rounds = 8)
    assert(a == b, s"layout-dependent training: $a vs $b")
  }
}
