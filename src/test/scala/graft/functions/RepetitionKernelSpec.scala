package graft.functions

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Brute-force parity fuzz for the t06 kernel: the interned-id fast path
  * must be BIT-identical to the naive string-set formulation (which is
  * itself the declarative HOF form's semantics — n-gram arrays from
  * split(" ", -1), distinct by string equality, 1 - d/max(c,1)). */
class RepetitionKernelSpec extends AnyFunSuite {

  private def naive(text: String): Seq[Double] = {
    val toks = text.split(" ", -1).toSeq
    def frac(grams: Seq[String]) =
      1.0 - grams.distinct.size * 1.0 / math.max(grams.size, 1)
    val g2 = if (toks.size >= 2) toks.sliding(2).map(_.mkString(" ")).toSeq
             else Seq.empty
    val g3 = if (toks.size >= 3) toks.sliding(3).map(_.mkString(" ")).toSeq
             else Seq.empty
    Seq(frac(toks), frac(g2), frac(g3))
  }

  private def kernel(text: String): Seq[Double] =
    RepetitionKernel.repetitionStats(UTF8String.fromString(text))
      .toDoubleArray().toSeq

  test("edge cases: empty, one token, two tokens, all-same, spaces") {
    Seq("", "a", "a b", "a a", "a a a a", "  ", "a  b", " a b ",
        "x y x y x y", "a b a b c").foreach { t =>
      assert(kernel(t) == naive(t), s"text='$t'")
    }
  }

  test("fuzz: 500 random docs over a tiny vocabulary (dense repeats)") {
    val rnd = new scala.util.Random(7)
    val vocab = Vector("a", "b", "c", "ab", "", "aa")
    (0 until 500).foreach { k =>
      val n = rnd.nextInt(30)
      val t = Vector.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      assert(kernel(t) == naive(t), s"k=$k text='$t'")
    }
  }

  test("fuzz: 200 random docs over a wide vocabulary (sparse repeats)") {
    val rnd = new scala.util.Random(11)
    (0 until 200).foreach { k =>
      val n = 1 + rnd.nextInt(400)
      val t = Vector.fill(n)("w" + rnd.nextInt(200)).mkString(" ")
      assert(kernel(t) == naive(t), s"k=$k")
    }
  }

  test("tokens colliding under naive 31-hash still count distinct") {
    // "Aa" and "BB" share a String.hashCode — HashMap handles it; the
    // packed-id 2/3-gram keys are identity-exact by construction
    val t = "Aa BB Aa BB Aa"
    assert(kernel(t) == naive(t))
  }
}
