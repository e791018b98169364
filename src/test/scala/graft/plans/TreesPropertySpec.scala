package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Randomized round-trip: any well-formed heading sequence must survive
  * parse → render → parse exactly. */
class TreesPropertySpec extends AnyFunSuite {

  private def forAll[A](gen: Gen[A], n: Int = 60)(check: A => Unit): Unit =
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(check)
    }

  // depth walk: starts at 1, never jumps more than +1
  private val depthWalk: Gen[List[Int]] =
    Gen.choose(1, 12).flatMap { n =>
      def step(remaining: Int, prev: Int, acc: List[Int]): Gen[List[Int]] =
        if (remaining == 0) Gen.const(acc.reverse)
        else Gen.choose(1, math.min(prev + 1, 4))
          .flatMap(d => step(remaining - 1, d, d :: acc))
      step(n, 0, Nil).map { l => if (l.isEmpty) List(1) else 1 :: l.tail }
    }

  private val titleGen: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString.take(12))

  test("parse/render round-trip holds for random well-formed outlines") {
    val outlineGen = for {
      depths <- depthWalk
      titles <- Gen.listOfN(depths.length, titleGen)
      descs  <- Gen.listOfN(depths.length, Gen.oneOf("", "desc line"))
    } yield depths.lazyZip(titles).lazyZip(descs).map { (d, t, x) =>
      ("#" * d) + " " + t + (if (x.nonEmpty) "\n" + x else "")
    }.mkString("\n")

    forAll(outlineGen) { md =>
      val rows = Trees.parseOutline("s", md)
      assert(rows.nonEmpty)
      val again = Trees.parseOutline("s", Trees.renderOutline(rows))
      assert(again == rows, s"round-trip diverged for:\n$md")
      // materialized paths are unique and preorder-consistent
      assert(rows.map(_.path).distinct.length == rows.length)
      rows.foreach(r => assert(r.path.length == r.depth))
    }
  }
}
