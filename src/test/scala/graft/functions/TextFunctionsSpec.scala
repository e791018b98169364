package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

class TextFunctionsSpec extends AnyFunSuite {
  import TextFunctions._

  /** Deterministic property driver (scalatestplus isn't in the offline
    * cache): sample `n` cases from the generator under a fixed seed. */
  private def forAll[A](gen: Gen[A], n: Int = 100)(check: A => Unit): Unit =
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong))
        .foreach(a => check(a))
    }

  // ---------------------------------------------------------------- chunker
  test("chunkText respects the token budget") {
    val doc = (1 to 50).map(i => s"para $i word word word").mkString("\n")
    val chunks = chunkText(doc, budget = 12)
    assert(chunks.nonEmpty)
    chunks.foreach(c => assert(whitespaceTokens(c) <= 12, s"oversized: '$c'"))
  }

  test("chunkText loses no content (normalized)") {
    val doc = "alpha beta gamma.\ndelta epsilon zeta. eta theta!\niota kappa"
    val chunks = chunkText(doc, budget = 4)
    def norm(s: String) = s.split("\\s+").filter(_.nonEmpty).toSeq
    assert(chunks.flatMap(norm) == norm(doc))
  }

  test("chunkText splits oversized paragraphs by sentence then word") {
    val doc = "one two three four five six seven eight nine ten"
    val chunks = chunkText(doc, budget = 3)
    assert(chunks.forall(whitespaceTokens(_) <= 3))
    assert(chunks.flatMap(_.split("\\s+")) ==
      doc.split(" ").toSeq)
  }

  test("chunkText single unbreakable token stands alone") {
    val chunks = chunkText("supercalifragilistic", budget = 1)
    assert(chunks == Seq("supercalifragilistic"))
  }

  test("chunkText property: budget + no-loss under random docs") {
    val wordGen = Gen.oneOf("spark", "scala", "data", "agg", "row", "col")
    val docGen = for {
      n     <- Gen.choose(1, 120)
      words <- Gen.listOfN(n, wordGen)
      seps  <- Gen.listOfN(n, Gen.oneOf(" ", " ", " ", "\n", ". "))
    } yield words.lazyZip(seps).map(_ + _).mkString
    forAll(Gen.zip(docGen, Gen.choose(2, 20))) { case (doc, budget) =>
      val chunks = chunkText(doc, budget)
      def norm(s: String) =
        s.replaceAll("[\\s]+", " ").trim.split(" ").filter(_.nonEmpty).toSeq
      assert(chunks.flatMap(norm) == norm(doc))
      chunks.foreach(c => assert(whitespaceTokens(c) <= budget))
    }
  }

  test("chunkTextOverlap: dropping the overlap prefix reconstructs the doc") {
    val doc = (1 to 40).map(i => s"w$i").mkString(" ")
    val overlap = 3
    val chunks = chunkTextOverlap(doc, budget = 10, overlap = overlap)
    assert(chunks.length > 1)
    chunks.foreach(c => assert(whitespaceTokens(c) <= 10))
    val rebuilt = chunks.head +: chunks.tail.map(
      _.split(" ").drop(overlap).mkString(" "))
    assert(rebuilt.mkString(" ").split("\\s+").toSeq == doc.split(" ").toSeq)
    // overlap prefix really is the predecessor's tail
    val t0 = chunks(0).split("\\s+"); val t1 = chunks(1).split(" ")
    assert(t1.take(overlap).toSeq == t0.takeRight(overlap).toSeq)
  }

  // ---------------------------------------------------------------- packing
  test("packBins greedy restart semantics (utils.py:61-90)") {
    assert(packBins(Seq(3, 3, 3), 6) == Seq(0, 0, 1))
    assert(packBins(Seq(5, 5, 5), 6) == Seq(0, 1, 2))
    // singleton over budget: own bin, no failure
    assert(packBins(Seq(2, 9, 2), 6) == Seq(0, 1, 2))
    assert(packBins(Seq.empty, 6) == Seq.empty)
  }

  test("packBins cumulative per bin never exceeds budget except singletons") {
    forAll(Gen.zip(Gen.listOf(Gen.choose(1, 10)), Gen.choose(5, 15))) {
      case (lens, budget) =>
        val bins = packBins(lens, budget)
        bins.distinct.foreach { b =>
          val members =
            lens.lazyZip(bins).collect { case (l, bb) if bb == b => l }.toList
          assert(members.sum <= budget || members.length == 1)
        }
    }
  }

  // ---------------------------------------------------------------- strings
  test("slugify") {
    assert(slugify("A Survey of Stream Processing!") == "a-survey-of-stream-processing")
    assert(slugify("  --weird__ Input--  ") == "weird-input")
  }

  test("normalizeAnswer strips articles and punctuation") {
    assert(normalizeAnswer("The  quick, brown fox!") == "quick brown fox")
    assert(normalizeAnswer("An answer") == "answer")
  }

  test("tokenF1 bounds and symmetry") {
    assert(tokenF1("a b c", "a b c") == 1.0)
    assert(tokenF1("x y", "a b") == 0.0)
    forAll(Gen.zip(Gen.listOf(Gen.oneOf("a", "b", "c", "d")),
      Gen.listOf(Gen.oneOf("a", "b", "c", "d")))) { case (p, g) =>
      val f = tokenF1(p.mkString(" "), g.mkString(" "))
      assert(f >= 0.0 && f <= 1.0)
      assert(math.abs(f - tokenF1(g.mkString(" "), p.mkString(" "))) < 1e-12)
    }
  }

  test("stripHtml drops script/style, strips tags, decodes entities (T17)") {
    val html =
      """<html><head><style>p {color: red}</style>
        |<script>var x = "<p>not text</p>";</script></head>
        |<body><h1>Title</h1><p>Hello &amp; welcome&nbsp;here.</p>
        |<!-- comment --><div>Second&nbsp;line &lt;kept&gt;</div></body></html>"""
        .stripMargin
    val text = stripHtml(html)
    assert(!text.contains("color"))
    assert(!text.contains("var x"))
    assert(text.contains("Title"))
    assert(text.contains("Hello & welcome here."))
    assert(text.contains("Second line <kept>"))
    assert(!text.contains("<div>"))
  }

  test("normalizeAnswerZh strips punctuation and spaces") {
    assert(normalizeAnswerZh("答案：北京。") == "答案北京")
    assert(normalizeAnswerZh("A B,C！") == "abc")
  }

  test("extractFence") {
    val s = "prefix\n```mermaid\ngraph TD;\nA-->B;\n```\nsuffix"
    assert(extractFence(s, "mermaid").contains("graph TD;\nA-->B;"))
    assert(extractFence(s, "python").isEmpty)
  }

  test("parseHeading") {
    assert(parseHeading("## 1.2 Methods").contains((2, "1.2", "Methods")))
    assert(parseHeading("# Intro").contains((1, "", "Intro")))
    assert(parseHeading("plain text").isEmpty)
  }

  test("levenshtein and similarityRatio") {
    assert(levenshtein("kitten", "sitting") == 3)
    assert(levenshtein("", "abc") == 3)
    assert(similarityRatio("abc", "abc") == 1.0)
    assert(similarityRatio("", "") == 1.0)
  }

  // ---------------------------------------------------------------- scrub
  test("scrubCitations keeps legal, repairs near-miss, drops junk") {
    val legal = Set("smith2020", "jones2021")
    val out = scrubCitations(
      "As shown [smith2020] and [smith2021] but not [nonsense]. Cost $[1,2]$ stays.",
      legal)
    assert(out.contains("[smith2020]"))
    // smith2021 ~ smith2020 ratio 0.9 -> repaired
    assert(out.contains("[smith2020] and [smith2020]"))
    assert(!out.contains("nonsense"))
    // math span untouched
    assert(out.contains("$[1,2]$"))
  }
}
