package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** jusText-semantics block classification edges (html_extrator.py:86-200). */
class HtmlCleanSpec extends AnyFunSuite {

  // a block that classifies GOOD: long (>200 chars), stopword-dense
  private val goodText =
    ("this is the kind of sentence that a real page would have in it " * 4).trim
  private def p(t: String) = s"<p>$t</p>"

  test("script/style/head/comment subtrees never become blocks") {
    val html = "<html><head><title>T</title></head><body>" +
      "<script>var a = 'nav menu';</script><style>.x{color:red}</style>" +
      "<!-- hidden comment -->" + p(goodText) + "</body></html>"
    val out = HtmlClean.clean(html)
    assert(out == goodText)
  }

  test("high link density classifies BAD (nav bars drop)") {
    val html = "<div><a href='/'>Home</a> <a href='/a'>About</a></div>" +
      p(goodText)
    assert(HtmlClean.clean(html) == goodText)
  }

  test("copyright mark classifies BAD") {
    val html = p(goodText) + "<div>© 2026 Example Corp</div>" +
      "<div>Copyright Example Corp and all of the rights that it reserves for itself in every place</div>"
    assert(HtmlClean.clean(html) == goodText)
  }

  test("low stopword density classifies BAD (keyword-stuffing drops)") {
    val stuffing = ("buy cheap widgets gadgets discount sale offer " * 8).trim
    assert(HtmlClean.clean(p(stuffing) + p(goodText)) == goodText)
  }

  test("SHORT between two GOOD blocks survives; between two BAD drops") {
    val shortText = "a short connective sentence."
    val kept = HtmlClean.clean(p(goodText) + p(shortText) + p(goodText))
    assert(kept == Seq(goodText, shortText, goodText).mkString("\n\n"))
    val nav = "<div><a href='/'>Home</a> <a href='/a'>About</a></div>"
    val dropped = HtmlClean.clean(nav + p(shortText) + nav + p(goodText))
    assert(dropped == goodText)
  }

  test("NEAR-GOOD collapses to BAD only between BAD neighbors") {
    // medium length (70..200), stopword-dense -> NEAR-GOOD
    val nearGood =
      "this is the kind of sentence that a real page would have in it, written for people."
    assert(nearGood.length > 70 && nearGood.length < 200)
    val nav = "<div><a href='/'>Home</a> <a href='/a'>About</a></div>"
    assert(HtmlClean.clean(nav + p(nearGood) + nav) == "")
    assert(HtmlClean.clean(p(goodText) + p(nearGood) + nav) ==
      goodText + "\n\n" + nearGood)
  }

  test("short heading near GOOD content is promoted and kept") {
    val html = "<h1>Section Title</h1>" + p(goodText)
    assert(HtmlClean.clean(html) == "Section Title\n\n" + goodText)
    // heading far from any good block (only boilerplate follows) drops
    val nav = "<div><a href='/'>Home</a> <a href='/a'>About</a></div>"
    assert(HtmlClean.clean("<h1>Orphan</h1>" + nav) == "")
  }

  test("non-spaced languages keep every block (reference CJK rule)") {
    val nav = "<div><a href='/'>导航</a></div>"
    val html = nav + p("这是正文的第一段。") + p("这是第二段。")
    assert(HtmlClean.clean(html, lang = "zh") ==
      "导航\n\n这是正文的第一段。\n\n这是第二段。")
  }

  test("entities decode and whitespace collapses inside block text") {
    val html = p("a &amp; b &lt;c&gt;   spaced" + " with the of and in to is on for it a long enough sentence that it classifies as good content here okay" * 2)
    val out = HtmlClean.clean(html)
    assert(out.startsWith("a & b <c> spaced"))
    assert(!out.contains("  "))
  }

  test("link density is measured on text share, not tag count") {
    // one small link inside a long good paragraph stays under the threshold
    val html = s"<p>$goodText <a href='/ref'>ref</a> $goodText</p>"
    val out = HtmlClean.clean(html)
    assert(out.nonEmpty && out.contains("ref"))
  }
}
