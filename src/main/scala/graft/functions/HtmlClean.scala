package graft.functions

import scala.collection.mutable.ArrayBuffer

/** Boilerplate-removing HTML cleaner with jusText classification semantics
  * (T17 — the V3 crawler's cleaner, html_extrator.py:86-200, which wraps the
  * published jusText algorithm; re-implemented fresh from the algorithm's
  * public description):
  *
  *   1. drop comment/script/style/head/select/textarea subtrees
  *   2. segment on block-level tags into text blocks, tracking per-block
  *      link-text share and heading origin
  *   3. context-free classify each block: BAD on high link density or a
  *      copyright mark; SHORT under `lengthLow`; GOOD/NEAR-GOOD by stopword
  *      density and `lengthHigh`
  *   4. promote short headings within `maxHeadingDistance` chars of a good
  *      block to NEAR-GOOD
  *   5. context-sensitive revision: NEAR-GOOD collapses to BAD only between
  *      BAD neighbors; SHORT takes its neighbors' shared class, mixed
  *      neighborhoods resolve through an adjacent NEAR-GOOD
  *   6. keep GOOD blocks, joined with blank lines
  *
  * Non-spaced languages (zh/ja/th/ko) skip the boilerplate check entirely
  * and keep every block (the reference's NON_SPACED_LANGUAGES rule) — their
  * stopword-density signal is meaningless under whitespace tokenization.
  *
  * Everything is per-document and deterministic: at scale this runs as a
  * scan-side UDF with zero shuffle.
  */
object HtmlClean {

  final case class Options(
      lengthLow: Int = 70,
      lengthHigh: Int = 200,
      stopwordsLow: Double = 0.30,
      stopwordsHigh: Double = 0.32,
      maxLinkDensity: Double = 0.1,
      maxHeadingDistance: Int = 200)

  /** One segmented block before/after classification. */
  final case class Block(
      text: String,
      linkDensity: Double,
      stopDensity: Double,
      isHeading: Boolean)

  private sealed trait Cls
  private case object Good extends Cls
  private case object NearGood extends Cls
  private case object Short extends Cls
  private case object Bad extends Cls

  private val BlockTag =
    ("(?i)</?(p|div|table|tbody|thead|tr|td|th|h[1-6]|li|ul|ol|dl|dt|dd|" +
      "blockquote|article|section|header|footer|nav|aside|form|pre|main|" +
      "figure|figcaption|fieldset|hr|br|body|html|title)\\b[^>]*/?>").r
  private val DropSubtree =
    "(?is)<(script|style|select|textarea|head)[^>]*>.*?</\\1>".r
  private val Anchor = "(?is)<a\\b[^>]*>(.*?)</a>".r
  private val HeadingName = "(?i)h[1-6]".r

  /** Inline-tag strip + entity decode + whitespace collapse for one block's
    * raw HTML. */
  private def innerText(seg: String): String =
    seg
      .replaceAll("(?is)<[^>]+>", " ")
      .replaceAll("&nbsp;", " ").replaceAll("&amp;", "&")
      .replaceAll("&lt;", "<").replaceAll("&gt;", ">")
      .replaceAll("&quot;", "\"").replaceAll("&#39;", "'")
      .replaceAll("\\s+", " ")
      .trim

  /** Segment preprocessed HTML into candidate blocks. */
  def segment(html: String): Seq[Block] = segment(html, Stopwords.en)

  def segment(html: String, stopwords: Set[String]): Seq[Block] = {
    val pre = DropSubtree.replaceAllIn(
      html.replaceAll("(?s)<!--.*?-->", " "), " ")
    val out = ArrayBuffer.empty[Block]
    var last = 0
    var lastOpenTag = "" // the block tag that opened the current segment
    def flush(upTo: Int): Unit = {
      val seg = pre.substring(last, upTo)
      val text = innerText(seg)
      if (text.nonEmpty) {
        val linkChars = Anchor.findAllMatchIn(seg)
          .map(m => innerText(m.group(1)).length).sum
        val words = text.split("\\s+").filter(_.nonEmpty)
        val stops = words.count(w =>
          stopwords.contains(w.toLowerCase.replaceAll("[^\\p{L}\\p{N}']", "")))
        out += Block(
          text,
          if (text.isEmpty) 0.0
          else math.min(1.0, linkChars.toDouble / text.length),
          if (words.isEmpty) 0.0 else stops.toDouble / words.length,
          HeadingName.matches(lastOpenTag))
      }
    }
    BlockTag.findAllMatchIn(pre).foreach { m =>
      flush(m.start)
      last = m.end
      val tag = m.group(1).toLowerCase
      if (!m.matched.startsWith("</")) lastOpenTag = tag
      else lastOpenTag = ""
    }
    flush(pre.length)
    out.toSeq
  }

  private def classify(b: Block, o: Options): Cls =
    if (b.linkDensity > o.maxLinkDensity) Bad
    else if (b.text.contains("©") ||
      b.text.toLowerCase.contains("copyright")) Bad
    else if (b.text.length < o.lengthLow) {
      if (b.linkDensity > 0) Bad else Short
    } else if (b.stopDensity >= o.stopwordsHigh) {
      if (b.text.length > o.lengthHigh) Good else NearGood
    } else if (b.stopDensity >= o.stopwordsLow) NearGood
    else Bad

  /** Classify + revise; returns (block, keep) pairs. */
  def classifyBlocks(
      blocks: Seq[Block], o: Options = Options()): Seq[(Block, Boolean)] = {
    val cf = blocks.map(classify(_, o)).toArray

    // heading promotion: a SHORT heading with a GOOD block within
    // maxHeadingDistance characters after it becomes NEAR-GOOD
    blocks.indices.foreach { i =>
      if (blocks(i).isHeading && cf(i) == Short) {
        var dist = 0
        var j = i + 1
        var promoted = false
        while (j < blocks.length && dist <= o.maxHeadingDistance && !promoted) {
          if (cf(j) == Good) promoted = true
          dist += blocks(j).text.length
          j += 1
        }
        if (promoted) cf(i) = NearGood
      }
    }

    // context-sensitive revision against the nearest GOOD/BAD neighbors
    // (edges count as BAD, like the algorithm's virtual boundary blocks)
    def neighbor(from: Int, step: Int): Cls = {
      var k = from + step
      while (k >= 0 && k < cf.length) {
        if (cf(k) == Good || cf(k) == Bad) return cf(k)
        k += step
      }
      Bad
    }
    val fin = cf.zipWithIndex.map {
      case (Good, _) => Good
      case (Bad, _)  => Bad
      case (NearGood, i) =>
        if (neighbor(i, -1) == Bad && neighbor(i, 1) == Bad) Bad else Good
      case (Short, i) =>
        (neighbor(i, -1), neighbor(i, 1)) match {
          case (Good, Good) => Good
          case (Bad, Bad)   => Bad
          case _ =>
            // mixed: resolve through an adjacent NEAR-GOOD block
            val adjNearGood =
              (i > 0 && cf(i - 1) == NearGood) ||
                (i < cf.length - 1 && cf(i + 1) == NearGood)
            if (adjNearGood) Good else Bad
        }
    }
    blocks.zip(fin).map { case (b, c) => (b, c == Good) }
  }

  private val nonSpaced = Set("zh", "ja", "th", "ko")

  /** Full cleaner: language picks the stoplist; non-spaced languages keep
    * every block (no boilerplate check). Kept blocks join with blank lines
    * (the reference's `"\n\n".join`). */
  def clean(html: String, lang: String = "en", opts: Options = Options()): String = {
    val code = Option(lang).getOrElse("en").take(2).toLowerCase
    if (nonSpaced.contains(code))
      segment(html, Stopwords.zh).map(_.text).mkString("\n\n")
    else
      classifyBlocks(segment(html, Stopwords.en), opts)
        .collect { case (b, true) => b.text }
        .mkString("\n\n")
  }
}
