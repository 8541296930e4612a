package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Real DOM-based HTML extraction over the JDK's built-in lenient SGML
  * parser (`javax.swing.text.html.parser.ParserDelegator`) — the
  * round-11 promotion of the DOM-parse row: the reference extracts text
  * and images through a real HTML tree (resiliparse `HTMLTree`,
  * `/root/reference/doc2dataset/extractor.py:138-139`); this repo's
  * regex twins ([[Extraction]]) pass all 7 ported extractor tests but a
  * real parser additionally gets right what no regex can:
  *
  *   - attribute values containing `>` (`<p title="a>b">` — the regex
  *     strip cuts mid-tag)
  *   - character entities (`&amp;lt;` is TEXT, not markup)
  *   - `<script>`/`<style>` payloads (content, not text)
  *   - unclosed/misnested tags (the SGML parser recovers)
  *
  * No external dependency: `java.desktop` ships the parser. It is not
  * resiliparse-grade on HTML5 edge cases (its DTD is HTML 3.2-era), so
  * the regex twins remain the default for byte-parity with the ported
  * reference tests; `DomSpec` pins where the two agree and where the
  * DOM version is strictly more correct.
  *
  * Used via UDFs — justified: a streaming SAX-style parse with
  * stateful skip-depth has no Catalyst-expression equivalent.
  */
object Dom {

  case class DomImg(src: String, width: Int, height: Int) // -1 = absent

  /** SAX-style parse: returns (visible text, img descriptors). Text is
    * whitespace-normalized (single spaces); script/style content is
    * dropped; entities are decoded by the parser. Null/empty html →
    * ("", Nil). */
  def parse(html0: String): (String, Seq[DomImg]) = {
    if (html0 == null || html0.isEmpty) return ("", Nil)
    // script/style payloads are CDATA — no nested markup — so the
    // delimited strip is exact there (unlike general tags); the swing
    // parser doesn't deliver STYLE through start/end callbacks
    // consistently enough to depth-track it
    val html = html0.replaceAll("(?is)<(script|style)\\b[^>]*>.*?</\\1\\s*>", " ")
    import javax.swing.text.html.HTML
    import javax.swing.text.MutableAttributeSet
    val sb = new StringBuilder
    val imgs = scala.collection.mutable.ArrayBuffer[DomImg]()
    def addImg(a: MutableAttributeSet): Unit = {
      val src = Option(a.getAttribute(HTML.Attribute.SRC)).map(_.toString).getOrElse("")
      def dim(at: HTML.Attribute): Int =
        Option(a.getAttribute(at)).map(_.toString.trim)
          .flatMap(s => scala.util.Try(s.toInt).toOption).getOrElse(-1)
      imgs += DomImg(src, dim(HTML.Attribute.WIDTH), dim(HTML.Attribute.HEIGHT))
    }
    val cb = new javax.swing.text.html.HTMLEditorKit.ParserCallback {
      private var skip = 0 // <script>/<style> nesting depth
      override def handleText(data: Array[Char], pos: Int): Unit =
        if (skip == 0 && data.nonEmpty) {
          if (sb.nonEmpty) sb.append(' ')
          sb.appendAll(data)
        }
      override def handleStartTag(t: HTML.Tag, a: MutableAttributeSet, pos: Int): Unit = {
        if (t == HTML.Tag.SCRIPT || t == HTML.Tag.STYLE) skip += 1
        if (t == HTML.Tag.IMG) addImg(a) // some parsers route img here
      }
      override def handleEndTag(t: HTML.Tag, pos: Int): Unit =
        if (t == HTML.Tag.SCRIPT || t == HTML.Tag.STYLE) skip = math.max(0, skip - 1)
      override def handleSimpleTag(t: HTML.Tag, a: MutableAttributeSet, pos: Int): Unit =
        if (t == HTML.Tag.IMG) addImg(a)
    }
    new javax.swing.text.html.parser.ParserDelegator()
      .parse(new java.io.StringReader(html), cb, true)
    (sb.toString.replaceAll("\\s+", " ").trim, imgs.toSeq)
  }

  /** Visible text via the real parser (whitespace-normalized). */
  def domText(c: Column): Column = udf((s: String) => parse(s)._1).apply(c)

  /** img src attributes via the real parser. */
  def domImgSrcs(c: Column): Column =
    udf((s: String) => parse(s)._2.map(_.src)).apply(c)

  /** word count over the parsed visible text. */
  def domWordCount(c: Column): Column =
    udf((s: String) => parse(s)._1.split(" ").count(_.nonEmpty).toLong).apply(c)
}
