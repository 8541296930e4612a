package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.{Dom, Extraction}

/** The real (JDK SGML) DOM parser vs the regex twins: agreement on the
  * reference-shaped inputs, strict wins on the malformed HTML no regex
  * handles (the gap the VERDICT's "What's missing #3" names). */
class DomSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def domTextOf(html: String): String =
    Seq(html).toDF("s").select(Dom.domText(col("s")).as("r")).collect()(0).getString(0)
  private def regexTextOf(html: String): String =
    Seq(html).toDF("s").select(Extraction.stripTags(col("s")).as("r")).collect()(0).getString(0)
  private def words(s: String): Seq[String] = s.split("\\s+").filter(_.nonEmpty).toSeq

  test("agrees with regex strip on the ported reference page (word sequence)") {
    val page = "<h1> header \n header </h2>نکیمن دیلوت  <img jslfndl />هوضو هب ار бла бла"
    assert(words(domTextOf(page)) == words(regexTextOf(page)))
    val plain = "نکیمن دیلوت هوضو هب ار"
    assert(words(domTextOf(plain)) == words(regexTextOf(plain)))
  }

  test("img srcs via the parser match the regex extractor on well-formed tags") {
    val page = "a <img src=\"one.png\" width=\"270\" height=\"180\"/> b <img src='two.jpg'> c"
    val srcs = Seq(page).toDF("s")
      .select(Dom.domImgSrcs(col("s")).as("r")).collect()(0).getSeq[String](0)
    assert(srcs == Seq("one.png", "two.jpg"))
    val imgs = Dom.parse(page)._2
    assert(imgs.head.width == 270 && imgs.head.height == 180)
    assert(imgs(1).width == -1)
  }

  test("WIN: attribute value containing '>' does not truncate the tag") {
    val page = """before <p title="a>b">inside</p> after"""
    // the regex strip cuts at the first '>', leaving attribute residue
    assert(regexTextOf(page).contains("b\">") || !words(regexTextOf(page)).contains("inside")
      || words(regexTextOf(page)) != Seq("before", "inside", "after"))
    // the real parser tokenizes the attribute correctly
    assert(words(domTextOf(page)) == Seq("before", "inside", "after"))
  }

  test("WIN: character entities decode as text, not markup") {
    val page = "x &lt;div&gt; y &amp; z"
    assert(words(domTextOf(page)) == Seq("x", "<div>", "y", "&", "z"))
  }

  test("WIN: script and style payloads are dropped, not emitted as text") {
    val page = "keep <script>var a = 1 < 2; bad()</script> this <style>p{color:red}</style> text"
    assert(words(domTextOf(page)) == Seq("keep", "this", "text"))
  }

  test("unclosed and misnested tags recover") {
    val page = "<b>bold <i>both</b> italic trailing"
    assert(words(domTextOf(page)) == Seq("bold", "both", "italic", "trailing"))
  }
}
