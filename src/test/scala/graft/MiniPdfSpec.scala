package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{AutoPdfDecoder, FakePdfDecoder, MiniPdf, MiniPdfDecoder}
import java.nio.charset.StandardCharsets.ISO_8859_1

/** Real-PDF decoding against hand-built documents: every input here is a
  * genuine PDF assembled byte-by-byte (Flate streams via
  * java.util.zip.Deflater), so the decoder is exercised on the real wire
  * format, not on a mock of itself. */
class MiniPdfSpec extends AnyFunSuite {

  private def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(data); d.finish()
    val bos = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) bos.write(buf, 0, d.deflate(buf))
    d.end()
    bos.toByteArray
  }

  /** Assemble a PDF: objects may be supplied in ANY order; `pageKids`
    * fixes the page-tree order. Content streams optionally Flate'd. */
  private def buildPdf(contents: Map[Int, String], pageObjs: Seq[(Int, Seq[Int])],
                       kidsOrder: Seq[Int], flate: Boolean,
                       objOrder: Option[Seq[Int]] = None): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = bos.write(s.getBytes(ISO_8859_1))
    w("%PDF-1.4\n")
    val kids = kidsOrder.map(n => s"$n 0 R").mkString(" ")
    val objects = scala.collection.mutable.LinkedHashMap[Int, () => Unit]()
    objects(1) = () => w(s"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    objects(2) = () => w(s"2 0 obj\n<< /Type /Pages /Kids [ $kids ] /Count ${kidsOrder.size} >>\nendobj\n")
    for ((num, contentRefs) <- pageObjs) {
      val c =
        if (contentRefs.size == 1) s"/Contents ${contentRefs.head} 0 R"
        else s"/Contents [ ${contentRefs.map(r => s"$r 0 R").mkString(" ")} ]"
      objects(num) = () => w(s"$num 0 obj\n<< /Type /Page /Parent 2 0 R $c >>\nendobj\n")
    }
    for ((num, text) <- contents) {
      objects(num) = () => {
        val raw = text.getBytes(ISO_8859_1)
        val data = if (flate) deflate(raw) else raw
        val filter = if (flate) " /Filter /FlateDecode" else ""
        w(s"$num 0 obj\n<< /Length ${data.length}$filter >>\nstream\n")
        bos.write(data)
        w("\nendstream\nendobj\n")
      }
    }
    for (num <- objOrder.getOrElse(objects.keys.toSeq)) objects(num)()
    w("trailer\n<< /Size 9 /Root 1 0 R >>\n%%EOF\n")
    bos.toByteArray
  }

  test("single-page uncompressed Tj extracts the text") {
    val pdf = buildPdf(
      contents = Map(4 -> "BT /F1 12 Tf 72 720 Td (Hello world from PDF) Tj ET"),
      pageObjs = Seq(3 -> Seq(4)), kidsOrder = Seq(3), flate = false)
    val Right(pages) = MiniPdfDecoder().decode(pdf)
    assert(pages == Seq("<div><p>Hello world from PDF</p></div>"))
  }

  test("multi-page Flate with TJ arrays, escapes, octal, and hex strings") {
    val p1 = "BT (Para \\(one\\) with \\134 backslash) Tj ET"
    val p2 = "BT [(Second ) (page ) (glued)] TJ T* (next line \\101\\102) Tj ET"
    val p3 = "BT <48656C6C6F20686578> Tj ET"
    val pdf = buildPdf(
      contents = Map(10 -> p1, 11 -> p2, 12 -> p3),
      pageObjs = Seq(5 -> Seq(10), 6 -> Seq(11), 7 -> Seq(12)),
      kidsOrder = Seq(5, 6, 7), flate = true)
    val Right(pages) = MiniPdfDecoder().decode(pdf)
    assert(pages(0) == "<div><p>Para (one) with \\ backslash</p></div>")
    assert(pages(1) == "<div><p>Second page glued next line AB</p></div>")
    assert(pages(2) == "<div><p>Hello hex</p></div>")
  }

  test("page ORDER follows the Kids tree, not document object order") {
    // objects written back-to-front: content for page B first, etc.
    val pdf = buildPdf(
      contents = Map(20 -> "BT (FIRST) Tj ET", 21 -> "BT (SECOND) Tj ET"),
      pageObjs = Seq(8 -> Seq(20), 9 -> Seq(21)),
      kidsOrder = Seq(8, 9), flate = false,
      objOrder = Some(Seq(21, 9, 20, 8, 2, 1)))
    val Right(pages) = MiniPdfDecoder().decode(pdf)
    assert(pages.map(p => p.contains("FIRST") -> p.contains("SECOND")) ==
      Seq(true -> false, false -> true))
  }

  test("/Contents array concatenates streams in order") {
    val pdf = buildPdf(
      contents = Map(30 -> "BT (alpha ) Tj ET", 31 -> "BT (beta) Tj ET"),
      pageObjs = Seq(3 -> Seq(30, 31)), kidsOrder = Seq(3), flate = true)
    val Right(pages) = MiniPdfDecoder().decode(pdf)
    assert(pages == Seq("<div><p>alpha beta</p></div>"))
  }

  test("fails CLOSED on junk, truncation, and non-PDF payloads") {
    assert(MiniPdfDecoder().decode(null).isLeft)
    assert(MiniPdfDecoder().decode("not a pdf at all".getBytes).isLeft)
    assert(MiniPdfDecoder().decode("%PDF-1.4\ngarbage with no objects".getBytes).isLeft)
    // a valid header + objects but no page tree and no /Type /Page
    val noPages = "%PDF-1.4\n1 0 obj\n<< /Type /Catalog >>\nendobj\n".getBytes(ISO_8859_1)
    assert(MiniPdfDecoder().decode(noPages).isLeft)
  }

  test("AutoPdfDecoder routes real PDFs to MiniPdf and text payloads to the stub") {
    val pdf = buildPdf(
      contents = Map(4 -> "BT (routed) Tj ET"),
      pageObjs = Seq(3 -> Seq(4)), kidsOrder = Seq(3), flate = false)
    val auto = AutoPdfDecoder()
    assert(auto.decode(pdf) == Right(Seq("<div><p>routed</p></div>")))
    val textPayload = "plain words for the fake decoder".getBytes("UTF-8")
    assert(auto.decode(textPayload) == FakePdfDecoder().decode(textPayload))
  }

  test("end-to-end: real PDFs through DocPipeline.decodePages") {
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val pdfA = buildPdf(Map(4 -> "BT (doc A text) Tj ET"),
      Seq(3 -> Seq(4)), Seq(3), flate = true)
    val pdfB = buildPdf(Map(10 -> "BT (B one) Tj ET", 11 -> "BT (B two) Tj ET"),
      Seq(5 -> Seq(10), 6 -> Seq(11)), Seq(5, 6), flate = true)
    val df = Seq(("a", pdfA), ("b", pdfB), ("junk", "not a pdf".getBytes))
      .toDF("id", "payload")
    val out = graft.operators.DocPipeline
      .decodePages(df, AutoPdfDecoder(FakePdfDecoder(40)), "payload")
      .select(col("id"), col("pages"), col("decode_error"))
      .collect().map(r => r.getString(0) ->
        (Option(r.getSeq[String](1)), Option(r.getString(2)))).toMap
    assert(out("a")._1.get == Seq("<div><p>doc A text</p></div>"))
    assert(out("b")._1.get == Seq("<div><p>B one</p></div>", "<div><p>B two</p></div>"))
    // junk payload routed to the FAKE decoder (deterministic pages, no error)
    assert(out("junk")._1.get.nonEmpty && out("junk")._2.isEmpty)
  }
}
