package graft

import java.io.{ByteArrayOutputStream, File, FileOutputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.GZIPOutputStream
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsOf
import graft.sources.Warc
import org.apache.spark.sql.functions._

class WarcSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def record(wtype: String, uri: String, body: String): String = {
    val payload = body.getBytes(StandardCharsets.UTF_8)
    s"WARC/1.0\r\n" +
      s"WARC-Type: $wtype\r\n" +
      s"WARC-Target-URI: $uri\r\n" +
      s"Content-Type: text/html\r\n" +
      s"Content-Length: ${payload.length}\r\n" +
      "\r\n" + body + "\r\n\r\n"
  }

  private val warcText =
    record("warcinfo", "", "software: graft-test") +
    record("response", "http://a.example/page",
      """<a href="http://a.example/docs/paper.pdf">pdf</a> <a href="http://a.example/other.html">x</a>""") +
    record("response", "http://b.example/page",
      """see http://b.example/files/report.pdf and again http://a.example/docs/paper.pdf""")

  test("warc scan parses records from plain and gzip files") {
    val dir = new File("target/tmp/warc"); org.apache.commons.io.FileUtils.deleteQuietly(dir)
    dir.mkdirs()
    val plain = new FileOutputStream(new File(dir, "a.warc"))
    plain.write(warcText.getBytes(StandardCharsets.UTF_8)); plain.close()
    val gz = new GZIPOutputStream(new FileOutputStream(new File(dir, "b.warc.gz")))
    gz.write(warcText.getBytes(StandardCharsets.UTF_8)); gz.close()

    val records = Warc.scan(spark, dir.getAbsolutePath + "/*")
    assert(records.count() == 6, "3 records per file x 2 files")
    val types = records.groupBy("warc_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(types == Map("warcinfo" -> 2L, "response" -> 4L))
    val body = records.filter(col("target_uri") === "http://a.example/page")
      .select(decode(col("payload"), "UTF-8")).as[String].head()
    assert(body.contains("paper.pdf"))
  }

  private def recordD(wtype: String, uri: String, digest: String, body: String): String = {
    val payload = body.getBytes(StandardCharsets.UTF_8)
    s"WARC/1.0\r\n" +
      s"WARC-Type: $wtype\r\n" +
      s"WARC-Target-URI: $uri\r\n" +
      s"WARC-Payload-Digest: $digest\r\n" +
      s"Content-Type: text/html\r\n" +
      s"Content-Length: ${payload.length}\r\n" +
      "\r\n" + body + "\r\n\r\n"
  }

  test("revisit records: digest surfaces, revisits drop before decode, " +
       "digest-duplicates keep one fetch (min uri)") {
    val text =
      recordD("response", "http://a.example/1", "sha1:AAA", "HTTP/1.1 200 OK\r\n\r\nbody one") +
      recordD("revisit", "http://a.example/1.again", "sha1:AAA", "") + // re-crawl pointer
      recordD("response", "http://b.example/2", "sha1:BBB", "HTTP/1.1 200 OK\r\n\r\nbody two") +
      recordD("response", "http://c.example/0", "sha1:BBB", "HTTP/1.1 200 OK\r\n\r\nbody two mirror") +
      record("response", "http://d.example/nodigest", "no digest here")
    val dir = new File("target/tmp/warc_revisit")
    org.apache.commons.io.FileUtils.deleteQuietly(dir); dir.mkdirs()
    val f = new FileOutputStream(new File(dir, "r.warc"))
    f.write(text.getBytes(StandardCharsets.UTF_8)); f.close()
    val records = Warc.scan(spark, dir.getAbsolutePath + "/*")
    // the digest header surfaces on every record, revisits included
    val byUri = records.collect()
      .map(r => r.getString(1) -> (r.getString(0), r.getString(4))).toMap
    assert(byUri("http://a.example/1.again") == ("revisit", "sha1:AAA"))
    assert(byUri("http://b.example/2")._2 == "sha1:BBB")
    assert(byUri("http://d.example/nodigest")._2 == "")
    // crawl dedup: revisit dropped; sha1:BBB keeps min-uri fetch only;
    // the digest-less record passes through
    val kept = Warc.dedupByPayloadDigest(records)
      .select(col("target_uri")).as[String].collect().toSet
    assert(kept == Set("http://a.example/1", "http://b.example/2",
      "http://d.example/nodigest"))
    // and responseDocuments excludes revisits while carrying the digest
    val docs = Warc.responseDocuments(records)
      .select(col("target_uri"), col("payload_digest")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(!docs.contains("http://a.example/1.again"))
    assert(docs("http://a.example/1") == "sha1:AAA")
  }

  test("pdf link manifest: extract + dedup (get_pdf_links_from_cc.py parity)") {
    val dir = new File("target/tmp/warc")
    val links = Warc.pdfLinks(Warc.scan(spark, dir.getAbsolutePath + "/*"))
      .as[String].collect().toSet
    assert(links == Set("http://a.example/docs/paper.pdf", "http://b.example/files/report.pdf"))
  }

  test("responseDocuments unwraps HTTP: headers split, chunked decoded, gzip inflated") {
    // a Common-Crawl-style response record: HTTP status+headers, body
    // both chunked AND gzipped (encode order: gzip first, chunk outer)
    val doc = "%PDF-1.4 fake document body for the unwrap test"
    val gz = { val b = new ByteArrayOutputStream()
      val g = new GZIPOutputStream(b); g.write(doc.getBytes(StandardCharsets.ISO_8859_1)); g.close()
      b.toByteArray }
    def chunked(p: Array[Byte], sizes: Seq[Int]): Array[Byte] = {
      val b = new ByteArrayOutputStream()
      var off = 0
      for (s <- sizes; if off < p.length) {
        val n = math.min(s, p.length - off)
        b.write(f"$n%x\r\n".getBytes(StandardCharsets.ISO_8859_1))
        b.write(p, off, n); b.write("\r\n".getBytes(StandardCharsets.ISO_8859_1))
        off += n
      }
      b.write("0\r\n\r\n".getBytes(StandardCharsets.ISO_8859_1))
      b.toByteArray
    }
    val httpBody = chunked(gz, Seq(7, 11, 9999))
    val http = ("HTTP/1.1 200 OK\r\nContent-Type: application/pdf; charset=binary\r\n" +
      "Transfer-Encoding: chunked\r\nContent-Encoding: gzip\r\n\r\n")
      .getBytes(StandardCharsets.ISO_8859_1) ++ httpBody
    def rec(wtype: String, uri: String, p: Array[Byte]): Array[Byte] =
      (s"WARC/1.0\r\nWARC-Type: $wtype\r\nWARC-Target-URI: $uri\r\n" +
        s"Content-Type: application/http\r\nContent-Length: ${p.length}\r\n\r\n")
        .getBytes(StandardCharsets.ISO_8859_1) ++ p ++
        "\r\n\r\n".getBytes(StandardCharsets.ISO_8859_1)
    val plainHttp = ("HTTP/1.0 404 Not Found\r\nContent-Type: text/html\r\n\r\n" +
      "<html>gone</html>").getBytes(StandardCharsets.ISO_8859_1)
    val bare = "just raw conversion bytes".getBytes(StandardCharsets.ISO_8859_1)
    val dir = new File("target/tmp/warc_http"); org.apache.commons.io.FileUtils.deleteQuietly(dir)
    dir.mkdirs()
    val f = new FileOutputStream(new File(dir, "r.warc"))
    f.write(rec("response", "http://x.example/d.pdf", http))
    f.write(rec("response", "http://x.example/gone", plainHttp))
    f.write(rec("conversion", "http://x.example/conv", bare))
    f.write(rec("warcinfo", "", "software: test".getBytes(StandardCharsets.ISO_8859_1)))
    f.close()
    val docs = Warc.responseDocuments(Warc.scan(spark, dir.getAbsolutePath))
      .collect().map(r => r.getString(0) ->
        ((r.getInt(1), r.getString(2), new String(r.getAs[Array[Byte]](3), StandardCharsets.ISO_8859_1))))
      .toMap
    assert(docs.size == 3, "warcinfo must be excluded")
    assert(docs("http://x.example/d.pdf") == ((200, "application/pdf", doc)),
      s"chunk+gzip unwrap failed: ${docs("http://x.example/d.pdf")}")
    assert(docs("http://x.example/gone") == ((404, "text/html", "<html>gone</html>")))
    assert(docs("http://x.example/conv") ==
      ((0, "application/http", "just raw conversion bytes")),
      "bare payload must pass through with the WARC content-type")
  }

  test("WARC -> HTTP unwrap -> REAL PDF decode, end to end through the Spark pipeline") {
    // the complete Common-Crawl story: a response record carrying a
    // gzipped real PDF unwraps to document bytes and decodes to page
    // text through the same DocPipeline path live fetches use
    val pdfText = "Archived corpus document"
    val content = s"BT /F1 12 Tf 72 720 Td ($pdfText) Tj ET"
    val pdf = (s"%PDF-1.4\n" +
      "1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n" +
      "2 0 obj\n<< /Type /Pages /Kids [ 3 0 R ] /Count 1 >>\nendobj\n" +
      "3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n" +
      s"4 0 obj\n<< /Length ${content.length} >>\nstream\n$content\nendstream\nendobj\n" +
      "trailer\n<< /Size 5 /Root 1 0 R >>\n%%EOF\n").getBytes(StandardCharsets.ISO_8859_1)
    val gz = { val b = new ByteArrayOutputStream()
      val g = new GZIPOutputStream(b); g.write(pdf); g.close(); b.toByteArray }
    val http = ("HTTP/1.1 200 OK\r\nContent-Type: application/pdf\r\n" +
      "Content-Encoding: gzip\r\n\r\n").getBytes(StandardCharsets.ISO_8859_1) ++ gz
    val rec = (s"WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Target-URI: http://cc.example/doc.pdf\r\n" +
      s"Content-Type: application/http\r\nContent-Length: ${http.length}\r\n\r\n")
      .getBytes(StandardCharsets.ISO_8859_1) ++ http ++
      "\r\n\r\n".getBytes(StandardCharsets.ISO_8859_1)
    val dir = new File("target/tmp/warc_e2e"); org.apache.commons.io.FileUtils.deleteQuietly(dir)
    dir.mkdirs()
    val f = new FileOutputStream(new File(dir, "cc.warc")); f.write(rec); f.close()
    val docs = Warc.responseDocuments(Warc.scan(spark, dir.getAbsolutePath))
      .filter(col("mime") === "application/pdf")
    val decoded = graft.operators.DocPipeline.decodePages(
      docs, graft.sources.AutoPdfDecoder(), "body")
    val pages = decoded.select(explode(col("pages"))).as[String].collect()
    assert(pages.toSeq == Seq(s"<div><p>$pdfText</p></div>"),
      s"end-to-end WARC->PDF text extraction: $pages")
  }

  test("dechunk salvages on malformed framing, never throws") {
    import graft.sources.Warc
    assert(new String(Warc.dechunk("5\r\nhello\r\n0\r\n\r\n".getBytes), StandardCharsets.ISO_8859_1) == "hello")
    // torn mid-chunk: declared 10, only 3 present -> salvage the 3
    assert(new String(Warc.dechunk("a\r\nabc".getBytes), StandardCharsets.ISO_8859_1) == "abc")
    // garbage size line -> empty salvage, no throw
    assert(Warc.dechunk("zz\r\nboom\r\n".getBytes).isEmpty)
    // absurd size -> no allocation attempt
    assert(Warc.dechunk("ffffffffff\r\nx".getBytes).isEmpty)
  }

  test("content-decode salvage: torn gzip keeps the decoded prefix, mislabel passes through, bomb drops") {
    import graft.sources.Warc
    def http(enc: String, body: Array[Byte]): Array[Byte] =
      (s"HTTP/1.1 200 OK\r\nContent-Encoding: $enc\r\n\r\n")
        .getBytes(StandardCharsets.ISO_8859_1) ++ body
    val doc = ("the quick brown fox jumps over the lazy dog " * 3000)
      .getBytes(StandardCharsets.ISO_8859_1) // ~132 KB, compressible
    val gz = { val b = new ByteArrayOutputStream()
      val g = new GZIPOutputStream(b); g.write(doc); g.close(); b.toByteArray }
    // torn mid-stream: keep the decoded prefix, NOT the compressed junk
    val torn = java.util.Arrays.copyOf(gz, gz.length / 2)
    val (_, _, salvaged) = Warc.splitHttp(http("gzip", torn))
    assert(salvaged.nonEmpty && salvaged.length < doc.length,
      s"expected partial decode, got ${salvaged.length} of ${doc.length}")
    assert(java.util.Arrays.equals(salvaged,
      java.util.Arrays.copyOf(doc, salvaged.length)),
      "salvaged bytes must be a prefix of the original document")
    // mislabeled encoding (plain body claiming gzip): pass through untouched
    val plain = "<html>not actually gzip</html>".getBytes(StandardCharsets.ISO_8859_1)
    val (_, _, passed) = Warc.splitHttp(http("gzip", plain))
    assert(java.util.Arrays.equals(passed, plain))
    // torn zlib deflate: same prefix salvage on the deflate path
    val zl = { val b = new ByteArrayOutputStream()
      val d = new java.util.zip.DeflaterOutputStream(b); d.write(doc); d.close(); b.toByteArray }
    val (_, _, zsal) = Warc.splitHttp(http("deflate", java.util.Arrays.copyOf(zl, zl.length / 2)))
    assert(zsal.nonEmpty && zsal.length < doc.length &&
      java.util.Arrays.equals(zsal, java.util.Arrays.copyOf(doc, zsal.length)))
    // decompression bomb (>1 GiB expansion): dropped to empty, never
    // allocated as a document nor passed through as compressed bytes
    val bomb = { val b = new ByteArrayOutputStream()
      val g = new GZIPOutputStream(b)
      val zeros = new Array[Byte](1 << 20)
      for (_ <- 0 until 1025) g.write(zeros) // 1 GiB + 1 MiB of zeros
      g.close(); b.toByteArray }
    val (_, _, dropped) = Warc.splitHttp(http("gzip", bomb))
    assert(dropped.isEmpty, s"bomb must drop, got ${dropped.length} bytes")
  }
}

class AsOfToleranceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private def ts(s: Long) = new java.sql.Timestamp(s * 1000)

  test("tolerance nulls out stale matches, keeps fresh ones") {
    val left = Seq((1L, 1L, ts(100)), (2L, 1L, ts(500))).toDF("event_id", "user_id", "ts")
    val right = Seq((1L, ts(90), 7.0)).toDF("user_id", "ts", "pval")
      .select(col("user_id"), col("ts"), col("pval"))
    val got = AsOf.join(left, right, "user_id", "ts", Seq("pval"),
        tolerance = Some("60 seconds"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(got(1L).contains(7.0), "10s-old match within 60s tolerance")
    assert(got(2L).isEmpty, "410s-old match must be nulled")
  }
}
