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

  test("pdf link manifest: extract + dedup (get_pdf_links_from_cc.py parity)") {
    val dir = new File("target/tmp/warc")
    val links = Warc.pdfLinks(Warc.scan(spark, dir.getAbsolutePath + "/*"))
      .as[String].collect().toSet
    assert(links == Set("http://a.example/docs/paper.pdf", "http://b.example/files/report.pdf"))
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
