package graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream, File, FileOutputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.GZIPOutputStream

import org.apache.commons.compress.archivers.tar.{TarArchiveEntry, TarArchiveOutputStream}
import org.scalatest.funsuite.AnyFunSuite

import graft.sinks.TfRecord
import graft.sources.{Warc, WebDataset}

/** Corpus-scale corruption policy for the binary sources: torn tails,
  * flipped bytes, and crafted lengths must SALVAGE what parsed cleanly
  * and end (or resync) — never throw out of a task, never allocate
  * unbounded memory. One bad record in a 1 GB archive that fails the
  * task 4 times fails the whole job; these specs pin that it cannot. */
class SourcesFuzzSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def warcRecord(uri: String, body: String): String = {
    val payload = body.getBytes(StandardCharsets.UTF_8)
    s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: $uri\r\n" +
      s"Content-Length: ${payload.length}\r\n\r\n$body\r\n\r\n"
  }

  // ------------------------------------------------------------------ WARC

  test("warc: non-numeric and absurd Content-Length resync at the next record") {
    val text =
      warcRecord("http://ok1.example/", "first good body") +
      "WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: http://bad.example/\r\n" +
      "Content-Length: banana\r\n\r\n" + // unparseable: framing lost
      warcRecord("http://ok2.example/", "second good body") +
      "WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: http://huge.example/\r\n" +
      "Content-Length: 99999999999999\r\n\r\n" + // over cap: framing lost
      warcRecord("http://ok3.example/", "third good body")
    val recs = Warc.parseStream(
      new ByteArrayInputStream(text.getBytes(StandardCharsets.UTF_8))).toSeq
    val uris = recs.map(_._2)
    assert(uris.contains("http://ok1.example/"))
    assert(uris.contains("http://ok3.example/"), "parser must resync after lost framing")
    assert(!uris.contains("http://bad.example/") && !uris.contains("http://huge.example/"))
  }

  test("warc: truncated payload salvages prior records") {
    val good = warcRecord("http://ok.example/", "complete body")
    val torn = "WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: http://torn.example/\r\n" +
      "Content-Length: 5000\r\n\r\nonly a few bytes"
    val recs = Warc.parseStream(new ByteArrayInputStream(
      (good + torn).getBytes(StandardCharsets.UTF_8))).toSeq
    assert(recs.map(_._2) == Seq("http://ok.example/"))
  }

  test("warc: random byte soup never throws and never hangs") {
    val rnd = new scala.util.Random(42)
    for (_ <- 0 until 100) {
      val bytes = new Array[Byte](rnd.nextInt(8192))
      rnd.nextBytes(bytes)
      Warc.parseStream(new ByteArrayInputStream(bytes)).foreach(_ => ()) // must not throw
    }
  }

  test("warc: a GB-scale line with no newline is not buffered whole (header-line cap)") {
    // 10 MB of 'A' with no newline: readLine must cap its buffer, not mirror input
    val bytes = Array.fill[Byte](10 << 20)('A')
    val recs = Warc.parseStream(new ByteArrayInputStream(bytes)).toSeq
    assert(recs.isEmpty)
  }

  test("warc scan: corrupt gzip header file yields zero rows, not a failed job") {
    val dir = new File("target/tmp/warc_fuzz"); org.apache.commons.io.FileUtils.deleteQuietly(dir)
    dir.mkdirs()
    val bad = new FileOutputStream(new File(dir, "bad.warc.gz"))
    bad.write("this is not gzip at all".getBytes(StandardCharsets.UTF_8)); bad.close()
    val gz = new GZIPOutputStream(new FileOutputStream(new File(dir, "good.warc.gz")))
    gz.write(warcRecord("http://ok.example/", "body").getBytes(StandardCharsets.UTF_8)); gz.close()
    val rows = Warc.scan(spark, dir.getAbsolutePath + "/*").collect()
    assert(rows.length == 1, "good file parses; corrupt-header file contributes nothing")
  }

  test("warc scan: torn gzip TAIL salvages the records before the tear") {
    val dir = new File("target/tmp/warc_fuzz2"); org.apache.commons.io.FileUtils.deleteQuietly(dir)
    dir.mkdirs()
    val bos = new ByteArrayOutputStream()
    val gz = new GZIPOutputStream(bos)
    gz.write((warcRecord("http://one.example/", "aaa") +
      warcRecord("http://two.example/", "bbb")).getBytes(StandardCharsets.UTF_8))
    gz.close()
    val full = bos.toByteArray
    val torn = full.take(full.length - 12) // cut the gzip trailer + some data
    val f = new FileOutputStream(new File(dir, "torn.warc.gz"))
    f.write(torn); f.close()
    val rows = Warc.scan(spark, dir.getAbsolutePath + "/*").collect()
    assert(rows.nonEmpty, "records before the tear are salvaged")
  }

  // ----------------------------------------------------------- WebDataset

  test("webdataset: corrupt tar tail salvages complete pairs") {
    val dir = new File("target/tmp/wds_fuzz"); org.apache.commons.io.FileUtils.deleteQuietly(dir)
    dir.mkdirs()
    val bos = new ByteArrayOutputStream()
    val os = new TarArchiveOutputStream(bos)
    def put(name: String, data: Array[Byte]): Unit = {
      val e = new TarArchiveEntry(name); e.setSize(data.length)
      os.putArchiveEntry(e); os.write(data); os.closeArchiveEntry()
    }
    put("k0.txt", "payload zero".getBytes(StandardCharsets.UTF_8))
    put("k0.json", """{"k":"0"}""".getBytes(StandardCharsets.UTF_8))
    put("k1.txt", "payload one".getBytes(StandardCharsets.UTF_8))
    put("k1.json", """{"k":"1"}""".getBytes(StandardCharsets.UTF_8))
    os.finish()
    val full = bos.toByteArray
    // overwrite the second half with garbage: k0's pair stays intact
    val rnd = new scala.util.Random(7)
    val corrupt = full.clone()
    for (i <- full.length / 2 until full.length) corrupt(i) = rnd.nextInt(256).toByte
    val f = new FileOutputStream(new File(dir, "s0.tar")); f.write(corrupt); f.close()
    val rows = WebDataset.read(spark, dir.getAbsolutePath).collect()
    assert(rows.map(_.getString(0)).contains("k0"), "pairs before the corruption salvage")
  }

  test("webdataset: all-orphan tar stays under the buffer cap, every payload salvaged") {
    // no .json ever arrives — pre-cap this buffered the WHOLE shard
    // on-heap; with the cap, oldest orphans emit early with null meta
    // (the same row they would get at EOF) and memory stays bounded
    val dir = new File("target/tmp/wds_orphans"); org.apache.commons.io.FileUtils.deleteQuietly(dir)
    dir.mkdirs()
    val bos = new ByteArrayOutputStream()
    val os = new TarArchiveOutputStream(bos)
    def put(name: String, data: Array[Byte]): Unit = {
      val e = new TarArchiveEntry(name); e.setSize(data.length)
      os.putArchiveEntry(e); os.write(data); os.closeArchiveEntry()
    }
    val n = 50
    for (i <- 0 until n) put(f"k$i%03d.txt", Array.fill[Byte](1000)(i.toByte))
    // one late pair whose payload was already evicted: meta must drop,
    // not resurrect a second row for the same key
    put("k000.json", """{"late":true}""".getBytes(StandardCharsets.UTF_8))
    os.finish()
    val f = new FileOutputStream(new File(dir, "s0.tar")); f.write(bos.toByteArray); f.close()
    // cap of ~5 payloads forces eviction 45 times
    val (df, _) = WebDataset.readCounted(spark, dir.getAbsolutePath, maxOrphanBytes = 5000L)
    val rows = df.collect()
    assert(rows.length == n, s"expected $n salvage rows, got ${rows.length}")
    assert(rows.map(_.getString(0)).distinct.length == n, "one row per key, no dup emission")
    assert(rows.forall(_.isNullAt(2)), "orphans emit with null meta")
    assert(rows.forall(_.getAs[Array[Byte]](1).length == 1000), "payload bytes intact")
  }

  test("webdataset: all-meta tar stays under the buffer cap; payload after meta eviction salvages") {
    // the dual hole: only .json entries ever arrive — pre-cap this
    // buffered every meta string on-heap. Past the cap the oldest meta
    // drops (its EOF fate anyway); a payload arriving AFTER its meta
    // was evicted still salvages with null meta, and a payload whose
    // meta survived pairs normally.
    val dir = new File("target/tmp/wds_metas"); org.apache.commons.io.FileUtils.deleteQuietly(dir)
    dir.mkdirs()
    val bos = new ByteArrayOutputStream()
    val os = new TarArchiveOutputStream(bos)
    def put(name: String, data: Array[Byte]): Unit = {
      val e = new TarArchiveEntry(name); e.setSize(data.length)
      os.putArchiveEntry(e); os.write(data); os.closeArchiveEntry()
    }
    val n = 50
    for (i <- 0 until n)
      put(f"k$i%03d.json", (s"""{"i":$i,"pad":"""" + "x" * 1000 + "\"}").getBytes(StandardCharsets.UTF_8))
    // k000's meta was evicted long ago; k049's survived (most recent)
    put("k000.txt", Array.fill[Byte](10)(1))
    put("k049.txt", Array.fill[Byte](10)(2))
    os.finish()
    val f = new FileOutputStream(new File(dir, "s0.tar")); f.write(bos.toByteArray); f.close()
    // cap of ~5 metas forces meta eviction 45 times
    val (df, _) = WebDataset.readCounted(spark, dir.getAbsolutePath, maxOrphanBytes = 5000L)
    val rows = df.collect().sortBy(_.getString(0))
    assert(rows.length == 2, s"only paired/salvaged payloads emit rows, got ${rows.length}")
    assert(rows(0).getString(0) == "k000" && rows(0).isNullAt(2),
      "payload after meta eviction salvages with null meta")
    assert(rows(1).getString(0) == "k049" && rows(1).getString(2).contains("\"i\":49"),
      "payload whose meta survived pairs normally")
  }

  test("http fetch: a body past the payload cap is a counted failure, not an OOM") {
    class Endless(total: Long) extends java.io.InputStream {
      var served = 0L
      var closed = false
      override def read(): Int = { if (served >= total) -1 else { served += 1; 'x' } }
      override def read(b: Array[Byte], off: Int, len: Int): Int = {
        if (served >= total) -1
        else { val n = math.min(len.toLong, total - served).toInt
               java.util.Arrays.fill(b, off, off + n, 'x'.toByte); served += n; n }
      }
      override def close(): Unit = closed = true
    }
    val over = new Endless(100000)
    val res = graft.sources.HttpFetch.boundedBody(over, cap = 4096)
    assert(res.isLeft && res.swap.toOption.get.contains("exceeds"))
    assert(over.closed, "oversize body stream must be closed (aborts the transfer)")
    assert(over.served <= 4096 + 65536 + 65536, "reading stops near the cap, not at EOF")
    val under = new Endless(1000)
    val ok = graft.sources.HttpFetch.boundedBody(under, cap = 4096)
    assert(ok.isRight && ok.toOption.get.length == 1000 && under.closed)
  }

  test("webdataset: random-bytes .tar yields zero rows, not a failed job") {
    val dir = new File("target/tmp/wds_fuzz2"); org.apache.commons.io.FileUtils.deleteQuietly(dir)
    dir.mkdirs()
    val rnd = new scala.util.Random(13)
    val junk = new Array[Byte](4096); rnd.nextBytes(junk)
    val f = new FileOutputStream(new File(dir, "junk.tar")); f.write(junk); f.close()
    assert(WebDataset.read(spark, dir.getAbsolutePath).count() == 0)
  }

  // -------------------------------------------------------------- TFRecord

  private def framedRecords(payloads: Seq[Array[Byte]]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    payloads.foreach(TfRecord.writeRecord(out, _))
    out.flush(); bos.toByteArray
  }

  test("tfrecord: flipped byte ends the stream, salvaging prior records") {
    val a = "record-a".getBytes(StandardCharsets.UTF_8)
    val b = "record-b".getBytes(StandardCharsets.UTF_8)
    val c = "record-c".getBytes(StandardCharsets.UTF_8)
    val bytes = framedRecords(Seq(a, b, c))
    // flip one byte inside record b's frame (after a's 12 + 8 + 4 = 24+len(a) bytes)
    val off = 12 + a.length + 4 + 6
    bytes(off) = (bytes(off) ^ 0x55).toByte
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val got = Iterator.continually(TfRecord.nextRecord(in)).takeWhile(_.isDefined).flatten.toSeq
    assert(got.map(new String(_, StandardCharsets.UTF_8)) == Seq("record-a"))
  }

  test("tfrecord: truncation mid-record salvages prior records") {
    val a = "alpha".getBytes(StandardCharsets.UTF_8)
    val b = "beta-beta-beta".getBytes(StandardCharsets.UTF_8)
    val bytes = framedRecords(Seq(a, b))
    val torn = bytes.take(bytes.length - 7)
    val in = new DataInputStream(new ByteArrayInputStream(torn))
    val got = Iterator.continually(TfRecord.nextRecord(in)).takeWhile(_.isDefined).flatten.toSeq
    assert(got.map(new String(_, StandardCharsets.UTF_8)) == Seq("alpha"))
  }

  test("tfrecord: random byte soup never throws, never allocates a crafted length") {
    val rnd = new scala.util.Random(99)
    for (_ <- 0 until 200) {
      val bytes = new Array[Byte](rnd.nextInt(2048))
      rnd.nextBytes(bytes)
      val in = new DataInputStream(new ByteArrayInputStream(bytes))
      // must terminate without throwing; length CRC rejects garbage frames
      Iterator.continually(TfRecord.nextRecord(in)).takeWhile(_.isDefined).size
    }
  }

  // ---------------------------------------------------- salvage observability

  test("warc: salvage counters measure what was dropped") {
    val dir = new File("target/tmp/warc_fuzz3"); org.apache.commons.io.FileUtils.deleteQuietly(dir)
    dir.mkdirs()
    val text =
      warcRecord("http://ok.example/", "good") +
      "WARC/1.0\r\nContent-Length: nope\r\n\r\n" + // 1 resync
      warcRecord("http://ok2.example/", "good too")
    val f = new FileOutputStream(new File(dir, "a.warc"))
    f.write(text.getBytes(StandardCharsets.UTF_8)); f.close()
    val bad = new FileOutputStream(new File(dir, "bad.warc.gz"))
    bad.write("not gzip".getBytes(StandardCharsets.UTF_8)); bad.close() // 1 unreadable
    val (df, counters) = Warc.scanCounted(spark, dir.getAbsolutePath + "/*")
    assert(df.count() == 2)
    assert(counters.resyncedRecords.value == 1L)
    assert(counters.unreadableFiles.value == 1L)
    assert(counters.tornStreams.value == 0L)
  }

  test("webdataset: torn-tar counter is nonzero when a shard is corrupt") {
    val dir = new File("target/tmp/wds_fuzz3"); org.apache.commons.io.FileUtils.deleteQuietly(dir)
    dir.mkdirs()
    val rnd = new scala.util.Random(5)
    val junk = new Array[Byte](8192); rnd.nextBytes(junk)
    val f = new FileOutputStream(new File(dir, "junk.tar")); f.write(junk); f.close()
    val (df, torn) = WebDataset.readCounted(spark, dir.getAbsolutePath)
    assert(df.count() == 0)
    assert(torn.value >= 1L)
  }

  test("tfrecord: onCorrupt fires for flipped bytes but not clean EOF") {
    val a = "aaa".getBytes(StandardCharsets.UTF_8)
    val clean = framedRecords(Seq(a))
    var n = 0
    val in1 = new DataInputStream(new ByteArrayInputStream(clean))
    Iterator.continually(TfRecord.nextRecord(in1, () => n += 1)).takeWhile(_.isDefined).size
    assert(n == 0, "clean EOF is not corruption")
    val bad = clean.clone(); bad(4) = (bad(4) ^ 0x1).toByte // corrupt the length word
    val in2 = new DataInputStream(new ByteArrayInputStream(bad))
    Iterator.continually(TfRecord.nextRecord(in2, () => n += 1)).takeWhile(_.isDefined).size
    assert(n == 1)
  }

  test("tfrecord scan exposes the corruptTails DSv2 metric in the executed plan") {
    val scan = new graft.sources.TfRecordScan("/tmp/nonexistent",
      org.apache.spark.sql.types.StructType(Nil))
    val metrics = scan.supportedCustomMetrics()
    assert(metrics.map(_.name()).contains("corruptTails"))
  }
}
