package graft.sources

import java.io.{BufferedInputStream, ByteArrayInputStream, DataInputStream, EOFException, InputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.GZIPInputStream

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** WARC scan — the reference's Common-Crawl link-mining companion
  * (`/root/reference/examples/get_pdf_links_from_cc.py:59-125` parses WAT
  * records into PDF-link manifest rows). Spark-native restatement:
  * `binaryFiles` → per-file streaming WARC parser in `flatMap` → typed
  * record rows → manifest construction is plain DataFrame code
  * (`dropDuplicates`, write parquet) exactly like the reference's one
  * real Spark usage (`get_pdf_links_from_cc.py:126`).
  *
  * Parser follows the WARC/1.0 format (ISO 28500): header block of
  * `Name: value` lines terminated by an empty line, `Content-Length`
  * payload bytes, two CRLF record separators. Handles plain and
  * whole-file-gzip WARCs.
  */
object Warc {

  val schema: StructType = StructType(Seq(
    StructField("warc_type", StringType),
    StructField("target_uri", StringType),
    StructField("content_type", StringType),
    StructField("payload", BinaryType),
    StructField("payload_digest", StringType)))

  /** Header lines are small (URIs + digests); a corrupt stream with no
    * newline for a GB must not buffer it all as one "line". Bytes past
    * the cap are consumed but not stored. */
  private val MaxHeaderLine = 64 * 1024

  /** Per-record payload ceiling (1 GiB). A corrupt or crafted
    * `Content-Length` past this is treated as lost framing, not an
    * allocation request. */
  private val MaxPayload: Long = 1L << 30

  private def readLine(in: DataInputStream): String = {
    val sb = new java.lang.StringBuilder()
    var b = in.read()
    if (b < 0) throw new EOFException()
    while (b >= 0 && b != '\n') {
      if (b != '\r' && sb.length < MaxHeaderLine) sb.append(b.toChar)
      b = in.read()
    }
    sb.toString
  }

  /** Streaming parse of one WARC stream into records.
    *
    * Corruption policy (what a 100 TB crawl needs — one bad record must
    * never fail the whole file's task): a malformed `Content-Length`
    * (non-numeric, negative, or over [[MaxPayload]]) means record framing
    * is lost, so the parser RESYNCS by scanning for the next `WARC/`
    * version line; a mid-stream I/O error (torn gzip member, truncated
    * tail) ends the stream and SALVAGES everything parsed before it.
    *
    * `onResync` / `onTear` fire once per salvage event so callers can
    * COUNT dropped data instead of losing it silently — [[scanCounted]]
    * wires them to Spark accumulators. */
  def parseStream(raw: InputStream,
                  onResync: () => Unit = () => (),
                  onTear: () => Unit = () => ())
      : Iterator[(String, String, String, Array[Byte], String)] = {
    val in = new DataInputStream(new BufferedInputStream(raw))
    new Iterator[(String, String, String, Array[Byte], String)] {
      private var nextRec: (String, String, String, Array[Byte], String) = _
      private var done = false

      private def advance(): Unit = {
        try {
          var found = false
          while (!found) {
            // seek the version line (skips inter-record blank lines, and
            // resyncs after a record whose framing was unparseable)
            var line = readLine(in)
            while (!line.startsWith("WARC/")) line = readLine(in)
            val headers = scala.collection.mutable.Map.empty[String, String]
            line = readLine(in)
            while (line.nonEmpty) {
              val i = line.indexOf(':')
              if (i > 0) headers(line.substring(0, i).trim.toLowerCase(java.util.Locale.ROOT)) =
                line.substring(i + 1).trim
              line = readLine(in)
            }
            val len = headers.get("content-length")
              .flatMap(v => v.toLongOption).getOrElse(-1L)
            if (len >= 0 && len <= MaxPayload) {
              val payload = new Array[Byte](len.toInt)
              in.readFully(payload)
              nextRec = (headers.getOrElse("warc-type", ""),
                headers.getOrElse("warc-target-uri", ""),
                headers.getOrElse("content-type", ""), payload,
                headers.getOrElse("warc-payload-digest", ""))
              found = true
            } else onResync() // framing lost — loop resyncs at next WARC/
          }
        } catch {
          case _: EOFException => done = true
          case _: java.io.IOException => done = true; onTear() // torn gzip etc
        }
      }

      advance()
      def hasNext: Boolean = !done
      def next(): (String, String, String, Array[Byte], String) = {
        val r = nextRec; advance(); r
      }
    }
  }

  /** Salvage counters for a [[scanCounted]] run. Spark accumulators:
    * exact on success, at-least-once under task retries — monitoring
    * semantics (alert when nonzero), not billing semantics. */
  final case class SalvageCounters(
      resyncedRecords: org.apache.spark.util.LongAccumulator,
      tornStreams: org.apache.spark.util.LongAccumulator,
      unreadableFiles: org.apache.spark.util.LongAccumulator)

  /** Scan a directory/glob of `.warc` / `.warc.gz` files into a DataFrame
    * of records. Each file is one task (CC-style archives are ~1 GB —
    * the natural partition granule). */
  def scan(spark: SparkSession, path: String): DataFrame =
    scanCounted(spark, path)._1

  /** [[scan]], plus salvage observability: counters for records dropped
    * to framing resync, streams ended early by a tear, and files whose
    * gzip header would not even open. Silent data loss at corpus scale
    * is a bug — these make the loss a measured, alertable quantity. */
  def scanCounted(spark: SparkSession, path: String): (DataFrame, SalvageCounters) = {
    val counters = SalvageCounters(
      spark.sparkContext.longAccumulator("warc.records.resynced"),
      spark.sparkContext.longAccumulator("warc.streams.torn"),
      spark.sparkContext.longAccumulator("warc.files.unreadable"))
    val rdd = spark.sparkContext.binaryFiles(path).flatMap { case (name, pds) =>
      val base: InputStream = pds.open()
      // a corrupt gzip HEADER throws at construction (before the parser's
      // salvage policy can apply) — treat that file as empty, not failed
      val stream: Option[InputStream] =
        try Some(if (name.endsWith(".gz")) new GZIPInputStream(base) else base)
        catch {
          case _: java.io.IOException =>
            base.close(); counters.unreadableFiles.add(1L); None
        }
      stream.iterator
        .flatMap(parseStream(_,
          onResync = () => counters.resyncedRecords.add(1L),
          onTear = () => counters.tornStreams.add(1L)))
        .map { case (t, uri, ct, payload, dig) => Row(t, uri, ct, payload, dig) }
    }
    (spark.createDataFrame(rdd, schema), counters)
  }

  /** PDF-link manifest from response-ish records: extract `.pdf` hrefs
    * from the payload text, one row per distinct URL — the reference
    * example's output contract (`get_pdf_links_from_cc.py:113-131`). */
  def pdfLinks(records: DataFrame): DataFrame =
    records
      .filter(col("warc_type").isin("response", "resource", "metadata", "conversion"))
      .select(explode(regexp_extract_all(
        decode(col("payload"), "UTF-8"),
        lit("""https?://[^\s"'<>\\)]+\.pdf"""), lit(0))).as("url"))
      .dropDuplicates("url")

  // ------------------------------------------------ HTTP payload unwrap

  /** A WARC `response` record's payload is the raw HTTP message: status
    * line + headers + body, with the body possibly chunked
    * (`Transfer-Encoding: chunked`) and/or compressed
    * (`Content-Encoding: gzip`/`deflate`). Getting DOCUMENT BYTES out —
    * the input every decode operator downstream wants — needs all three
    * unwrapped. Returns (status, lowercased headers, body). A payload
    * with no `HTTP/` status line passes through whole as the body
    * (resource/conversion records carry bare documents). */
  private[graft] def splitHttp(p: Array[Byte]): (Int, Map[String, String], Array[Byte]) = {
    if (p == null || p.length < 5 ||
        !(p(0) == 'H' && p(1) == 'T' && p(2) == 'T' && p(3) == 'P' && p(4) == '/'))
      return (0, Map.empty, if (p == null) Array.emptyByteArray else p)
    // header/body split at the first blank line (CRLF CRLF, LF-tolerant)
    var i = 0
    var split = -1
    while (split < 0 && i < p.length - 1) {
      if (p(i) == '\n') {
        if (p(i + 1) == '\n') split = i + 2
        else if (i + 2 < p.length && p(i + 1) == '\r' && p(i + 2) == '\n') split = i + 3
      }
      i += 1
    }
    if (split < 0) return (0, Map.empty, p) // torn header: pass through
    val head = new String(p, 0, split, StandardCharsets.ISO_8859_1)
    val lines = head.split("\r?\n").toSeq
    val status = """HTTP/\S+\s+(\d{3})""".r.findFirstMatchIn(lines.head)
      .map(_.group(1).toInt).getOrElse(0)
    val headers = lines.tail.flatMap { l =>
      val c = l.indexOf(':')
      if (c > 0) Some(l.substring(0, c).trim.toLowerCase(java.util.Locale.ROOT) ->
        l.substring(c + 1).trim) else None
    }.toMap
    var body = java.util.Arrays.copyOfRange(p, split, p.length)
    if (headers.get("transfer-encoding").exists(_.toLowerCase(java.util.Locale.ROOT).contains("chunked")))
      body = dechunk(body)
    headers.get("content-encoding").map(_.toLowerCase(java.util.Locale.ROOT)) match {
      case Some(ce) if ce.contains("gzip") => body = gunzipCapped(body)
      case Some(ce) if ce.contains("deflate") => body = inflateCapped(body)
      case _ =>
    }
    (status, headers, body)
  }

  /** RFC 9112 chunked decoding: `size-hex[;ext]\r\n bytes \r\n`, ended
    * by a zero chunk (trailers dropped). Malformed framing salvages the
    * bytes decoded so far plus nothing else — never throws. */
  private[graft] def dechunk(p: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(p.length)
    var i = 0
    var done = false
    while (!done && i < p.length) {
      // read the size line
      val lineEnd = {
        var j = i
        while (j < p.length && p(j) != '\n') j += 1
        j
      }
      if (lineEnd >= p.length) done = true
      else {
        val line = new String(p, i, lineEnd - i, StandardCharsets.ISO_8859_1).trim
        val hex = line.takeWhile(c => Character.digit(c, 16) >= 0)
        if (hex.isEmpty) done = true // malformed: salvage what we have
        else {
          val size = try java.lang.Long.parseLong(hex, 16) catch { case _: NumberFormatException => -1L }
          if (size < 0 || size > MaxPayload) done = true
          else if (size == 0) done = true // final chunk; trailers ignored
          else {
            val start = lineEnd + 1
            val end = math.min(p.length.toLong, start + size).toInt
            if (start >= p.length) done = true
            else {
              out.write(p, start, end - start)
              i = end
              // skip the chunk-terminating CRLF
              if (i < p.length && p(i) == '\r') i += 1
              if (i < p.length && p(i) == '\n') i += 1
              if (end.toLong < start + size) done = true // torn chunk: salvaged
            }
          }
        }
      }
    }
    out.toByteArray
  }

  /** Over-[[MaxPayload]] expansion: a crafted body, not a framing tear —
    * distinguished so the salvage policy can DROP it instead of either
    * allocating the blow-up or passing the compressed form downstream. */
  private final class CapExceeded
    extends java.io.IOException("decompressed body exceeds payload cap")

  /** Content-decoding salvage policy (mirrors [[parseStream]]'s): a
    * MISLABELED encoding — zero bytes decodable, the common server bug of
    * claiming gzip on a plain body — passes the body through untouched; a
    * stream TORN after partial decode keeps the decoded prefix (a
    * mostly-complete document beats compressed junk bytes downstream); a
    * decompression BOMB over [[MaxPayload]] is dropped to empty. */
  private def gunzipCapped(p: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(8192)
    try { copyCapped(new GZIPInputStream(new ByteArrayInputStream(p)), out); out.toByteArray }
    catch {
      case _: CapExceeded => Array.emptyByteArray
      case _: java.io.IOException =>
        if (out.size() == 0) p else out.toByteArray
    }
  }

  private def inflateCapped(p: Array[Byte]): Array[Byte] = {
    // HTTP "deflate" is zlib-wrapped; some servers send raw deflate —
    // try zlib first, fall back to raw (nowrap)
    val out = new java.io.ByteArrayOutputStream(8192)
    try { copyCapped(new java.util.zip.InflaterInputStream(new ByteArrayInputStream(p)), out); out.toByteArray }
    catch {
      case _: CapExceeded => Array.emptyByteArray
      case _: java.io.IOException if out.size() > 0 => out.toByteArray
      case _: java.io.IOException =>
        val raw = new java.io.ByteArrayOutputStream(8192)
        try {
          copyCapped(new java.util.zip.InflaterInputStream(
            new ByteArrayInputStream(p), new java.util.zip.Inflater(true)), raw)
          raw.toByteArray
        } catch {
          case _: CapExceeded => Array.emptyByteArray
          case _: java.io.IOException =>
            if (raw.size() == 0) p else raw.toByteArray
        }
    }
  }

  private def copyCapped(in: InputStream, out: java.io.ByteArrayOutputStream): Unit =
    try {
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) {
        if (out.size().toLong + n > MaxPayload) throw new CapExceeded
        out.write(buf, 0, n)
        n = in.read(buf)
      }
    } finally in.close()

  /** Document bytes from `response`/`resource`/`conversion` records:
    * (target_uri, http_status, mime from the HTTP header — falling back
    * to the WARC content-type — and the unwrapped body). The input to
    * every downstream decode operator when the corpus arrives as WARC
    * instead of live fetches. Scale shape: one map over the record
    * frame, no shuffle. */
  def responseDocuments(records: DataFrame): DataFrame = {
    val unwrap = udf { (p: Array[Byte], warcCt: String) =>
      val (status, headers, body) = splitHttp(p)
      val mime = headers.get("content-type").map(_.takeWhile(_ != ';').trim)
        .filter(_.nonEmpty).getOrElse(if (warcCt == null) "" else warcCt)
      (status, mime, body)
    }
    records
      .filter(col("warc_type").isin("response", "resource", "conversion"))
      .withColumn("__u", unwrap(col("payload"), col("content_type")))
      .select(col("target_uri"),
        col("__u._1").as("http_status"),
        col("__u._2").as("mime"),
        col("__u._3").as("body"),
        col("payload_digest"))
  }

  /** Crawl-level dedup BEFORE fetch/decode (ISO 28500 §6.7: a
    * `WARC-Type: revisit` record marks content whose payload digest
    * matched an earlier capture — Common Crawl writes one per
    * re-crawled unchanged page). Policy:
    *
    *   - `revisit` records DROP — they carry no payload, only the
    *     pointer; decoding them would yield empty documents
    *   - among content records sharing a non-empty
    *     `WARC-Payload-Digest`, ONE survives (deterministically the
    *     min target_uri via one struct-min partial agg — no window,
    *     no join-back; the exact-dedup keep-best shape)
    *   - records with NO digest pass through untouched (can't prove
    *     duplication, so never silently drop)
    *
    * Scale shape: ONE shuffle on the digest key, partial+final
    * aggregate (plan-gated: no join-back, no per-key window). Because
    * the min-struct buffer carries the binary payload, Spark plans a
    * SortAggregate rather than a hash aggregate — the per-partition
    * sort is the known cost of single-shuffle keep-best over wide
    * rows; the alternative (tiny winner agg + semi-join back) trades
    * it for a second shuffle of the full record frame, which loses
    * whenever duplicates are common (the crawl case). */
  def dedupByPayloadDigest(records: DataFrame): DataFrame = {
    val content = records.filter(col("warc_type") =!= "revisit")
    val undigested = content.filter(col("payload_digest").isNull ||
      col("payload_digest") === "")
    val keyed = content.filter(col("payload_digest").isNotNull &&
      col("payload_digest") =!= "")
    val cols = records.columns.toSeq
    val rest = cols.filterNot(_ == "payload_digest").filterNot(_ == "target_uri")
    val bestFields: Seq[Column] = col("target_uri") +: rest.map(col)
    val outCols: Seq[Column] =
      col("payload_digest") +: (col("__best.target_uri").as("target_uri") +:
        rest.map(c => col(s"__best.$c").as(c)))
    val kept = keyed
      .groupBy(col("payload_digest"))
      .agg(min(struct(bestFields: _*)).as("__best"))
      .select(outCols: _*)
      .select(cols.map(col): _*)
    kept.unionByName(undigested.select(cols.map(col): _*))
  }
}
