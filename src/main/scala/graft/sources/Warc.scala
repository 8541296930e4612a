package graft.sources

import java.io.{BufferedInputStream, ByteArrayInputStream, DataInputStream, EOFException, InputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.GZIPInputStream

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
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
    StructField("payload", BinaryType)))

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
      : Iterator[(String, String, String, Array[Byte])] = {
    val in = new DataInputStream(new BufferedInputStream(raw))
    new Iterator[(String, String, String, Array[Byte])] {
      private var nextRec: (String, String, String, Array[Byte]) = _
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
              if (i > 0) headers(line.substring(0, i).trim.toLowerCase) =
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
                headers.getOrElse("content-type", ""), payload)
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
      def next(): (String, String, String, Array[Byte]) = {
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
        .map { case (t, uri, ct, payload) => Row(t, uri, ct, payload) }
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
}
