package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration
import java.util.concurrent.{Executors, TimeUnit}
import scala.jdk.CollectionConverters._
import scala.util.control.NonFatal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Bounded-concurrency HTTP fetch operator — the one genuinely custom
  * "source" (SURVEY §2.1): per-row URL → bytes with UA header, timeout,
  * retries, and X-Robots-Tag opt-out handling
  * (`/root/reference/doc2dataset/downloader.py:20-66`).
  *
  * Spark's 1-thread-per-task model underuses the network for I/O-bound
  * fetch, so inside each partition we run a bounded async pool (the
  * reference's 256-thread/semaphore design, `downloader.py:274-305`),
  * while Spark handles distribution, retries-at-task-level, and
  * backpressure across the cluster. The operator is idempotent (pure
  * function of the URL modulo remote state), safe under task re-runs.
  *
  * Results carry the reference's status contract: `status ∈ {success,
  * failed_to_download}` + `error_message` — errors are data, never
  * exceptions (SURVEY §7.5.5).
  */
object HttpFetch {

  /** Header directives that opt a document out of dataset use
    * (ref `downloader.py:16-17`). */
  val defaultDisallowed: Seq[String] = Seq("noai", "noindex")

  case class FetchResult(url: String, payload: Array[Byte],
                         status: String, error_message: String)

  def resultSchema(base: StructType): StructType =
    StructType(base.fields ++ Seq(
      StructField("payload", BinaryType),
      StructField("status", StringType),
      StructField("error_message", StringType)))

  /** True when the X-Robots-Tag headers disallow use for `userAgentToken`
    * (ref `is_disallowed`, `downloader.py:20-34`). */
  def isDisallowed(headers: Map[String, Seq[String]], userAgentToken: Option[String],
                   disallowed: Seq[String]): Boolean = {
    if (disallowed.isEmpty) return false
    val tags = headers.collect {
      case (k, vs) if k.equalsIgnoreCase("x-robots-tag") => vs
    }.flatten
    tags.exists { tag =>
      val parts = tag.split(":", 2).map(_.trim)
      val (agent, directives) =
        if (parts.length == 2) (Some(parts(0).toLowerCase(java.util.Locale.ROOT)), parts(1))
        else (None, parts(0))
      val applies = agent.isEmpty || userAgentToken.exists(t => agent.contains(t.toLowerCase(java.util.Locale.ROOT)))
      applies && directives.split(",").map(_.trim.toLowerCase(java.util.Locale.ROOT)).exists(disallowed.contains)
    }
  }

  /** Fetch every `url` in `df`, appending payload/status/error_message.
    *
    * @param threadsPerTask bounded in-task concurrency (ref default 256
    *                       spread across processes; per Spark task a
    *                       smaller pool multiplies across executors)
    */
  private def userAgent(token: Option[String]): String =
    "Mozilla/5.0 (X11; Ubuntu; Linux x86_64; rv:72.0) Gecko/20100101 Firefox/72.0" +
      token.map(t => s" (compatible; $t;)").getOrElse("")

  /** One URL → (payload, status, error) with retries and the X-Robots-Tag
    * opt-out check — the shared core of both fetch flavors. */
  /** Per-document payload ceiling (256 MiB). `ofByteArray` would buffer
    * whatever a hostile or misconfigured server streams — at crawl scale
    * one endless body must become a counted failure, not an executor OOM. */
  private val MaxBodyBytes: Long = 256L * 1024 * 1024

  /** Read at most `cap` bytes from the body stream; Left(error) past the
    * cap. The stream is always closed (also aborts the transfer). */
  private[graft] def boundedBody(in: java.io.InputStream,
                                   cap: Long = MaxBodyBytes): Either[String, Array[Byte]] =
    try {
      val bos = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](64 * 1024)
      var n = in.read(buf)
      while (n >= 0) {
        if (bos.size().toLong + n > cap)
          return Left(s"payload exceeds $cap bytes")
        bos.write(buf, 0, n)
        n = in.read(buf)
      }
      Right(bos.toByteArray)
    } finally in.close()

  private def fetchUrl(client: HttpClient, url: String, ua: String,
                       timeoutSec: Int, retries: Int,
                       userAgentToken: Option[String],
                       disallowed: Seq[String]): (Array[Byte], String, String) = {
    var attempt = 0
    var last: (Array[Byte], String, String) = (null, "failed_to_download", "no attempt")
    while (attempt <= retries) {
      try {
        val req = HttpRequest.newBuilder(URI.create(url))
          .timeout(Duration.ofSeconds(timeoutSec.toLong))
          .header("User-Agent", ua)
          .GET().build()
        val resp = client.send(req, HttpResponse.BodyHandlers.ofInputStream())
        if (resp.statusCode() >= 400) {
          resp.body().close()
          last = (null, "failed_to_download", s"http ${resp.statusCode()}")
        } else {
          val headers = resp.headers().map().asScala.toMap
            .map { case (k, v) => k -> v.asScala.toSeq }
          if (isDisallowed(headers, userAgentToken, disallowed)) {
            resp.body().close()
            last = (null, "failed_to_download", "Use of image disallowed by X-Robots-Tag directive")
          } else boundedBody(resp.body()) match {
            case Right(bytes) => return (bytes, "success", null)
            case Left(err)    => last = (null, "failed_to_download", err)
          }
        }
      } catch {
        case NonFatal(e) =>
          val msg = if (e.getMessage == null) e.getClass.getSimpleName else e.getMessage
          last = (null, "failed_to_download", msg)
      }
      attempt += 1
    }
    last
  }

  /** One JVM-wide client for the streaming (UDF) fetch flavor — created
    * lazily per executor; request-level timeouts, so sharing is safe. */
  @transient private lazy val sharedClient: HttpClient =
    HttpClient.newBuilder().followRedirects(HttpClient.Redirect.NORMAL).build()

  /** Stream-capable fetch: a scalar UDF over `url` (the pooled
    * [[fetch]] goes through `df.rdd`, which a streaming plan can't).
    * One request in flight per task — in a streaming job, concurrency
    * comes from partitions/cores rather than an in-task pool. */
  def fetchStreaming(df: DataFrame, timeoutSec: Int = 10, retries: Int = 0,
                     userAgentToken: Option[String] = None,
                     disallowed: Seq[String] = Nil): DataFrame = {
    val ua = userAgent(userAgentToken)
    val f = org.apache.spark.sql.functions.udf((url: String) =>
      fetchUrl(sharedClient, url, ua, timeoutSec, retries, userAgentToken, disallowed))
    df.withColumn("__f", f(org.apache.spark.sql.functions.col("url")))
      .withColumn("payload", org.apache.spark.sql.functions.col("__f._1"))
      .withColumn("status", org.apache.spark.sql.functions.col("__f._2"))
      .withColumn("error_message", org.apache.spark.sql.functions.col("__f._3"))
      .drop("__f")
  }

  def fetch(df: DataFrame, threadsPerTask: Int = 16, timeoutSec: Int = 10,
            retries: Int = 0, userAgentToken: Option[String] = None,
            disallowed: Seq[String] = Nil): DataFrame = {
    val schema = resultSchema(df.schema)
    val urlIdx = df.schema.fieldIndex("url")
    val ua = userAgent(userAgentToken)
    val rdd = df.rdd.mapPartitions { rows =>
      // One client + pool per partition (ref reuses one session per N
      // requests, `downloader.py:37-45`); closed when the iterator drains.
      val pool = Executors.newFixedThreadPool(threadsPerTask)
      val client = HttpClient.newBuilder()
        .connectTimeout(Duration.ofSeconds(timeoutSec.toLong))
        .followRedirects(HttpClient.Redirect.NORMAL)
        .executor(pool)
        .build()

      def fetchOne(url: String): (Array[Byte], String, String) =
        fetchUrl(client, url, ua, timeoutSec, retries, userAgentToken, disallowed)

      // Grouped async execution: at most `threadsPerTask` requests in
      // flight (the reference's semaphore, `downloader.py:274-283`),
      // without materializing the partition.
      val out = rows.grouped(threadsPerTask * 2).flatMap { batch =>
        val futs = batch.map { row =>
          val url = row.getString(urlIdx)
          pool.submit(new java.util.concurrent.Callable[(Row, (Array[Byte], String, String))] {
            def call(): (Row, (Array[Byte], String, String)) = (row, fetchOne(url))
          })
        }
        futs.map { f =>
          val (row, (bytes, status, err)) = f.get()
          Row.fromSeq(row.toSeq ++ Seq(bytes, status, err))
        }
      }
      new Iterator[Row] {
        def hasNext: Boolean = {
          val h = out.hasNext
          if (!h) { pool.shutdown(); pool.awaitTermination(5, TimeUnit.SECONDS); () }
          h
        }
        def next(): Row = out.next()
      }
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }
}
