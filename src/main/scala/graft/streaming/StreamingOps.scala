package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Structured Streaming surface over the `events` table (SURVEY §2.7 —
  * [EXT]; the reference is pure batch). Transform builders are
  * source-agnostic (same DataFrame code paths serve batch and stream,
  * Spark's unified model), so every streaming transform is testable by
  * running the batch twin through the DuckDB oracle and the stream twin
  * through a memory sink.
  */
object StreamingOps {

  /** events schema as read post-normalization (ts already µs). */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-based stream over a directory of parquet events (ts must already
    * be TimestampType — stage with [[stageEventsForStreaming]]). */
  def eventsStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(eventsSchema).parquet(dir)

  /** Write the batch events table (ns-normalized) to a staging dir so the
    * file stream source can replay it. Idempotent: a staging dir with a
    * `_SUCCESS` marker is reused (repeat streaming runs in one session
    * shouldn't re-pay the write). */
  def stageEventsForStreaming(spark: SparkSession, sfDir: String, stagingDir: String): Unit = {
    val success = new Path(stagingDir, "_SUCCESS")
    val fs = success.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(success))
      graft.Tables.events(spark, sfDir).write.mode("overwrite").parquet(stagingDir)
  }

  /** Deterministic per-(sfDir, source mtime) staging path — stable across
    * calls AND JVMs so the `_SUCCESS` reuse in [[stageEventsForStreaming]]
    * kicks in, yet never reuses staging from a regenerated source table.
    * mtime resolves through the Hadoop FileSystem of `sfDir`'s scheme
    * (java.io.File reports 0 for non-local sources — which silently
    * re-enabled the stale-reuse behavior this path exists to prevent);
    * superseded staging dirs for the same source are deleted so a
    * regenerated table doesn't leak one tmp dir per version. */
  def defaultStagingDir(spark: SparkSession, sfDir: String): String = {
    val conf = spark.sessionState.newHadoopConf()
    val src = new Path(sfDir, "events.parquet")
    val mtime =
      try src.getFileSystem(conf).getFileStatus(src).getModificationTime
      catch { case _: java.io.IOException => 0L }
    val dirTag = Integer.toHexString(sfDir.hashCode)
    val base = new Path(new java.io.File(System.getProperty("java.io.tmpdir")).getAbsolutePath)
    val target = new Path(base, s"graft_stream_${dirTag}_${java.lang.Long.toHexString(mtime)}")
    val fs = target.getFileSystem(conf)
    try fs.listStatus(base).foreach { st =>
      val n = st.getPath.getName
      if (n.startsWith(s"graft_stream_${dirTag}_") && n != target.getName)
        fs.delete(st.getPath, true)
    } catch { case _: java.io.IOException => () }
    target.toUri.getPath
  }

  /** Tumbling / sliding window aggregation (slide = None → tumbling). */
  def windowedAgg(events: DataFrame, windowDur: String, slide: Option[String] = None,
                  watermark: String = "10 minutes"): DataFrame = {
    val withWm = if (events.isStreaming) events.withWatermark("ts", watermark) else events
    val win = slide match {
      case Some(s) => window(col("ts"), windowDur, s)
      case None    => window(col("ts"), windowDur)
    }
    withWm.groupBy(win.as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value").cast(DecimalType(18, 4))).cast("double").as("total_value"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"), col("total_value"))
  }

  /** Session windows per user (gap-based; SURVEY §2.7). */
  def sessionAgg(events: DataFrame, gap: String, watermark: String = "10 minutes"): DataFrame = {
    val withWm = if (events.isStreaming) events.withWatermark("ts", watermark) else events
    withWm.groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value").cast(DecimalType(18, 4))).cast("double").as("total_value"))
      .select(col("w.start").as("session_start"), col("w.end").as("session_end"),
        col("user_id"), col("n_events"), col("total_value"))
  }

  /** Stream-static enrichment: join the event stream onto a broadcast
    * batch dimension keyed by user_id, then per-dimension running
    * totals. The dim is re-planned (and re-broadcast) each micro-batch —
    * Spark's contract for batch sides of stream-batch joins — so a slowly
    * refreshed dim table is picked up without restarting the query. Inner
    * join: facts without a dim row drop, as the batch twin does. */
  def enrichedTotals(events: DataFrame, dims: DataFrame): DataFrame =
    events.join(broadcast(dims), Seq("user_id"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 4))).cast("double").as("total_value"))

  /** Stateful dedup on event_id within the watermark. */
  def dedupWithinWatermark(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    if (events.isStreaming)
      events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark("event_id")
    else events.dropDuplicates("event_id")

  case class EventRow(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                      event_type: String, value: Double)
  case class UserAgg(user_id: Long, n_events: Long, total_value: Double)

  /** Arbitrary stateful processing (SURVEY §2.7's last row):
    * per-user running totals via `flatMapGroupsWithState` — the pattern
    * for state Spark's windowed aggs can't express. Works on batch too
    * (one group pass, empty initial state), so the stream twin is
    * verifiable against `groupBy` in tests. */
  def statefulUserTotals(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.GroupStateTimeout
    events.select("event_id", "ts", "user_id", "event_type", "value").as[EventRow]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[UserAgg, UserAgg](
        OutputMode.Update, GroupStateTimeout.NoTimeout) { (uid, rows, state) =>
        val prev = state.getOption.getOrElse(UserAgg(uid, 0L, 0.0))
        var n = prev.n_events
        var tv = prev.total_value
        rows.foreach { r => n += 1; tv += r.value }
        val cur = UserAgg(uid, n, tv)
        state.update(cur)
        Iterator(cur)
      }
      .toDF()
  }

  case class SessionOut(session_start: java.sql.Timestamp,
                        session_end: java.sql.Timestamp,
                        user_id: Long, n_events: Long, total_value: Double)

  /** Gap-sessionization as a CUSTOM state machine
    * (`flatMapGroupsWithState` — SURVEY §2.8's arbitrary-state surface):
    * the hand-rolled twin of [[sessionAgg]]'s built-in `session_window`,
    * proving the custom-state path produces oracle-identical sessions.
    *
    * Batch execution (one group pass, empty initial state) finalizes
    * every session at group end — that is what makes it oracle-exact;
    * under a stream, Update-mode emission would interleave partial
    * sessions (use [[sessionAgg]] there — q78). Each user's rows are
    * sorted in memory: bounded by per-user activity, the same per-group
    * buffering Spark's own sort-based session agg performs.
    *
    * Sum parity: each value is quantized to DECIMAL(18,4) HALF_UP before
    * accumulating — the scalar twin of the engine-wide decimal-sum
    * discipline (a raw double sum would be arrival-order dependent). */
  def customSessionize(events: DataFrame, gapMinutes: Int): DataFrame = {
    // the scaladoc's batch-only constraint, enforced: under a stream each
    // micro-batch would re-walk its groups stateless and emit partial /
    // duplicate sessions with no error — fail loudly instead
    require(!events.isStreaming,
      "customSessionize is batch-only; use sessionAgg for streams (q78)")
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.GroupStateTimeout
    import org.apache.spark.sql.catalyst.util.DateTimeUtils
    val gapMicros = gapMinutes.toLong * 60L * 1000000L
    // Spark's own µs conversions — correct for pre-epoch timestamps,
    // where getTime/1000-based math double-counts the sub-second part
    def micros(t: java.sql.Timestamp): Long = DateTimeUtils.fromJavaTimestamp(t)
    def plusGap(t: java.sql.Timestamp): java.sql.Timestamp =
      DateTimeUtils.toJavaTimestamp(micros(t) + gapMicros)
    events.select("event_id", "ts", "user_id", "event_type", "value").as[EventRow]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[UserAgg, SessionOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) { (uid, rows, _) =>
        val sorted = rows.toArray.sortBy(r => (micros(r.ts), r.event_id))
        val out = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
        var start: EventRow = null
        var last: EventRow = null
        var n = 0L
        var tv = java.math.BigDecimal.ZERO
        // valueOf (shortest-decimal), NOT new BigDecimal(double) (exact
        // binary expansion): Spark's double→decimal cast rounds the
        // shortest representation, and 0.56645 would otherwise land on
        // 0.5664 here vs the engine's 0.5665
        def quant(v: Double) = java.math.BigDecimal.valueOf(v)
          .setScale(4, java.math.RoundingMode.HALF_UP)
        def close(): Unit = if (start != null)
          out += SessionOut(start.ts, plusGap(last.ts), uid, n, tv.doubleValue)
        sorted.foreach { r =>
          if (start == null || micros(r.ts) - micros(last.ts) >= gapMicros) {
            close(); start = r; n = 0L; tv = java.math.BigDecimal.ZERO
          }
          last = r; n += 1; tv = tv.add(quant(r.value))
        }
        close()
        out.iterator
      }
      .toDF()
  }

  /** Run a streaming DataFrame to completion against a memory sink and
    * return the materialized result (synchronous batch-replay harness for
    * tests/Verify). */
  /** Stream-stream inner join with an event-time bound: each click pairs
    * with the same user's purchases in the preceding `lookback`. Both
    * sides watermarked, and the join condition carries the time range, so
    * the state store retains only a `lookback`-wide window per side —
    * bounded state at any corpus rate (SURVEY §2.7). Source-agnostic:
    * feed batch frames and the same code is the batch twin the oracle
    * checks. */
  def clickPurchaseJoin(clicks: DataFrame, purchases: DataFrame,
                        lookback: String = "240 minutes",
                        watermark: String = "240 minutes",
                        joinType: String = "inner"): DataFrame = {
    def wm(df: DataFrame) =
      if (df.isStreaming) df.withWatermark("ts", watermark) else df
    val c = wm(clicks).select(col("event_id").as("click_id"),
      col("user_id"), col("ts").as("click_ts"))
    val p = wm(purchases).select(col("event_id").as("purchase_id"),
      col("user_id").as("p_user"), col("ts").as("purchase_ts"),
      col("value").as("purchase_value"))
    c.join(p, col("user_id") === col("p_user") &&
        col("purchase_ts") >= col("click_ts") - expr(s"INTERVAL $lookback") &&
        col("purchase_ts") <= col("click_ts"), joinType)
      .select(col("click_id"), col("user_id"), col("click_ts"),
        col("purchase_id"), col("purchase_ts"), col("purchase_value"))
  }

  def runToMemory(spark: SparkSession, stream: DataFrame, name: String,
                  outputMode: OutputMode = OutputMode.Complete()): DataFrame = {
    val q: StreamingQuery = stream.writeStream
      .format("memory").queryName(name)
      .outputMode(outputMode)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }
}
