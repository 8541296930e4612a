package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Canonical loaders for the driver-generated test tables
  * (`/root/testdata/sf*`; see TESTDATA.md / FIXTURES.md).
  *
  * All queries read through here so schema normalization happens in one
  * place. The only normalization needed: `events.ts`, whose physical
  * layout has varied across driver-generated fixture versions —
  * TIMESTAMP(NANOS) (unreadable by Spark's µs TimestampType; read as a
  * nanosecond Long via `spark.sql.legacy.parquet.nanosAsLong` and
  * truncated to µs) or plain µs TIMESTAMP without a UTC annotation
  * (read as TIMESTAMP_NTZ; cast to session-local TimestampType — exact
  * under the UTC session every entry point pins). Both normalizations
  * match DuckDB's `CAST(ts AS TIMESTAMP)` exactly, so the oracle
  * comparison stays bit-identical whichever fixture generation is on
  * disk. Branching on the observed schema (not a conf) keeps every
  * query working without knowing which generation it reads.
  */
object Tables {
  def path(sfDir: String, table: String): String = s"$sfDir/$table.parquet"

  private def read(spark: SparkSession, sfDir: String, table: String): DataFrame =
    spark.read.parquet(path(sfDir, table))

  def region(spark: SparkSession, sfDir: String): DataFrame   = read(spark, sfDir, "region")
  def nation(spark: SparkSession, sfDir: String): DataFrame   = read(spark, sfDir, "nation")
  def customer(spark: SparkSession, sfDir: String): DataFrame = read(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = read(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame     = read(spark, sfDir, "part")
  def orders(spark: SparkSession, sfDir: String): DataFrame   = read(spark, sfDir, "orders")
  def lineitem(spark: SparkSession, sfDir: String): DataFrame = read(spark, sfDir, "lineitem")
  def documents(spark: SparkSession, sfDir: String): DataFrame = read(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = read(spark, sfDir, "embeddings")

  /** `documents` spread across the session's full parallelism — the
    * input frame for CPU-BOUND per-doc kernels (PDF assembly + decode,
    * image codecs, password KDFs, WARC parse): parquet splits are
    * BYTE-based, so a small file arrives as ONE partition and
    * multi-ms-per-row work serializes on one core no matter how wide
    * the session is. A round-robin repartition of the ids costs one
    * tiny shuffle and fans the kernel out to every core — the same
    * stage shape a many-file 100 TB input gets from its file splits,
    * and still the right call at scale whenever per-row CPU cost
    * dwarfs the bytes (the split planner cannot see CPU). Queries that
    * only scan/aggregate documents columns keep using [[documents]] —
    * an unconditional shuffle would hurt those. */
  def documentsFanned(spark: SparkSession, sfDir: String): DataFrame =
    documents(spark, sfDir)
      .repartition(spark.sparkContext.defaultParallelism)

  /** events with `ts` normalized to TimestampType (µs) from whichever
    * physical layout this fixture generation uses (see object scaladoc). */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    // Runtime-settable SQL conf; scoped to this session.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = read(spark, sfDir, "events")
    val ts = raw.schema("ts").dataType match {
      case LongType =>
        // ns Long -> truncate to µs. MUST be integral `div`: `/` on longs
        // is double division and 1.7e18 ns exceeds double's 2^53 exact
        // range (observed off-by-1µs vs DuckDB's truncating cast).
        timestamp_micros(expr("ts div 1000"))
      case TimestampNTZType => col("ts").cast(TimestampType) // exact under UTC session
      case TimestampType    => col("ts")
      case other =>
        // fail LOUDLY on an unrecognized fixture layout: a silent
        // pass-through would feed wrong timestamps to every query
        // instead of one descriptive error at load (r9 ADVICE item)
        throw new IllegalStateException(
          s"events.ts has unrecognized physical type $other — a new fixture " +
            "generation needs an explicit normalization branch here (Tables.events)")
    }
    raw.withColumn("ts", ts)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
  }
}
