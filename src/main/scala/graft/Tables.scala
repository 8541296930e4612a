package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Canonical loaders for the driver-generated test tables
  * (`/root/testdata/sf*`; see TESTDATA.md / FIXTURES.md).
  *
  * All queries read through here so schema normalization happens in one
  * place. The only normalization needed: `events.ts` is parquet
  * TIMESTAMP(NANOS), which Spark's TimestampType (microseconds) cannot
  * ingest directly — we read it as a nanosecond Long
  * (`spark.sql.legacy.parquet.nanosAsLong`) and truncate to microseconds,
  * exactly matching DuckDB's `CAST(ts AS TIMESTAMP)` truncation so the
  * oracle comparison is bit-identical.
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

  /** events with `ts` normalized to TimestampType (µs, truncated from ns). */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    // Runtime-settable SQL conf; scoped to this session.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = read(spark, sfDir, "events")
    // ts long nanos -> truncate to micros. MUST be integral `div`: `/` on
    // longs is double division and 1.7e18 ns exceeds double's 2^53 exact
    // range (observed off-by-1µs vs DuckDB's truncating cast).
    raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
  }
}
