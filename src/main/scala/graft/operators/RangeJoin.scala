package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) join: match timestamped points to the intervals
  * containing them WITHOUT a nested-loop/cross join.
  *
  * Naive Spark planning of `a JOIN b ON a.ts BETWEEN b.start AND b.end`
  * (no equi key) is BroadcastNestedLoopJoin — fine when one side is tiny,
  * O(n·m) disaster at 100 TB. The scalable formulation here is the
  * standard bucketized range join (as in Databricks' range-join
  * optimization and the interval-join of stream processors): both sides
  * are mapped to fixed-width time buckets, intervals exploding to every
  * bucket they overlap, the join becomes an equi-join on the bucket id
  * (hash-shuffle both sides, AQE/skew handling applies), and the exact
  * range predicate filters within the bucket.
  *
  * Each matching (point, interval) pair is emitted exactly once: a point
  * has exactly one bucket, and the interval's bucket list contains it at
  * most once — no dedup pass needed.
  *
  * `bucketWidthSec` trades shuffle fan-out for join selectivity: the
  * interval side is replicated `len/width + 1` times, so pick the width
  * near the typical interval length. Extension surface [EXT] — the
  * reference has no relational joins; this generalizes its time-windowed
  * event semantics (SURVEY §2.4).
  */
object RangeJoin {

  /** Join `points` (with timestamp `ptCol`) to `intervals` (with
    * `[startCol, endCol]`, inclusive ends). Column names must be disjoint
    * across the two frames (the result carries both sides' columns). */
  def pointInInterval(points: DataFrame, ptCol: Column,
                      intervals: DataFrame, startCol: Column, endCol: Column,
                      bucketWidthSec: Long): DataFrame = {
    require(bucketWidthSec > 0, "bucketWidthSec must be positive")
    val pb = points.withColumn("__bucket",
      floor(unix_timestamp(ptCol) / bucketWidthSec))
    val ib = intervals.withColumn("__bucket",
      explode(sequence(
        floor(unix_timestamp(startCol) / bucketWidthSec),
        floor(unix_timestamp(endCol) / bucketWidthSec))))
    pb.join(ib, Seq("__bucket"))
      .filter(ptCol >= startCol && ptCol <= endCol)
      .drop("__bucket")
  }

  /** Interval×interval OVERLAP join (inclusive bounds): both sides
    * explode to their buckets, pairs meet on the bucket equi-join, and
    * the exact predicate filters inside. A pair sharing several buckets
    * would match once per shared bucket — the max-start-bucket guard
    * (emit only in the bucket containing `greatest(startA, startB)`,
    * the first bucket where BOTH intervals are live) restores
    * exactly-once without a distinct pass. Column names must be
    * disjoint across the two frames. */
  def intervalOverlap(a: DataFrame, aStart: Column, aEnd: Column,
                      b: DataFrame, bStart: Column, bEnd: Column,
                      bucketWidthSec: Long): DataFrame = {
    require(bucketWidthSec > 0, "bucketWidthSec must be positive")
    val ab = a.withColumn("__bucket",
      explode(sequence(
        floor(unix_timestamp(aStart) / bucketWidthSec),
        floor(unix_timestamp(aEnd) / bucketWidthSec))))
    val bb = b.withColumn("__bucket",
      explode(sequence(
        floor(unix_timestamp(bStart) / bucketWidthSec),
        floor(unix_timestamp(bEnd) / bucketWidthSec))))
    ab.join(bb, Seq("__bucket"))
      .filter(aStart <= bEnd && bStart <= aEnd)
      .filter(col("__bucket") ===
        floor(greatest(unix_timestamp(aStart), unix_timestamp(bStart)) / bucketWidthSec))
      .drop("__bucket")
  }
}
