package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout — the Z-order (Morton) clustering that
  * Delta/Iceberg-class table formats use for multi-column locality. [EXT]
  *
  * Why it matters at 100 TB: min/max zone maps prune a scan only when the
  * filtered column correlates with file layout. Range-partitioning by ONE
  * column gives perfect pruning on it and none on any other; interleaving
  * the bits of k columns into one sort key gives every interleaved column
  * bounded value ranges per file (a 2^b × 2^b grid cell per bucket), so
  * predicates on ANY of them prune. The z-value is pure codegen'd bit
  * arithmetic (no UDF) — `repartitionByRange(zValue(...))` before a
  * parquet write is the whole deployment story.
  */
object Layout {

  /** 2-D Morton code over the low `bits` bits of each dimension: x's bits
    * land on even positions, y's on odd. Inputs must be non-negative and
    * fit `bits` bits for the interleave to be a bijection (truncation
    * above that loses locality, never correctness of the ordering key).
    * Disjoint bit positions → the OR is a plain sum. */
  def zValue(x: Column, y: Column, bits: Int = 16): Column =
    (0 until bits).map { i =>
      shiftleft(shiftrightunsigned(x, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftrightunsigned(y, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)
}
