package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.{udaf, udf}

/** Count-min sketch (Cormode & Muthukrishnan 2005) as a typed Spark
  * `Aggregator` — the custom-UDAF surface of SURVEY §2.8 applied to the
  * 100 TB frequency problem: estimating term counts with a FIXED-size
  * mergeable state (Depth×Width longs ≈ 32 KB) instead of shuffling a
  * corpus-sized word→count map. Partial buffers merge by element-wise
  * add (commutative + associative), so estimates are independent of
  * partitioning and task scheduling — deterministic despite being
  * approximate, which is what makes the q115 output row-stable.
  *
  * Guarantees: est ≥ true (one-sided); est ≤ true + εN with
  * probability 1−δ, ε = e/Width, δ = e^−Depth. Hashes are seeded FNV-1a
  * — no RNG state, identical across JVMs.
  */
object Sketch {
  val Depth = 4
  val Width = 1024

  private[graft] def bucket(s: String, seed: Int): Int = {
    var h = 0xcbf29ce484222325L ^ (seed.toLong * 0x9e3779b97f4a7c15L)
    var i = 0
    while (i < s.length) { h ^= s.charAt(i).toLong; h *= 0x100000001b3L; i += 1 }
    (((h % Width) + Width) % Width).toInt
  }

  class CmsAgg extends Aggregator[String, Array[Long], Array[Long]] {
    def zero: Array[Long] = new Array[Long](Depth * Width)
    def reduce(b: Array[Long], a: String): Array[Long] = {
      if (a != null) {
        var d = 0
        while (d < Depth) { b(d * Width + bucket(a, d)) += 1; d += 1 }
      }
      b
    }
    def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
      var i = 0
      while (i < x.length) { x(i) += y(i); i += 1 }
      x
    }
    def finish(b: Array[Long]): Array[Long] = b
    def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  }

  /** Column aggregate: one sketch for the whole (grouped) input. */
  def cms(c: Column): Column = udaf(new CmsAgg, ExpressionEncoder[String]()).apply(c)

  /** Point estimate from a materialized sketch (min over the d rows). */
  def estimate(sketch: IndexedSeq[Long], s: String): Long = {
    var m = Long.MaxValue
    var d = 0
    while (d < Depth) { m = math.min(m, sketch(d * Width + bucket(s, d))); d += 1 }
    m
  }

  /** Column twin of [[estimate]] for probing a broadcast sketch row. */
  def estimateCol(sketch: Column, term: Column): Column =
    udf((sk: Seq[Long], s: String) => estimate(sk.toIndexedSeq, s))
      .apply(sketch, term)
}
