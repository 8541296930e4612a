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

  /** Misra–Gries heavy-hitter summary (Misra & Gries 1982) as a typed
    * mergeable `Aggregator` — the DETERMINISTIC counterpart to [[CmsAgg]]:
    * where CMS answers point queries within εN w.h.p., MG guarantees
    * unconditionally that `true(x) − n/k ≤ est(x) ≤ true(x)` and that
    * every item with `true(x) > n/k` is present in the ≤(k−1)-entry
    * summary. Partial summaries merge by counter addition followed by
    * subtracting the k-th largest combined count (Agarwal et al.,
    * "Mergeable Summaries", PODS'12 — the merge preserves the n/k error
    * bound), so the CANDIDATE SET is partitioning-independent enough to
    * superset the true heavy hitters regardless of task scheduling.
    * State is O(k) per group — at 100 TB the token stream never
    * shuffles; only ≤(k−1)-entry maps do. */
  class MgAgg(k: Int) extends Aggregator[String, Map[String, Long], Map[String, Long]] {
    require(k >= 2, s"MG needs k >= 2, got $k")
    def zero: Map[String, Long] = Map.empty
    def reduce(b: Map[String, Long], a: String): Map[String, Long] =
      if (a == null) b
      else b.get(a) match {
        case Some(c) => b.updated(a, c + 1L)
        case None if b.size < k - 1 => b.updated(a, 1L)
        // decrement-all: drops every counter by 1, evicting zeros —
        // the classic MG step; amortized O(1) decrements per stream item
        case None => b.flatMap { case (w, c) => if (c > 1L) Some(w -> (c - 1L)) else None }
      }
    def merge(x: Map[String, Long], y: Map[String, Long]): Map[String, Long] = {
      val comb = y.foldLeft(x) { case (m, (w, c)) => m.updated(w, m.getOrElse(w, 0L) + c) }
      if (comb.size <= k - 1) comb
      else {
        // subtract the k-th largest count from every counter (mergeable-
        // summaries merge rule): ≤ k−1 survivors, error still ≤ n/k
        val thr = comb.values.toIndexedSeq.sorted(Ordering[Long].reverse)(k - 1)
        comb.flatMap { case (w, c) => if (c > thr) Some(w -> (c - thr)) else None }
      }
    }
    def finish(b: Map[String, Long]): Map[String, Long] = b
    def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder[Map[String, Long]]()
    def outputEncoder: Encoder[Map[String, Long]] = ExpressionEncoder[Map[String, Long]]()
  }

  /** Column aggregate: the ≤(k−1)-entry MG summary of the (grouped) input. */
  def mgSummary(c: Column, k: Int): Column =
    udaf(new MgAgg(k), ExpressionEncoder[String]()).apply(c)
}
