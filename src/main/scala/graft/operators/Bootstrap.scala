package graft.operators

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.functions.udaf

/** Poisson-bootstrap replicate accumulation as ONE typed aggregate.
  *
  * The naive formulation (q235's original shape) explodes every event
  * row ×B replicates and shuffles n·B rows into a hash aggregate keyed
  * by (group, b) — at sf0.1 that is a 60M-row aggregate whose decimal
  * sums dominate the query (~6 s). This aggregator keeps the identical
  * arithmetic but folds the replicate loop INSIDE the per-row update:
  * state is two long[B] arrays (quantized weighted sums + weight sums),
  * so the aggregate sees n probes instead of n·B, sums are exact 64-bit
  * integers instead of Decimal objects, and the shuffled partial state
  * is 2·B longs per group regardless of n — the mergeable-summary shape
  * that survives a 100 TB scan (state size is B·|groups|, never n).
  *
  * Engine parity (the pround discipline): the replicate weight is the
  * house Lehmer hash u = ((id·101+b) %p ·48271 %p ·48271 %p ·48271 %p
  * + 0.5)/p inverted through the literal Poisson(1) CDF ladder — pure
  * integer/IEEE arithmetic that DuckDB reproduces token-for-token; each
  * term is quantized floor(w·value·10000 + 0.5) so the sum is an exact
  * integer with no accumulation-order dependence. |term| ≤ 7·|value|·1e4
  * and n ≤ 2^40 keeps the running sum far inside long range.
  */
object Bootstrap {

  /** Replicate sums for one group: `swx(b)` = Σ floor(w·value·1e4+0.5),
    * `sw(b)` = Σ w, for b = 1..B (0-indexed as b-1). */
  case class RepSums(swx: Array[Long], sw: Array[Long])

  private val LP = 2147483647L // 2^31 - 1 (Lehmer/Park-Miller modulus)

  /** The 7-step cumulative Poisson(1) CDF ladder (P(k>7) ≈ 1e-5); the
    * same literals appear in the oracle SQL so both engines draw the
    * identical integer weight from the identical u. */
  private def poissonW(u: Double): Long =
    if (u < 0.36787944117144233) 0L
    else if (u < 0.7357588823428847) 1L
    else if (u < 0.9196986029286058) 2L
    else if (u < 0.9810118431238463) 3L
    else if (u < 0.9963401531726563) 4L
    else if (u < 0.9994058151824183) 5L
    else if (u < 0.999916758850712) 6L
    else 7L

  /** Aggregator over rows (event_id, value) → B replicate sums. */
  final class PoissonRepsAgg(B: Int)
      extends Aggregator[(Long, Double), RepSums, RepSums] {
    override def zero: RepSums = RepSums(new Array[Long](B), new Array[Long](B))
    override def reduce(s: RepSums, in: (Long, Double)): RepSums = {
      val (id, value) = in
      var b = 1
      while (b <= B) {
        var h = (id * 101L + b) % LP
        h = h * 48271L % LP * 48271L % LP * 48271L % LP
        val u = (h.toDouble + 0.5) / 2147483647.0
        val w = poissonW(u)
        if (w != 0L) {
          s.sw(b - 1) += w
          s.swx(b - 1) += math.floor(w * value * 10000.0 + 0.5).toLong
        }
        b += 1
      }
      s
    }
    override def merge(a: RepSums, b: RepSums): RepSums = {
      var i = 0
      while (i < B) { a.swx(i) += b.swx(i); a.sw(i) += b.sw(i); i += 1 }
      a
    }
    override def finish(s: RepSums): RepSums = s
    override def bufferEncoder: Encoder[RepSums] = Encoders.product[RepSums]
    override def outputEncoder: Encoder[RepSums] = Encoders.product[RepSums]
  }

  /** `poissonReps(B)(event_id, value)` as an untyped aggregate column. */
  def poissonReps(B: Int)(id: Column, value: Column): Column =
    udaf(new PoissonRepsAgg(B),
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble))
      .apply(id, value)
}
