package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Iterative optimization over corpus-sized frames — the model-TRAINING
  * loop (k-means q85 is the centroid instance; this is the gradient
  * instance). [EXT]
  *
  * Scale shape: one pass per GD step — parameters ride the plan as
  * literals (broadcast with the closure, exactly like a real model's
  * coefficients), per-row gradient contributions are computed map-side
  * and reduced with the exact-decimal discipline, and the one collected
  * row per step is the gradient vector itself (k+1 doubles — the
  * textbook driver loop; at any corpus size the driver traffic is
  * O(iters × features)).
  *
  * Determinism: squared-loss gradients are pure +/× arithmetic over the
  * input columns (no transcendentals), so per-row contributions are
  * IEEE-identical in any engine; DECIMAL(27,12) casts + exact sums make
  * the reduction order-independent, and parameters round to 9 per step
  * (the q82/q112 discipline) — the whole trajectory is engine-exact.
  */
object Optim {

  /** `iters` full-batch gradient-descent steps of linear least squares
    * `y ≈ w · x + b` from zero initialization. Returns one row:
    * (w..., b, mse) with mse of the FINAL parameters (round 6 — wide
    * decimal sums, the q139 conversion-ulp argument). */
  def linregGD(df: DataFrame, features: Seq[Column], y: Column,
               iters: Int, lr: Double): DataFrame = {
    val spark = df.sparkSession
    val k = features.size
    val base = df.select((features :+ y).zipWithIndex.map {
      case (c, i) => c.cast("double").as(if (i == k) "__y" else s"__x$i")
    }: _*).localCheckpoint(true) // one materialization; every step rescans it
    // engine-portable floor-form round (pure IEEE; mirrors the oracle's
    // FLOOR(x*1e9+0.5)/1e9 — not BigDecimal HALF_UP, which diverges
    // from libm rounding on half boundaries)
    def round9(x: Double): Double = math.floor(x * 1e9 + 0.5) / 1e9
    var w = Array.fill(k)(0.0)
    var b = 0.0
    for (_ <- 1 to iters) {
      val pred = (0 until k).map(i => col(s"__x$i") * lit(w(i))).foldLeft(lit(b): Column)(_ + _)
      val err = pred - col("__y")
      val gradCols = (0 until k).map(i =>
        sum((err * col(s"__x$i")).cast(DecimalType(27, 12))).cast("double").as(s"__g$i")) ++
        Seq(sum(err.cast(DecimalType(27, 12))).cast("double").as("__gb"),
          count(lit(1)).as("__n"))
      val row: Row = base.agg(gradCols.head, gradCols.tail: _*).head()
      val n = row.getLong(k + 1).toDouble
      w = Array.tabulate(k)(i => round9(w(i) - lr * (row.getDouble(i) / n)))
      b = round9(b - lr * (row.getDouble(k) / n))
    }
    val predF = (0 until k).map(i => col(s"__x$i") * lit(w(i))).foldLeft(lit(b): Column)(_ + _)
    val errF = predF - col("__y")
    val outCols: Seq[Column] =
      Seq(count(lit(1)).as("n")) ++
        (0 until k).map(i => lit(w(i)).as(s"w$i")) ++
        Seq(lit(b).as("b"),
          (floor(sum((errF * errF).cast(DecimalType(27, 12))).cast("double")
            / count(lit(1)) * 1e6 + 0.5) / 1e6).as("mse"))
    base.agg(outCols.head, outCols.tail: _*)
  }

  /** Pool-adjacent-violators (PAV) weighted isotonic regression: the
    * non-decreasing fit ŷ minimizing Σ wᵢ(ŷᵢ − yᵢ)² over ys IN ORDER
    * (Ayer et al. 1955; the stack form is O(n)). Blocks merge while the
    * previous block's weighted mean exceeds the current one's; each
    * input position receives its block's weighted mean. Driver-side by
    * design: callers hand it an already-reduced ≤bins-row frame (the
    * k×d-literal discipline of [[linregGD]] applied to calibration
    * bins), never corpus-sized data. */
  def pav(ys: IndexedSeq[Double], ws: IndexedSeq[Long]): IndexedSeq[Double] = {
    require(ys.length == ws.length, "ys and ws must align")
    require(ws.forall(_ > 0), "weights must be positive")
    val blocks = scala.collection.mutable.ArrayBuffer.empty[(Double, Double, Int)]
    for (i <- ys.indices) {
      var w = ws(i).toDouble; var wy = ws(i) * ys(i); var c = 1
      while (blocks.nonEmpty && blocks.last._2 / blocks.last._1 > wy / w) {
        val (bw, bwy, bc) = blocks.remove(blocks.length - 1)
        w += bw; wy += bwy; c += bc
      }
      blocks += ((w, wy, c))
    }
    blocks.flatMap { case (w, wy, c) => Seq.fill(c)(wy / w) }.toIndexedSeq
  }

  /** The same weighted isotonic fit by the MINIMAX identity
    * (Robertson–Wright–Dykstra): fit_i = max_{j≤i} min_{k≥i}
    * wavg(y_j..y_k). O(n³) vs [[pav]]'s O(n) — but ANSI-expressible
    * (three self-joins + MIN/MAX), which is the whole point: an SQL
    * oracle can compute the identical fit. Engine parity: `ys` must be
    * 9-decimal quantized (every emitted ratio in this codebase is);
    * segment means then reduce as EXACT integers Σw·round(y·1e9) and
    * Σw until one double division — both engines compare identical
    * doubles and select identical extrema, with no accumulation-order
    * dependence. Driver-side on ≤bins-row frames, like [[pav]]. */
  def isotonicMinimax(ys: IndexedSeq[Double], ws: IndexedSeq[Long]): IndexedSeq[Double] = {
    require(ys.length == ws.length, "ys and ws must align")
    require(ws.forall(_ > 0), "weights must be positive")
    val n = ys.length
    val y9 = ys.map(y => math.floor(y * 1e9 + 0.5).toLong)
    // v(j,k) = (Σ_{t=j..k} w_t·y9_t) / (Σ w_t) / 1e9 — prefix-sum
    // differences make each call O(1), so the triple loop below is the
    // true O(n³) the doc claims. Exact-long prefix differences equal
    // the old in-order segment sums bit-for-bit.
    val pw = new Array[Long](n + 1); val pwy = new Array[Long](n + 1)
    var t0 = 0
    while (t0 < n) {
      pw(t0 + 1) = pw(t0) + ws(t0); pwy(t0 + 1) = pwy(t0) + ws(t0) * y9(t0)
      t0 += 1
    }
    def v(j: Int, k: Int): Double =
      (pwy(k + 1) - pwy(j)).toDouble / (pw(k + 1) - pw(j)).toDouble / 1.0e9
    IndexedSeq.tabulate(n) { i =>
      var best = Double.NegativeInfinity
      var j = 0
      while (j <= i) {
        var mn = Double.PositiveInfinity
        var k = i
        while (k < n) { val x = v(j, k); if (x < mn) mn = x; k += 1 }
        if (mn > best) best = mn
        j += 1
      }
      best
    }
  }
}
