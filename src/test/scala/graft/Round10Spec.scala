package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Round-10 machinery: the pround overflow guard (the q275 Durbin–Watson
  * find), the boundary-sweep concurrency pattern (q266), and the Shapley
  * skeleton's axioms (q280). */
class Round10Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("pround equals double-floor rounding at EVERY magnitude (incl. past 2^63/10^n)") {
    // Reference = the DuckDB-side semantics: FLOOR(x·10ⁿ + 0.5)/10ⁿ in
    // pure double arithmetic (math.floor never overflows — it returns a
    // double). Spark's floor() returns LONG, which clamps at 2^63; the
    // 2^52 identity guard in pround must reproduce the double-floor
    // value everywhere. Magnitudes span the long-exact region, the
    // 2^52..2^63 window where the old form still worked, and the
    // >2^63/10^n region where it silently clamped.
    def ref(x: Double, n: Int): Double = {
      val s = math.pow(10, n)
      math.floor(x * s + 0.5) / s
    }
    val xs = Seq(0.0, 1e-9, -1e-9, 0.1235, -0.1235, 123.4567891234,
      9.2e6, 9.3e6, 1.2248208e7, 1e10, -3.7e10, 9.0e15, 4.6e15,
      1.1e19, -2.5e19, 7.7e300)
    val scales = Seq(0, 4, 6, 9, 12)
    val df = xs.toDF("x")
    for (n <- scales) {
      val got = df.select(SparkEntry.pround(col("x"), n).as("r"))
        .collect().map(_.getDouble(0))
      val want = xs.map(ref(_, n))
      got.zip(want).zip(xs).foreach { case ((g, w), x) =>
        assert(java.lang.Double.compare(g, w) == 0,
          s"pround($x, $n) = $g, double-floor reference = $w")
      }
    }
  }

  test("boundary-sweep peak concurrency == brute force, with touching intervals overlapping") {
    // the q266 pattern: +1 at start, -1 at end, running sum over
    // (ts, starts-before-ends) via the CumSum two-pass; peak must match
    // a brute-force count of intervals covering each boundary instant.
    // Includes touching intervals (end(a) == start(b) counts as 2 live)
    // and a same-instant start pair.
    val iv = Seq((0L, 10L), (10L, 20L), (5L, 15L), (30L, 30L), (30L, 40L),
      (2L, 3L), (100L, 200L), (150L, 160L), (150L, 155L))
    val sess = iv.zipWithIndex.map { case ((a, b), i) => (i.toLong, a, b) }
      .toDF("sid", "st", "en")
    val bounds = sess.select(col("st").as("ts"), lit(1L).as("delta"), col("sid"))
      .unionAll(sess.select(col("en").as("ts"), lit(-1L).as("delta"), col("sid")))
    val cum = graft.operators.CumSum.withRunningTotal(bounds,
      Seq(col("ts"), col("delta") * lit(-1L), col("sid")), col("delta"), "live")
    val peak = cum.agg(max(col("live"))).head.getLong(0)
    // brute force: at every boundary instant t, count intervals with
    // st <= t <= en
    val pts = iv.flatMap { case (a, b) => Seq(a, b) }.distinct
    val brute = pts.map(t => iv.count { case (a, b) => a <= t && t <= b }).max
    assert(peak == brute, s"sweep peak $peak != brute $brute")
  }

  test("Shapley skeleton satisfies the axiom preconditions") {
    val sk = SparkEntry.shapleySkeleton
    assert(sk.size == 32) // 4 channels x 8 coalitions each
    val byChannel = sk.groupBy(_._1)
    assert(byChannel.keySet == Set("click", "error", "signup", "view"))
    for ((_, rows) <- byChannel) {
      assert(rows.size == 8)
      // weights over coalitions sum to exactly 1 (efficiency): each of
      // the 8 subsets carries k!(n-1-k)!/n!
      assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-12)
      // m1 is m0 plus exactly the channel's bit
      rows.foreach { case (_, m0, m1, _) =>
        assert((m1 & m0) == m0 && Integer.bitCount(m1 - m0) == 1)
      }
    }
    // dummy-player check against a hand value function: v(S) = |S|/4
    // (linear game) must give every channel exactly 1/4
    def v(m: Int): Double = Integer.bitCount(m) / 4.0
    for ((_, rows) <- byChannel) {
      val phi = rows.map { case (_, m0, m1, w) => w * (v(m1) - v(m0)) }.sum
      assert(math.abs(phi - 0.25) < 1e-12)
    }
  }
}
