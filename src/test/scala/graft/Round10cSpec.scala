package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Properties of the q309/q312/q323/q325 machinery: DTW axioms on the
  * driver DP, power iteration recovering a planted principal direction,
  * coverage-sweep invariants, and interpolation boundedness. */
class Round10cSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // the q309 DP, verbatim (integer costs)
  private def dtw(a: Array[Long], b: Array[Long]): Long = {
    val n = a.length; val m = b.length
    val INF = Long.MaxValue / 4
    var prev = Array.fill(m + 1)(INF); prev(0) = 0L
    for (i <- 1 to n) {
      val cur = Array.fill(m + 1)(INF)
      for (j <- 1 to m) {
        val cost = math.abs(a(i - 1) - b(j - 1))
        cur(j) = cost + math.min(prev(j), math.min(cur(j - 1), prev(j - 1)))
      }
      prev = cur
    }
    prev(m)
  }

  test("DTW: identity, symmetry, hand-computed alignment, lag invariance") {
    val a = Array(1L, 3L, 4L, 9L, 8L, 2L)
    val b = Array(1L, 1L, 3L, 4L, 9L, 8L, 2L)  // a delayed by one step
    assert(dtw(a, a) === 0L)
    assert(dtw(a, b) === dtw(b, a))
    // elastic alignment absorbs the pure lag: distance stays 0
    assert(dtw(a, b) === 0L)
    // hand case: [0,0] vs [1,1] — every cell costs 1, path length 2
    assert(dtw(Array(0L, 0L), Array(1L, 1L)) === 2L)
    // uniform +5 shift: warping can pair off-diagonal cells whose
    // |a_i − a_j − 5| beats 5, so the cost is ≤ 5·pathlen, not =5n
    val shifted = a.map(_ + 5L)
    val d = dtw(a, shifted)
    assert(d > 0L && d <= 5L * (2 * a.length - 1))
    assert(d === 26L) // pinned regression value for this series
  }

  test("Pca.topComponent recovers a planted principal direction") {
    // points along (0.6, 0.8) with a small orthogonal wiggle — the top
    // component must align with the planted axis after 3 iterations
    val pts = (-20 to 20).map { t =>
      val wig = (t % 3 - 1) * 0.05
      (t.toLong + 21L,
        Seq((0.6 * t + 0.8 * wig).toFloat, (0.8 * t - 0.6 * wig).toFloat))
    }
    val df = pts.toDF("vec_id", "embedding")
    val v = graft.operators.Pca.topComponent(df, "embedding", "vec_id", 3)
      .orderBy(col("i")).collect()
    assert(v.length === 2)
    val (v0, v1) = (v(0).getAs[Double]("v"), v(1).getAs[Double]("v"))
    assert(math.abs(v0 * v0 + v1 * v1 - 1.0) < 1e-6, s"not unit: $v0,$v1")
    val cosToPlanted = math.abs(v0 * 0.6 + v1 * 0.8)
    assert(cosToPlanted > 0.999, s"misaligned: $v0,$v1 cos=$cosToPlanted")
    // eigenvalue ≈ full variance share: wiggle is tiny
    val tv = graft.operators.Pca.varianceStats(df, "embedding").head
    val lambda = v(0).getAs[Double]("nrm") / tv.getAs[Long]("n")
    assert(lambda / tv.getAs[Double]("totvar") > 0.99)
  }

  test("q323 coverage invariants: covered ≤ span, merged ≤ sessions") {
    val r = SparkEntry.queries("q323_coverage_timeline")(spark, TestSpark.sf0001)
      .head
    val covered = r.getAs[Long]("covered_seconds")
    val frac = r.getAs[Double]("coverage_frac")
    assert(covered >= 0L && frac >= 0.0 && frac <= 1.0)
    assert(r.getAs[Long]("n_merged") <= r.getAs[Long]("n_sessions"))
  }

  test("q325 interpolated values lie between their neighbors") {
    val rows = SparkEntry.queries("q325_linear_interp")(spark, TestSpark.sf0001)
      .orderBy(col("event_type"), col("day")).collect()
    val byType = rows.groupBy(_.getAs[String]("event_type"))
    byType.foreach { case (_, rs) =>
      val obs = rs.filter(r => !r.isNullAt(r.fieldIndex("mean_raw")))
        .map(_.getAs[Double]("mean_raw"))
      rs.filter(_.getAs[Boolean]("is_interpolated")).foreach { r =>
        val v = r.getAs[Double]("mean_interp")
        // lerp between two observed values can't leave their global range
        if (obs.nonEmpty)
          assert(v >= obs.min - 1e-9 && v <= obs.max + 1e-9)
      }
    }
  }
}
