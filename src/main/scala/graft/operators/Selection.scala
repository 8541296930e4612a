package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StructField, StructType}

/** Distributed order statistics by histogram refinement — the 100 TB
  * answer to "exact percentile without buffering the group".
  *
  * Spark's exact `percentile` (q55) materializes every value of a group
  * in one aggregation buffer: correct, and the declared oracle anchor,
  * but O(group) memory in ONE task — the known ceiling the q57 sketch
  * tier works around by giving up exactness. This operator keeps
  * exactness and drops the buffer: a classic distributed selection
  * (multi-round quickselect over histogram bins — the "bucket then
  * recurse" discipline).
  *
  *  - pass 0: per-group (min, max, count) — tiny partial agg;
  *  - pass 1: per-group fixed-width bin counts; binning is a pure
  *    codegen expression against the BROADCAST bounds frame (no UDF),
  *    the shuffle carries at most `bins` rows per group;
  *  - driver: walk each group's cumulative histogram to find the bin
  *    holding each target rank — driver traffic is groups × bins rows,
  *    bounded by construction, never by data size;
  *  - pass 2: re-scan filtered to target bins only (map-side broadcast
  *    semi-join, ~n/bins of the data survives); the per-group in-bin
  *    slice sorts inside one agg buffer and yields the exact order
  *    statistics. Every requested quantile shares the same three scans.
  *
  * One refinement level suffices while n/bins fits a task (1e9 rows /
  * 4096 bins ≈ 250k values); beyond that, recurse the same routine on
  * the in-bin slice — each level divides the candidate set by `bins`,
  * so depth is log_bins(n) (2 levels cover 10^13 rows per group).
  *
  * Interpolation matches `quantile_cont`/`percentile` exactly:
  * h = (n-1)·q, result = (1-frac)·x_floor(h) + frac·x_ceil(h) — the
  * weighted-mean form both engines compute (NOT lower + delta·frac,
  * which differs by 1 ulp), so results are bit-identical to the
  * single-buffer tier.
  */
object Selection {

  /** Exact per-group quantiles of `valueCol` over `groupCol`, histogram
    * refinement, never a full-group buffer. Long output:
    * (groupCol, q, value) — one row per (group, requested quantile).
    *
    * @param bins histogram resolution; the tail pass carries ~n/bins
    *             rows per group, the driver ≤ groups×bins histogram rows.
    */
  def exactGroupedQuantiles(df: DataFrame, groupCol: String, valueCol: String,
                            qs: Seq[Double], bins: Int = 1024): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0),
      s"quantiles must be in [0, 1]: $qs")
    val spark = df.sparkSession
    val v = col(valueCol).cast("double")
    val base = df.filter(v.isNotNull).select(col(groupCol).as("g"), v.as("v"))

    // pass 0: bounds + counts (kept as a frame for the broadcast join,
    // collected for the driver walk — same tiny result, computed once)
    val boundsDf = base.groupBy(col("g"))
      .agg(min(col("v")).as("lo"), max(col("v")).as("hi"), count(lit(1)).as("n"))
      .persist()
    val bounds = boundsDf.collect()
      .map(r => (r.get(0), (r.getDouble(1), r.getDouble(2), r.getLong(3)))).toMap

    // codegen binning: degenerate (single-valued) groups collapse to bin 0
    val binExpr = when(col("hi") <= col("lo"), lit(0)).otherwise(
      least(lit(bins - 1),
        floor((col("v") - col("lo")) / (col("hi") - col("lo")) * bins).cast("int")))
    val binned = base.join(broadcast(boundsDf), Seq("g"))
      .select(col("g"), col("v"), binExpr.as("b"))

    // pass 1: the histogram — at most `bins` rows per group shuffle
    val hist = binned.groupBy(col("g"), col("b")).agg(count(lit(1)).as("c"))
      .collect().map(r => (r.get(0), r.getInt(1), r.getLong(2)))

    // driver: the 0-indexed ranks each quantile needs (floor(h) and,
    // when h is fractional, ceil(h)), then a cumulative walk locating
    // each rank's (bin, local rank)
    def ranksFor(n: Long, q: Double): (Long, Long, Double) = {
      val h = (n - 1) * q
      val lo = math.floor(h).toLong
      val frac = h - lo
      (lo, if (frac > 0) lo + 1 else lo, frac)
    }
    // degenerate (single-valued) groups are fully answered by pass 0 —
    // every order statistic IS lo. Routing them through pass 2 would
    // collect the ENTIRE group into one agg buffer (all rows share bin
    // 0), the exact memory cliff this operator exists to avoid.
    val degenerate = bounds.filter { case (_, (lo, hi, _)) => hi <= lo }
    val located: Map[Any, Map[Long, (Int, Long)]] = hist.groupBy(_._1).collect {
      case (g, rows) if !degenerate.contains(g) =>
        val n = bounds(g)._3
        val wanted = qs.flatMap { q =>
          val (r1, r2, _) = ranksFor(n, q); Seq(r1, r2) }.distinct.sorted
        var cum = 0L
        val out = scala.collection.mutable.Map.empty[Long, (Int, Long)]
        for ((_, b, c) <- rows.sortBy(_._2)) {
          for (r <- wanted if r >= cum && r < cum + c) out(r) = (b, r - cum)
          cum += c
        }
        g -> out.toMap
    }

    // pass 2: map-side filter to target bins via a broadcast semi-join,
    // sort the surviving ~n/bins slice per (group, bin)
    val gType = base.schema("g").dataType
    val targetRows = located.toSeq.flatMap { case (g, m) =>
      m.values.map(_._1).toSeq.distinct.map(b => Row(g, b)) }
    val targetDf = spark.createDataFrame(
      spark.sparkContext.parallelize(targetRows, 1),
      StructType(Seq(StructField("g", gType),
        StructField("b", org.apache.spark.sql.types.IntegerType))))
    val slices = binned.join(broadcast(targetDf), Seq("g", "b"), "left_semi")
      .groupBy(col("g"), col("b")).agg(sort_array(collect_list(col("v"))).as("vs"))
      .collect().map(r => ((r.get(0), r.getInt(1)), r.getSeq[Double](2))).toMap
    boundsDf.unpersist(false)

    val out = located.toSeq.flatMap { case (g, m) =>
      val n = bounds(g)._3
      qs.map { q =>
        val (r1, r2, frac) = ranksFor(n, q)
        def at(r: Long): Double = { val (b, lr) = m(r); slices((g, b))(lr.toInt) }
        val x1 = at(r1)
        // the exact weighted-mean expression percentile/quantile_cont
        // evaluate (lower + delta*frac differs by 1 ulp)
        Row(g, q, if (r2 == r1) x1 else (1 - frac) * x1 + frac * at(r2))
      }
    } ++ degenerate.toSeq.flatMap { case (g, (lo, _, _)) =>
      qs.map(q => Row(g, q, lo))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(out, 1),
      StructType(Seq(StructField(groupCol, gType),
        StructField("q", DoubleType), StructField("value", DoubleType))))
  }

  /** Exact per-group median — [[exactGroupedQuantiles]] at q = 0.5.
    * Output: (groupCol, median). */
  def exactGroupedMedian(df: DataFrame, groupCol: String, valueCol: String,
                         bins: Int = 1024): DataFrame =
    exactGroupedQuantiles(df, groupCol, valueCol, Seq(0.5), bins)
      .select(col(groupCol), col("value").as("median"))
}
