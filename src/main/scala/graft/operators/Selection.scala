package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType, StructField, StructType}

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
  *    semi-join, ~n/bins of the data survives). A target bin whose
  *    histogram count fits `sliceCap` sorts inside one agg buffer and
  *    yields the exact order statistics; a bin that does NOT fit
  *    RECURSES — its rows are tagged with a dense id via a broadcast
  *    (group, bin) → id map and the same routine runs on the slice with
  *    the in-bin local ranks as the wanted order statistics. Each level
  *    divides the candidate set by ~`bins`, so depth is log_bins(n)
  *    (2 levels cover 10^13 rows per group at the default cap); a
  *    value-degenerate slice (all duplicates of one value) terminates
  *    via the single-valued fast path regardless of its size. Every
  *    requested quantile shares the same per-level scans.
  *
  * Interpolation matches `quantile_cont`/`percentile` exactly:
  * h = (n-1)·q, result = (1-frac)·x_floor(h) + frac·x_ceil(h) — the
  * weighted-mean form both engines compute (NOT lower + delta·frac,
  * which differs by 1 ulp), so results are bit-identical to the
  * single-buffer tier.
  */
object Selection {

  /** Levels of refinement before giving up and buffering the slice
    * anyway — 12 levels at bins=1024 is 10^36 rows, unreachable; the
    * limit only guards adversarial distributions where refinement stops
    * narrowing (near-duplicate doubles straddling a bin edge). */
  private val MaxDepth = 12

  /** Deepest refinement level reached by the most recent
    * [[exactGroupedQuantiles]] call — test-only telemetry so specs can
    * assert the recursion actually engaged (a broken cap check would
    * still produce correct values by buffering). 0 = no recursion. */
  private[graft] val lastDepth = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Exact per-group quantiles of `valueCol` over `groupCol`, histogram
    * refinement, never a full-group buffer. Long output:
    * (groupCol, q, value) — one row per (group, requested quantile).
    *
    * @param bins     histogram resolution; the tail pass carries ~n/bins
    *                 rows per group, the driver ≤ groups×bins histogram
    *                 rows per refinement level.
    * @param sliceCap largest in-bin slice collected into one sort
    *                 buffer; a bin above the cap recurses instead.
    */
  def exactGroupedQuantiles(df: DataFrame, groupCol: String, valueCol: String,
                            qs: Seq[Double], bins: Int = 1024,
                            sliceCap: Long = 1L << 18): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0),
      s"quantiles must be in [0, 1]: $qs")
    val spark = df.sparkSession
    val v = col(valueCol).cast("double")
    val base = df.filter(v.isNotNull).select(col(groupCol).as("g"), v.as("v"))
    val gType = base.schema("g").dataType

    // pass 0 computes counts (for the rank targets) AND bounds (for
    // orderStats' binning) in ONE agg over ONE scan — splitting them
    // cost the non-recursing path a fourth full scan in r9 (q184's
    // +80%); the combined frame is handed to the depth-0 orderStats
    // so the common path is exactly the 3-scan r8 plan.
    val statsDf = base.groupBy(col("g"))
      .agg(min(col("v")).as("lo"), max(col("v")).as("hi"), count(lit(1)).as("n"))
      .persist()
    val statRows = statsDf.collect()
    val counts: Map[Any, Long] = statRows.map(r => (r.get(0), r.getLong(3))).toMap
    val bounds0: Map[Any, (Double, Double)] =
      statRows.map(r => (r.get(0), (r.getDouble(1), r.getDouble(2)))).toMap

    // the 0-indexed ranks each quantile needs (floor(h) and, when h is
    // fractional, ceil(h))
    def ranksFor(n: Long, q: Double): (Long, Long, Double) = {
      val h = (n - 1) * q
      val lo = math.floor(h).toLong
      val frac = h - lo
      (lo, if (frac > 0) lo + 1 else lo, frac)
    }
    val wanted: Map[Any, Seq[Long]] = counts.map { case (g, n) =>
      g -> qs.flatMap { q => val (r1, r2, _) = ranksFor(n, q); Seq(r1, r2) }
        .distinct.sorted
    }

    lastDepth.set(0)
    val stats = orderStats(base, wanted, bins, sliceCap, depth = 0,
      precomputed = Some((statsDf.select(col("g"), col("lo"), col("hi")), bounds0)))
    statsDf.unpersist(false)

    val out = counts.toSeq.flatMap { case (g, n) =>
      qs.map { q =>
        val (r1, r2, frac) = ranksFor(n, q)
        val x1 = stats((g, r1))
        // the exact weighted-mean expression percentile/quantile_cont
        // evaluate (lower + delta*frac differs by 1 ulp)
        Row(g, q, if (r2 == r1) x1 else (1 - frac) * x1 + frac * stats((g, r2)))
      }
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(out, 1),
      StructType(Seq(StructField(groupCol, gType),
        StructField("q", DoubleType), StructField("value", DoubleType))))
  }

  /** The exact k-th smallest value (1-based k, per group) — the RANK
    * entry point to the same no-buffer refinement machinery:
    * split-conformal calibration needs the ceil((n+1)(1−α))-th order
    * statistic, whose rank is data-dependent per group and therefore
    * cannot ride fixed quantile probabilities (and probability
    * interpolation at (k−1)/(n−1) is 1-ulp fragile — a rank lookup is
    * value-exact by construction). Output columns: (group, k, value). */
  def exactGroupedOrderStat(df: DataFrame, groupCol: String, valueCol: String,
                            ks: Map[Any, Long], bins: Int = 1024,
                            sliceCap: Long = 1L << 18): DataFrame = {
    require(ks.values.forall(_ >= 1), s"ranks are 1-based: $ks")
    val spark = df.sparkSession
    val v = col(valueCol).cast("double")
    val base = df.filter(v.isNotNull).select(col(groupCol).as("g"), v.as("v"))
    val gType = base.schema("g").dataType
    val wanted: Map[Any, Seq[Long]] = ks.map { case (g, k) => (g, Seq(k - 1)) }
    lastDepth.set(0)
    val stats = orderStats(base, wanted, bins, sliceCap, depth = 0)
    val out = ks.toSeq.map { case (g, k) => Row(g, k, stats((g, k - 1))) }
    spark.createDataFrame(spark.sparkContext.parallelize(out, 1),
      StructType(Seq(StructField(groupCol, gType),
        StructField("k", LongType), StructField("value", DoubleType))))
  }

  /** One refinement level: the exact value at each wanted 0-indexed rank
    * per group of `base` (columns g, v; v non-null double). Bins each
    * group, locates the bin holding each rank, collects bins that fit
    * `sliceCap` and recurses on bins that don't (rows re-keyed to a
    * dense id by a broadcast map, wanted ranks rebased to in-bin local
    * ranks). Driver state per level: groups × bins histogram rows plus
    * the collected slices — never a full group. */
  private def orderStats(base: DataFrame, wanted: Map[Any, Seq[Long]],
                         bins: Int, sliceCap: Long, depth: Int,
                         precomputed: Option[(DataFrame, Map[Any, (Double, Double)])] = None)
      : Map[(Any, Long), Double] = {
    if (wanted.isEmpty) return Map.empty
    lastDepth.getAndUpdate(d => math.max(d, depth))
    val spark = base.sparkSession
    val gType = base.schema("g").dataType

    // pass 0: bounds (kept as a frame for the broadcast join, collected
    // for the driver walk — same tiny result, computed once). The
    // depth-0 caller already has them from its combined counts+bounds
    // agg (`precomputed`) — only recursion levels scan here.
    val ownsPersist = precomputed.isEmpty
    val (boundsDf, bounds) = precomputed.getOrElse {
      val df0 = base.groupBy(col("g"))
        .agg(min(col("v")).as("lo"), max(col("v")).as("hi"))
        .persist()
      (df0, df0.collect()
        .map(r => (r.get(0), (r.getDouble(1), r.getDouble(2)))).toMap)
    }

    // single-valued groups are fully answered by pass 0 — every order
    // statistic IS lo. Routing them through pass 2 would collect the
    // ENTIRE group into one agg buffer (all rows share bin 0), the
    // exact memory cliff this operator exists to avoid. This branch is
    // also the recursion's value-degenerate terminator.
    val degenerate = bounds.filter { case (_, (lo, hi)) => hi <= lo }
    val answered: Map[(Any, Long), Double] = degenerate.toSeq.flatMap {
      case (g, (lo, _)) => wanted.getOrElse(g, Nil).map(r => (g, r) -> lo)
    }.toMap
    val live = wanted.filter { case (g, _) =>
      !degenerate.contains(g) && bounds.contains(g) }
    if (live.isEmpty) {
      if (ownsPersist) boundsDf.unpersist(false)
      return answered
    }

    // codegen binning against the broadcast bounds
    val binExpr = when(col("hi") <= col("lo"), lit(0)).otherwise(
      least(lit(bins - 1),
        floor((col("v") - col("lo")) / (col("hi") - col("lo")) * bins).cast("int")))
    val binned = base.join(broadcast(boundsDf), Seq("g"))
      .select(col("g"), col("v"), binExpr.as("b"))

    // pass 1: the histogram — at most `bins` rows per group shuffle
    val hist = binned.groupBy(col("g"), col("b")).agg(count(lit(1)).as("c"))
      .collect().map(r => (r.get(0), r.getInt(1), r.getLong(2)))
    val histByG = hist.groupBy(_._1)

    // driver: cumulative walk locating each wanted rank's (bin, local
    // rank), plus each target bin's total count for the cap decision
    val located: Map[Any, Map[Long, (Int, Long)]] = histByG.collect {
      case (g, rows) if live.contains(g) =>
        val ranks = live(g)
        var cum = 0L
        val out = scala.collection.mutable.Map.empty[Long, (Int, Long)]
        for ((_, b, c) <- rows.sortBy(_._2)) {
          for (r <- ranks if r >= cum && r < cum + c) out(r) = (b, r - cum)
          cum += c
        }
        g -> out.toMap
    }
    val binCount: Map[(Any, Int), Long] =
      hist.map { case (g, b, c) => (g, b) -> c }.toMap
    val targets: Map[(Any, Int), Seq[Long]] = located.toSeq
      .flatMap { case (g, m) => m.map { case (r, (b, _)) => ((g, b), r) } }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    // a bin recurses when its count exceeds the cap — unless the depth
    // guard says buffering is the lesser evil
    val (big, small) = targets.partition { case (k, _) =>
      binCount(k) > sliceCap && depth < MaxDepth }

    // pass 2a: bins that fit — map-side filter via broadcast semi-join,
    // sort the surviving ~n/bins slice per (group, bin)
    val smallAnswers: Map[(Any, Long), Double] = if (small.isEmpty) Map.empty else {
      val targetDf = spark.createDataFrame(
        spark.sparkContext.parallelize(
          small.keys.toSeq.map { case (g, b) => Row(g, b) }, 1),
        StructType(Seq(StructField("g", gType), StructField("b", IntegerType))))
      val slices = binned.join(broadcast(targetDf), Seq("g", "b"), "left_semi")
        .groupBy(col("g"), col("b")).agg(sort_array(collect_list(col("v"))).as("vs"))
        .collect().map(r => ((r.get(0), r.getInt(1)), r.getSeq[Double](2))).toMap
      located.toSeq.flatMap { case (g, m) =>
        m.toSeq.collect { case (r, (b, lr)) if small.contains((g, b)) =>
          (g, r) -> slices((g, b))(lr.toInt)
        }
      }.toMap
    }

    // pass 2b: bins that don't fit — re-key each oversized (group, bin)
    // slice to a dense int id via a broadcast map and recurse with the
    // in-bin LOCAL ranks as the wanted statistics
    val bigAnswers: Map[(Any, Long), Double] = if (big.isEmpty) Map.empty else {
      val ids: Map[(Any, Int), Int] = big.keys.toSeq.zipWithIndex.toMap
      val idDf = spark.createDataFrame(
        spark.sparkContext.parallelize(
          ids.toSeq.map { case ((g, b), id) => Row(g, b, id) }, 1),
        StructType(Seq(StructField("g", gType), StructField("b", IntegerType),
          StructField("id", IntegerType))))
      val sub = binned.join(broadcast(idDf), Seq("g", "b"))
        .select(col("id").as("g"), col("v"))
      // m.toSeq BEFORE collect: collecting pairs straight off a Map
      // rebuilds a Map and silently drops all but one local rank per
      // oversized bin
      val subWanted: Map[Any, Seq[Long]] = located.toSeq.flatMap { case (g, m) =>
        m.toSeq.collect { case (_, (b, lr)) if big.contains((g, b)) =>
          (ids((g, b)): Any, lr)
        }
      }.groupBy(_._1).map { case (id, v) => id -> v.map(_._2).distinct.sorted }
      val subStats = orderStats(sub, subWanted, bins, sliceCap, depth + 1)
      located.toSeq.flatMap { case (g, m) =>
        m.toSeq.collect { case (r, (b, lr)) if big.contains((g, b)) =>
          (g, r) -> subStats((ids((g, b)): Any, lr))
        }
      }.toMap
    }

    if (ownsPersist) boundsDf.unpersist(false)
    answered ++ smallAnswers ++ bigAnswers
  }

  /** Exact per-group median — [[exactGroupedQuantiles]] at q = 0.5.
    * Output: (groupCol, median). */
  def exactGroupedMedian(df: DataFrame, groupCol: String, valueCol: String,
                         bins: Int = 1024): DataFrame =
    exactGroupedQuantiles(df, groupCol, valueCol, Seq(0.5), bins)
      .select(col(groupCol), col("value").as("median"))
}
