package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Round-5 statistical operators: k-means iteration, PMI collocations,
  * z-score outliers — planted-input semantics. */
class AnalyticsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("histogram-refinement median == single-buffer percentile on every group shape") {
    import org.apache.spark.sql.functions._
    // group shapes that stress the selection: even count (interpolated),
    // odd count, single element, constant values (degenerate bins),
    // two elements, skewed magnitudes
    val rows =
      (1 to 1000).map(i => ("even", i.toDouble * 1.3)) ++
      (1 to 999).map(i => ("odd", 5000.0 - i * 2.7)) ++
      Seq(("one", 42.5)) ++
      (1 to 100).map(_ => ("const", 7.0)) ++
      Seq(("two", 1.0), ("two", 2.0)) ++
      (1 to 500).map(i => ("skew", if (i < 490) i.toDouble else i * 1e9))
    val df = rows.toDF("g", "v").repartition(13) // exercise partial aggs
    val got = graft.operators.Selection.exactGroupedMedian(df, "g", "v", bins = 32)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val want = df.groupBy("g").agg(percentile(col("v"), lit(0.5)).as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got.keySet == want.keySet)
    for ((g, w) <- want)
      assert(got(g) == w, s"group $g: refinement ${got(g)} != percentile $w")
    // the general quantile band, same groups: bit-equal at p05/p50/p95/p99
    val qs = Seq(0.05, 0.5, 0.95, 0.99)
    val gotQ = graft.operators.Selection.exactGroupedQuantiles(df, "g", "v", qs, bins = 32)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    for (q <- qs) {
      val wantQ = df.groupBy("g").agg(percentile(col("v"), lit(q)).as("m"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      for ((g, w) <- wantQ)
        assert(gotQ((g, q)) == w, s"group $g q=$q: ${gotQ((g, q))} != $w")
    }
    // edges: q=0/q=1 are exact min/max; nulls are excluded like
    // percentile; an all-null/empty input yields an empty frame
    val ex = graft.operators.Selection.exactGroupedQuantiles(
        Seq(("a", Some(3.0)), ("a", Some(1.0)), ("a", None)).toDF("g", "v"),
        "g", "v", Seq(0.0, 1.0), bins = 8)
      .collect().map(r => r.getDouble(1) -> r.getDouble(2)).toMap
    assert(ex == Map(0.0 -> 1.0, 1.0 -> 3.0))
    assert(graft.operators.Selection.exactGroupedQuantiles(
      Seq(("a", Option.empty[Double])).toDF("g", "v"), "g", "v", Seq(0.5))
      .count() == 0L)
  }

  test("rank entry point: exactGroupedOrderStat returns the k-th smallest per group") {
    // mixed groups incl. ties and a data-dependent k per group (the
    // conformal use case); reference = plain sorted order statistics
    val rows = (1 to 400).map(i => ("a", ((i * 31) % 97).toDouble)) ++
      (1 to 55).map(i => ("b", (i % 7).toDouble)) ++
      Seq(("c", 5.0))
    val df = rows.toDF("g", "v").repartition(7)
    val ks: Map[Any, Long] = Map("a" -> 360L, "b" -> 50L, "c" -> 1L)
    val got = graft.operators.Selection.exactGroupedOrderStat(df, "g", "v", ks, bins = 16)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val byG = rows.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    for ((g, k) <- ks)
      assert(got(g.toString) == ((k, byG(g.toString)(k.toInt - 1))),
        s"group $g k=$k: ${got(g.toString)} != ${byG(g.toString)(k.toInt - 1)}")
    // recursing case: tiny sliceCap forces refinement; still exact
    val deep = graft.operators.Selection.exactGroupedOrderStat(
        df, "g", "v", Map("a" -> 123L), bins = 4, sliceCap = 16)
      .collect().head.getDouble(2)
    assert(deep == byG("a")(122))
    assert(graft.operators.Selection.lastDepth.get() > 0, "sliceCap must force recursion")
  }

  test("quantile selector non-recursing path reads the input exactly 3 times — no extra scan") {
    // the r9 regression: splitting the counts agg out of pass 0 cost
    // the common path a 4th full scan of the input (q184's +80%). An
    // accumulator ticking once per input-row evaluation counts actual
    // scans independent of AQE's job/stage slicing: combined
    // counts+bounds, histogram, and slice passes each read every row
    // once -> exactly 3n ticks; a reintroduced counts scan would show
    // up as 4n.
    val n = 5000
    val scans = spark.sparkContext.longAccumulator("selq-scans")
    val tick = udf { x: Double => scans.add(1L); x }
    val df = (1 to n).map(i => (s"g${i % 3}", ((i * 37) % 1009).toDouble))
      .toDF("g", "v0").select(col("g"), tick(col("v0")).as("v"))
    val res = graft.operators.Selection
      .exactGroupedQuantiles(df, "g", "v", Seq(0.5, 0.95), bins = 64)
    assert(graft.operators.Selection.lastDepth.get() === 0, "must not recurse")
    assert(res.count() === 6L) // output is driver-built rows: no re-scan
    assert(scans.value === 3L * n,
      s"non-recursing path must scan the input exactly 3 times: ${scans.value / n.toDouble} scans")
  }

  test("quantile selector recurses past the slice cap and stays bit-equal to percentile") {
    // bins=4 over 100k spread values with cap=1000 forces multi-level
    // refinement: 100k/4 = 25k per top bin, /4 per level → depth ≥ 3
    // before any slice fits. Values are a deterministic hash spread
    // (duplicates included via the modulus) so bins stay non-degenerate.
    val df = (1 to 100000)
      .map(i => ("g", ((i * 2654435761L) % 9973).toDouble + (i % 7) * 0.25))
      .toDF("g", "v").repartition(13)
    val qs = Seq(0.01, 0.25, 0.5, 0.75, 0.99)
    val got = graft.operators.Selection
      .exactGroupedQuantiles(df, "g", "v", qs, bins = 4, sliceCap = 1000)
      .collect().map(r => r.getDouble(1) -> r.getDouble(2)).toMap
    assert(graft.operators.Selection.lastDepth.get() >= 3,
      s"cap=1000 over 100k values must recurse, reached depth ${
        graft.operators.Selection.lastDepth.get()}")
    for (q <- qs) {
      val w = df.agg(percentile(col("v"), lit(q))).head.getDouble(0)
      assert(got(q) == w, s"q=$q: recursed ${got(q)} != percentile $w")
    }
    // a value-degenerate hot bin (60k duplicates of one value) must
    // terminate via the single-valued fast path, not recurse forever
    val dup = ((1 to 60000).map(_ => ("g", 5.0)) ++
      (1 to 1000).map(i => ("g", i.toDouble))).toDF("g", "v")
    val med = graft.operators.Selection
      .exactGroupedQuantiles(dup, "g", "v", Seq(0.5), bins = 4, sliceCap = 100)
      .head.getDouble(2)
    assert(med == 5.0)
  }

  test("ecdfTable on a continuous all-distinct column matches cume_dist semantics") {
    import graft.operators.CumSum
    // high-cardinality continuous column: 50k distinct doubles — the
    // regime where the bounded-distinct Window tier would single-
    // partition a corpus-sized frame; the two-pass must not
    val vals = (1 to 50000).map(i => ((i * 2654435761L) % 999983).toDouble + i * 1e-7)
    val df = vals.map(Tuple1(_)).toDF("v").repartition(11)
    val got = CumSum.ecdfTable(df, col("v"), "v")
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(got.size == vals.distinct.size)
    val sorted = vals.sorted
    val n = sorted.size.toDouble
    sorted.zipWithIndex.foreach { case (v, i) =>
      assert(got(v) == (i + 1) / n, s"ecdf($v): ${got(v)} != ${(i + 1) / n}")
    }
    // ties share one row at P(X <= v) counting ALL duplicates
    val tied = Seq(1.0, 2.0, 2.0, 2.0, 3.0).map(Tuple1(_)).toDF("v")
    val gotTied = CumSum.ecdfTable(tied, col("v"), "v")
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(gotTied == Map(1.0 -> 0.2, 2.0 -> 0.8, 3.0 -> 1.0))
  }

  test("k-means iteration: every vector lands on its nearest seed; Lloyd step reduces cost") {
    val emb = Tables.embeddings(spark, TestSpark.sf0001)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val cents = emb.filter(_._1 < 8)
    def l2(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i).toDouble - b(i).toDouble; s += d * d; i += 1 }
      math.sqrt(s)
    }
    def l2sq(a: Array[Float], b: Array[Float]): Double = { val d = l2(a, b); d * d }
    // local ground truth: SQUARED assignment cost with the seed centroids
    // (the mean minimizes summed SQUARED distance — the unsquared sum is
    // not guaranteed non-increasing and would be a false invariant)
    val seedCost = emb.map { case (_, v) => cents.map(c => l2sq(v, c._2)).min }.sum
    val out = SparkEntry.queries("q85_kmeans_iter")(spark, TestSpark.sf0001).collect()
    assert(out.length === 8 * 64) // every seed kept members (it contains itself)
    val newCents = out.groupBy(_.getLong(0)).map { case (cid, rows) =>
      cid -> rows.sortBy(_.getLong(1)).map(r => r.getDouble(2).toFloat)
    }
    // Lloyd guarantee: assigning to old centroids, the NEW centroids do
    // not increase the summed distance to each vector's assigned mean
    val newCost = emb.map { case (_, v) =>
      val assigned = cents.minBy(c => (l2(v, c._2), c._1))._1
      l2sq(v, newCents(assigned))
    }.sum
    assert(newCost <= seedCost + 1e-6, s"Lloyd step increased cost: $newCost > $seedCost")
  }

  test("PMI ranks a rare exclusive pair above a pair of common words") {
    val docs = (0 until 30).map { i =>
      // "the cat" is frequent with very common components; "foo bar" is
      // rare but its components appear ONLY together -> max association
      val extra = if (i < 5) " foo bar" else ""
      (i.toLong, s"the cat sat on the mat w$i$extra")
    }.toDF("doc_id", "text")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos"))
    val bi = docs
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "word")))
      .select(col("doc_id"), col("word"), lead(col("word"), 1).over(w).as("next"))
      .filter(col("next").isNotNull)
    val cAB = bi.groupBy(col("word"), col("next")).agg(count(lit(1)).as("c_ab"))
    val cA = bi.groupBy(col("word")).agg(count(lit(1)).as("c_a"))
    val cB = bi.groupBy(col("next").as("nw")).agg(count(lit(1)).as("c_b"))
    val n = bi.agg(count(lit(1)).as("n_bi"))
    val pmi = cAB.join(cA, Seq("word")).join(cB, cAB("next") === cB("nw"))
      .crossJoin(broadcast(n))
      .withColumn("pmi",
        round(log((col("c_ab") * col("n_bi")).cast("double") / (col("c_a") * col("c_b"))), 9))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(7)).toMap
    // exclusive co-occurrence beats common-word adjacency
    assert(pmi(("foo", "bar")) > pmi(("the", "cat")), pmi.toString)
    assert(pmi(("foo", "bar")) > 0.0)
  }

  test("resample + forward-fill bridges gaps and flags them") {
    import org.apache.spark.sql.expressions.Window
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    val hourly = Seq(
      (1L, ts("2024-01-01 00:00:00"), 10.0),
      (1L, ts("2024-01-01 03:00:00"), 40.0) // hours 1,2 are gaps
    ).toDF("user_id", "h", "v")
    val span = hourly.groupBy(col("user_id"))
      .agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
    val grid = span.select(col("user_id"),
      explode(sequence(col("h0"), col("h1"), expr("INTERVAL 1 hour"))).as("h"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("h"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val out = grid.join(hourly, Seq("user_id", "h"), "left")
      .select(col("h"), last(col("v"), ignoreNulls = true).over(w).as("f"),
        col("v").isNull.as("gap"))
      .collect().map(r => (r.getTimestamp(0).toString, r.getDouble(1), r.getBoolean(2))).toSet
    assert(out === Set(
      ("2024-01-01 00:00:00.0", 10.0, false),
      ("2024-01-01 01:00:00.0", 10.0, true),
      ("2024-01-01 02:00:00.0", 10.0, true),
      ("2024-01-01 03:00:00.0", 40.0, false)))
  }

  test("mean imputation fills exactly the planted nulls with the group mean") {
    val out = SparkEntry.queries("q90_impute")(spark, TestSpark.sf0001)
    val imputed = out.filter(col("was_imputed"))
    // planted rule: exactly the event_id % 7 == 0 rows are imputed
    assert(imputed.filter(col("event_id") % 7 =!= 0).count() === 0)
    assert(out.filter(col("was_imputed") && col("value_imputed").isNull).count() === 0)
    // imputed value is constant per type (the group mean)
    val perType = imputed.groupBy("event_type")
      .agg(countDistinct(col("value_imputed")).as("nd")).collect()
    assert(perType.forall(_.getLong(1) === 1L))
  }

  test("entropy of a uniform word distribution is ln(k)") {
    val df = Seq((1L, "a b c d")).toDF("doc_id", "text")
    val toks = df.select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
    val wc = toks.groupBy(col("doc_id"), col("word")).agg(count(lit(1)).as("c"))
    val tot = wc.groupBy(col("doc_id")).agg(sum(col("c")).as("n"))
    val p = col("c").cast("double") / col("n")
    val e = wc.join(tot, Seq("doc_id"))
      .withColumn("term", round(p * log(p), 9))
      .groupBy(col("doc_id"))
      .agg((-sum(col("term").cast(org.apache.spark.sql.types.DecimalType(27, 12)))).cast("double").as("e"))
      .collect()(0).getDouble(1)
    assert(math.abs(e - math.log(4.0)) < 1e-8, s"$e vs ${math.log(4.0)}")
  }

  test("degree-ordered orientation kills hub wedge blow-up; triangle count unchanged") {
    import org.apache.spark.sql.DataFrame
    import graft.operators.Graph
    // mid-id hub (500) wired to every other node: id-orientation gives
    // it 500 in-edges AND 500 out-edges → 250k wedge candidates at the
    // hub alone; degree-orientation points every star edge INTO the hub
    // (outdeg 0) so the hub contributes none. 100 rim edges close 100
    // triangles either way.
    val hub = 500L
    val star = (0L to 1000L).filterNot(_ == hub).map(i => (i, hub))
    val rim = (0L until 100L).map(i => (i, i + 1))
    val und = (star ++ rim).toDF("a", "b")
    def wedges(edges: DataFrame): Long =
      edges.select(col("u").as("x"), col("v").as("y"))
        .join(edges.select(col("u").as("y"), col("v").as("z")), Seq("y"))
        .count()
    def triangles(edges: DataFrame): Long =
      edges.select(col("u").as("x"), col("v").as("y"))
        .join(edges.select(col("u").as("y"), col("v").as("z")), Seq("y"))
        .join(edges.select(col("u").as("x"), col("v").as("z")), Seq("x", "z"),
          "left_semi")
        .count()
    val byId = und.select(least(col("a"), col("b")).as("u"),
      greatest(col("a"), col("b")).as("v")).distinct()
    val byDeg = Graph.orientByDegree(und)
    assert(triangles(byId) === 100L)
    assert(triangles(byDeg) === 100L, "orientation must not change the triangle set")
    val (wi, wd) = (wedges(byId), wedges(byDeg))
    assert(wi > 250000L, s"id orientation must exhibit the hub blow-up: $wi")
    assert(wd * 100 < wi, s"degree orientation must collapse candidates: $wd vs $wi")
    // reversed/duplicated input edges must not double-orient
    val doubled = und.union(und.select(col("b").as("a"), col("a").as("b")))
    assert(Graph.orientByDegree(doubled).count() === byDeg.count())
  }

  test("adamicAdar: hub cap bounds wedge candidates, discount keeps TRUE degree, sub-cap graphs unchanged") {
    import graft.operators.Graph
    // planted hub: node 0 adjacent to 200 leaves. Uncapped, every leaf
    // pair is a wedge through the hub — C(200,2) = 19900 candidates;
    // with capK=64 only the 64 id-smallest neighbors wedge — C(64,2).
    val star = (1L to 200L).map(i => (0L, i)).toDF("u", "v")
    val all = Graph.adamicAdar(star, capK = 64, topN = 1000000).collect()
    assert(all.length === 64 * 63 / 2,
      s"cap must bound candidates to C(64,2)=2016: ${all.length}")
    assert(all.forall { r => r.getLong(0) >= 1L && r.getLong(1) <= 64L },
      "surviving wedges are pairs among the hub's 64 id-smallest neighbors")
    // the 1/ln(deg) discount must use the TRUE hub degree (200), not
    // the capped adjacency size (64)
    val expected = math.floor(1.0 / math.log(200.0) * 1e9 + 0.5) / 1e9
    assert(all.forall(r => r.getDouble(2) === expected),
      s"score must discount by ln(200): ${all.take(3).mkString(",")}")
    assert(all.forall(r => r.getLong(3) === 1L), "one common neighbor each")
    // no node over the cap -> capped result identical to uncapped
    val g = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L), (4L, 5L)).toDF("u", "v")
    val capped = Graph.adamicAdar(g, capK = 64, topN = 100).collect().toSeq
    val open = Graph.adamicAdar(g, capK = 1000000, topN = 100).collect().toSeq
    assert(capped === open, "cap must be a no-op below the threshold")
  }

  test("kCore: pendant chain peels one layer per round; the core survives intact") {
    import graft.operators.Graph
    // triangle {100,101,102} with a 5-node pendant path 1-2-3-4-5-100:
    // at k=2 the path END is the only sub-degree node, so removals
    // CASCADE one node per round — the multi-round behavior the
    // fixpoint loop exists for — while the triangle is untouched
    val und = (Seq((100L, 101L), (101L, 102L), (100L, 102L)) ++
      Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 100L))).toDF("a", "b")
    val (core, rounds) = Graph.kCore(und, k = 2)
    val got = core.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(100L -> 2L, 101L -> 2L, 102L -> 2L),
      s"only the triangle is a 2-core: $got")
    assert(rounds >= 5, s"a 5-node pendant chain must cascade over rounds: $rounds")
    // observed telemetry: surviving-edge series non-increasing, ends flat
    val series = Graph.lastPeelSeries
    assert(series.size == rounds && series.zip(series.tail).forall { case (x, y) => y <= x },
      s"peel series must be non-increasing: $series")
    // k above the max degree peels everything; empty input never throws
    assert(Graph.kCore(und, k = 4)._1.count() === 0L)
    assert(Graph.kCore(und.limit(0), k = 2)._1.count() === 0L)
  }

  test("pageRank: hub node dominates, ring graph stays uniform, mass is bounded") {
    import graft.operators.Graph
    // star: every node links to the hub (node 0); hub links to node 1
    val star = Seq((1L, 0L, 1L), (2L, 0L, 1L), (3L, 0L, 1L), (4L, 0L, 1L), (0L, 1L, 1L))
      .toDF("src", "dst", "w")
    val r = Graph.pageRank(star, iters = 3).collect()
      .map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(r(0L) > r(1L) && r(1L) > r(2L), s"hub must dominate: $r")
    assert(r(2L) === r(3L) && r(3L) === r(4L), "symmetric leaves must tie")
    assert(r.values.sum <= 1.0 + 1e-6, "no mass creation")
    // 4-ring: perfect symmetry -> uniform ranks unchanged from 1/N
    val ring = Seq((0L, 1L, 1L), (1L, 2L, 1L), (2L, 3L, 1L), (3L, 0L, 1L))
      .toDF("src", "dst", "w")
    val rr = Graph.pageRank(ring, iters = 3).collect().map(_.getDouble(1)).toSet
    assert(rr === Set(0.25), s"ring must stay uniform: $rr")
  }

  test("pageRank tiers: driver union of casts ≡ distributed decimal plan, bit-exact") {
    import graft.operators.Graph
    // irregular weighted graph so every arithmetic path (fractional
    // weights, no-inbound nodes, multi-inbound sums) is exercised
    val g = Seq((0L, 1L, 3L), (0L, 2L, 1L), (1L, 2L, 2L), (2L, 0L, 1L),
      (3L, 0L, 5L), (3L, 2L, 2L), (4L, 3L, 1L)).toDF("src", "dst", "w")
    val local = Graph.pageRank(g, iters = 3).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val dist = Graph.pageRank(g, iters = 3, localEdgeThreshold = 0L).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(local === dist, s"tier drift:\nlocal=$local\ndist =$dist")
  }

  test("pageRank dangling redistribution conserves mass, both tiers bit-equal") {
    import graft.operators.Graph
    // node 9 is dangling (only inbound); without redistribution its mass leaks
    val g = Seq((0L, 1L, 1L), (1L, 9L, 1L), (2L, 9L, 2L), (9L, 9L, 0L))
      .filter(_._3 > 0).map(t => (t._1, t._2, t._3))
      .toDF("src", "dst", "w")
    val local = Graph.pageRank(g, iters = 5, redistributeDangling = true)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val dist = Graph.pageRank(g, iters = 5, localEdgeThreshold = 0L,
        redistributeDangling = true)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(local === dist, s"tier drift:\nlocal=$local\ndist =$dist")
    assert(math.abs(local.values.sum - 1.0) < 1e-7,
      s"redistributed ranks must sum to 1: ${local.values.sum}")
    val leaky = Graph.pageRank(g, iters = 5).collect().map(_.getDouble(1)).sum
    assert(leaky < 0.95, s"without redistribution the dangling node leaks mass: $leaky")
  }

  test("linregGD recovers a planted linear relationship and cuts the zero-model loss") {
    import graft.operators.Optim
    // y = 2*x + 1 exactly; GD from zero must march toward it and the
    // final mse must be far below the zero-model's mean(y²)
    val df = (0 until 200).map(i => (i / 200.0, 2.0 * (i / 200.0) + 1.0)).toDF("x", "y")
    val r = Optim.linregGD(df, Seq(col("x")), col("y"), iters = 25, lr = 1.0).collect()(0)
    val (w0, b, mse) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
    val zeroModel = df.agg(avg(col("y") * col("y"))).collect()(0).getDouble(0)
    assert(mse < zeroModel / 10, s"GD must cut the zero-model loss 10x: mse=$mse vs $zeroModel")
    assert(w0 > 0.5 && b > 0.5, s"parameters must move toward (2, 1): w=$w0 b=$b")
  }

  test("z-score flags a planted outlier and nothing near the mean") {
    val vals = Seq.tabulate(200)(i => (i.toLong, "t", 10.0 + (i % 5))) :+ ((999L, "t", 500.0))
    val df = vals.toDF("event_id", "event_type", "value")
    val stats = df.groupBy(col("event_type")).agg(
      sum(col("value").cast(org.apache.spark.sql.types.DecimalType(27, 12))).cast("double").as("s1"),
      sum((col("value") * col("value")).cast(org.apache.spark.sql.types.DecimalType(27, 12))).cast("double").as("s2"),
      count(lit(1)).as("n"))
    val mean = col("s1") / col("n")
    val variance = (col("s2") - col("s1") * col("s1") / col("n")) / (col("n") - 1)
    val out = df.join(broadcast(stats), Seq("event_type"))
      .withColumn("z", round((col("value") - mean) / sqrt(variance), 9))
      .filter(abs(col("z")) > 2.5)
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(out === Set(999L))
  }
}
