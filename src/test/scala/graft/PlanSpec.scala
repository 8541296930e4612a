package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.FormattedMode

/** Plan-quality regression gates: the physical plans that make these
  * queries scale must not silently degrade (SURVEY §4 — pushdown,
  * broadcast, partial agg, rank-limit pushdown are the 100 TB levers). */
class PlanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, TestSpark.sf0001)
      .queryExecution.explainString(FormattedMode)

  test("q01: filter + projection reach the parquet scan") {
    val p = plan("q01_pruned_scan")
    assert(p.contains("PushedFilters") && p.contains("LessThan(l_shipdate"), p.take(800))
    assert(p.contains("ReadSchema") && !p.contains("l_comment"))
    // projection pruning: scan must not read the full 11-column schema
    assert(p.contains("struct<l_orderkey:bigint,l_partkey:bigint,l_extendedprice:double,l_shipdate"))
  }

  test("q03: dimension joins broadcast") {
    val p = plan("q03_join_broadcast")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p.take(800))
    assert(!p.contains("SortMergeJoin"))
  }

  test("q02: aggregation is partial+final (map-side combine)") {
    val p = plan("q02_agg_pricing")
    assert(p.contains("partial_sum") || p.contains("Partial"), p.take(800))
  }

  test("q05: semi join stays a join (no row explosion)") {
    val p = plan("q05_semi_join")
    assert(p.contains("LeftSemi"), p.take(800))
  }

  test("q36: top-k rank filter pushes a WindowGroupLimit below the shuffle") {
    val p = plan("q36_knn_brute")
    assert(p.contains("WindowGroupLimit"), p.take(1200))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      "query side must broadcast; corpus must stay distributed")
  }

  test("q62: per-domain cap pushes a WindowGroupLimit (partial top-K per source)") {
    val p = plan("q62_domain_cap")
    assert(p.contains("WindowGroupLimit"), p.take(1200))
  }

  test("q64: tf-idf plans WindowGroupLimit and broadcasts the doc-count side") {
    val p = plan("q64_tfidf")
    assert(p.contains("WindowGroupLimit"), p.take(1200))
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastNestedLoopJoin"),
      "n_docs scalar must broadcast, never shuffle the tf side for it")
  }

  test("q68: running total plans no partition-less Window (two-pass cumsum)") {
    val p = plan("q68_token_budget")
    // a global `sum over (order by)` would plan a Window whose spec has
    // no partition columns — the single-partition funnel CumSum avoids;
    // every window spec here must partition by __pid
    val specs = "windowspecdefinition\\(".r.findAllMatchIn(p).map(_.end).toSeq
    assert(specs.nonEmpty, p.take(1200))
    specs.foreach(i => assert(p.substring(i).startsWith("__pid"),
      s"partition-less window spec found: ${p.substring(i - 22, math.min(i + 60, p.length))}"))
  }

  test("q195: continuous-tier ECDF plans no partition-less Window (two-pass cumsum)") {
    val p = plan("q195_ecdf_transform")
    // the former bounded-distinct tier cumulated via a global
    // `sum over (order by n_chars)` — a Window whose spec has no
    // partition columns; the CumSum two-pass must partition by __pid
    val specs = "windowspecdefinition\\(".r.findAllMatchIn(p).map(_.end).toSeq
    assert(specs.nonEmpty, p.take(1200))
    specs.foreach(i => assert(p.substring(i).startsWith("__pid"),
      s"partition-less window spec found: ${p.substring(i - 22, math.min(i + 60, p.length))}"))
  }

  test("q198: KS cumulative pass plans no partition-less Window (grouped two-pass)") {
    val p = plan("q198_ks_drift")
    val specs = "windowspecdefinition\\(".r.findAllMatchIn(p).map(_.end).toSeq
    assert(specs.nonEmpty, p.take(1200))
    specs.foreach(i => assert(p.substring(i).startsWith("__pid"),
      s"partition-less window spec found: ${p.substring(i - 22, math.min(i + 60, p.length))}"))
  }

  test("q202: phrase posting filters broadcast; adjacency join stays equi") {
    val p = plan("q202_phrase_search")
    // the two posting filters must be broadcast hash joins against the
    // 1-row phrase (map-side), and doc_id adjacency must never fall
    // back to a cartesian product
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p.take(1500))
    assert(!p.contains("CartesianProduct"), p.take(1500))
  }

  test("q203: clustering coefficient joins stay equi (no cartesian)") {
    val p = plan("q203_clustering_coeff")
    assert(!p.contains("CartesianProduct"), p.take(1500))
  }

  test("q224: sorted-neighborhood pairs via band equi-join, rank without a global window") {
    val p = plan("q224_sorted_neighborhood")
    // the w-neighbor pairing must be the band equi-join, never a
    // theta join over ranks
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(1500))
    // the global rank comes from the dense-id two-pass: no
    // partition-less Window anywhere in the plan
    val specs = "windowspecdefinition\\(".r.findAllMatchIn(p).map(_.end).toSeq
    specs.foreach(i => assert(p.substring(i).startsWith("__pid"),
      s"partition-less window spec found: ${p.substring(i - 22, math.min(i + 60, p.length))}"))
  }

  test("q226: covariance triangle is map-side explode — no self-join, means broadcast") {
    val p = plan("q226_embedding_covariance")
    // the upper triangle comes from a nested posexplode over the SAME
    // row; a vec_id self-join (SortMergeJoin) would shuffle n·d rows
    assert(!p.contains("SortMergeJoin"), p.take(1500))
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
  }

  test("q13: global top-k plans TakeOrderedAndProject, not a full sort") {
    val p = plan("q13_topk")
    assert(p.contains("TakeOrderedAndProject"), p.take(800))
  }

  test("q99: fixed-size per-stratum sample pushes a WindowGroupLimit") {
    val p = plan("q99_group_sample")
    assert(p.contains("WindowGroupLimit"), p.take(1200))
  }

  test("q80: weighted sampling plans TakeOrderedAndProject (k rows per partition)") {
    val p = plan("q80_weighted_sample")
    assert(p.contains("TakeOrderedAndProject"), p.take(800))
  }

  test("q79: mixture rates broadcast back to the corpus (no corpus shuffle)") {
    val p = plan("q79_mixture_sample")
    assert(p.contains("BroadcastHashJoin"), p.take(1200))
  }

  test("q73: benchmark shingle set broadcasts (corpus side stays put for the probe)") {
    val p = plan("q73_decontam")
    assert(p.contains("BroadcastHashJoin"), p.take(1200))
  }

  test("q84: profiling N columns costs ONE table scan") {
    val p = plan("q84_profile")
    assert("\\(\\d+\\) Scan parquet".r.findAllIn(p).size === 1, p.take(1200))
  }

  test("q105: approx profile is ONE scan with NO Expand (the q84 scan-multiplier)") {
    val p = plan("q105_profile_approx")
    assert("\\(\\d+\\) Scan parquet".r.findAllIn(p).size === 1, p.take(1200))
    assert(!p.contains("Expand"), p.take(1200))
  }

  test("q106: sem-dedup pairs via equi-join on cluster id, never a corpus cross join") {
    val p = plan("q106_semdedup")
    // the ONLY nested-loop join allowed is the broadcast of the tiny
    // centroid set for assignment; pair generation must be an equi-join
    assert(!p.contains("CartesianProduct"), p.take(1500))
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
      "within-cluster pair join must key on cluster id:\n" + p.take(1500))
    // rank=1 assignment compiles to a WindowGroupLimit (partial top-1)
    assert(p.contains("WindowGroupLimit"), p.take(1500))
    // the assignment pipeline (the only nested-loop, vs the broadcast
    // centroid set) is computed ONCE and cached; both pair-join sides
    // must read the cache, not re-run the broadcast join
    assert(p.contains("InMemoryTableScan"), p.take(1500))
  }

  test("q107: the boilerplate set broadcasts for the anti-join (corpus never reshuffles)") {
    val p = plan("q107_boilerplate_lines")
    assert(p.contains("BroadcastHashJoin LeftAnti") ||
      (p.contains("LeftAnti") && p.contains("BroadcastExchange")),
      "common-line subtraction must be a broadcast anti-join:\n" + p.take(1500))
  }

  test("q110: nucleus selection windows are all per-source (never global)") {
    val p = plan("q110_nucleus_select")
    val specs = "windowspecdefinition\\(".r.findAllMatchIn(p).map(_.end).toSeq
    assert(specs.nonEmpty, p.take(1200))
    specs.foreach(i => assert(p.substring(i).startsWith("source"),
      s"window not partitioned by source: ${p.substring(i - 22, math.min(i + 60, p.length))}"))
  }

  test("q119: the funnel's five stage counts cost ONE table scan") {
    val p = plan("q119_curation_funnel")
    assert("\\(\\d+\\) Scan parquet".r.findAllIn(p).size === 1, p.take(1200))
  }

  test("q128: the e2e curation pipeline is ONE scan + one content shuffle (no join-back)") {
    val p = plan("q128_curation_e2e")
    assert("\\(\\d+\\) Scan parquet".r.findAllIn(p).size === 1, p.take(1500))
    assert(!p.contains("Join"), "survivor selection must be min(struct), not a join:\n" + p.take(1500))
  }

  test("q81: vocab ranking plans no partition-less Window (dense-id discipline)") {
    val p = plan("q81_vocab_encode")
    val specs = "windowspecdefinition\\(".r.findAllMatchIn(p).map(_.end).toSeq
    specs.foreach(i => assert(p.substring(i).startsWith("__pid"),
      s"partition-less window spec found: ${p.substring(i - 22, math.min(i + 60, p.length))}"))
  }

  test("q157: fingerprint pairs are generated IN-ROW — the plan has no join at all") {
    val p = plan("q157_substr_fingerprints")
    // one content shuffle (gram → collect_set) + the pair agg; pair
    // generation is a bounded nested transform over the ≤20-doc set,
    // so no join operator of any kind may appear
    assert(!p.contains("Join") && !p.contains("CartesianProduct"), p.take(1500))
    assert(p.contains("TakeOrderedAndProject"), p.take(1500))
  }

  test("q158: blocked linkage plans partial-agg best-match + global TakeOrdered") {
    val p = plan("q158_record_linkage")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "candidates must come from the blocking equi-join:\n" + p.take(1500))
    // best-match is min(struct) with map-side combine, NOT a window sort
    assert(!p.contains("Window"), p.take(1500))
    assert(p.contains("partial_min") || p.contains("Partial"), p.take(1500))
    assert(p.contains("TakeOrderedAndProject"), p.take(1500))
  }

  test("q160: as-of attribution is the union-and-carry plan (no range/nested-loop join)") {
    val p = plan("q160_attribution")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(1500))
    // the carry window partitions by user, never globally
    assert(p.contains("Window"), p.take(1500))
  }

  test("q161: KMV bottom-k rides TakeOrderedAndProject over a partial distinct") {
    val p = plan("q161_kmv_distinct")
    assert(p.contains("TakeOrderedAndProject"),
      "bottom-k must be per-partition top-k, not a global sort:\n" + p.take(1500))
    assert(p.contains("HashAggregate"), p.take(1500))
  }

  test("q162: triangle closure is equi-joins on oriented edges, never a cross join") {
    val p = plan("q162_triangles")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(1500))
    // the edge set is computed once and cached for all three join roles
    assert(p.contains("InMemoryTableScan"), p.take(1500))
  }

  test("q164: containment sizes broadcast back (corpus shuffles only on the shingle)") {
    val p = plan("q164_containment")
    assert(!p.contains("CartesianProduct"), p.take(1500))
    assert(p.contains("BroadcastHashJoin"),
      "per-doc sizes are tiny and must broadcast:\n" + p.take(1500))
  }

  test("q172: interval-overlap join is a bucket equi-join, never a nested loop") {
    val p = plan("q172_interval_overlap")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "no equi key exists, but the bucketization must synthesize one:\n" + p.take(1500))
  }

  test("q177: k-means assignment is map-side — one shuffle total (the means agg), no join, no window") {
    val p = plan("q177_kmeans_lloyd")
    // centroids ride the plan as literals: any Exchange beyond the
    // partial→final agg, or any join/window, means the corpus is being
    // shuffled to be assigned — the thing the literal design forbids
    assert("\\+- Exchange".r.findAllIn(p).size === 1, p.take(1500))
    assert(!p.contains("BroadcastExchange") && !p.contains("Join"), p.take(1500))
    assert(!p.contains("Window"), p.take(1500))
    assert(p.contains("partial_sum") || p.contains("Partial"), "means must map-side combine")
  }

  test("q178: SemDeDup pairs join on the cluster key — no cross join, no assignment window") {
    val p = plan("q178_semdedup")
    assert(!p.contains("CartesianProduct"), p.take(1500))
    assert(!p.contains("Window"), "assignment must be the literal argmin, not a window rank")
    assert(p.contains("LeftSemi"), "removal set must be a semi join")
  }

  test("q183: association rules broadcast the page-count sides; pairs join stays equi") {
    val p = plan("q183_assoc_rules")
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
    assert(!p.contains("CartesianProduct"), p.take(1500))
  }

  test("q187: packing prefix sum plans no partition-less Window (two-pass cumsum)") {
    val p = plan("q187_sequence_packing")
    val specs = "windowspecdefinition\\(".r.findAllMatchIn(p).map(_.end).toSeq
    assert(specs.nonEmpty, p.take(1200))
    specs.foreach(i => assert(p.substring(i).startsWith("__pid"),
      s"partition-less window spec found: ${p.substring(i - 22, math.min(i + 60, p.length))}"))
  }

  test("Pipeline.run: no Window anywhere in the payload plan (key assignment is two-pass dense-id)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val cfg = PipelineConfig(numSamplesPerShard = 100)
    val manifest = Seq(("http://h/a", "alpha beta"), ("http://h/b", "gamma delta"))
      .toDF("url", "body")
    val fakeFetch = (df: org.apache.spark.sql.DataFrame) => df
      .join(manifest.select(col("url"), col("body")), Seq("url"))
      .withColumn("payload", encode(col("body"), "UTF-8")).drop("body")
      .withColumn("status", lit("success"))
      .withColumn("error_message", lit(null).cast("string"))
    val r = Pipeline.run(spark, manifest, cfg, graft.sources.FakePdfDecoder(4),
      output = None, fetcher = Some(fakeFetch))
    val p = r.payload.queryExecution.explainString(FormattedMode)
    assert(!p.contains("Window"),
      "key assignment regressed to a global window (single-partition funnel):\n" + p.take(1500))
  }

  test("q240: JSD shared-word join is an equi-join, never a cartesian over vocabularies") {
    val p = plan("q240_jsd_sources")
    assert(!p.contains("CartesianProduct"), p.take(1500))
    // the s1 < s2 pair filter must ride the word equi-join, not a BNLJ
    // over the full per-source vocabularies
    assert(p.contains("SortMergeJoin") || p.contains("BroadcastHashJoin")
      || p.contains("ShuffledHashJoin"), p.take(1500))
  }

  test("q239: per-type top-(k+1) plans a WindowGroupLimit (rank pushed into the shuffle)") {
    val p = plan("q239_hill_tail")
    assert(p.contains("WindowGroupLimit"), p.take(1200))
  }

  test("q243: MG sketch aggregates partial-per-partition before one map merge") {
    val p = plan("q243_mg_heavy_hitters")
    // the token stream must reduce via partial ObjectHashAggregate
    // (O(k) maps shuffle), never sort-shuffle raw tokens to one task:
    // two ObjectHashAggregate nodes = partial (below the Exchange) +
    // final, the mergeable-summary shape
    assert("ObjectHashAggregate".r.findAllIn(p).size >= 2, p.take(1500))
  }

  test("q300: novelty gram join is an equi-join, never all-pairs") {
    val p = plan("q300_ngram_novelty")
    assert(!p.contains("CartesianProduct"), p.take(1500))
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin")
      || p.contains("BroadcastHashJoin"), p.take(1500))
  }

  test("q302: all five overflow thresholds reduce in ONE scan (no doc×k join)") {
    val p = plan("q302_context_overflow")
    assert(!p.contains("Join"), p.take(1500))
    // one scan NODE = two mentions in FormattedMode (tree line + detail)
    assert("Scan parquet".r.findAllIn(p).size <= 2, p.take(1500))
  }

  test("q307: ES weighted top-50 rides TakeOrderedAndProject, not a global sort") {
    val p = plan("q307_weighted_sample")
    assert(p.contains("TakeOrderedAndProject"), p.take(1200))
  }

  test("q311: dense-id block assignment plans no Window (two-pass idiom)") {
    val p = plan("q311_zonemap_skip")
    assert(!p.contains("Window"), p.take(1500))
  }

  test("q312: power iteration is join-free map-side math (v as literals)") {
    // r12 rewrite: means and v are dim-sized literals, the projection
    // folds per row — the iteration plans no join against the corpus at
    // all. The returned frame is the 64-row result crossed with the
    // 1-row variance scalar (broadcast NLJ on bounded frames, not a
    // corpus cartesian).
    val p = plan("q312_pca_power")
    assert(!p.contains("CartesianProduct"), p.take(1500))
    assert(!p.contains("BroadcastHashJoin"), "corpus join crept back:\n" + p.take(1500))
    // and the iteration's own shape: one grouped agg, zero joins
    import org.apache.spark.sql.functions.col
    val emb = graft.Tables.embeddings(spark, TestSpark.sf0001)
    val v3 = graft.operators.Pca.topComponent(emb, "embedding", "vec_id", 1)
    assert(v3.count() == 64)
  }

  test("q315: per-source weighted top-5 plans a WindowGroupLimit") {
    val p = plan("q315_grouped_weighted_sample")
    assert(p.contains("WindowGroupLimit"), p.take(1200))
  }

  test("q313: QL scoring has no cartesian over the corpus; top-20 is rank-limited") {
    val p = plan("q313_query_likelihood")
    assert(!p.contains("CartesianProduct"), p.take(1500))
    assert(p.contains("TakeOrderedAndProject"), p.take(1500))
  }

  test("q337: pHash candidates come from the band equi-join, never all-pairs") {
    val p = plan("q337_phash_dedup")
    assert(!p.contains("CartesianProduct"), p.take(1500))
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin")
      || p.contains("BroadcastHashJoin"), p.take(1500))
  }

  test("q343: rolling WAU joins on the shifted day, never per-day rescans") {
    val p = plan("q343_rolling_wau")
    assert(!p.contains("CartesianProduct"), p.take(1500))
  }

  test("q115: the CMS prefilter probe is a codegen expression, not a Scala UDF") {
    // r11 regression gate: the probe used to be a udf() — 1.5 µs/row of
    // UTF8String→String decode, 9× the exact agg it guards. The
    // expression must sit inside the filter (cmsprobe) with no UDF
    // wrapper on the probe path.
    val p = plan("q115_cms_heavy_hitters")
    assert(p.toLowerCase.contains("cmsprobe"), p.take(1500))
  }

  test("q55: percentiles ride the selector — no single-buffer percentile agg") {
    // r11 re-anchor (VERDICT item 6): Spark's built-in `percentile`
    // buffers the whole group in one task; no oracle path may plan it
    val p = plan("q55_percentiles")
    assert(!p.contains("percentile(") && !p.contains("Percentile"), p.take(1500))
  }

  test("q235 shape: the replicate aggregate plans with NO x100 Generate") {
    // r12 rewrite gate. The final q235 plan can't carry the aggregate
    // (the quantile selector materializes `reps` eagerly), so the gate
    // pins the reps SHAPE itself: one aggregate holding the B replicate
    // sums, zero Generate — the old form exploded sequence(1,100) into
    // an n·B-row decimal hash-agg.
    import org.apache.spark.sql.functions.col
    val reps = graft.Tables.events(spark, TestSpark.sf0001)
      .groupBy(col("event_type"))
      .agg(graft.operators.Bootstrap.poissonReps(100)(
        col("event_id"), col("value")).as("r"))
    val p = reps.queryExecution.explainString(FormattedMode)
    assert(p.toLowerCase.contains("poissonrepsagg"), p.take(1500))
    assert(!p.contains("Generate"), "x100 explode crept back:\n" + p.take(1500))
    // and the full query must not re-introduce the replicate sequence
    assert(!plan("q235_bootstrap_ci").contains("sequence(1, 100"))
  }

  test("q192: token explode sits directly ON the doc-level join") {
    // r12 rewrite gate: joining the exploded token stream probes
    // n_tokens rows (and at scale shuffles tokens); the Generate's
    // direct child must be the doc⋈assignment join
    // the Generate's Input must already carry the cluster column — it
    // only exists after the doc⋈assignment join, so its presence proves
    // the join ran before the explode
    val p = plan("q192_cluster_labels")
    assert("""\) Generate\s*\nInput \[\d+\]: \[(?=[^\]\n]*cluster#)(?=[^\]\n]*text#)""".r
      .findFirstIn(p).isDefined,
      "explode no longer sits on the joined (cluster, text) frame:\n" + p.take(2000))
  }

  test("q366: digest dedup is one struct-min agg — no join, no window, no cartesian") {
    // the crawl-dedup shape: keep-one-per-digest must stay a grouped
    // partial+final aggregate (SortAggregate — struct-with-binary
    // buffers aren't hash-aggregable — but still ONE shuffle with
    // map-side combine), never a join-back or per-key window
    val p = plan("q366_warc_revisit_dedup")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin") &&
      !p.contains("BroadcastHashJoin"), p.take(1500))
    assert(!p.contains(" Window"), "digest dedup must not plan a window:\n" + p.take(1500))
    assert(p.contains("Aggregate"), p.take(1500))
  }

  test("q367: the composed WARC->PDF path plans NO join and NO extra shuffle " +
       "(pure per-row map work over the documents scan)") {
    val p = plan("q367_warc_pdf_e2e")
    assert(!p.contains("Join") && !p.contains("CartesianProduct"), p.take(1500))
    assert(!p.contains(" Window"), p.take(1500))
  }

  test("q228: harmonic centrality rings stay equi/anti joins (no cartesian, no BNLJ)") {
    val p = plan("q228_harmonic_centrality")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(1500))
  }
}
