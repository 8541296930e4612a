package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis
import graft.operators.{Blocklist, Dedup, RangeJoin}

/** Round-5 curation operators: corpus line dedup, benchmark
  * decontamination, PII redaction, Gopher rule gate, bucketized range
  * join, bloom blocklist. Planted-input semantics + plan-shape gates. */
class CurationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // ----------------------------------------------------------- line dedup

  test("lineDedup keeps only the first occurrence of each line across the corpus") {
    val lines = Seq(
      // (key, line_no, line): "dup line" appears in docs 1, 2 and twice in 3
      (1L, 0L, "dup line"), (1L, 1L, "only in one"),
      (2L, 0L, "dup line"), (2L, 1L, "unique two"),
      (3L, 0L, "dup line"), (3L, 1L, "dup line"), (3L, 2L, "unique three")
    ).toDF("key", "line_no", "line")
    val kept = Dedup.lineDedup(lines).collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(kept === Set(
      (1L, 0L, "dup line"), (1L, 1L, "only in one"),
      (2L, 1L, "unique two"), (3L, 2L, "unique three")))
  }

  test("reassembleLines restores line order and drops all-duplicate docs") {
    val lines = Seq(
      (1L, 0L, "a"), (1L, 1L, "b"),
      (2L, 0L, "a") // doc 2 is entirely duplicates of doc 1's first line
    ).toDF("key", "line_no", "line")
    val out = Dedup.reassembleLines(Dedup.lineDedup(lines), " ")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(out === Set((1L, "a b", 2L)))
  }

  test("dropCommonLines drops ≥minDocs-doc boilerplate from EVERY doc, keeps rare lines") {
    val lines = Seq(
      // "cookie banner" is in 3 distinct docs (boilerplate at minDocs=3);
      // "dup line" is in only 2 docs (survives); doc 3 repeats the banner
      // twice — repeats within ONE doc don't make a line common
      (1L, 0L, "cookie banner"), (1L, 1L, "dup line"), (1L, 2L, "unique one"),
      (2L, 0L, "cookie banner"), (2L, 1L, "dup line"),
      (3L, 0L, "cookie banner"), (3L, 1L, "cookie banner"), (3L, 2L, "unique three"),
      (4L, 0L, "twice here"), (4L, 1L, "twice here")
    ).toDF("key", "line_no", "line")
    val kept = Dedup.dropCommonLines(lines, minDocs = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(kept === Set(
      (1L, 1L, "dup line"), (1L, 2L, "unique one"),
      (2L, 1L, "dup line"),
      (3L, 2L, "unique three"),
      (4L, 0L, "twice here"), (4L, 1L, "twice here")))
  }

  // ----------------------------------------------------------- sem-dedup

  test("semanticDedup emits only within-cluster cosine pairs, bit-equal to the in-cluster brute force") {
    // two well-separated clusters on orthogonal axes; near-dups planted
    // inside each cluster, plus a cross-cluster pair that brute-force
    // cosine WOULD match but clustering must never compare
    val vecs = Seq(
      (0L, Array(10f, 0f, 0f)),   // centroid seed, cluster A
      (1L, Array(0f, 10f, 0f)),   // centroid seed, cluster B
      (2L, Array(9f, 0.5f, 0f)),  // A member, near-dup of 4
      (3L, Array(0.5f, 9f, 0f)),  // B member
      (4L, Array(9.1f, 0.4f, 0f)) // A member, near-dup of 2
    ).toDF("vec_id", "embedding")
    val cents = vecs.filter(col("vec_id") < 2)
    val out = Dedup.semanticDedup(vecs, col("embedding"), col("vec_id"),
        cents, col("embedding"), col("vec_id"), minCosine = 0.9)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    // within cluster A: (0,2),(0,4),(2,4); within B: (1,3); never (2,3)
    assert(out === Set((0L, 2L), (0L, 4L), (2L, 4L), (1L, 3L)))
  }

  test("incrementalMinhashDups: planted near-copies find their originals, only new×index pairs") {
    val docs = Tables.documents(spark, TestSpark.sf0001).limit(60)
    val increment = docs.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 5000L).as("doc_id"),
        concat(col("text"), lit(" extra word")).as("text"))
    val idx = Dedup.signatures(docs, col("text"), col("doc_id"))
    val out = Dedup.incrementalMinhashDups(increment, col("text"), col("doc_id"), idx)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = increment.select("doc_id").collect().map(_.getLong(0)).toSet
    // every planted near-copy must rediscover its original (key - 5000)
    planted.foreach { nk =>
      assert(out.contains((nk, nk - 5000L)),
        s"near-copy $nk must match its original ${nk - 5000L}; got ${out.take(10)}")
    }
    // and the join never emits index-vs-index pairs
    assert(out.forall { case (nk, ik) => planted.contains(nk) && !planted.contains(ik) })
  }

  test("nearDupCorpus: a planted dup chain collapses to its best row; uniques pass through") {
    // docs 1,2,3 are a near-dup chain (successive one-word edits chain
    // 1~2 and 2~3 even if 1~3 miss); 4 is unique. Doc 2 has best quality.
    val base = Seq.fill(30)("the quick brown fox jumps over the lazy dog again").mkString(" ")
    val docs = Seq(
      (1L, base + " tail one", 0.5),
      (2L, base + " tail two", 0.9),
      (3L, base + " tail tri", 0.7),
      (4L, (0 until 120).map(i => s"u${i * 31 % 97}q$i").mkString(" "), 0.1)
    ).toDF("doc_id", "text", "quality")
    val out = Dedup.nearDupCorpus(docs, col("text"), col("doc_id"), col("quality"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(out === Set(2L, 4L), s"best-of-chain + unique expected, got $out")
  }

  // ------------------------------------------------------ decontamination

  test("decontaminate flags docs sharing shingles with the benchmark, exact ratio") {
    val docs = Seq(
      (10L, "the quick brown fox jumps over the lazy dog"), // contains bench 3-grams
      (11L, "completely different words nothing shared here at all")
    ).toDF("doc_id", "text")
    val bench = Seq((1L, "the quick brown fox runs")).toDF("doc_id", "text")
    val out = Dedup.decontaminate(docs, col("text"), col("doc_id"),
      bench, col("text"), k = 3, minRatio = 0.0)
    val byKey = out.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // doc 10 shares "the quick brown" and "quick brown fox" with the bench
    assert(byKey.contains(10L) && byKey(10L)._1 === 2L)
    assert(byKey(10L)._2 === 7L) // 9 words -> 7 distinct 3-shingles
    assert(!byKey.contains(11L))
  }

  test("compressionRatio: boilerplate compresses far below diverse text; empty is 1.0") {
    val df = Seq(
      (1L, Seq.fill(200)("cookie banner accept all").mkString(" ")),
      (2L, (0 until 200).map(i => s"w${i * 7919 % 9973}x${i}").mkString(" ")),
      (3L, "")
    ).toDF("id", "text")
    val r = df.select(col("id"), TextAnalysis.compressionRatio(col("text")).as("r"))
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(r(1L) < 0.1, s"repeated boilerplate must crush: ${r(1L)}")
    assert(r(2L) > 0.3, s"diverse text must not: ${r(2L)}")
    assert(r(1L) < r(2L) / 3, "the signal must separate the classes")
    assert(r(3L) === 1.0, "empty text is defined as ratio 1.0")
  }

  // -------------------------------------------------------- PII redaction

  test("redactPii scrubs emails, IPv4s and phone shapes; counts are exact") {
    val df = Seq(
      (1L, "mail alice.smith+x@sub.example.org now"),
      (2L, "server at 192.168.0.17 responded"),
      (3L, "call 555-0199 or 555 0200 today"),
      (4L, "clean text with no identifiers")
    ).toDF("id", "t")
    val out = df.select(col("id"), TextAnalysis.redactPii(col("t")).as("r"),
        TextAnalysis.piiCount(col("t"), TextAnalysis.emailPattern).as("e"),
        TextAnalysis.piiCount(col("t"), TextAnalysis.ipv4Pattern).as("i"),
        TextAnalysis.piiCount(col("t"), TextAnalysis.phonePattern).as("p"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out(1L) === (("mail <EMAIL> now", 1L, 0L, 0L)))
    assert(out(2L) === (("server at <IP> responded", 0L, 1L, 0L)))
    assert(out(3L) === (("call <PHONE> or <PHONE> today", 0L, 0L, 2L)))
    assert(out(4L) === (("clean text with no identifiers", 0L, 0L, 0L)))
  }

  // ----------------------------------------------------------- range join

  test("range join result equals the naive theta join") {
    val ev = Tables.events(spark, TestSpark.sf0001)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("ts").as("click_ts"))
    val wins = ev.filter(col("event_type") === "purchase" && col("event_id") % 97 === 0)
      .select(col("event_id").as("win_id"), col("ts").as("win_start"),
        (col("ts") + expr("INTERVAL 30 minutes")).as("win_end"))
    val bucketed = RangeJoin.pointInInterval(clicks, col("click_ts"),
        wins, col("win_start"), col("win_end"), bucketWidthSec = 1800L)
      .select(col("click_id"), col("win_id")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = clicks.join(wins,
        col("click_ts") >= col("win_start") && col("click_ts") <= col("win_end"))
      .select(col("click_id"), col("win_id")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bucketed === naive && bucketed.nonEmpty)
  }

  test("range join plans as an equi-join on the bucket, not a nested loop") {
    val p = SparkEntry.queries("q76_range_join")(spark, TestSpark.sf0001)
      .queryExecution.explainString(FormattedMode)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p.take(1200))
    assert(p.contains("SortMergeJoin") || p.contains("BroadcastHashJoin") ||
      p.contains("ShuffledHashJoin"), p.take(1200))
  }

  test("range join emits each matching pair exactly once (interval spans many buckets)") {
    val pts = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 10:15:00")))
      .toDF("pid", "pts")
    val iv = Seq((7L,
        java.sql.Timestamp.valueOf("2024-01-01 08:00:00"),
        java.sql.Timestamp.valueOf("2024-01-01 20:00:00")))
      .toDF("iid", "ist", "ien") // 12 h interval over 30 min buckets = 25 bucket copies
    val out = RangeJoin.pointInInterval(pts, col("pts"), iv, col("ist"), col("ien"), 1800L)
    assert(out.count() === 1L)
  }

  test("interval-overlap join == naive theta join, exactly once across shared buckets") {
    // two long intervals overlap across MANY shared 30-min buckets: the
    // max-start-bucket guard must emit the pair once; plus a same-bucket
    // pair, a touching pair (inclusive bounds), and a disjoint pair
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val a = Seq(
      (1L, t("2024-01-01 08:00:00"), t("2024-01-01 20:00:00")), // 12h
      (2L, t("2024-01-02 10:00:00"), t("2024-01-02 10:10:00")),
      (3L, t("2024-01-03 10:00:00"), t("2024-01-03 11:00:00")),
      (4L, t("2024-01-04 10:00:00"), t("2024-01-04 11:00:00"))
    ).toDF("aid", "ast", "aen")
    val b = Seq(
      (10L, t("2024-01-01 09:00:00"), t("2024-01-01 19:00:00")), // inside aid=1
      (20L, t("2024-01-02 10:05:00"), t("2024-01-02 10:07:00")),
      (30L, t("2024-01-03 11:00:00"), t("2024-01-03 12:00:00")), // touches aid=3
      (40L, t("2024-01-04 12:00:00"), t("2024-01-04 13:00:00"))  // disjoint
    ).toDF("bid", "bst", "ben")
    val got = RangeJoin.intervalOverlap(a, col("ast"), col("aen"),
        b, col("bst"), col("ben"), bucketWidthSec = 1800L)
      .select("aid", "bid").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val naive = a.join(b, col("ast") <= col("ben") && col("bst") <= col("aen"))
      .select("aid", "bid").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(got.toSeq == naive.toSeq && got.length == 3,
      s"got ${got.toSeq} vs naive ${naive.toSeq}")
  }

  // --------------------------------------------- sampling / vocab / stream

  test("streaming session windows equal the batch twin") {
    import graft.streaming.StreamingOps
    val staging = StreamingOps.defaultStagingDir(spark, TestSpark.sf0001)
    StreamingOps.stageEventsForStreaming(spark, TestSpark.sf0001, staging)
    val streamed = StreamingOps.runToMemory(spark,
        StreamingOps.sessionAgg(StreamingOps.eventsStream(spark, staging), "5 minutes"),
        "curation_stream_session")
      .collect().map(_.toSeq).toSet
    val batch = StreamingOps.sessionAgg(Tables.events(spark, TestSpark.sf0001), "5 minutes")
      .collect().map(_.toSeq).toSet
    assert(streamed === batch && streamed.nonEmpty)
  }

  test("custom flatMapGroupsWithState sessionizer equals the built-in session_window") {
    import graft.streaming.StreamingOps
    val ev = Tables.events(spark, TestSpark.sf0001)
    val custom = StreamingOps.customSessionize(ev, gapMinutes = 5)
      .collect().map(_.toSeq).toSet
    val builtin = StreamingOps.sessionAgg(ev, "5 minutes")
      .collect().map(_.toSeq).toSet
    assert(custom === builtin && custom.nonEmpty)
  }

  test("mixture sample rebalances domains toward the target weights") {
    val out = SparkEntry.queries("q79_mixture_sample")(spark, TestSpark.sf0001)
      .groupBy(col("source")).agg(count(lit(1)).as("kept"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    def w(src: String) = src.stripPrefix("src").toLong % 3 + 1
    // weight-3 domains must keep more than weight-1 domains on average
    val byW = out.groupBy { case (s, _) => w(s) }.view.mapValues(m => m.values.sum.toDouble / m.size)
    assert(byW(3L) > byW(1L), byW.toMap.toString)
  }

  test("weighted sample equals the locally-computed Efraimidis-Spirakis top-k") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
      .select("doc_id", "n_chars").collect().map(r => (r.getLong(0), r.getLong(1)))
    val expected = docs.map { case (id, nc) =>
      val P = 2147483647L
      val u = ((id % P * 48271L % P * 48271L % P * 48271L % P).toDouble + 0.5) / P
      val pr = BigDecimal(math.log(u) / nc).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
      (id, pr)
    }.sortBy { case (id, pr) => (-pr, id) }.take(100).map(_._1).toSeq
    val got = SparkEntry.queries("q80_weighted_sample")(spark, TestSpark.sf0001)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(got === expected)
  }

  test("vocab ids are dense, 0-based and frequency-ranked; encoding round-trips") {
    val enc = SparkEntry.queries("q81_vocab_encode")(spark, TestSpark.sf0001)
    val ids = enc.select("word_id").distinct().collect().map(_.getLong(0)).sorted
    assert(ids.head === 0L && ids.last === ids.length - 1L) // dense, 0-based
    // id 0 is the most frequent token of the corpus
    val topWord = Tables.documents(spark, TestSpark.sf0001)
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").count().orderBy(desc("count"), col("word"))
      .limit(1).collect()(0).getString(0)
    val tokens = Tables.documents(spark, TestSpark.sf0001)
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "word")))
      .filter(length(col("word")) > 0)
    val id0Words = enc.filter(col("word_id") === 0L)
      .join(tokens, Seq("doc_id", "pos"))
      .select("word").distinct().collect().map(_.getString(0))
    assert(id0Words.toSeq === Seq(topWord))
    // round-trip: every (doc, pos) token got exactly one id
    assert(enc.count() === tokens.count())
  }

  // -------------------------------------------------- centroids / profile

  test("embedding centroid aggregation computes exact element-wise means") {
    import graft.operators.{Profile => _}
    val df = Seq(
      (0, Array(1.0f, 2.0f)), (0, Array(3.0f, 6.0f)), // label 0: mean (2, 4)
      (1, Array(10.0f, 0.0f))                          // label 1: mean (10, 0)
    ).toDF("label", "embedding")
    val out = df
      .select(col("label").cast("long").as("label"),
        posexplode(col("embedding")).as(Seq("dim", "v")))
      .groupBy(col("label"), col("dim"))
      .agg(round(sum(col("v").cast("double")
        .cast(org.apache.spark.sql.types.DecimalType(27, 12))).cast("double") / count(lit(1)), 9).as("c"))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(out === Map((0L, 0) -> 2.0, (0L, 1) -> 4.0, (1L, 0) -> 10.0, (1L, 1) -> 0.0))
  }

  test("Profile: one-pass profile reports nulls, exact distincts, min/max per column") {
    import graft.operators.Profile
    val df = Seq(
      (Some("a"), 1L), (Some("b"), 2L), (None, 2L), (Some("a"), 3L)
    ).toDF("s", "k")
    val out = Profile.profile(df, Seq("s", "k")).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5)))).toMap
    assert(out("s") === ((4L, 1L, 2L, "a", "b")))
    assert(out("k") === ((4L, 0L, 3L, "1", "3")))
  }

  test("Profile approx tier: distincts within 5% of exact, everything else identical") {
    import graft.operators.Profile
    val orders = Tables.orders(spark, TestSpark.sf0001)
    val cols = Seq("o_orderstatus", "o_orderpriority", "o_custkey")
    def toMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5)))).toMap
    val exact = toMap(Profile.profile(orders, cols))
    val approx = toMap(Profile.profile(orders, cols, approxDistinct = true))
    assert(approx.keySet == exact.keySet)
    cols.foreach { c =>
      val (en, enull, end_, emin, emax) = exact(c)
      val (an, anull, and_, amin, amax) = approx(c)
      // only the distinct count is approximate
      assert((an, anull, amin, amax) === ((en, enull, emin, emax)), c)
      assert(math.abs(and_ - end_).toDouble / end_ < 0.05,
        s"$c: approx $and_ vs exact $end_")
    }
  }

  // ------------------------------------------------------ bloom blocklist

  test("bloom blocklist: subset of exact anti-join, no false negatives, bounded extra drops") {
    val li = Tables.lineitem(spark, TestSpark.sf0001)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"))
    val block = Tables.part(spark, TestSpark.sf0001)
      .filter(col("p_size") > 40).select(col("p_partkey"))
    val approx = Blocklist.filterNotIn(li, col("l_partkey"), block, col("p_partkey"),
      expectedItems = 20000L, fpp = 0.01)
    val exact = li.join(block, li("l_partkey") === block("p_partkey"), "left_anti")
    val approxKeys = approx.select("l_orderkey", "l_linenumber").collect()
      .map(r => (r.getLong(0), r.getAs[Number](1).longValue)).toSet
    val exactKeys = exact.select("l_orderkey", "l_linenumber").collect()
      .map(r => (r.getLong(0), r.getAs[Number](1).longValue)).toSet
    // no false negatives: everything bloom kept is truly not blocklisted
    assert(approxKeys.subsetOf(exactKeys))
    // false-positive drops bounded: well under 5x the configured 1% fpp
    val dropped = exactKeys.size - approxKeys.size
    assert(dropped.toDouble / exactKeys.size < 0.05,
      s"bloom dropped $dropped of ${exactKeys.size} non-blocklisted rows")
  }

  test("bloom exactAntiJoin == plain anti-join, null keys kept") {
    val df = Seq(
      (1L, java.lang.Long.valueOf(10L)), (2L, java.lang.Long.valueOf(20L)),
      (3L, java.lang.Long.valueOf(30L)), (4L, null.asInstanceOf[java.lang.Long])
    ).toDF("id", "k")
    val block = Seq(20L, 40L).toDF("bk")
    val got = Blocklist.exactAntiJoin(df, col("k"), block, col("bk"),
        expectedItems = 10L, fpp = 0.3) // high fpp to force a real sliver
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got === Set(1L, 3L, 4L), s"got $got")
    // and on real data: bit-identical row set to the plain anti-join
    val li = Tables.lineitem(spark, TestSpark.sf0001)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"))
    val bl = Tables.part(spark, TestSpark.sf0001)
      .filter(col("p_size") > 40).select(col("p_partkey"))
    val a = Blocklist.exactAntiJoin(li, col("l_partkey"), bl, col("p_partkey"), 20000L)
      .collect().map(_.toSeq).toSet
    val b = li.join(bl, li("l_partkey") === bl("p_partkey"), "left_anti")
      .collect().map(_.toSeq).toSet
    assert(a === b && a.nonEmpty)
  }
}
