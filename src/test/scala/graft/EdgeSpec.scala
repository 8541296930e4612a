package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis
import graft.operators.{Blocklist, Dedup, Profile, RangeJoin}

/** Edge-input robustness: every round-5 operator must degrade to an
  * empty (or full) result on empty/degenerate inputs — never throw.
  * At 100 TB some partition, shard, or day WILL be empty. */
class EdgeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val noLines = Seq.empty[(Long, Long, String)].toDF("key", "line_no", "line")
  private val noDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")

  test("lineDedup + reassembleLines on an empty corpus") {
    assert(Dedup.reassembleLines(Dedup.lineDedup(noLines)).count() === 0L)
  }

  test("decontaminate with an empty benchmark flags nothing; empty corpus yields nothing") {
    val docs = Seq((1L, "some words here")).toDF("doc_id", "text")
    assert(Dedup.decontaminate(docs, col("text"), col("doc_id"),
      noDocs, col("text"), k = 2).count() === 0L)
    assert(Dedup.decontaminate(noDocs, col("text"), col("doc_id"),
      docs, col("text"), k = 2).count() === 0L)
  }

  test("redactPii and gopher columns on null and empty text") {
    val df = Seq((1L, null: String), (2L, "")).toDF("id", "t")
    val out = df.select(col("id"),
      TextAnalysis.redactPii(col("t")).as("r"),
      TextAnalysis.alphaWordRatio(col("t")).as("awr"),
      TextAnalysis.piiCount(col("t"), TextAnalysis.emailPattern).as("e"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).isNullAt(1) && out(1L).isNullAt(3)) // null propagates
    assert(out(2L).getString(1) === "" && out(2L).getDouble(2) === 0.0 &&
      out(2L).getLong(3) === 0L)
  }

  test("range join with an empty side returns empty, never throws") {
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val pts = Seq((1L, ts)).toDF("pid", "pts")
    val noIv = Seq.empty[(Long, java.sql.Timestamp, java.sql.Timestamp)]
      .toDF("iid", "ist", "ien")
    assert(RangeJoin.pointInInterval(pts, col("pts"), noIv,
      col("ist"), col("ien"), 60L).count() === 0L)
    val noPts = Seq.empty[(Long, java.sql.Timestamp)].toDF("pid", "pts")
    val iv = Seq((1L, ts, ts)).toDF("iid", "ist", "ien")
    assert(RangeJoin.pointInInterval(noPts, col("pts"), iv,
      col("ist"), col("ien"), 60L).count() === 0L)
  }

  test("bloom blocklist with an empty blocklist keeps everything") {
    val df = Seq((1L, 10L), (2L, 20L)).toDF("id", "k")
    val noBlock = Seq.empty[Tuple1[Long]].toDF("bk")
    val out = Blocklist.filterNotIn(df, col("k"), noBlock, col("bk"),
      expectedItems = 10L, fpp = 0.01)
    assert(out.count() === 2L)
  }

  test("profile of an empty frame reports zero rows per column") {
    val out = Profile.profile(noDocs, Seq("doc_id", "text")).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out("doc_id") === ((0L, 0L, 0L)) && out("text") === ((0L, 0L, 0L)))
  }

  test("connectedComponents of an empty pair set is empty") {
    val noPairs = Seq.empty[(Long, Long)].toDF("key_a", "key_b")
    assert(Dedup.connectedComponents(noPairs).count() === 0L)
  }

  test("pageRank of an empty edge set is empty (both tiers)") {
    import graft.operators.Graph
    val noEdges = Seq.empty[(Long, Long, Long)].toDF("src", "dst", "w")
    assert(Graph.pageRank(noEdges, iters = 3).count() === 0L)
    assert(Graph.pageRank(noEdges, iters = 3, localEdgeThreshold = -1L).count() === 0L)
  }

  test("semanticDedup with empty centroids emits nothing (and does not throw)") {
    val vecs = Seq((0L, Array(1f, 0f))).toDF("vec_id", "embedding")
    val noCents = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    assert(Dedup.semanticDedup(vecs, col("embedding"), col("vec_id"),
      noCents, col("embedding"), col("vec_id"), 0.5).count() === 0L)
  }

  test("dropCommonLines on an empty lines frame is empty") {
    val noLines = Seq.empty[(Long, Long, String)].toDF("key", "line_no", "line")
    assert(Dedup.dropCommonLines(noLines, 3).count() === 0L)
  }

  // ------------------------------------------------------- round-7 edges

  test("intervalOverlap with an empty side returns empty, never throws") {
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val a = Seq((1L, ts, ts)).toDF("aid", "ast", "aen")
    val noB = Seq.empty[(Long, java.sql.Timestamp, java.sql.Timestamp)]
      .toDF("bid", "bst", "ben")
    assert(RangeJoin.intervalOverlap(a, col("ast"), col("aen"),
      noB, col("bst"), col("ben"), 60L).count() === 0L)
    assert(RangeJoin.intervalOverlap(noB.toDF("aid", "ast", "aen"),
      col("ast"), col("aen"),
      a.toDF("bid", "bst", "ben"), col("bst"), col("ben"), 60L).count() === 0L)
  }

  test("bloom exactAntiJoin with an empty blocklist keeps everything") {
    val df = Seq((1L, 10L), (2L, 20L)).toDF("id", "k")
    val noBlock = Seq.empty[Tuple1[Long]].toDF("bk")
    assert(Blocklist.exactAntiJoin(df, col("k"), noBlock, col("bk"),
      expectedItems = 10L).count() === 2L)
  }

  test("exactGroupedQuantiles on an empty frame is empty, never throws") {
    val none = Seq.empty[(String, Double)].toDF("g", "v")
    assert(graft.operators.Selection
      .exactGroupedQuantiles(none, "g", "v", Seq(0.5)).count() === 0L)
  }

  test("shingle containment / substring grams on empty and sub-k text yield no rows") {
    val docs = Seq((1L, ""), (2L, "short")).toDF("doc_id", "text")
    // 40-char grams over <40-char docs: the q157 shape produces nothing
    val grams = docs
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(1), greatest(length(col("text")) - 39, lit(1)))).as("pos"))
      .select(col("doc_id"), expr("substring(text, pos, 40)").as("gram"))
      .filter(length(col("gram")) === 40)
    assert(grams.count() === 0L)
  }

  // ------------------------------------------------------- round-8 edges

  test("lloyd refuses to seed from fewer vectors than k with a clear error") {
    val two = Seq((0L, Seq(1f, 0f)), (1L, Seq(0f, 1f))).toDF("key", "vec")
    val e = intercept[IllegalArgumentException] {
      graft.operators.Cluster.lloyd(two, col("key"), col("vec"), k = 3, iters = 1)
    }
    assert(e.getMessage.contains("fewer than 3"))
  }

  test("running-total packing shape on an empty corpus aggregates to a single summary row") {
    val none = Seq.empty[(Long, Long)].toDF("doc_id", "wc")
    val t = graft.operators.CumSum.withRunningTotal(none, Seq(col("doc_id")), col("wc"), "cum")
    val row = t.agg(count(lit(1)).as("n_docs"), sum(col("wc")).as("total_tokens")).head()
    assert(row.getLong(0) === 0L && row.isNullAt(1))
  }

  test("semDedup on a corpus with no near-duplicates removes nothing") {
    val df = Seq((0L, Seq(1f, 0f, 0f)), (1L, Seq(0f, 1f, 0f)),
      (2L, Seq(0f, 0f, 1f)), (3L, Seq(-1f, 0f, 0f))).toDF("key", "vec")
    val out = graft.operators.Cluster.semDedup(df, col("key"), col("vec"),
      k = 2, iters = 1, minCosine = 0.99)
    assert(out.filter(col("removed")).count() === 0L)
    assert(out.count() === 4L)
  }

  // ------------------------------------------------------- round-9 edges

  test("ecdfTable on an empty frame is empty; a single value maps to 1.0") {
    import graft.operators.CumSum
    val none = Seq.empty[Tuple1[Double]].toDF("v")
    assert(CumSum.ecdfTable(none, col("v"), "v").count() === 0L)
    val one = Seq(Tuple1(42.0)).toDF("v")
    val got = CumSum.ecdfTable(one, col("v"), "v").collect()
    assert(got.length == 1 && got(0).getDouble(0) == 42.0 && got(0).getDouble(1) == 1.0)
  }

  test("orientByDegree drops self-loops and dedups reversed duplicates; empty is empty") {
    import graft.operators.Graph
    val e = Seq((1L, 1L), (1L, 2L), (2L, 1L)).toDF("a", "b")
    val got = Graph.orientByDegree(e).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length === 1, s"one surviving undirected edge: ${got.toSeq}")
    assert(Graph.orientByDegree(Seq.empty[(Long, Long)].toDF("a", "b")).count() === 0L)
  }

  test("withRunningTotals refuses an empty weight list with a clear error") {
    import graft.operators.CumSum
    val df = Seq((1L, 1L)).toDF("k", "w")
    val e = intercept[IllegalArgumentException] {
      CumSum.withRunningTotals(df, Seq(col("k")), Seq.empty)
    }
    assert(e.getMessage.contains("at least one"))
  }
}
