package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Invariants of the q300–q308 curation-audit family: novelty counts
  * partition the corpus vocabulary, the funnel is a true cascade, the
  * ES weighted-sampling key is weight-monotone, and dedup keep-first
  * conserves hash groups. */
class PipelineAuditSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("q300 novelty: per-source novel grams partition the corpus vocabulary") {
    val out = SparkEntry.queries("q300_ngram_novelty")(spark, TestSpark.sf0001)
      .collect()
    val novelSum = out.map(_.getAs[Long]("novel_grams")).sum
    val vocab = Tables.documents(spark, TestSpark.sf0001)
      .select(explode(array_distinct(
        graft.functions.Shingles.shingles(col("text"), 3))).as("sh"))
      .agg(countDistinct(col("sh"))).head.getLong(0)
    // every distinct gram has exactly one first owner
    assert(novelSum === vocab)
    out.foreach { r =>
      val nov = r.getAs[Double]("novelty")
      assert(nov >= 0.0 && nov <= 1.0)
    }
  }

  test("q301 funnel is a cascade: stage inputs chain and survival is monotone") {
    val rows = SparkEntry.queries("q301_filter_funnel")(spark, TestSpark.sf0001)
      .orderBy(col("stage")).collect()
    assert(rows.length === 4)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_out") <= r.getAs[Long]("n_in"))
    }
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b.getAs[Long]("n_in") === a.getAs[Long]("n_out"))
      assert(b.getAs[Double]("cum_survival") <= a.getAs[Double]("cum_survival"))
    }
  }

  test("q307 ES key is strictly weight-monotone at fixed u (heavier docs rank higher)") {
    // key = ln(u)/w with ln(u) < 0: doubling w must strictly increase the key
    val d = Seq((1L, 100L), (1L, 200L), (2L, 50L), (2L, 100L))
      .toDF("id", "w")
      .withColumn("u",
        (conv(substring(md5(col("id").cast("string")), 1, 8), 16, 10)
          .cast("double") + 1.0) / 4294967296.0)
      .withColumn("k", log(col("u")) / col("w"))
      .collect()
    val byId = d.groupBy(_.getAs[Long]("id"))
    byId.foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("w"))
      assert(sorted(0).getAs[Double]("k") < sorted(1).getAs[Double]("k"))
    }
    // and the full query returns a deterministic desc-sorted top-50
    val out = SparkEntry.queries("q307_weighted_sample")(spark, TestSpark.sf0001)
      .collect()
    assert(out.length <= 50 && out.nonEmpty)
    val keys = out.map(_.getAs[Double]("es_key"))
    assert(keys.sliding(2).forall { case Array(a, b) => a >= b; case _ => true })
  }

  test("JaroWinkler expression matches the textbook battery (DuckDB-verified values)") {
    // the 12-case battery cross-checked against DuckDB's
    // jaro_winkler_similarity — the parity contract q314's oracle rides
    import org.apache.spark.unsafe.types.UTF8String
    def jw(a: String, b: String): Double =
      graft.functions.Strings.jwImpl(
        UTF8String.fromString(a), UTF8String.fromString(b))
    val eps = 1e-12
    assert(math.abs(jw("martha", "marhta") - 0.9611111111111111) < eps)
    assert(math.abs(jw("dixon", "dicksonx") - 0.8133333333333332) < eps)
    assert(math.abs(jw("jellyfish", "smellyfish") - 0.8962962962962964) < eps)
    assert(jw("abc", "abc") === 1.0)
    assert(math.abs(jw("spark", "sprak") - 0.9466666666666667) < eps)
    assert(math.abs(jw("kitten", "sitting") - 0.746031746031746) < eps)
    assert(jw("alpha", "bravo") === 0.0)
    assert(jw("a", "") === 0.0)
    assert(jw("ab", "ba") === 0.0)           // window 0: adjacent swap has no matches
    assert(math.abs(jw("crate", "trace") - 0.7333333333333334) < eps)
    assert(math.abs(jw("dwayne", "duane") - 0.84) < eps)
    assert(math.abs(jw("arnab", "raanb") - 0.8666666666666667) < eps)
    // codegen path agrees with the static impl
    import spark.implicits._
    val viaExpr = Seq(("martha", "marhta")).toDF("a", "b")
      .select(graft.functions.Strings.jaroWinkler(col("a"), col("b")))
      .head.getDouble(0)
    assert(math.abs(viaExpr - 0.9611111111111111) < eps)
  }

  test("q337 pigeonhole: 4×16-bit bands find EVERY pair at hamming ≤ 3") {
    // flip k bits of a base hash; band-candidacy (≥1 equal band) must
    // hold for every k ≤ 3 (pigeonhole) — and CAN fail only for k ≥ 4.
    // 64-bit aHash since r15 (real-pixel promotion), 16-bit bands.
    val base = 0x8ABCDEF123456789L
    def bands(x: Long): Seq[Long] = (0 to 3).map(i => (x >>> (i * 16)) & 0xFFFF)
    val flips3 = Seq(Seq(0), Seq(15, 31), Seq(1, 22, 63), Seq(3, 17, 44))
    flips3.foreach { bits =>
      val other = bits.foldLeft(base)((h, b) => h ^ (1L << b))
      assert(java.lang.Long.bitCount(base ^ other) === bits.length)
      assert(bands(base).zip(bands(other)).exists { case (x, y) => x == y },
        s"pair at hamming ${bits.length} missed by bands: $bits")
    }
    // one flip per band: all 4 bands differ — correctly NOT a candidate,
    // and also beyond the hamming-3 threshold, so the result set is
    // still exactly the all-pairs answer
    val far = Seq(0, 16, 32, 48).foldLeft(base)((h, b) => h ^ (1L << b))
    assert(bands(base).zip(bands(far)).forall { case (x, y) => x != y })
    assert(java.lang.Long.bitCount(base ^ far) === 4)
  }

  test("q308 keep-first conserves hash groups: kept docs == distinct hashes") {
    val out = SparkEntry.queries("q308_dedup_savings")(spark, TestSpark.sf0001)
      .collect()
    val kept = out.map(_.getAs[Long]("kept_docs")).sum
    val distinctHashes = Tables.documents(spark, TestSpark.sf0001)
      .select(md5(col("text")).as("h")).distinct().count()
    assert(kept === distinctHashes)
    out.foreach { r =>
      assert(r.getAs[Long]("kept_tokens") <= r.getAs[Long]("tokens"))
    }
  }
}
