package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Top principal component by distributed power iteration — the
  * anisotropy/whitening diagnostic for embedding corpora (q312).
  *
  * Fully distributed: the corpus appears only as posexplode aggregates
  * (per-dim means, per-row projections, per-dim updates); the only
  * small state is the dim-row v frame cached per round. Engine parity
  * is the q112 iterative discipline: every reduction is floor-rounded
  * terms (12 digits) summed in exact DECIMAL — order-free — and v
  * re-normalizes through a floor-rounded divide each round, so an SQL
  * oracle unrolling the same steps is bit-identical.
  *
  * Cost: 2 grouped aggs + 1 tiny agg per iteration over the exploded
  * (rows×dim) frame — linear, no shuffle wider than the dim-key
  * hash agg. At 100 TB the exploded frame never materializes (codegen
  * explode feeds partial aggs); v broadcasts at |dim| rows.
  */
object Pca {

  private val D = DecimalType(27, 14)
  private def pr(c: Column, scale: Int): Column = {
    val s = math.pow(10, scale)
    val y = c * s + 0.5
    when(abs(y) >= 4.503599627370496e15, y)
      .otherwise(floor(y).cast("double")) / s
  }

  /** Driver mirror of [[pr]] — identical IEEE floor form incl. the 2^52
    * passthrough branch (the Graph.round9 discipline). */
  private def prD(x: Double, scale: Int): Double = {
    val s = math.pow(10, scale)
    val y = x * s + 0.5
    (if (math.abs(y) >= 4.503599627370496e15) y else math.floor(y)) / s
  }

  /** Returns (dim 0-based, loading, nrm) — loading is the unit top
    * component after `iters` power steps from e0; nrm is ‖C·v‖
    * UNNORMALIZED by n (divide by the row count for the eigenvalue).
    *
    * Plan shape (round-12 rewrite, values BIT-IDENTICAL to the old
    * exploded form so the unrolled SQL oracle is untouched): means and
    * the round's v are |dim|-sized literals (the Cluster.lloyd
    * parameters-as-literals discipline — driver traffic O(d) per
    * round), the per-row projection s = Σ_d pround(c·v, 12) folds as a
    * sequential exact-DECIMAL array aggregate (exact addition is
    * order-free, so the sequential fold equals the old per-vid grouped
    * sum), and each iteration costs ONE grouped agg over the exploded
    * (rows×dim) frame — the old shape also shuffled a per-vid
    * projection frame and joined it back against the exploded corpus,
    * which was the dominant cost and grows with n at 100 TB. */
  def topComponent(vecs: DataFrame, vecCol: String, idCol: String,
                   iters: Int): DataFrame = {
    // Fixed-dimensionality assumed: a ragged/short vector yields a null
    // zip_with projection and that row silently drops out of the update
    // aggregate — callers feed fixed-dim embedding columns.
    val spark = vecs.sparkSession
    import spark.implicits._
    val dimStats = vecs
      .select(posexplode(col(vecCol)).as(Seq("i", "x")))
      .select(col("i"), col("x").cast("double").as("x"))
      .groupBy(col("i"))
      .agg((floor(sum(col("x").cast(DecimalType(27, 12))).cast("double")
        / count(lit(1)) * 1e9 + 0.5) / 1e9).as("m"))
      .orderBy(col("i")).collect()
    val d = dimStats.length
    // Degenerate input (no rows / all-null vectors) → empty result, not
    // a throw: matches the pre-r12 exploded form's behavior.
    if (d == 0) return Seq.empty[(Int, Double, Double)].toDF("i", "v", "nrm")
    val mLit = array(dimStats.toIndexedSeq.map(r => lit(r.getDouble(1))): _*)
    val c = Dedup.cacheScoped(vecs.select(
      zip_with(col(vecCol), mLit, (x, m) => x.cast("double") - m).as("c")))
    var v: Array[Double] = Array.tabulate(d)(i => if (i == 0) 1.0 else 0.0)
    var nrmOut = 0.0
    for (_ <- 1 to iters) {
      val vLit = array(v.toIndexedSeq.map(lit): _*)
      val s = aggregate(
        zip_with(col("c"), vLit, (ci, vi) => pr(ci * vi, 12).cast(D)),
        lit(0).cast(D), (acc, t) => (acc + t).cast(D)).cast("double")
      val uRows = c.withColumn("s", s)
        .select(col("s"), posexplode(col("c")).as(Seq("i", "cd")))
        .withColumn("t", pr(col("cd") * col("s"), 12).cast(D))
        .groupBy(col("i")).agg(sum(col("t")).cast("double").as("u"))
        .orderBy(col("i")).collect()
      // r19: ‖u‖ and the normalized v close on the DRIVER over the
      // |dim|-row collect — bit-mirrors the old distributed close
      // (sqrt of the exact DECIMAL(27,14) sum of pr(u², 12) terms,
      // then pr(u/nrm, 9)); the crossJoin(broadcast(u.agg(...)))
      // formulation re-planned the u subtree through two more stages
      // per iteration for a 1-row norm.
      val nrm = math.sqrt(uRows.foldLeft(java.math.BigDecimal.ZERO) { (a, r) =>
        a.add(java.math.BigDecimal.valueOf(prD(r.getDouble(1) * r.getDouble(1), 12))
          .setScale(14, java.math.RoundingMode.HALF_UP))
      }.doubleValue())
      v = uRows.map(r => prD(r.getDouble(1) / nrm, 9))
      nrmOut = nrm
    }
    import spark.implicits._
    v.indices.map(i => (i, v(i), nrmOut)).toDF("i", "v", "nrm")
  }

  /** Per-dim count and exact total variance companion frame
    * (n, totvar) — 1 row. */
  def varianceStats(vecs: DataFrame, vecCol: String): DataFrame = {
    val e = vecs.select(posexplode(col(vecCol)).as(Seq("i", "x")))
      .select(col("i"), col("x").cast("double").as("x"))
    e.groupBy(col("i"))
      .agg(count(lit(1)).as("n"),
        (floor(sum(col("x").cast(DecimalType(27, 12))).cast("double")
          / count(lit(1)) * 1e9 + 0.5) / 1e9).as("m"),
        sum(pr(col("x") * col("x"), 12).cast(D)).cast("double").as("sxx"))
      .select(col("n"), pr(col("sxx") / col("n") - col("m") * col("m"), 9)
        .as("vr"))
      .agg(max(col("n")).as("n"),
        sum(col("vr").cast(DecimalType(27, 10))).cast("double").as("totvar"))
  }
}
