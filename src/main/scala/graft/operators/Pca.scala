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

  /** Returns (dim 0-based, loading, nrm) — loading is the unit top
    * component after `iters` power steps from e0; nrm is ‖C·v‖
    * UNNORMALIZED by n (divide by the row count for the eigenvalue). */
  def topComponent(vecs: DataFrame, vecCol: String, idCol: String,
                   iters: Int): DataFrame = {
    val e = Dedup.cacheScoped(vecs
      .select(col(idCol).as("__vid"), posexplode(col(vecCol)).as(Seq("i", "x")))
      .select(col("__vid"), col("i"), col("x").cast("double").as("x")))
    val st = Dedup.cacheScoped(e.groupBy(col("i"))
      .agg(count(lit(1)).as("n"),
        (floor(sum(col("x").cast(DecimalType(27, 12))).cast("double")
          / count(lit(1)) * 1e9 + 0.5) / 1e9).as("m")))
    val c = Dedup.cacheScoped(e.join(broadcast(st.select(col("i"), col("m"))),
        Seq("i"))
      .select(col("__vid"), col("i"), (col("x") - col("m")).as("c")))
    def step(v: DataFrame): DataFrame = {
      val sI = c.join(broadcast(v.select(col("i"), col("v"))), Seq("i"))
        .withColumn("t", pr(col("c") * col("v"), 12).cast(D))
        .groupBy(col("__vid")).agg(sum(col("t")).cast("double").as("s"))
      val u = c.join(sI, Seq("__vid"))
        .withColumn("t", pr(col("c") * col("s"), 12).cast(D))
        .groupBy(col("i")).agg(sum(col("t")).cast("double").as("u"))
      val nrm = u.agg(sqrt(sum(pr(col("u") * col("u"), 12).cast(D))
        .cast("double")).as("nrm"))
      Dedup.cacheScoped(u.crossJoin(broadcast(nrm))
        .select(col("i"), pr(col("u") / col("nrm"), 9).as("v"), col("nrm")))
    }
    val v0 = st.select(col("i"),
      when(col("i") === 0, lit(1.0)).otherwise(lit(0.0)).as("v"))
    (1 to iters).foldLeft(v0)((v, _) => step(v.select(col("i"), col("v"))))
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
