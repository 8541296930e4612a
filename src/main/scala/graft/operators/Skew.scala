package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys (SURVEY §4 / §7.5.3 — heavy-tailed
  * document sizes are the expected 100 TB failure mode).
  *
  * AQE's skew-join handling (`spark.sql.adaptive.skewJoin`) is the first
  * line of defense and is enabled in the engine sessions; these manual
  * operators cover the cases AQE cannot re-plan: skewed aggregation
  * (one giant group) and broadcast-averse skewed joins.
  */
object Skew {

  /** Deterministic salt in [0, salts) derived from a source column —
    * never `rand()` (task retries must reproduce the same salt or
    * shuffle outputs disagree across attempts). */
  def saltColumn(source: Column, salts: Int): Column =
    pmod(xxhash64(source), lit(salts.toLong)).cast("int")

  /** Skew-safe equi-join: the skewed side is salted (`saltSrc` must be a
    * column that distributes rows of one hot key across salts, e.g. a
    * unique row id), the dim side is replicated `salts` ways. Each hot
    * key's rows land in `salts` tasks instead of one. */
  def saltedJoin(skewed: DataFrame, dim: DataFrame, key: String,
                 saltSrc: Column, salts: Int): DataFrame = {
    val s = skewed.withColumn("__salt", saltColumn(saltSrc, salts))
    val d = dim
      .withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
      .withColumn("__salt", col("__salt").cast("int"))
    s.join(d, Seq(key, "__salt")).drop("__salt")
  }

  /** Skew-safe count/sum aggregation: partial aggregate on (key, salt),
    * final on key. Decomposable aggregates only — the partial pass does
    * the heavy lifting in `salts`-way parallelism. */
  def saltedSumCount(df: DataFrame, key: String, value: Column,
                     saltSrc: Column, salts: Int): DataFrame =
    df.withColumn("__salt", saltColumn(saltSrc, salts))
      .withColumn("__v", value)
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__pc"), sum(col("__v")).as("__ps"))
      .groupBy(col(key))
      .agg(sum(col("__pc")).as("n"), sum(col("__ps")).as("total"))
}
