package graft.operators

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Pipeline observability (ref `logger.py` SpeedLogger / StatusTableLogger
  * / per-shard stats JSON, SURVEY §2.6) — re-expressed as `df.observe`
  * named metrics: zero extra passes, counters ride the existing action,
  * no sidecar polling process.
  */
object Metrics {

  /** Attach the reference's per-run counters to a status-tagged frame.
    * After any action on the returned frame, `summary(obs, wallSec)`
    * yields docs/sec + ratios (ref `logger.py:113-117`). */
  def observed(df: DataFrame, name: String = "graft_stats"): (DataFrame, Observation) = {
    val obs = Observation(name)
    val out = df.observe(obs,
      count(lit(1)).as("count"),
      sum(when(col("status") === "success", 1L).otherwise(0L)).as("successes"),
      sum(when(col("status") === "failed_to_download", 1L).otherwise(0L)).as("failed_to_download"),
      sum(when(col("status") === "failed_to_extract", 1L).otherwise(0L)).as("failed_to_extract"))
    (out, obs)
  }

  /** Streaming twin of [[observed]]: the SAME counters attached to a
    * streaming frame. `Observation` is batch-only — on a stream the
    * metrics arrive per micro-batch in
    * `StreamingQueryProgress.observedMetrics(name)`, so a monitor sums
    * them across progress events (each row is observed in exactly one
    * micro-batch; the totals are exact, not sampled). */
  def observeStream(df: DataFrame, name: String = "graft_stats"): DataFrame =
    df.observe(name,
      count(lit(1)).as("count"),
      sum(when(col("status") === "success", 1L).otherwise(0L)).as("successes"),
      sum(when(col("status") === "failed_to_download", 1L).otherwise(0L)).as("failed_to_download"),
      sum(when(col("status") === "failed_to_extract", 1L).otherwise(0L)).as("failed_to_extract"))

  /** ref `logger.py:162-184` stats dict: counts, ratios, duration, rate. */
  def summary(obs: Observation, wallSec: Double): Map[String, Double] = {
    val row = obs.get
    val n = row.getOrElse("count", 0L).asInstanceOf[Long].toDouble
    def g(k: String) = row.getOrElse(k, 0L).asInstanceOf[Long].toDouble
    Map(
      "count" -> n,
      "successes" -> g("successes"),
      "failed_to_download" -> g("failed_to_download"),
      "failed_to_extract" -> g("failed_to_extract"),
      "duration" -> wallSec,
      "docs_per_sec" -> (if (wallSec > 0) n / wallSec else 0.0),
      "success_ratio" -> (if (n > 0) g("successes") / n else 0.0))
  }

  /** Capped status histogram (ref `CappedCounter`, `logger.py:13-43`):
    * top-k statuses by count — `groupBy.count.limit` replaces the
    * hand-rolled halving cap. */
  def statusHistogram(df: DataFrame, k: Int = 100): DataFrame =
    df.groupBy(col("status"), col("error_message"))
      .agg(count(lit(1)).as("count"))
      .orderBy(desc("count"), col("status"), col("error_message"))
      .limit(k)
}
