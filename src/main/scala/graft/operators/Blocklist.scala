package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter blocklist membership — the runtime-filter pattern for
  * subtracting a blocklist from a 100 TB stream without shuffling it.
  *
  * An exact anti-join shuffles BOTH sides on the key. The bloom variant
  * aggregates the blocklist into a compact sketch (size O(n·log(1/fpp))
  * bits, independent of the stream), broadcasts it, and filters map-side:
  * the big side is never shuffled at all. Bloom guarantees NO false
  * negatives — every blocklisted key is always dropped; `fpp` bounds the
  * rate of extra (false-positive) drops, asserted in CurationSpec.
  *
  * This is the same mechanism Spark's own runtime bloom-filter join
  * (`spark.sql.optimizer.runtime.bloomFilter.enabled`) injects for
  * selective joins — exposed here as an explicit operator because the
  * optimizer only triggers it on statistics local test scales don't
  * produce. Extension surface [EXT] (SURVEY §2.4 runtime filters).
  */
object Blocklist {

  /** Build the blocklist sketch (one distributed aggregation; the sketch,
    * not the rows, returns to the driver). */
  def bloomOf(blocklist: DataFrame, blockKey: Column,
              expectedItems: Long, fpp: Double): BloomFilter =
    blocklist.select(blockKey.as("__k")).stat.bloomFilter("__k", expectedItems, fpp)

  /** Keep only rows of `df` whose `key` is NOT (probably) in the
    * blocklist. Result is a subset of the exact anti-join: all true
    * members are dropped, plus at most ~fpp of the non-members. */
  def filterNotIn(df: DataFrame, key: Column,
                  blocklist: DataFrame, blockKey: Column,
                  expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    // an empty blocklist blocks nothing — and Spark's stat.bloomFilter
    // NPEs on an empty frame (no sketch row comes back), so short-circuit
    if (blocklist.isEmpty) return df
    val bf = bloomOf(blocklist, blockKey, expectedItems, fpp)
    val bc = df.sparkSession.sparkContext.broadcast(bf)
    val keep = udf((k: java.lang.Long) => k != null && !bc.value.mightContainLong(k))
    df.filter(keep(key.cast("long")))
  }
}
