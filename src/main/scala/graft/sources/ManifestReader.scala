package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Manifest readers — the reference's `Reader`
  * (`/root/reference/doc2dataset/reader.py:14-146`) re-expressed as thin
  * wrappers over `spark.read`. The reference hand-rolls sharding (feather
  * files in `_tmp/`, 32-thread pool) and must hold the whole manifest in
  * driver memory (`reader.py:110,122` — its documented scalability cliff);
  * here the manifest is a distributed DataFrame from the first scan and
  * "sharding" is just `repartition`, so a 100 TB manifest never converges
  * on one machine.
  */
object ManifestReader {

  /** Normalize a manifest: rename `urlCol → url`, optionally rename the
    * verify-hash column to its hash-type name, keep only
    * url + hash + additional columns (ref `reader.py:60-69,114-120`). */
  def normalize(df: DataFrame, urlCol: String, verifyHashCol: Option[String],
                verifyHashType: String, additional: Seq[String]): DataFrame = {
    val renamed = verifyHashCol.foldLeft(df.withColumnRenamed(urlCol, "url")) {
      (d, c) => d.withColumnRenamed(c, verifyHashType)
    }
    val keep = additional ++ verifyHashCol.map(_ => verifyHashType).toSeq :+ "url"
    renamed.select(keep.distinct.map(col): _*)
  }

  /** txt manifest: one URL per line (ref `reader.py:60-61,91-92`). */
  def txt(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path).withColumnRenamed("value", "url")

  /** csv / tsv (+.gz transparent) with header (ref `reader.py:95-98`). */
  def csv(spark: SparkSession, path: String, sep: String = ","): DataFrame =
    spark.read.option("header", "true").option("sep", sep).csv(path)

  def tsv(spark: SparkSession, path: String): DataFrame = csv(spark, path, "\t")

  /** json / jsonl (ref `reader.py:93-94,99-100`); `multiline` for a
    * whole-file JSON array. */
  def json(spark: SparkSession, path: String, multiline: Boolean = false): DataFrame =
    spark.read.option("multiline", multiline.toString).json(path)

  /** parquet with column pruning left to Catalyst (ref `reader.py:103-110`
    * prunes by hand; a declarative `select` after scan reaches the reader
    * as ReadSchema automatically). */
  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Directory-of-files scan via path glob (ref `reader.py:53-58`). */
  def glob(spark: SparkSession, dir: String, format: String): DataFrame =
    spark.read.format(format).load(s"$dir/*.$format")

  /** Arrow IPC / Feather-v2 shards — the reference's own intermediate
    * shard format (ref `downloader.py:229-231`), readable directly so a
    * migration can consume existing `_tmp feather` output. */
  def arrow(spark: SparkSession, path: String): DataFrame =
    ArrowIpc.read(spark, path)

  /** Shard for downstream fetch parallelism: the reference's fixed-size
    * shard (`number_sample_per_shard`, `reader.py:125-138`) maps to a row
    * count based partition target. */
  def shard(df: DataFrame, totalRows: Long, rowsPerShard: Int): DataFrame =
    df.repartition(math.max(1, (totalRows / math.max(1, rowsPerShard)).toInt))
}
