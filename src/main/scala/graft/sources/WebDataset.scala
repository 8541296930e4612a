package graft.sources

import java.io.BufferedInputStream
import java.nio.charset.StandardCharsets

import org.apache.commons.compress.archivers.tar.TarArchiveInputStream
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** webdataset READER — the source twin of `Sinks.webdataset`, completing
  * the round trip the tfrecord pair already has (write with the sink,
  * read back as a DataFrame). Ref layout `writer.py:88-126`: tars of
  * (`<key>.<ext>` payload, `<key>.json` metadata) entry pairs.
  *
  * Scale shape: one task per tar (read parallelism = shard count = write
  * parallelism, the tfrecord DSv2 argument), each streamed through
  * commons-compress — a shard is read start-to-finish with O(entry)
  * memory, never materialized whole. Entry pairs are written
  * consecutively by the sink, but the reader tolerates any order within
  * a tar by keying on the entry stem. */
object WebDataset {

  val schema: StructType = StructType(Seq(
    StructField("key", StringType),
    StructField("payload", BinaryType),
    StructField("meta", StringType),
    StructField("shard", StringType)))

  def read(spark: SparkSession, dir: String, ext: String = "txt"): DataFrame = {
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sessionState.newHadoopConf())
    val base = new Path(dir)
    val fs = base.getFileSystem(conf.value)
    val tars = fs.listStatus(base)
      .filter(st => st.isFile && st.getPath.getName.endsWith(".tar"))
      .map(_.getPath.toString).sorted
    val rdd = spark.sparkContext
      .parallelize(tars.toIndexedSeq, math.max(1, tars.length))
      .flatMap { tarPath =>
        val p = new Path(tarPath)
        val shard = p.getName.stripSuffix(".tar")
        val in = new TarArchiveInputStream(
          new BufferedInputStream(p.getFileSystem(conf.value).open(p)))
        val payloads = collection.mutable.LinkedHashMap.empty[String, Array[Byte]]
        val metas = collection.mutable.HashMap.empty[String, String]
        try {
          var e = in.getNextEntry
          while (e != null) {
            if (!e.isDirectory) {
              val n = e.getName
              val bytes = in.readAllBytes()
              if (n.endsWith(".json"))
                metas(n.stripSuffix(".json")) = new String(bytes, StandardCharsets.UTF_8)
              else if (n.endsWith(s".$ext"))
                payloads(n.stripSuffix(s".$ext")) = bytes
            }
            e = in.getNextEntry
          }
        } finally in.close()
        payloads.iterator.map { case (k, bytes) =>
          Row(k, bytes, metas.getOrElse(k, null), shard)
        }
      }
    spark.createDataFrame(rdd, schema)
  }
}
