package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Also writes manifest.json: per query, the row count, the sorted
  * schema, an order-independent value fingerprint (sum of the low 60
  * bits of md5(to_json(struct(sorted cols))) per row), and the sha256
  * of the declared oracle SQL text. When a driver-side CORRECTNESS
  * artifact disagrees with a builder-side sweep, the two manifests
  * make the divergence diffable — same fingerprint ⇒ the Spark dump is
  * identical and the break is oracle-environment-side; different
  * sql_sha256 ⇒ the oracle text drifted (r10's q213 lesson).
  */
object Verify {
  def main(args: Array[String]): Unit = {
    // args: <sfDir> <outDir> [querySubstrings] — the optional third arg
    // (comma-separated substrings) restricts the dump to matching query
    // names (local iteration only; the driver always passes two)
    val sfDir = args(0); val outDir = args(1)
    val only = if (args.length > 2)
      Some(args(2).split(",").filter(_.nonEmpty).toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // static compiled-class cache, default 100 entries — thrashes on
      // a 361-query run (see Bench.scala / SCALE.md round-11)
      .config("spark.sql.codegen.cache.maxEntries", "4000")
      // r19: same AQE-on-cached-plans conf as Bench (see its comment) —
      // Verify must dump under the exact session the bench times
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val manifest = scala.collection.mutable.LinkedHashMap[String, String]()
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.exists(name.contains)) }
      .foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
        // fingerprint from the parquet actually written (what the
        // driver will read), not the in-memory frame
        val back = spark.read.parquet(s"$outDir/$name")
        val cols = back.columns.sorted
        val fpRow = back
          .select(to_json(struct(cols.toIndexedSeq.map(col): _*)).as("js"))
          .agg(
            coalesce(sum(conv(substring(md5(col("js")), 1, 15), 16, 10)
              .cast(DecimalType(38, 0))), lit(0).cast(DecimalType(38, 0)))
              .as("fp"),
            count(lit(1)).as("n"))
          .collect()(0)
        val schemaStr = back.schema.fields.sortBy(_.name)
          .map(f => s"${f.name}:${f.dataType.simpleString}").mkString(",")
        manifest(name) =
          s"""{"rows": ${fpRow.getLong(1)}, "fingerprint": "${fpRow.getDecimal(0)}", "schema": "$schemaStr"}"""
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        manifest(name) = s"""{"error": true}"""
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    def sha256(s: String): String = {
      val d = java.security.MessageDigest.getInstance("SHA-256")
      d.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    val sqlHashes = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(sha256(v))}" }
    val manifestJson =
      s"""{"spark_version": ${q(spark.version)},
         |"queries": ${manifest.map { case (k, v) => s"${q(k)}: $v" }.mkString("{", ",", "}")},
         |"oracle_sql_sha256": ${sqlHashes.mkString("{", ",", "}")}}""".stripMargin
    Files.writeString(Paths.get(s"$outDir/manifest.json"), manifestJson)
    spark.stop()
  }
}
