package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measured scale-blow-up probe (VERDICT r10 item 4): replicate the
  * LLM-pipeline tables (events / documents / embeddings) ×FACTOR with
  * perturbed keys, run the most expensive bench queries on both the
  * base and the blown-up fixture, and record t(base) vs t(×FACTOR) plus
  * peak driver heap — converting SCALE.md's asymptotic arguments into
  * per-query measured growth.
  *
  * Replication is NOT a plain union of identical copies: identical text
  * would turn every near-dup/fingerprint query quadratic by data
  * pathology (every doc 10× duplicated), which measures the fixture,
  * not the plan. Instead each replica r > 0:
  *   - events: event_id/user_id offset per replica (new users, same
  *     time range — the realistic "10× traffic" shape: days×10 rows/day)
  *   - documents: doc_id offset; every 8th word salted with the replica
  *     id, so any ≥8-word shingle/fingerprint window differs across
  *     replicas (vocab grows mildly, like a real corpus; near-dup
  *     candidate structure stays realistic)
  *   - embeddings: vec_id offset; embedding circularly shifted by r
  *     dims (new geometry, same distribution)
  * The TPC-H tables are copied as-is (the probe's query set reads only
  * the pipeline tables).
  *
  * Output: SCALE_BLOWUP.json — per query {base_sec, blown_sec, ratio,
  * peak_heap_mb}, plus the factor and calibration spin. A ratio well
  * under FACTOR×1.5 on a 32-thread box that is NOT 10× wider than the
  * base run is the evidence the plan scales ≲linearly in data volume.
  */
object ScaleProbe {
  // the most expensive BENCH_r10 queries that read the replicated
  // tables (lineitem/part-based ones excluded — their input is flat
  // here, so their timing would measure nothing)
  val Probes: Seq[String] = Seq(
    "q235_bootstrap_ci", "q115_cms_heavy_hitters", "q312_pca_power",
    "q206_adamic_adar", "q157_substr_fingerprints", "q147_tfidf_pairs",
    "q253_silhouette", "q228_harmonic_centrality", "q131_stream_outer_join",
    "q203_clustering_coeff", "q177_kmeans_lloyd", "q258_topic_coherence",
    "q344_rfm", "q339_sla_trend", "q65_stream_join",
    // round-12 plan rewrites — blow-up re-measured after the change
    "q180_dsir", "q192_cluster_labels",
    // round-14: the BINARY document pipeline itself (VERDICT r13 item
    // 8) — per-doc PDF assembly → MiniPdf decode (incl. images,
    // drawings-capable path, RC4 decryption) → explode/channels, and
    // the WARC parse + digest-dedup ingest leg; all per-row map-side
    // work whose blow-up should track the documents table linearly
    "q362_pdf_planted_dims", "q363_pdf_channels", "q364_pdf_encrypted",
    "q366_warc_revisit_dedup", "q367_warc_pdf_e2e",
    // round-15: embedded-font program decode and in-PDF image payload
    // extraction (Flate raster → PNG re-wrap + DCT passthrough into the
    // real codec) — per-row map-side decode legs. q337 (real-pixel
    // pHash) is EXCLUDED by the fixture-pathology rule above: its
    // planted corpus has only 256 distinct images (64 patterns × 4
    // variants), so replication multiplies same-hash collisions and the
    // band join's candidate count grows as Σ|group|² — a property of
    // the planted data, not the plan (the banding scale shape is the
    // minhash-LSH one, covered by those probes; candidate growth on a
    // REAL corpus is governed by true near-dup density)
    "q369_pdf_embedded_font", "q370_pdf_image_payload",
    // executor-side Arrow shard write+read round trip (one file per
    // partition both ways)
    "q372_arrow_shard_roundtrip",
    // round-16: the band-tier pHash probe at realistic distinct-hash
    // cardinality (VERDICT r15 "What's wrong" #3 — replicas offset
    // doc_id, so md5-derived hashes stay unique and the distinct-hash
    // population grows with the factor; planted 1–3-bit neighbors ride
    // along), plus the scanned-document (CCITT G4) and Indexed/ICC
    // color-space decode legs (per-row map-side, zero shuffle)
    "q373_phash_band_probe", "q374_pdf_ccitt_g4", "q375_pdf_colorspaces",
    "q376_pdf_ccitt_g3", "q377_pdf_lowbpc",
    // round-16b: CMYK raster conversion, JBIG2 generic-region decode
    // (MQ + TPGDON + MMR legs), /SMask alpha merge — per-row map-side,
    // zero shuffle
    "q378_pdf_cmyk", "q379_pdf_jbig2", "q380_pdf_smask",
    "q381_pdf_separation", "q382_pdf_type4", "q383_pdf_devicen",
    // round-17: JPX verbatim surfacing + SIZ dims, CMYK JPEGs through
    // readRaster+clamp, the Huffman JBIG2 class, and the /Lab CIE
    // conversion — all per-row map-side behind the documentsFanned
    // exchange, zero shuffle
    "q384_pdf_jpx", "q385_pdf_cmyk_jpeg", "q386_pdf_jbig2_huffman",
    "q387_pdf_cie_color", "q388_pdf_jbig2_halftone",
    // round-17b: the non-PDF document classes (zip-contained EPUB
    // chapters, CBZ image archives through the real JDK codec)
    "q393_epub_decode", "q394_cbz_images",
    // round-18: the remaining document classes (XPS OPC walk, FB2
    // section scan, MOBI PalmDOC inflate), the five-leg audio header
    // walk, and JBIG2 generic refinement — per-row map-side decode
    // behind the documentsFanned exchange, zero shuffle
    "q395_xps_decode", "q396_fb2_decode", "q397_mobi_decode",
    "q389_audio_compressed_meta", "q398_pdf_jbig2_refinement",
    // round-18b: refinement-coded symbols, Matroska walks, custom
    // Huffman tables — per-row map-side like the rest
    "q399_pdf_jbig2_refined_symbols", "q400_mkv_meta",
    "q401_pdf_jbig2_custom_table",
    // round-18c: in-document images across EPUB/FB2/XPS
    "q402_doc_embedded_images",
    // round-19: the SVG/TXT document classes, Huffman-coded JBIG2
    // refinement, multi-instance SDREFAGG aggregates, and the YCCK
    // JPEG inverse — per-row map-side decode behind the
    // documentsFanned exchange, zero shuffle
    "q403_svg_decode", "q404_txt_decode",
    "q405_pdf_jbig2_huffman_refinement", "q406_pdf_jbig2_multi_agg",
    "q407_pdf_ycck_jpeg",
    // round-19b: bare-raster documents through the router image route,
    // AVI main-header metadata, from-scratch Netpbm decode, PSD dims
    "q408_image_as_document", "q409_avi_meta", "q410_pnm_decode",
    "q411_psd_meta")

  def buildBlownFixture(spark: SparkSession, sfDir: String, outDir: String,
                        factor: Int): Unit = {
    val reps = spark.range(0, factor).select(col("id").cast("int").as("r"))
    // events: per-replica id offsets, same time range
    val ev = Tables.events(spark, sfDir)
    ev.crossJoin(broadcast(reps))
      .select(
        (col("event_id") + col("r").cast("long") * 100000000L).as("event_id"),
        col("ts"),
        (col("user_id") + col("r").cast("long") * 10000000L).as("user_id"),
        col("event_type"), col("value"), col("props"))
      .write.mode("overwrite").parquet(s"$outDir/events.parquet")
    // documents: salt every 8th word with the replica id (r=0 unchanged)
    val docs = Tables.documents(spark, sfDir)
    docs.crossJoin(broadcast(reps))
      .select(
        (col("doc_id") + col("r").cast("long") * 10000000L).as("doc_id"),
        when(col("r") === 0, col("text")).otherwise(
          array_join(zip_with(
            split(col("text"), " "),
            sequence(lit(0), size(split(col("text"), " ")) - 1),
            (w, i) => when(i % 8 === 7, concat(w, lit("_zr"), col("r")))
              .otherwise(w)), " ")).as("text"),
        col("lang"), col("source"), col("n_chars"))
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    // embeddings: circular dim shift per replica
    val emb = Tables.embeddings(spark, sfDir)
    val n = size(col("embedding"))
    emb.crossJoin(broadcast(reps))
      .select(
        (col("vec_id") + col("r").cast("long") * 10000000L).as("vec_id"),
        when(col("r") === 0, col("embedding")).otherwise(
          concat(slice(col("embedding"), col("r") + 1, n - col("r")),
            slice(col("embedding"), lit(1), col("r")))).as("embedding"),
        col("label"))
      .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
    // flat copies for the rest so any query can run against outDir
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem"))
      spark.read.parquet(Tables.path(sfDir, t))
        .write.mode("overwrite").parquet(s"$outDir/$t.parquet")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val factor = if (args.length > 1) args(1).toInt else 10
    val outJson = if (args.length > 2) args(2) else "/root/repo/SCALE_BLOWUP.json"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "4000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val blownDir = s"/root/repo/target/scale_blowup_x$factor"
    println(s"[scale] building x$factor fixture at $blownDir")
    buildBlownFixture(spark, sfDir, blownDir, factor)
    // stage streaming inputs for both dirs outside the timings
    for (d <- Seq(sfDir, blownDir))
      try graft.streaming.StreamingOps.stageEventsForStreaming(
        spark, d, graft.streaming.StreamingOps.defaultStagingDir(spark, d))
      catch { case e: Throwable => System.err.println(s"[scale] staging $d: ${e.getMessage}") }
    val queries = SparkEntry.queries
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").filter(_.nonEmpty).toSet)
    val probes = Probes.filter(n => only.forall(_.exists(n.contains)))
    def runOne(name: String, dir: String): (Double, Long) = {
      val rt = Runtime.getRuntime
      val t0 = System.nanoTime()
      queries(name)(spark, dir).write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      val usedMb = (rt.totalMemory() - rt.freeMemory()) / (1024 * 1024)
      (sec, usedMb)
    }
    // min-of-2 on BOTH sides: the first execution of a plan shape in a
    // JVM runs the generated code interpreted until C2 compiles it —
    // measured 49 s vs 1.9 s warm for q235 on the blown fixture — so a
    // single cold blown run would measure the JIT, not the plan
    val rows = probes.map { name =>
      try {
        val (w, _) = runOne(name, sfDir)
        val (b1, _) = runOne(name, sfDir)
        val base = math.min(w, b1)
        val (c1, h1) = runOne(name, blownDir)
        val (c2, h2) = runOne(name, blownDir)
        val (blown, heapMb) = (math.min(c1, c2), math.max(h1, h2))
        System.gc()
        val ratio = if (base > 0) blown / base else Double.NaN
        println(f"[scale] $name%-28s base=$base%6.2fs x$factor=$blown%7.2fs ratio=$ratio%5.2f heap=${heapMb}MB")
        f"""{"query":"$name","base_sec":$base%.3f,"blown_sec":$blown%.3f,"ratio":$ratio%.2f,"heap_mb":$heapMb}"""
      } catch { case e: Throwable =>
        System.err.println(s"[scale] $name FAILED: ${e.getMessage}")
        s"""{"query":"$name","error":"${e.getClass.getSimpleName}"}"""
      }
    }
    val json = s"""{"factor":$factor,"base":"$sfDir","cpus":$cpus,""" +
      s""""probes":[${rows.mkString(",")}]}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(outJson),
      (json + "\n").getBytes("UTF-8"))
    println(json)
    spark.stop()
  }
}
