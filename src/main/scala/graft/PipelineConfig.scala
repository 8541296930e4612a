package graft

/** Engine configuration — mirror of the reference CLI surface
  * (`/root/reference/doc2dataset/main.py:66-104`), validated like
  * `arguments_validator` (`main.py:29-63`).
  */
final case class PipelineConfig(
    urlCol: String = "url",
    verifyHashCol: Option[String] = None,
    verifyHashType: String = "md5",
    computeHash: Option[String] = Some("sha256"),
    saveAdditionalColumns: Seq[String] = Nil,
    numSamplesPerShard: Int = 10000,
    oomShardCount: Int = 5,
    encodeFormat: String = "text",
    outputFormat: String = "parquet",     // parquet|jsonl|files|webdataset|tfrecord|dummy
    maxPages: Option[Int] = None,
    minWordsPerPage: Int = 0,
    maxImagesPerPage: Option[Int] = None,
    minImageSize: Int = 0,
    // accepted-but-unused, faithfully: the reference takes max_image_area
    // (main.py:91) but its removal criteria use only min_image_size and
    // max_aspect_ratio (extractor.py:121-126) — the parameter is dead
    // there, so it is config-surface-only here too
    maxImageArea: Double = Double.MaxValue,
    // accepted-but-unused, faithfully: the reference threads
    // disable_all_reencoding into its Extractor (`main.py:88`,
    // `extractor.py:98`) which stores and never reads it — config
    // surface only, like maxImageArea
    disableAllReencoding: Boolean = false,
    maxAspectRatio: Double = Double.MaxValue,
    getLanguage: Boolean = false,
    getDrawings: Boolean = false,
    extractExif: Boolean = false,
    countWords: Boolean = true,
    removeDigits: Boolean = false,
    saveFigures: Boolean = false,
    timeoutSec: Int = 10,
    retries: Int = 0,
    userAgentToken: Option[String] = None,
    disallowedHeaderDirectives: Seq[String] = Nil) {

  /** Reserved output names that user manifests must not collide with
    * (ref `main.py:43-63`). */
  val reservedNames: Set[String] =
    Set("key", "url", "status", "error_message", "exif", "md5", "sha256", "sha512")

  def validate(): Unit = {
    val hashes = Set("md5", "sha256", "sha512")
    require(hashes.contains(verifyHashType), s"verify_hash_type must be one of $hashes")
    computeHash.foreach(h => require(hashes.contains(h), s"compute_hash must be one of $hashes"))
    require(verifyHashCol.isEmpty || computeHash.contains(verifyHashType),
      "verifying a hash requires computing the same hash type")
    val bad = saveAdditionalColumns.filter(reservedNames.contains)
    require(bad.isEmpty, s"additional columns collide with reserved names: $bad")
    val formats = Set("parquet", "jsonl", "files", "webdataset", "tfrecord", "dummy")
    require(formats.contains(outputFormat), s"output_format must be one of $formats")
  }
}
