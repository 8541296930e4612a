package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for LLM training-data pipelines: language ID,
  * quality scoring, token counting, fingerprinting. All built from
  * codegen'd Catalyst expressions (regex / higher-order functions); the
  * only closure is the language-ID scorer, which is a deterministic
  * pure function usable from both Column and test contexts.
  *
  * Generalizes the reference's word-count / cld2 language-detect surface
  * (`/root/reference/doc2dataset/extractor.py:28-31,71-73`) without the
  * native cld2 dependency (zero-egress container).
  */
object TextAnalysis {

  // ---------------------------------------------------------------- langid

  /** Language identification: script histogram + per-script statistical
    * n-gram profiles — see [[LangId]] for the model. Returns an ISO 639-1
    * code or "un" (unknown). Deterministic, allocation-light; used inside
    * the langid UDF and directly testable. */
  def detectLanguage(text: String): String = LangId.detect(text)

  /** Language-ID column (UDF — the scorer needs per-char script lookups
    * that Catalyst expressions can't express). Deterministic + idempotent,
    * safe under task retries. */
  def langId(c: Column): Column =
    udf((s: String) => detectLanguage(s)).apply(c)

  // ------------------------------------------------------- token counting

  /** Whitespace token count — codegen'd. */
  def wsTokenCount(c: Column): Column =
    size(regexp_extract_all(c, lit("\\S+"), lit(0)))

  /** BPE-ish subword token count: alpha runs, digit runs, and single
    * punctuation marks each count as one token — a portable approximation
    * of GPT-style pre-tokenization, identical under Java and RE2 regex. */
  val bpeTokenPattern = "[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\\s]"
  def bpeTokenCount(c: Column): Column =
    size(regexp_extract_all(c, lit(bpeTokenPattern), lit(0)))

  // ------------------------------------------------------ quality scoring

  /** Ratio of alphabetic chars to total length (0 for empty). */
  def alphaRatio(c: Column): Column =
    when(length(c) === 0, lit(0.0))
      .otherwise(length(regexp_replace(c, "[^a-zA-Z]", "")).cast("double") / length(c))

  /** Ratio of punctuation chars to total length. */
  def punctRatio(c: Column): Column =
    when(length(c) === 0, lit(0.0))
      .otherwise(length(regexp_replace(c, "[^.,;:!?'\"()-]", "")).cast("double") / length(c))

  /** Ratio of common-English-stopword tokens to all tokens — a standard
    * "natural language vs boilerplate" signal. SQL-expressible so the
    * DuckDB oracle can replicate it. */
  val stopwordAltPattern = "\\b(the|and|of|to|a|in|is|that|it|for)\\b"
  def stopwordRatio(c: Column): Column = {
    val total = wsTokenCount(c)
    when(total === 0, lit(0.0))
      .otherwise(size(regexp_extract_all(lower(c), lit(stopwordAltPattern), lit(0))).cast("double") / total)
  }

  /** Mean whitespace-token length. */
  def meanWordLen(c: Column): Column = {
    val total = wsTokenCount(c)
    when(total === 0, lit(0.0))
      .otherwise(length(regexp_replace(c, "\\s+", "")).cast("double") / total)
  }

  /** Composite quality score in [0,1]: length prior × alpha ratio ×
    * (1 - punct excess). Mirrors the C4/Gopher-style cheap quality rules.
    * Pure IEEE-double arithmetic (no rounding) so any engine computing the
    * same formula produces bit-identical values. */
  def qualityScore(c: Column): Column = {
    val lenScore = least(length(c).cast("double") / lit(500.0), lit(1.0))
    val alpha = alphaRatio(c)
    val punct = punctRatio(c)
    lenScore * alpha * (lit(1.0) - least(punct * 5.0, lit(1.0)))
  }

  /** Fraction of whitespace tokens containing at least one ASCII letter —
    * the Gopher "80% of words must contain an alphabetic character" rule.
    * The greedy `\S*[A-Za-z]\S*` pattern consumes a whole token per match,
    * so each qualifying token counts exactly once; identical under Java
    * and RE2 regex. */
  val alphaWordPattern = "\\S*[A-Za-z]\\S*"
  def alphaWordRatio(c: Column): Column = {
    val total = wsTokenCount(c)
    when(total === 0, lit(0.0))
      .otherwise(size(regexp_extract_all(c, lit(alphaWordPattern), lit(0))).cast("double") / total)
  }

  /** Logistic quality classifier head: sigmoid(w · features + b) over the
    * cheap codegen'd text signals — the scoring plumbing of a
    * fasttext-style quality model (the GPT-3 "looks-like-reference-corpus"
    * filter) with the model reduced to a deterministic linear head so an
    * oracle can replay it. A real model's coefficient vector rides the
    * plan exactly like these literals (broadcast with the closure); the
    * feature extraction stays one whole-stage-codegen map pass either
    * way. Rounded to 9 so exp() last-ulp drift cannot flip boundary docs
    * (q87 discipline); gate decisions on the ROUNDED score. */
  def classifierScore(c: Column, wTokens: Double, wStop: Double,
                      wAlpha: Double, wPunct: Double, bias: Double): Column = {
    val z = least(wsTokenCount(c).cast("double") / 100.0, lit(1.0)) * wTokens +
      stopwordRatio(c) * wStop + alphaRatio(c) * wAlpha +
      punctRatio(c) * wPunct + bias
    // floor-form round (pure IEEE, engine-portable — the oracle side is
    // FLOOR(x*1e9+0.5)/1e9), not functions.round whose BigDecimal
    // HALF_UP can break the tie differently than DuckDB on a boundary
    floor((lit(1.0) / (lit(1.0) + exp(-z))) * 1e9 + 0.5) / 1e9
  }

  /** Deflate-compression ratio (compressed/raw bytes, level 6) — the
    * low-information-content quality proxy: repetitive boilerplate
    * compresses far below natural text. Deterministic per input (zlib
    * is), but not SQL-expressible → one of the justified UDFs (no
    * codegen deflate exists); still a single map-side pass. Rounded to
    * 9 like every emitted ratio. */
  def compressionRatio(c: Column): Column =
    udf((s: String) => {
      if (s == null || s.isEmpty) 1.0
      else {
        val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val d = new java.util.zip.Deflater(6)
        d.setInput(bytes); d.finish()
        val buf = new Array[Byte](8192)
        var total = 0L
        while (!d.finished()) total += d.deflate(buf)
        d.end()
        math.round(total.toDouble / bytes.length * 1e9) / 1e9
      }
    }).apply(c)

  // --------------------------------------------------------- PII redaction

  /** PII patterns — deliberately restricted to syntax shared verbatim by
    * Java regex and RE2 (no lookaround, no backrefs) so the DuckDB oracle
    * replays them identically. */
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val ipv4Pattern  = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val phonePattern = "\\b\\d{3}[- ]\\d{4}\\b"

  /** Redact emails, IPv4 addresses and phone-shaped numbers with typed
    * placeholder tokens — the standard pre-training privacy scrub.
    * Emails first (their local parts contain dots/digits that the later
    * patterns must not see), then dotted quads, then phone shapes; all
    * three replacements are codegen'd regexp_replace passes. */
  def redactPii(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, emailPattern, "<EMAIL>"),
        ipv4Pattern, "<IP>"),
      phonePattern, "<PHONE>")

  /** Count of matches of one PII pattern in the raw text. */
  def piiCount(c: Column, pattern: String): Column =
    size(regexp_extract_all(c, lit(pattern), lit(0))).cast("long")

  // -------------------------------------------------------- fingerprinting

  /** 64-bit FNV-1a over the concatenated normalized tokens — a rolling
    * document fingerprint. Implemented over Spark's xxhash64 on the
    * normalized text (codegen'd); normalization = lowercase, collapse
    * whitespace, strip punctuation. */
  def normalizeText(c: Column): Column =
    trim(regexp_replace(lower(regexp_replace(c, "[^\\p{L}\\p{N}\\s]", "")), "\\s+", " "))

  /** Content-defined fingerprint of normalized text (xxhash64). Used for
    * exact near-normalization dedup; oracle uses md5 of the same
    * normalization (hash fn differs, normalization semantics identical). */
  def fingerprint(c: Column): Column = xxhash64(normalizeText(c))

  /** md5 fingerprint of normalized text — SQL-portable twin of
    * [[fingerprint]] (DuckDB md5 produces the same hex). */
  def fingerprintMd5(c: Column): Column = md5(normalizeText(c))
}
