package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge.{toColumn => column, toExpression => expression}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen kernels for the text-dedup hot path: shingling, MinHash
  * signatures and SimHash — the per-row work of every near-dup pass over a
  * 100 TB corpus (`Dedup.minhashCandidates` / `simhashCandidates` /
  * `ngramJaccardPairs` / `decontaminate`).
  *
  * Replaces interpreted Scala UDFs: a `ScalaUDF` pays catalyst<->scala
  * converters on every call plus an encoder for the tuple return, and the
  * signature UDF allocated every shingle as a `String` only to hash it.
  * These expressions stay inside whole-stage codegen (a static call into
  * [[ShingleKernel]]) and the minhash/simhash kernels hash word windows
  * in place — zero per-shingle allocations.
  *
  * Semantics are EXACTLY the scalar twins' (`Dedup.shingleStrings` /
  * `minhashSigBands` / `simhashOf`), spec-gated: null text == empty text
  * (never a null result), duplicate shingles kept (min-hash is idempotent
  * under them; SimHash counts votes per occurrence).
  */
object Shingles {

  /** Array of k-word shingles of normalized text (lowercase, strip
    * non-letter/digit, collapse whitespace). `distinct` dedups while
    * preserving first-seen order, matching `Seq.distinct`. */
  def shingles(text: Column, k: Int, distinct: Boolean = false): Column =
    column(ShingleArray(expression(text), k, distinct))

  /** struct(_1 = minhash signature array, _2 = LSH band-bucket hash array)
    * fused straight from the text column. Field names `_1`/`_2` match the
    * tuple-returning UDF this replaces, so `col("mh._1")` call sites are
    * unchanged. */
  def minhashSigBands(text: Column, k: Int, numHashes: Int, bands: Int): Column =
    column(MinHashSigBands(expression(text), k, numHashes, bands))

  /** 64-bit SimHash of the text's k-shingle multiset. */
  def simhash(text: Column, k: Int): Column =
    column(SimHash64(expression(text), k))
}

/** Static kernel shared by interpreted eval and generated code (Scala
  * objects emit static forwarders, so generated Java calls
  * `graft.functions.ShingleKernel.m(...)` directly). */
object ShingleKernel {
  private final val FnvOffset = 0xcbf29ce484222325L
  private final val FnvPrime = 0x100000001b3L

  /** Normalized word list — the exact normalization of
    * `Dedup.shingleStrings` (ref `/root/reference/doc2dataset/extractor.py`
    * tokenization semantics). */
  def words(text: UTF8String): Array[String] = {
    if (text == null) return Array.empty
    val ws = text.toString.toLowerCase
      .replaceAll("[^\\p{L}\\p{N}\\s]", "")
      .split("\\s+").filter(_.nonEmpty)
    ws
  }

  /** FNV-1a 64 over words[from..until) joined with a single space —
    * bit-identical to `Dedup.fnv1a64(slice.mkString(" "))` without
    * building the string. */
  def fnvWindow(ws: Array[String], from: Int, until: Int): Long = {
    var h = FnvOffset
    var j = from
    while (j < until) {
      if (j > from) { h ^= ' '.toLong; h *= FnvPrime }
      val w = ws(j)
      var c = 0
      while (c < w.length) { h ^= w.charAt(c).toLong; h *= FnvPrime; c += 1 }
      j += 1
    }
    h
  }

  def shingleArray(text: UTF8String, k: Int, distinct: Boolean): ArrayData = {
    val ws = words(text)
    if (ws.isEmpty) return new GenericArrayData(Array.empty[Any])
    val last = math.max(ws.length - k, 0)
    val out = new java.util.ArrayList[Any](last + 1)
    val seen = if (distinct) new java.util.HashSet[String](2 * (last + 1)) else null
    var i = 0
    while (i <= last) {
      val until = math.min(i + k, ws.length)
      val sb = new java.lang.StringBuilder
      var j = i
      while (j < until) { if (j > i) sb.append(' '); sb.append(ws(j)); j += 1 }
      val s = sb.toString
      if (seen == null || seen.add(s)) out.add(UTF8String.fromString(s))
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  def minhashSigBands(text: UTF8String, k: Int, numHashes: Int, bands: Int): InternalRow = {
    val ws = words(text)
    val sig = Array.fill(numHashes)(Long.MaxValue)
    if (ws.nonEmpty) {
      val last = math.max(ws.length - k, 0)
      var w = 0
      while (w <= last) {
        val base = fnvWindow(ws, w, math.min(w + k, ws.length))
        var i = 0
        while (i < numHashes) {
          var h = base ^ (0x9E3779B97F4A7C15L * (i + 1))
          h ^= (h >>> 33); h *= 0xFF51AFD7ED558CCDL; h ^= (h >>> 33)
          if (h < sig(i)) sig(i) = h
          i += 1
        }
        w += 1
      }
    }
    val rows = numHashes / bands
    val bandHash = Array.tabulate(bands) { b =>
      var h = FnvOffset
      var i = b * rows
      while (i < (b + 1) * rows) { h ^= sig(i); h *= FnvPrime; i += 1 }
      h
    }
    new GenericInternalRow(Array[Any](new GenericArrayData(sig), new GenericArrayData(bandHash)))
  }

  def simhash64(text: UTF8String, k: Int): Long = {
    val ws = words(text)
    val votes = new Array[Int](64)
    if (ws.nonEmpty) {
      val last = math.max(ws.length - k, 0)
      var w = 0
      while (w <= last) {
        val h = fnvWindow(ws, w, math.min(w + k, ws.length))
        var b = 0
        while (b < 64) { if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1; b += 1 }
        w += 1
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }
}

/** Shingle array with codegen; null text behaves as empty text (empty
  * array, never null — matching the UDF it replaces, where dedup must not
  * pair all null-text docs via a null bucket). */
case class ShingleArray(child: Expression, k: Int, distinct: Boolean)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any =
    ShingleKernel.shingleArray(child.eval(input).asInstanceOf[UTF8String], k, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = code"""
      ${c.code}
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
        graft.functions.ShingleKernel.shingleArray(
          ${c.isNull} ? null : ${c.value}, $k, $distinct);
      """, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Fused text -> (minhash signature, band-bucket hashes) with codegen. */
case class MinHashSigBands(child: Expression, k: Int, numHashes: Int, bands: Int)
    extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("_1", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("_2", ArrayType(LongType, containsNull = false), nullable = false)))
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any =
    ShingleKernel.minhashSigBands(child.eval(input).asInstanceOf[UTF8String], k, numHashes, bands)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = code"""
      ${c.code}
      InternalRow ${ev.value} =
        graft.functions.ShingleKernel.minhashSigBands(
          ${c.isNull} ? null : ${c.value}, $k, $numHashes, $bands);
      """, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Fused text -> 64-bit SimHash with codegen. */
case class SimHash64(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any =
    ShingleKernel.simhash64(child.eval(input).asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = code"""
      ${c.code}
      long ${ev.value} =
        graft.functions.ShingleKernel.simhash64(
          ${c.isNull} ? null : ${c.value}, $k);
      """, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
