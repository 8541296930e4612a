package graft.sources

/** PDF function objects (ISO 32000-1 §7.10) — the evaluation engine
  * behind /Separation tint transforms in the raster re-wrap (spot
  * colors are the print-origin class PyMuPDF renders through the
  * alternate space). Types supported:
  *
  *   - Type 2 (exponential interpolation): C0 + x^N · (C1 − C0)
  *   - Type 0 (sampled): 1-input n-output LUT streams, BitsPerSample
  *     1/2/4/8/16, linear interpolation, Encode/Decode defaults per
  *     Table 39
  *   - Type 3 (stitching): 1-input piecewise composition of the above
  *
  * Type 4 (PostScript calculator) and multi-input sampled functions
  * yield None — fail closed, the same contract as the rest of MiniPdf.
  * Evaluation clamps inputs to Domain and outputs to Range (§7.10.1),
  * exactly as a conformant renderer does. */
object PdfFunction {

  /** A compiled 1-input function: t (already Domain-clamped by the
    * evaluator) → output vector. */
  type Fn1 = Double => Array[Double]

  private def numList(s: String, key: String): Option[Array[Double]] = {
    val at = s.indexOf(key)
    if (at < 0) return None
    val open = s.indexOf('[', at + key.length)
    if (open < 0) return None
    // reject if anything but whitespace sits between key and '['
    if (s.substring(at + key.length, open).exists(!_.isWhitespace)) return None
    val close = s.indexOf(']', open)
    if (close < 0) return None
    val body = s.substring(open + 1, close).trim
    if (body.isEmpty) return Some(Array.empty)
    try Some(body.split("\\s+").map(_.toDouble))
    catch { case _: NumberFormatException => None }
  }

  private def clamp(v: Double, lo: Double, hi: Double): Double =
    if (v < lo) lo else if (v > hi) hi else v

  private def interp(x: Double, x0: Double, x1: Double,
                     y0: Double, y1: Double): Double =
    if (x1 == x0) y0 else y0 + (x - x0) * (y1 - y0) / (x1 - x0)

  /** Compile the function at object `num` (dict or stream object) into
    * a Domain-clamping evaluator. `depth` caps Type-3 recursion. */
  def build(objs: Map[Int, MiniPdf.PdfObj], num: Int,
            depth: Int = 0): Option[Fn1] = {
    if (depth > 4) return None
    val o = objs.getOrElse(num, return None)
    val d = o.dict
    val domain = numList(d, "/Domain").filter(_.length >= 2).getOrElse(return None)
    val (d0, d1) = (domain(0), domain(1))
    val ftype = """/FunctionType\s+(\d+)""".r.findFirstMatchIn(d)
      .map(_.group(1).toInt).getOrElse(return None)
    ftype match {
      case 2 =>
        val c0 = numList(d, "/C0").getOrElse(Array(0.0))
        val c1 = numList(d, "/C1").getOrElse(Array(1.0))
        if (c0.length != c1.length || c0.isEmpty) return None
        val n = """/N\s+([-0-9.]+)""".r.findFirstMatchIn(d)
          .map(_.group(1).toDouble).getOrElse(return None)
        Some { t0 =>
          val t = clamp(t0, d0, d1)
          val xn = math.pow(t, n)
          Array.tabulate(c0.length)(j => c0(j) + xn * (c1(j) - c0(j)))
        }
      case 0 =>
        val range = numList(d, "/Range").filter(r => r.length >= 2 && r.length % 2 == 0)
          .getOrElse(return None)
        val nOut = range.length / 2
        val size = numList(d, "/Size").filter(_.length == 1) // 1-input only
          .map(_(0).toInt).getOrElse(return None)
        if (size < 1 || size > 65536) return None
        val bps = intKey(d, "/BitsPerSample").getOrElse(return None)
        if (!Set(1, 2, 4, 8, 16).contains(bps)) return None
        val encode = numList(d, "/Encode").filter(_.length >= 2)
          .getOrElse(Array(0.0, (size - 1).toDouble))
        val decode = numList(d, "/Decode").filter(_.length == range.length)
          .getOrElse(range)
        val data = MiniPdf.decodedStream(o)
        val needBits = size.toLong * nOut * bps
        if (data.length.toLong * 8 < needBits) return None
        val maxV = (1L << bps) - 1
        def sample(idx: Int, j: Int): Double = {
          val bit = (idx.toLong * nOut + j) * bps
          var v = 0L
          var k = 0L
          while (k < bps) {
            val b = data(((bit + k) >> 3).toInt) & 0xff
            v = (v << 1) | ((b >> (7 - ((bit + k) & 7))) & 1)
            k += 1
          }
          v.toDouble
        }
        Some { t0 =>
          val t = clamp(t0, d0, d1)
          val e = clamp(interp(t, d0, d1, encode(0), encode(1)), 0, size - 1)
          val i0 = math.min(e.toInt, size - 1)
          val i1 = math.min(i0 + 1, size - 1)
          val frac = e - i0
          Array.tabulate(nOut) { j =>
            val raw = sample(i0, j) + frac * (sample(i1, j) - sample(i0, j))
            clamp(interp(raw, 0, maxV.toDouble, decode(2 * j), decode(2 * j + 1)),
              range(2 * j), range(2 * j + 1))
          }
        }
      case 3 =>
        val funcRefs = {
          val at = d.indexOf("/Functions")
          if (at < 0) return None
          val open = d.indexOf('[', at)
          val close = if (open < 0) -1 else d.indexOf(']', open)
          if (close < 0) return None
          """(\d+)\s+\d+\s+R""".r.findAllMatchIn(d.substring(open, close))
            .map(_.group(1).toInt).toArray
        }
        if (funcRefs.isEmpty) return None
        val bounds = numList(d, "/Bounds").getOrElse(return None)
        val encode = numList(d, "/Encode").getOrElse(return None)
        if (bounds.length != funcRefs.length - 1 ||
            encode.length != 2 * funcRefs.length) return None
        val subs = funcRefs.map(build(objs, _, depth + 1))
        if (subs.exists(_.isEmpty)) return None
        val fns = subs.map(_.get)
        Some { t0 =>
          val t = clamp(t0, d0, d1)
          var k = 0
          while (k < bounds.length && t >= bounds(k)) k += 1
          val lo = if (k == 0) d0 else bounds(k - 1)
          val hi = if (k == bounds.length) d1 else bounds(k)
          val e = interp(t, lo, hi, encode(2 * k), encode(2 * k + 1))
          fns(k)(e)
        }
      case _ => None // Type 4 (PostScript) and unknown types: fail closed
    }
  }

  private def intKey(d: String, key: String): Option[Int] =
    (key + """\s+(\d+)""").r.findFirstMatchIn(d).map(_.group(1).toInt)
}
