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

  /** Tri-state key parse, so "absent" (→ spec default) never conflates
    * with "present but indirect/malformed" (→ fail closed — a /C0
    * carried as `9 0 R` must NOT silently become the default and
    * fabricate colors): Right(None) = absent, Right(Some(xs)) = parsed
    * inline array, Left(()) = present but not an inline numeric array. */
  private def numList(s: String, key: String)
      : Either[Unit, Option[Array[Double]]] = {
    val at = (java.util.regex.Pattern.quote(key) + """(?![A-Za-z0-9])""").r
      .findFirstMatchIn(s).map(_.start).getOrElse(return Right(None))
    val open = s.indexOf('[', at + key.length)
    // anything but whitespace between key and '[' (or no '[' at all):
    // an indirect ref or non-array value — present but unusable
    if (open < 0 ||
        s.substring(at + key.length, open).exists(!_.isWhitespace))
      return Left(())
    val close = s.indexOf(']', open)
    if (close < 0) return Left(())
    val body = s.substring(open + 1, close).trim
    if (body.isEmpty) return Right(Some(Array.empty))
    try Right(Some(body.split("\\s+").map(_.toDouble)))
    catch { case _: NumberFormatException => Left(()) }
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
    val domain = numList(d, "/Domain") match {
      case Right(Some(a)) if a.length >= 2 => a
      case _ => return None // required, inline
    }
    val (d0, d1) = (domain(0), domain(1))
    val ftype = """/FunctionType\s+(\d+)""".r.findFirstMatchIn(d)
      .map(_.group(1).toInt).getOrElse(return None)
    ftype match {
      case 2 =>
        val c0 = numList(d, "/C0") match {
          case Right(None) => Array(0.0)
          case Right(Some(a)) if a.nonEmpty => a
          case _ => return None
        }
        val c1 = numList(d, "/C1") match {
          case Right(None) => Array(1.0)
          case Right(Some(a)) if a.nonEmpty => a
          case _ => return None
        }
        if (c0.length != c1.length) return None
        // the lookahead rejects an indirect `/N 9 0 R` (a bare-regex
        // read would otherwise treat the object NUMBER as the exponent)
        val n = """/N\s+([-0-9.]+)(?!\s+\d+\s+R)""".r.findFirstMatchIn(d)
          .map(_.group(1).toDouble).getOrElse(return None)
        Some { t0 =>
          val t = clamp(t0, d0, d1)
          val xn = math.pow(t, n)
          Array.tabulate(c0.length)(j => c0(j) + xn * (c1(j) - c0(j)))
        }
      case 0 =>
        val range = numList(d, "/Range") match {
          case Right(Some(a)) if a.length >= 2 && a.length % 2 == 0 => a
          case _ => return None // required, inline
        }
        val nOut = range.length / 2
        val size = numList(d, "/Size") match {
          case Right(Some(a)) if a.length == 1 => a(0).toInt // 1-input only
          case _ => return None
        }
        if (size < 1 || size > 65536) return None
        val bps = intKey(d, "/BitsPerSample").getOrElse(return None)
        if (!Set(1, 2, 4, 8, 16).contains(bps)) return None
        val encode = numList(d, "/Encode") match {
          case Right(None) => Array(0.0, (size - 1).toDouble)
          case Right(Some(a)) if a.length >= 2 => a
          case _ => return None
        }
        val decode = numList(d, "/Decode") match {
          case Right(None) => range
          case Right(Some(a)) if a.length == range.length => a
          case _ => return None
        }
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
        val bounds = numList(d, "/Bounds") match {
          case Right(Some(a)) => a
          case _ => return None // required, inline
        }
        val encode = numList(d, "/Encode") match {
          case Right(Some(a)) => a
          case _ => return None // required, inline
        }
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
