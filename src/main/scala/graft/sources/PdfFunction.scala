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
  *   - Type 4 (PostScript calculator): the [[PsCalc]] interpreter —
  *     the full §7.10.5 operator set with degree trig, typed booleans,
  *     if/ifelse blocks, and a stack/op budget against hostile input
  *
  * Multi-input functions (the /DeviceN tint shape) are supported for
  * Type 4 and for Type 0 via MULTILINEAR interpolation ([[buildM]]);
  * everything else fails closed, the same contract as the rest of
  * MiniPdf.
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
        // read would otherwise treat the object NUMBER as the exponent);
        // the possessive `++` keeps backtracking from shortening the
        // token so `/N 12 0 R` can't sneak through as N=1
        val n = """/N\s+([-0-9.]++)(?!\s+\d+\s+R)""".r.findFirstMatchIn(d)
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
      case 4 =>
        // PostScript calculator (§7.10.5) — the most common tint
        // transform in print-origin PDFs. Bounded interpreter: the
        // full spec operator set, degree-based trig, a 100-deep stack
        // and a 10k-op budget per evaluation (hostile programs must
        // not hang an executor). Any type error, stack violation, or
        // budget hit fails the evaluation → the payload drops.
        val range = numList(d, "/Range") match {
          case Right(Some(a)) if a.length >= 2 && a.length % 2 == 0 => a
          case _ => return None // required, inline
        }
        val nOut = range.length / 2
        val src = new String(MiniPdf.decodedStream(o),
          java.nio.charset.StandardCharsets.ISO_8859_1)
        val prog = PsCalc.parse(src).getOrElse(return None)
        Some { t0 =>
          val t = clamp(t0, d0, d1)
          PsCalc.run(prog, Array(t), nOut) match {
            case Some(out) =>
              Array.tabulate(nOut)(j =>
                clamp(out(j), range(2 * j), range(2 * j + 1)))
            case None =>
              // poison the output so the caller's byte-mapping stage
              // (which checks arity) drops the payload
              Array.empty[Double]
          }
        }
      case _ => None // unknown types: fail closed
    }
  }

  /** Compile an m-INPUT function (the /DeviceN tint shape): Type 4
    * programs take m stack inputs; Type 0 LUTs interpolate
    * multilinearly over m dimensions. Types 2/3 are 1-input by spec.
    * The Domain must carry exactly 2m bounds; inputs clamp per
    * §7.10.1. */
  def buildM(objs: Map[Int, MiniPdf.PdfObj], num: Int,
             m: Int): Option[Array[Double] => Array[Double]] = {
    if (m == 1) return build(objs, num).map(f => (in: Array[Double]) => f(in(0)))
    val o = objs.getOrElse(num, return None)
    val d = o.dict
    val ftype = """/FunctionType\s+(\d+)""".r.findFirstMatchIn(d)
      .map(_.group(1).toInt).getOrElse(return None)
    if (ftype != 4 && ftype != 0) return None
    val domain = numList(d, "/Domain") match {
      case Right(Some(a)) if a.length == 2 * m => a
      case _ => return None
    }
    if (ftype == 0) return buildM0(o, d, m, domain)
    val range = numList(d, "/Range") match {
      case Right(Some(a)) if a.length >= 2 && a.length % 2 == 0 => a
      case _ => return None
    }
    val nOut = range.length / 2
    val src = new String(MiniPdf.decodedStream(o),
      java.nio.charset.StandardCharsets.ISO_8859_1)
    val prog = PsCalc.parse(src).getOrElse(return None)
    Some { in =>
      if (in.length != m) Array.empty[Double]
      else {
        val clamped = Array.tabulate(m)(i =>
          clamp(in(i), domain(2 * i), domain(2 * i + 1)))
        PsCalc.run(prog, clamped, nOut) match {
          case Some(out) =>
            Array.tabulate(nOut)(j =>
              clamp(out(j), range(2 * j), range(2 * j + 1)))
          case None => Array.empty[Double]
        }
      }
    }
  }

  /** m-input Type 0: MULTILINEAR interpolation over an m-dimensional
    * sampled LUT (§7.10.2 — "the first dimension varies fastest" in
    * the sample stream; 2^m corner samples weighted by per-dimension
    * fractions). Bounded: m ≤ 4 and ≤ 2^20 total samples. */
  private def buildM0(o: MiniPdf.PdfObj, d: String, m: Int,
      domain: Array[Double]): Option[Array[Double] => Array[Double]] = {
    if (m > 4) return None
    val range = numList(d, "/Range") match {
      case Right(Some(a)) if a.length >= 2 && a.length % 2 == 0 => a
      case _ => return None
    }
    val nOut = range.length / 2
    val sizes = numList(d, "/Size") match {
      case Right(Some(a)) if a.length == m && a.forall(v => v >= 1 && v <= 65536) =>
        a.map(_.toInt)
      case _ => return None
    }
    if (sizes.map(_.toLong).product > (1L << 20)) return None
    val bps = intKey(d, "/BitsPerSample").getOrElse(return None)
    if (!Set(1, 2, 4, 8, 16).contains(bps)) return None
    val encode = numList(d, "/Encode") match {
      case Right(None) => Array.tabulate(2 * m)(i =>
        if (i % 2 == 0) 0.0 else (sizes(i / 2) - 1).toDouble)
      case Right(Some(a)) if a.length == 2 * m => a
      case _ => return None
    }
    val decode = numList(d, "/Decode") match {
      case Right(None) => range
      case Right(Some(a)) if a.length == range.length => a
      case _ => return None
    }
    val data = MiniPdf.decodedStream(o)
    val total = sizes.map(_.toLong).product
    if (data.length.toLong * 8 < total * nOut * bps) return None
    val maxV = (1L << bps) - 1
    def sample(flat: Long, j: Int): Double = {
      val bit = (flat * nOut + j) * bps
      var v = 0L
      var k = 0L
      while (k < bps) {
        val b = data(((bit + k) >> 3).toInt) & 0xff
        v = (v << 1) | ((b >> (7 - ((bit + k) & 7))) & 1)
        k += 1
      }
      v.toDouble
    }
    Some { in =>
      if (in.length != m) Array.empty[Double]
      else {
        val i0 = new Array[Int](m)
        val frac = new Array[Double](m)
        var k = 0
        while (k < m) {
          val t = clamp(in(k), domain(2 * k), domain(2 * k + 1))
          val e = clamp(interp(t, domain(2 * k), domain(2 * k + 1),
            encode(2 * k), encode(2 * k + 1)), 0, sizes(k) - 1)
          i0(k) = math.min(e.toInt, sizes(k) - 1)
          frac(k) = e - i0(k)
          k += 1
        }
        Array.tabulate(nOut) { j =>
          var raw = 0.0
          var corner = 0
          while (corner < (1 << m)) {
            var w = 1.0
            var flat = 0L
            var stride = 1L
            var dim = 0
            while (dim < m) {
              val hi = ((corner >> dim) & 1) == 1
              w *= (if (hi) frac(dim) else 1.0 - frac(dim))
              val idx = math.min(i0(dim) + (if (hi) 1 else 0), sizes(dim) - 1)
              flat += idx * stride // first dimension varies fastest
              stride *= sizes(dim)
              dim += 1
            }
            raw += w * sample(flat, j)
            corner += 1
          }
          clamp(interp(raw, 0, maxV.toDouble, decode(2 * j), decode(2 * j + 1)),
            range(2 * j), range(2 * j + 1))
        }
      }
    }
  }

  private def intKey(d: String, key: String): Option[Int] =
    (key + """\s+(\d+)""").r.findFirstMatchIn(d).map(_.group(1).toInt)
}

/** §7.10.5 PostScript-calculator subset: tokenizer + evaluator for
  * the spec's operator list (arithmetic in doubles, trig in DEGREES,
  * bitwise on integers, booleans as a distinct type, `if`/`ifelse`
  * over nested procedure blocks). No variables, no loops — programs
  * terminate by construction, and an op budget guards crafted
  * pathological nesting. */
private[graft] object PsCalc {
  sealed trait Tok
  final case class Num(v: Double) extends Tok
  final case class Op(name: String) extends Tok
  final case class Block(body: Vector[Tok]) extends Tok

  /** Parse `{ ... }` (the outermost braces are the program);
    * %-comments strip to end-of-line first. */
  def parse(src: String): Option[Vector[Tok]] = {
    val clean = src.split('\n').map(l => l.takeWhile(_ != '%')).mkString(" ")
    val toks = clean.split("""\s+""").filter(_.nonEmpty)
      .flatMap { t => // split glued braces: "{dup" etc.
        t.foldLeft(Vector.empty[String]) { (acc, ch) =>
          if (ch == '{' || ch == '}') acc :+ ch.toString
          else acc.lastOption match {
            case Some(s) if s != "{" && s != "}" => acc.init :+ (s + ch)
            case _ => acc :+ ch.toString
          }
        }
      }
    var pos = 0
    // nesting cap: parse recurses per '{', so a crafted brace bomb
    // would otherwise StackOverflowError PAST the Exception handlers
    def block(depth: Int): Option[Vector[Tok]] = {
      if (depth > 64) return None
      val out = Vector.newBuilder[Tok]
      while (pos < toks.length) {
        toks(pos) match {
          case "{" =>
            pos += 1
            out += Block(block(depth + 1).getOrElse(return None))
          case "}" =>
            pos += 1
            return Some(out.result())
          case w =>
            pos += 1
            out += (try Num(w.toDouble) catch {
              case _: NumberFormatException => Op(w.toLowerCase)
            })
        }
      }
      None // unterminated block
    }
    if (pos >= toks.length || toks(pos) != "{") return None
    pos += 1
    val prog = block(0)
    // trailing garbage after the outer } is malformed
    prog.filter(_ => pos == toks.length)
  }

  /** Run with `inputs` pre-pushed (first input deepest). Returns the
    * top `nOut` stack values, bottom-first, iff the stack holds
    * exactly nOut values at the end. */
  def run(prog: Vector[Tok], inputs: Array[Double], nOut: Int): Option[Array[Double]] = {
    val stack = new scala.collection.mutable.ArrayBuffer[Any](16)
    inputs.foreach(v => stack += (v: java.lang.Double))
    var budget = 10000
    def num(a: Any): Option[Double] = a match {
      case d: java.lang.Double => Some(d.doubleValue)
      case _ => None
    }
    def bool(a: Any): Option[Boolean] = a match {
      case b: java.lang.Boolean => Some(b.booleanValue)
      case _ => None
    }
    def push(v: Double): Boolean = { stack += (v: java.lang.Double); stack.length <= 100 }
    def pushB(v: Boolean): Boolean = { stack += (v: java.lang.Boolean); stack.length <= 100 }
    def pop(): Option[Any] =
      if (stack.isEmpty) None else Some(stack.remove(stack.length - 1))
    def pop2(): Option[(Double, Double)] =
      for (b <- pop(); a <- pop(); bv <- num(b); av <- num(a)) yield (av, bv)
    def pop1(): Option[Double] = pop().flatMap(num)
    def popInts(): Option[(Long, Long)] =
      pop2().map { case (a, b) => (a.toLong, b.toLong) }
    def exec(body: Vector[Tok]): Boolean = {
      for (tok <- body) {
        budget -= 1
        if (budget <= 0) return false
        val ok: Boolean = tok match {
          case Num(v) => push(v)
          case Block(_) =>
            // a bare block only makes sense as an if/ifelse operand;
            // push it for the following conditional to consume
            stack += tok; stack.length <= 100
          case Op(name) => name match {
            case "add" => pop2().exists { case (a, b) => push(a + b) }
            case "sub" => pop2().exists { case (a, b) => push(a - b) }
            case "mul" => pop2().exists { case (a, b) => push(a * b) }
            case "div" => pop2().exists { case (a, b) => b != 0 && push(a / b) }
            case "idiv" => popInts().exists { case (a, b) => b != 0 && push((a / b).toDouble) }
            case "mod" => popInts().exists { case (a, b) => b != 0 && push((a % b).toDouble) }
            case "neg" => pop1().exists(a => push(-a))
            case "abs" => pop1().exists(a => push(math.abs(a)))
            case "sqrt" => pop1().exists(a => a >= 0 && push(math.sqrt(a)))
            case "sin" => pop1().exists(a => push(math.sin(math.toRadians(a))))
            case "cos" => pop1().exists(a => push(math.cos(math.toRadians(a))))
            case "atan" => pop2().exists { case (n, dd) =>
              if (n == 0 && dd == 0) false
              else { val deg = math.toDegrees(math.atan2(n, dd))
                push(if (deg < 0) deg + 360 else deg) } }
            case "exp" => pop2().exists { case (a, b) => push(math.pow(a, b)) }
            case "ln" => pop1().exists(a => a > 0 && push(math.log(a)))
            case "log" => pop1().exists(a => a > 0 && push(math.log10(a)))
            case "ceiling" => pop1().exists(a => push(math.ceil(a)))
            case "floor" => pop1().exists(a => push(math.floor(a)))
            case "round" =>
              // PostScript ties round to the GREATER value, not even
              pop1().exists(a => push(math.floor(a + 0.5)))
            case "truncate" => pop1().exists(a => push(a.toLong.toDouble))
            case "cvi" => pop1().exists(a => push(a.toLong.toDouble))
            case "cvr" => pop1().exists(push)
            case "dup" => pop().exists(a => { stack += a; stack += a; stack.length <= 100 })
            case "pop" => pop().isDefined
            case "exch" =>
              (for (b <- pop(); a <- pop()) yield { stack += b; stack += a; true })
                .getOrElse(false)
            case "copy" => pop1().exists { nRaw =>
              val n = nRaw.toInt
              n >= 0 && n <= stack.length && stack.length + n <= 100 && {
                val from = stack.length - n
                for (i <- 0 until n) stack += stack(from + i)
                true
              } }
            case "index" => pop1().exists { nRaw =>
              val n = nRaw.toInt
              n >= 0 && n < stack.length && {
                stack += stack(stack.length - 1 - n); stack.length <= 100
              } }
            case "roll" =>
              (for (j <- pop1(); n <- pop1()) yield {
                val nn = n.toInt
                nn >= 0 && nn <= stack.length && (nn == 0 || {
                  val jj = ((j.toInt % nn) + nn) % nn
                  val from = stack.length - nn
                  val seg = stack.slice(from, stack.length).toVector
                  val rolled = seg.takeRight(jj) ++ seg.dropRight(jj)
                  for (i <- 0 until nn) stack(from + i) = rolled(i)
                  true
                })
              }).getOrElse(false)
            case "lt" | "le" | "gt" | "ge" =>
              pop2().exists { case (a, b) =>
                pushB(name match {
                  case "lt" => a < b; case "le" => a <= b
                  case "gt" => a > b; case _ => a >= b
                }) }
            case "eq" | "ne" =>
              // eq/ne also accept boolean operands (PLRM semantics)
              (for (b <- pop(); a <- pop()) yield (a, b) match {
                case (x: java.lang.Double, y: java.lang.Double) =>
                  pushB(if (name == "eq") x.doubleValue == y.doubleValue
                        else x.doubleValue != y.doubleValue)
                case (x: java.lang.Boolean, y: java.lang.Boolean) =>
                  pushB(if (name == "eq") x == y else x != y)
                case _ => false
              }).getOrElse(false)
            case "true" => pushB(true)
            case "false" => pushB(false)
            case "not" => pop().exists {
              case b: java.lang.Boolean => pushB(!b.booleanValue)
              case d: java.lang.Double => push((~d.doubleValue.toLong).toDouble)
              case _ => false }
            case "and" | "or" | "xor" =>
              (for (b <- pop(); a <- pop()) yield (a, b) match {
                case (x: java.lang.Boolean, y: java.lang.Boolean) =>
                  pushB(name match {
                    case "and" => x && y; case "or" => x || y
                    case _ => x != y })
                case (x: java.lang.Double, y: java.lang.Double) =>
                  val (xi, yi) = (x.doubleValue.toLong, y.doubleValue.toLong)
                  push((name match {
                    case "and" => xi & yi; case "or" => xi | yi
                    case _ => xi ^ yi }).toDouble)
                case _ => false
              }).getOrElse(false)
            case "bitshift" => popInts().exists { case (a, s) =>
              push((if (s >= 0) a << math.min(s, 63) else a >> math.min(-s, 63)).toDouble) }
            case "if" =>
              (for (proc <- pop(); cond <- pop(); c <- bool(cond)) yield proc match {
                case Block(body) => !c || exec(body)
                case _ => false
              }).getOrElse(false)
            case "ifelse" =>
              (for (p2 <- pop(); p1 <- pop(); cond <- pop(); c <- bool(cond))
                yield (p1, p2) match {
                  case (Block(b1), Block(b2)) => exec(if (c) b1 else b2)
                  case _ => false
                }).getOrElse(false)
            case _ => false // unknown operator: fail closed
          }
        }
        if (!ok) return false
      }
      true
    }
    if (!exec(prog)) return None
    if (stack.length != nOut) return None
    val out = new Array[Double](nOut)
    for (i <- 0 until nOut) num(stack(i)) match {
      case Some(v) => out(i) = v
      case None => return None
    }
    Some(out)
  }
}
