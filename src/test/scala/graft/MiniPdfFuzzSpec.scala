package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{AutoPdfDecoder, MiniPdfDecoder}
import java.nio.charset.StandardCharsets.ISO_8859_1

/** Adversarial-input hardening for the real PDF decoder: at corpus
  * scale the decoder sees truncated downloads, bit-rotted bytes, and
  * crafted bombs. Every input here must produce Left or Right —
  * never an uncaught throw, never unbounded memory. Seeded RNG keeps
  * the suite deterministic. */
class MiniPdfFuzzSpec extends AnyFunSuite {

  private val decoder = MiniPdfDecoder()

  private def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(data); d.finish()
    val bos = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) bos.write(buf, 0, d.deflate(buf))
    d.end()
    bos.toByteArray
  }

  /** A small valid two-page PDF used as the mutation baseline. */
  private val validPdf: Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = bos.write(s.getBytes(ISO_8859_1))
    w("%PDF-1.4\n")
    w("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    w("2 0 obj\n<< /Type /Pages /Kids [ 3 0 R 5 0 R ] /Count 2 >>\nendobj\n")
    w("3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n")
    val c1 = deflate("BT (First page text) Tj ET".getBytes(ISO_8859_1))
    w(s"4 0 obj\n<< /Length ${c1.length} /Filter /FlateDecode >>\nstream\n")
    bos.write(c1); w("\nendstream\nendobj\n")
    w("5 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 6 0 R >>\nendobj\n")
    w("6 0 obj\n<< /Length 24 >>\nstream\nBT (Second page) Tj ET\nendstream\nendobj\n")
    w("trailer\n<< /Size 7 /Root 1 0 R >>\n%%EOF\n")
    bos.toByteArray
  }

  test("baseline document decodes (sanity for the mutation tests)") {
    val Right(pages) = decoder.decode(validPdf)
    assert(pages == Seq("<div><p>First page text</p></div>", "<div><p>Second page</p></div>"))
  }

  test("bit-flip fuzz over the r16 color/function dict shapes never " +
       "throws (Separation/DeviceN tints, SMask, JBIG2 image)") {
    val ISO = ISO_8859_1
    val rnd = new scala.util.Random(163)
    def pdf(imgDict: String, img: Array[Byte],
            extra: Seq[(Int, String, Option[Array[Byte]])]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      def w(s: String): Unit = bos.write(s.getBytes(ISO))
      val content = "q 8 0 0 8 0 0 cm /Im1 Do Q"
      w("%PDF-1.5\n")
      for ((num, dict, stream) <- Seq(
        (1, "<< /Type /Catalog /Pages 2 0 R >>", None),
        (2, "<< /Type /Pages /Kids [ 3 0 R ] /Count 1 >>", None),
        (3, "<< /Type /Page /Parent 2 0 R /Contents 4 0 R " +
          "/Resources << /XObject << /Im1 5 0 R >> >> >>", None),
        (4, s"<< /Length ${content.length} >>", Some(content.getBytes(ISO))),
        (5, s"$imgDict /Length ${img.length} >>", Some(img))) ++ extra) {
        w(s"$num 0 obj\n$dict\n")
        stream.foreach { st => w("stream\n"); bos.write(st); w("\nendstream\n") }
        w("endobj\n")
      }
      w("trailer\n<< /Root 1 0 R >>\n%%EOF\n")
      bos.toByteArray
    }
    val prog1 = "{ 1 exch sub }".getBytes(ISO)
    val prog = "{ add 0.5 mul 1 exch sub }".getBytes(ISO)
    val mask = Array[Byte](10, 20, 30, 40)
    val jb = graft.sources.Jbig2.encodeEmbeddedText(
      Seq((2, 2, Array(true, false, true, true))), Seq((0, 1, 1)), 6, 4)
    val fixtures = Seq(
      pdf("<< /Subtype /Image /Width 2 /Height 2 /BitsPerComponent 8 " +
        "/ColorSpace [/Separation /Ink /DeviceGray 8 0 R]",
        Array[Byte](10, 60, 110, (160).toByte),
        Seq((8, "<< /FunctionType 4 /Domain [0 1] /Range [0 1] " +
          s"/Length ${prog1.length} >>", Some(prog1)))),
      pdf("<< /Subtype /Image /Width 2 /Height 1 /BitsPerComponent 8 " +
        "/ColorSpace [/DeviceN [/A /B] /DeviceGray 8 0 R]",
        Array[Byte](5, 50, 100, (200).toByte),
        Seq((8, "<< /FunctionType 4 /Domain [0 1 0 1] /Range [0 1] " +
          s"/Length ${prog.length} >>", Some(prog)))),
      pdf("<< /Subtype /Image /Width 2 /Height 2 /BitsPerComponent 8 " +
        "/ColorSpace /DeviceRGB /SMask 7 0 R",
        Array.fill[Byte](12)(99),
        Seq((7, "<< /Subtype /Image /Width 2 /Height 2 " +
          s"/BitsPerComponent 8 /ColorSpace /DeviceGray /Length 4 >>",
          Some(mask)))),
      pdf("<< /Subtype /Image /Width 6 /Height 4 /BitsPerComponent 1 " +
        "/ColorSpace /DeviceGray /Filter /JBIG2Decode", jb, Nil))
    val dec = graft.sources.MiniPdfDecoder()
    for ((f, fi) <- fixtures.zipWithIndex) {
      // sanity: the unmutated fixture decodes with one image payload
      assert(dec.decodeWithImages(f).exists(_.flatMap(_._2).nonEmpty),
        s"fixture $fi must be valid before mutation")
      for (_ <- 0 until 150) {
        val m = f.clone()
        m(rnd.nextInt(m.length)) = (m(rnd.nextInt(m.length)) ^
          (1 << rnd.nextInt(8))).toByte
        dec.decodeWithImages(m) // Either way, never throw / never hang
      }
    }
  }

  test("random byte soup never throws (with and without %PDF- header)") {
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 300) {
      val len = rnd.nextInt(4096)
      val bytes = new Array[Byte](len)
      rnd.nextBytes(bytes)
      if (trial % 2 == 0 && len >= 5)
        System.arraycopy("%PDF-".getBytes(ISO_8859_1), 0, bytes, 0, 5)
      val r = decoder.decode(bytes) // must not throw
      assert(r.isLeft || r.isRight)
    }
  }

  test("every truncation point of a valid PDF fails closed or decodes") {
    for (cut <- 0 until validPdf.length by 7) {
      val r = decoder.decode(validPdf.take(cut))
      assert(r.isLeft || r.isRight, s"threw at cut=$cut")
    }
  }

  test("seeded single-byte mutations never throw") {
    val rnd = new scala.util.Random(7)
    for (_ <- 0 until 400) {
      val mutated = validPdf.clone()
      mutated(rnd.nextInt(mutated.length)) = rnd.nextInt(256).toByte
      val r = decoder.decode(mutated)
      assert(r.isLeft || r.isRight)
    }
  }

  test("seeded random splices (chunk deletion/duplication) never throw") {
    val rnd = new scala.util.Random(1234)
    for (_ <- 0 until 100) {
      val a = rnd.nextInt(validPdf.length)
      val b = a + rnd.nextInt(validPdf.length - a)
      val spliced =
        if (rnd.nextBoolean()) validPdf.take(a) ++ validPdf.drop(b) // delete [a,b)
        else validPdf.take(b) ++ validPdf.slice(a, b) ++ validPdf.drop(b) // duplicate
      val r = decoder.decode(spliced)
      assert(r.isLeft || r.isRight)
    }
  }

  test("Flate decompression bomb fails CLOSED, bounded memory") {
    // ~200 MiB of zeros deflates to ~200 KiB; decode must abort at the
    // 128 MiB cap with a descriptive Left, not OOM.
    val zeros = new Array[Byte](200 << 20)
    val bomb = deflate(zeros)
    assert(bomb.length < (1 << 20))
    val bos = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = bos.write(s.getBytes(ISO_8859_1))
    w("%PDF-1.4\n")
    w("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    w("2 0 obj\n<< /Type /Pages /Kids [ 3 0 R ] /Count 1 >>\nendobj\n")
    w("3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n")
    w(s"4 0 obj\n<< /Length ${bomb.length} /Filter /FlateDecode >>\nstream\n")
    bos.write(bomb); w("\nendstream\nendobj\n")
    w("trailer\n<< /Size 5 /Root 1 0 R >>\n%%EOF\n")
    decoder.decode(bos.toByteArray) match {
      case Left(msg) => assert(msg.contains("cannot open document"))
      case Right(_) => fail("bomb should not decode")
    }
  }

  test("RunLength bomb via stacked filter chain fails CLOSED") {
    // 2-byte RLE runs expand 64x per pass; an 8-deep crafted chain
    // would be 64^8. The chain cap + per-pass cap must stop it.
    val run = Array.fill(4096)(Array[Byte](0x81.toByte, 0x41)).flatten // 4 KiB -> 512 KiB/pass
    val filters = Seq.fill(12)("/RunLengthDecode").mkString(" ")
    val bos = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = bos.write(s.getBytes(ISO_8859_1))
    w("%PDF-1.4\n")
    w("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    w("2 0 obj\n<< /Type /Pages /Kids [ 3 0 R ] /Count 1 >>\nendobj\n")
    w("3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n")
    w(s"4 0 obj\n<< /Length ${run.length} /Filter [ $filters ] >>\nstream\n")
    bos.write(run); w("\nendstream\nendobj\n")
    w("trailer\n<< /Size 5 /Root 1 0 R >>\n%%EOF\n")
    val t0 = System.nanoTime()
    val r = decoder.decode(bos.toByteArray)
    val sec = (System.nanoTime() - t0) / 1e9
    assert(r.isLeft || r.isRight)
    assert(sec < 60.0, s"RLE chain took $sec s — bomb cap not effective")
  }

  test("LZW kernel: random byte soup never throws, never hangs, output bounded") {
    val rnd = new scala.util.Random(314L)
    for (_ <- 0 until 300) {
      val bytes = new Array[Byte](rnd.nextInt(2048))
      rnd.nextBytes(bytes)
      val t0 = System.nanoTime()
      val out = graft.sources.MiniPdf.lzwDecode(bytes, rnd.nextInt(2)) // must not throw
      assert((System.nanoTime() - t0) / 1e9 < 10.0, "LZW fuzz input hung")
      // random codes mostly hit the corrupt-code salvage path quickly;
      // whatever survives is bounded by construction (cap would throw
      // IllegalStateException, which decode() maps to a Left — but at
      // 2 KB of input the cap is unreachable: each code emits <= 4096 B)
      assert(out.length <= (2048 * 8 / 9 + 1) * 4096)
    }
  }

  test("self-referential /Parent and /Pages cycles terminate") {
    val bos = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = bos.write(s.getBytes(ISO_8859_1))
    w("%PDF-1.4\n")
    w("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    // Pages node whose Kids include itself, and a Page whose Parent is itself
    w("2 0 obj\n<< /Type /Pages /Kids [ 2 0 R 3 0 R ] /Count 2 >>\nendobj\n")
    w("3 0 obj\n<< /Type /Page /Parent 3 0 R /Contents 4 0 R >>\nendobj\n")
    w("4 0 obj\n<< /Length 20 >>\nstream\nBT (cycle ok) Tj ET\nendstream\nendobj\n")
    w("trailer\n<< /Size 5 /Root 1 0 R >>\n%%EOF\n")
    val r = decoder.decode(bos.toByteArray)
    assert(r.isLeft || r.isRight) // terminated — depth caps held
  }

  test("AutoPdfDecoder routes fuzz garbage to the fallback without throwing") {
    val rnd = new scala.util.Random(99)
    val auto = AutoPdfDecoder()
    for (_ <- 0 until 50) {
      val bytes = new Array[Byte](rnd.nextInt(512))
      rnd.nextBytes(bytes)
      val r = auto.decode(bytes)
      assert(r.isLeft || r.isRight)
    }
  }

  test("bit-flip fuzz over encrypted fixtures never throws (decrypt-path robustness)") {
    // PDF encryption has no integrity check — a flipped ciphertext bit
    // legitimately yields different plaintext — but the decoder must
    // never escape its Either for ANY mutation (torn AES blocks, broken
    // /U hex, truncated /Encrypt dict, garbage ObjStm bodies included)
    val rnd = new scala.util.Random(1234)
    for (fx <- EncryptedPdfFixtures.all; _ <- 0 until 25) {
      val m = fx.pdf.clone()
      val flips = 1 + rnd.nextInt(8)
      for (_ <- 0 until flips) {
        val at = rnd.nextInt(m.length)
        m(at) = (m(at) ^ (1 << rnd.nextInt(8))).toByte
      }
      val r = decoder.decode(m)
      assert(r.isLeft || r.isRight, s"${fx.name}: decoder escaped Either")
    }
  }
}
