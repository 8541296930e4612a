package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{AutoPdfDecoder, MiniPdf, MiniPdfDecoder, PdfCrypt}
import java.nio.charset.StandardCharsets.ISO_8859_1

/** Executes PdfCrypt's REAL decrypt paths against ciphertext produced
  * by an independent implementation (scripts/gen_encrypted_pdfs.py:
  * Python hashlib + the cryptography package, from the public ISO
  * 32000 algorithms). Every supported variant must decrypt to the
  * exact planted text AND derive the exact file key the generator
  * recorded — the cross-pinning discipline: a symmetric bug in
  * PdfCrypt's Algorithm 2 / 2.B derivation would produce a different
  * key than Python's and turn the planted text into garbage, failing
  * both assertions. A non-empty user password must fail CLOSED. */
class PdfCryptSpec extends AnyFunSuite {

  private def encDictOf(pdf: Array[Byte]): String =
    MiniPdf.parseObjects(pdf)(5).dict

  for (fx <- EncryptedPdfFixtures.all) {
    test(s"${fx.name}: decrypts to the exact planted text") {
      assert(MiniPdfDecoder().decode(fx.pdf) ==
        Right(Seq(s"<div><p>${fx.text}</p></div>")))
    }

    test(s"${fx.name}: derived file key matches the independent Python derivation") {
      val raw = new String(fx.pdf, ISO_8859_1)
      val dec = PdfCrypt.decryptorFor(raw, encDictOf(fx.pdf))
      assert(dec.isDefined, "decryptorFor failed on a supported variant")
      assert(dec.get.fileKey.map(b => f"$b%02x").mkString == fx.fileKeyHex)
      assert(dec.get.streamsEncrypted)
    }
  }

  test("variant coverage: RC4-40, RC4-128, AESV2, V4-RC4, EncryptMetadata-false, " +
       "R5, R6, encrypted ObjStm") {
    assert(EncryptedPdfFixtures.all.map(_.name).toSet ==
      Set("rc4_40", "rc4_128", "aesv2", "rc4_v4", "aesv2_nometa",
          "aesv3_r5", "aesv3_r6", "objstm_rc4"))
    // the ObjStm fixture's page tree is INSIDE the encrypted object
    // stream: a decryptor that deciphers streams after ObjStm expansion
    // (wrong order) would find no pages at all
  }

  test("EncryptMetadata false: flag surfaces on the Decryptor and the key differs " +
       "from the metadata-encrypted derivation") {
    val nometa = EncryptedPdfFixtures.all.find(_.name == "aesv2_nometa").get
    val meta = EncryptedPdfFixtures.all.find(_.name == "aesv2").get
    val d = PdfCrypt.decryptorFor(new String(nometa.pdf, ISO_8859_1),
      encDictOf(nometa.pdf)).get
    assert(!d.encryptMetadata)
    // R4 key derivation mixes in FF FF FF FF only when metadata is
    // unencrypted — the two fixtures must not share a key
    assert(nometa.fileKeyHex != meta.fileKeyHex)
    // the plaintext /Metadata stream survives decode untouched (the
    // decryptor skips /Type /Metadata streams instead of garbling them)
    val objs = MiniPdf.parseObjects(nometa.pdf)
    assert(new String(objs(6).stream.get, ISO_8859_1).contains("xmpmeta"))
  }

  test("non-empty user password (wrong /U) fails CLOSED with 'encrypted'") {
    val res = MiniPdfDecoder().decode(EncryptedPdfFixtures.wrongU)
    assert(res.isLeft && res.swap.toOption.get.contains("encrypted"))
    // and never fabricates text
    assert(PdfCrypt.decryptorFor(
      new String(EncryptedPdfFixtures.wrongU, ISO_8859_1),
      encDictOf(EncryptedPdfFixtures.wrongU)).isEmpty)
  }

  test("/StmF absent while /CF present: spec default /Identity — plaintext " +
       "streams decode as-is, never ciphertext-as-garbage") {
    assert(MiniPdfDecoder().decode(EncryptedPdfFixtures.stmfAbsent) ==
      Right(Seq("<div><p>StmF absent plaintext sesame</p></div>")))
  }

  test("/StmF naming a custom crypt filter fails CLOSED") {
    val base = new String(
      EncryptedPdfFixtures.all.find(_.name == "aesv2").get.pdf, ISO_8859_1)
    val custom = base.replace("/StmF /StdCF", "/StmF /MyCF")
    val res = MiniPdfDecoder().decode(custom.getBytes(ISO_8859_1))
    assert(res.isLeft && res.swap.toOption.get.contains("encrypted"))
  }

  test("corrupted /U (bit-flipped password check) fails CLOSED for every variant") {
    for (fx <- EncryptedPdfFixtures.all) {
      val raw = new String(fx.pdf, ISO_8859_1)
      val uAt = raw.indexOf("/U <")
      val flipped = raw.substring(0, uAt + 4) +
        (if (raw.charAt(uAt + 4) == '0') '1' else '0') + raw.substring(uAt + 5)
      // flipping the first /U byte breaks the empty-password check
      val res = MiniPdfDecoder().decode(flipped.getBytes(ISO_8859_1))
      assert(res.isLeft && res.swap.toOption.get.contains("encrypted"),
        s"${fx.name}: corrupt /U must fail closed")
    }
  }

  test("end-to-end: encrypted PDFs decode through DocPipeline.decodePages") {
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rows = EncryptedPdfFixtures.all.map(fx => (fx.name, fx.pdf)) :+
      ("locked", EncryptedPdfFixtures.wrongU)
    val df = rows.toDF("id", "payload")
    val out = graft.operators.DocPipeline
      .decodePages(df, AutoPdfDecoder(), "payload")
      .select(col("id"), col("pages"), col("decode_error"))
      .collect().map(r => r.getString(0) ->
        (Option(r.getSeq[String](1)), Option(r.getString(2)))).toMap
    for (fx <- EncryptedPdfFixtures.all)
      assert(out(fx.name)._1.get == Seq(s"<div><p>${fx.text}</p></div>"))
    assert(out("locked")._1.isEmpty &&
      out("locked")._2.get.contains("encrypted"))
  }
}
