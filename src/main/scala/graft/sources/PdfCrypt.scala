package graft.sources

import java.nio.charset.StandardCharsets.ISO_8859_1
import java.security.MessageDigest
import javax.crypto.Cipher
import javax.crypto.spec.{IvParameterSpec, SecretKeySpec}

/** PDF standard security handler (ISO 32000-1 §7.6.3, ISO 32000-2
  * §7.6.4), EMPTY-user-password decryption — the dominant crawled-PDF
  * case: such files are "encrypted" only to carry owner permissions,
  * and PyMuPDF opens them transparently (ref
  * `/root/reference/doc2dataset/downloader.py:385`, `fitz.open` needs
  * no password). Covered:
  *
  *   - V1/V2 + R2/R3: RC4, 40–128-bit keys (Algorithms 2, 4, 5)
  *   - V4 + R4: `/CF /StdCF /CFM` `/V2` (RC4) or `/AESV2`
  *     (AES-128-CBC, 16-byte IV prefix), `/EncryptMetadata` honored
  *     in key derivation
  *   - V5 + R5/R6: `/AESV3` AES-256-CBC; R6's hardened iterative hash
  *     (Algorithm 2.B) for the password check and the `/UE`-wrapped
  *     file key
  *
  * A non-empty user password (U check fails), a non-/Standard filter,
  * or an unknown V fails CLOSED — [[MiniPdfDecoder]] surfaces
  * `cannot open document: encrypted`, the reference's
  * `failed_to_extract` channel with a distinguishing message. All
  * algorithms are pure JDK (MessageDigest MD5/SHA-2, javax.crypto
  * AES-CBC; RC4 hand-rolled — the JDK's ARCFOUR cipher may be absent
  * from hardened JREs).
  */
object PdfCrypt {

  /** §7.6.3.3 Algorithm 2 padding constant. */
  private val Pad: Array[Byte] = Array(
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
    0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
    0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A).map(_.toByte)

  /** Stream-decryption handle: (objNum, gen, raw) → plaintext.
    * `encryptMetadata=false` means the `/Metadata` stream is stored as
    * PLAINTEXT (ISO 32000-1 §7.6.3.2) — callers must skip it, or
    * decryptStream would garble it. */
  final case class Decryptor(fileKey: Array[Byte], v: Int, aes: Boolean,
                             streamsEncrypted: Boolean,
                             encryptMetadata: Boolean = true) {
    def decryptStream(num: Int, gen: Int, data: Array[Byte]): Array[Byte] = {
      if (!streamsEncrypted || data.isEmpty) return data
      if (v >= 5) aesDecrypt(fileKey, data)
      else {
        val key = objectKey(fileKey, num, gen, aes)
        if (aes) aesDecrypt(key, data) else rc4(key, data)
      }
    }
  }

  // ------------------------------------------------------------ ciphers

  private[sources] def rc4(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val s = Array.tabulate(256)(_.toByte)
    var j = 0
    var i = 0
    while (i < 256) {
      j = (j + s(i) + key(i % key.length)) & 0xff
      val t = s(i); s(i) = s(j); s(j) = t
      i += 1
    }
    val out = new Array[Byte](data.length)
    var x = 0; var y = 0; var k = 0
    while (k < data.length) {
      x = (x + 1) & 0xff
      y = (y + s(x)) & 0xff
      val t = s(x); s(x) = s(y); s(y) = t
      out(k) = (data(k) ^ s((s(x) + s(y)) & 0xff)).toByte
      k += 1
    }
    out
  }

  /** AES-CBC with the PDF convention: 16-byte IV prefixed to the
    * ciphertext, PKCS#7 padding stripped (tolerantly — a corrupt pad
    * keeps the bytes rather than throwing mid-corpus). */
  private[sources] def aesDecrypt(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    if (data.length < 32 || (data.length % 16) != 0)
      return Array.emptyByteArray // torn AES block stream: no plaintext
    val c = Cipher.getInstance("AES/CBC/NoPadding")
    c.init(Cipher.DECRYPT_MODE, new SecretKeySpec(key, "AES"),
      new IvParameterSpec(java.util.Arrays.copyOfRange(data, 0, 16)))
    val plain = c.doFinal(data, 16, data.length - 16)
    val pad = plain.last & 0xff
    if (pad >= 1 && pad <= 16 && pad <= plain.length)
      java.util.Arrays.copyOfRange(plain, 0, plain.length - pad)
    else plain
  }

  private def md5(parts: Array[Byte]*): Array[Byte] = {
    val d = MessageDigest.getInstance("MD5")
    parts.foreach(d.update)
    d.digest()
  }

  private def sha(alg: String, parts: Array[Byte]*): Array[Byte] = {
    val d = MessageDigest.getInstance(alg)
    parts.foreach(d.update)
    d.digest()
  }

  // --------------------------------------------- key derivation (V ≤ 4)

  private def intLE(v: Long, n: Int): Array[Byte] =
    Array.tabulate(n)(i => ((v >>> (8 * i)) & 0xff).toByte)

  /** Algorithm 2: file key from the (empty) user password. */
  private[sources] def fileKeyClassic(o: Array[Byte], p: Long, id0: Array[Byte],
                                      r: Int, keyBytes: Int,
                                      encryptMetadata: Boolean): Array[Byte] = {
    val base = md5(Pad, o.take(32), intLE(p, 4), id0,
      if (r >= 4 && !encryptMetadata) Array(0xff.toByte, 0xff.toByte, 0xff.toByte, 0xff.toByte)
      else Array.emptyByteArray)
    var key = base
    if (r >= 3) {
      var i = 0
      while (i < 50) { key = md5(key.take(keyBytes)); i += 1 }
    }
    key.take(keyBytes)
  }

  /** Algorithms 4 (R2) / 5 (R3+): expected /U for the empty user
    * password; compare first 16 bytes for R3+. */
  private[sources] def userValueClassic(key: Array[Byte], id0: Array[Byte],
                                        r: Int): Array[Byte] = {
    if (r == 2) rc4(key, Pad)
    else {
      var u = rc4(key, md5(Pad, id0))
      var i = 1
      while (i <= 19) {
        u = rc4(key.map(b => (b ^ i).toByte), u)
        i += 1
      }
      u
    }
  }

  /** §7.6.2 Algorithm 1: per-object key (V ≤ 4). */
  private[sources] def objectKey(fileKey: Array[Byte], num: Int, gen: Int,
                                 aes: Boolean): Array[Byte] = {
    val salt = if (aes) Array[Byte](0x73, 0x41, 0x6C, 0x54) else Array.emptyByteArray
    md5(fileKey, intLE(num.toLong, 3), intLE(gen.toLong, 2), salt)
      .take(math.min(fileKey.length + 5, 16))
  }

  // ------------------------------------------------ key derivation (V5)

  /** ISO 32000-2 Algorithm 2.B: the R6 hardened hash. `udata` is empty
    * for the user-password computations. */
  private[sources] def hash2B(pw: Array[Byte], salt: Array[Byte],
                              udata: Array[Byte]): Array[Byte] = {
    var k = sha("SHA-256", pw, salt, udata)
    var round = 0
    var lastE = 0
    var done = false
    // hoisted out of the ≥64-round loop (r16): Cipher.getInstance and
    // MessageDigest.getInstance do provider lookups per call — inside
    // the loop they dominated the KDF (~3× the actual crypto work);
    // a 100 TB crawl pays this hash on EVERY R6 file it opens
    val c = Cipher.getInstance("AES/CBC/NoPadding")
    val digests = Array("SHA-256", "SHA-384", "SHA-512")
      .map(java.security.MessageDigest.getInstance)
    while (!done) {
      val k1 = {
        val unit = pw ++ k ++ udata
        val buf = new Array[Byte](unit.length * 64)
        var i = 0
        while (i < 64) { System.arraycopy(unit, 0, buf, i * unit.length, unit.length); i += 1 }
        buf
      }
      c.init(Cipher.ENCRYPT_MODE,
        new SecretKeySpec(java.util.Arrays.copyOfRange(k, 0, 16), "AES"),
        new IvParameterSpec(java.util.Arrays.copyOfRange(k, 16, 32)))
      val e = c.doFinal(k1)
      var mod = 0
      var i = 0
      while (i < 16) { mod += e(i) & 0xff; i += 1 }
      val d = digests(mod % 3)
      d.reset()
      d.update(e)
      k = d.digest()
      round += 1
      lastE = e(e.length - 1) & 0xff
      done = round >= 64 && lastE <= round - 32
    }
    k.take(32)
  }

  // ------------------------------------------------------- dict parsing

  /** A PDF string value after `key` in dict text: `(…)` literal with
    * escapes or `<…>` hex; returns raw bytes. */
  private[sources] def stringAfter(dict: String, key: String): Option[Array[Byte]] = {
    var from = 0
    while (true) {
      val at = dict.indexOf(key, from)
      if (at < 0) return None
      var i = at + key.length
      if (i < dict.length && (dict.charAt(i).isLetterOrDigit || dict.charAt(i) == '_')) {
        from = i // longer key sharing the prefix (e.g. /UE for /U)
      } else {
        while (i < dict.length && dict.charAt(i).isWhitespace) i += 1
        if (i >= dict.length) return None
        dict.charAt(i) match {
          case '(' =>
            val bos = new java.io.ByteArrayOutputStream()
            var j = i + 1; var depth = 1
            while (j < dict.length && depth > 0) {
              dict.charAt(j) match {
                case '\\' if j + 1 < dict.length =>
                  dict.charAt(j + 1) match {
                    case 'n' => bos.write('\n'); j += 2
                    case 'r' => bos.write('\r'); j += 2
                    case 't' => bos.write('\t'); j += 2
                    case 'b' => bos.write('\b'); j += 2
                    case 'f' => bos.write('\f'); j += 2
                    case d if d >= '0' && d <= '7' =>
                      var k = j + 1; var v = 0; var n = 0
                      while (k < dict.length && n < 3 &&
                             dict.charAt(k) >= '0' && dict.charAt(k) <= '7') {
                        v = v * 8 + (dict.charAt(k) - '0'); k += 1; n += 1
                      }
                      bos.write(v); j = k
                    case other => bos.write(other); j += 2
                  }
                case '(' => depth += 1; bos.write('('); j += 1
                case ')' =>
                  depth -= 1; if (depth > 0) bos.write(')'); j += 1
                case ch => bos.write(ch); j += 1
              }
            }
            return Some(bos.toByteArray)
          case '<' =>
            val e = dict.indexOf('>', i)
            if (e < 0) return None
            val hex = dict.substring(i + 1, e).filterNot(_.isWhitespace)
            val padded = if (hex.length % 2 == 1) hex + "0" else hex
            return Some(padded.grouped(2)
              .map(h => Integer.parseInt(h, 16).toByte).toArray)
          case _ => return None
        }
      }
    }
    None
  }

  private def intAfter(dict: String, key: String): Option[Long] =
    (java.util.regex.Pattern.quote(key) + """\s+(-?\d+)""").r
      .findFirstMatchIn(dict).map(_.group(1).toLong)

  /** Balanced `<<…>>` dictionary text starting at the first `<<` at or
    * after `from`; None if unterminated. */
  private def balancedDict(s: String, from: Int): Option[String] = {
    val start = s.indexOf("<<", from)
    if (start < 0) return None
    var i = start; var depth = 0
    while (i < s.length - 1) {
      if (s.charAt(i) == '<' && s.charAt(i + 1) == '<') { depth += 1; i += 2 }
      else if (s.charAt(i) == '>' && s.charAt(i + 1) == '>') {
        depth -= 1; i += 2
        if (depth == 0) return Some(s.substring(start, i))
      } else i += 1
    }
    None
  }

  /** /CFM of the crypt filter named `name` inside the /CF dictionary
    * (ISO 32000-1 §7.6.5). None when /CF, the named filter, or its
    * /CFM is absent — NOT the first /CFM anywhere in the Encrypt dict:
    * a /CF listing another filter before the /StmF one must not bleed
    * its mode onto the stream filter. */
  private[graft] def cryptFilterMode(encDict: String, name: String): Option[String] =
    for {
      cfAt <- """/CF\s*<<""".r.findFirstMatchIn(encDict).map(_.start)
      cf   <- balancedDict(encDict, cfAt)
      nmAt <- ("/" + java.util.regex.Pattern.quote(name) + """(?![A-Za-z0-9#._\-])""").r
                .findFirstMatchIn(cf).map(_.end)
      sub  <- balancedDict(cf, nmAt)
      cfm  <- """/CFM\s*/([A-Za-z0-9]+)""".r.findFirstMatchIn(sub).map(_.group(1))
    } yield cfm

  /** First element of the trailer `/ID [ <…> <…> ]` array. */
  private[sources] def firstFileId(raw: String): Array[Byte] = {
    val m = """/ID\s*\[\s*<([0-9A-Fa-f\s]*)>""".r.findFirstMatchIn(raw)
    m.map(_.group(1).filterNot(_.isWhitespace))
      .filter(_.nonEmpty)
      .map(h => (if (h.length % 2 == 1) h + "0" else h).grouped(2)
        .map(x => Integer.parseInt(x, 16).toByte).toArray)
      .getOrElse(Array.emptyByteArray)
  }

  // ----------------------------------------------------------- assembly

  /** Build a [[Decryptor]] for the document, or None when the
    * encryption is outside the supported envelope (→ fail closed).
    * `raw` is the full document text (for `/ID`), `encDict` the
    * `/Encrypt` dictionary text. */
  def decryptorFor(raw: String, encDict: String): Option[Decryptor] = {
    if (!"""/Filter\s*/Standard\b""".r.findFirstIn(encDict).isDefined) return None
    val v = intAfter(encDict, "/V").getOrElse(0L).toInt
    val r = intAfter(encDict, "/R").getOrElse(if (v >= 2) 3L else 2L).toInt
    val o = stringAfter(encDict, "/O").getOrElse(return None)
    val u = stringAfter(encDict, "/U").getOrElse(return None)
    val p = intAfter(encDict, "/P").getOrElse(return None)
    val emptyPw = Array.emptyByteArray

    // crypt-filter mode for V4/V5: streams route through /StmF (ISO
    // 32000-1 Table 20). An ABSENT /StmF means /Identity — streams are
    // stored unencrypted. A named /StmF is resolved in the /CF
    // dictionary and ITS /CFM governs (r15: previously the first /CFM
    // anywhere in the Encrypt dict won, so a /CF listing another
    // filter before the /StmF one could misread the stream cipher); a
    // filter missing from /CF or an unknown CFM fails CLOSED (decoding
    // its ciphertext as if standard would emit garbage).
    val (cfm, stmIdentity) =
      if (v < 4) { if (v == 0) return None else ("V2", false) }
      else """/StmF\s*/([A-Za-z0-9#._\-]+)""".r.findFirstMatchIn(encDict)
        .map(_.group(1)) match {
        case None | Some("Identity") => ("Identity", true) // spec default
        case Some(name) =>
          cryptFilterMode(encDict, name) match {
            case Some("Identity")                     => ("Identity", true)
            case Some(m @ ("V2" | "AESV2" | "AESV3")) => (m, false)
            case _ => return None // unresolvable filter / unknown CFM
          }
      }
    val encryptMetadata =
      !"""/EncryptMetadata\s+false""".r.findFirstIn(encDict).isDefined

    if (v >= 5) {
      if (r < 5 || cfm != "AESV3" && !stmIdentity) return None
      if (u.length < 48) return None
      val hash = java.util.Arrays.copyOfRange(u, 0, 32)
      val vSalt = java.util.Arrays.copyOfRange(u, 32, 40)
      val kSalt = java.util.Arrays.copyOfRange(u, 40, 48)
      val check =
        if (r == 5) sha("SHA-256", emptyPw, vSalt)
        else hash2B(emptyPw, vSalt, Array.emptyByteArray)
      if (!java.util.Arrays.equals(check, hash)) return None // non-empty user pw
      val ue = stringAfter(encDict, "/UE").getOrElse(return None)
      if (ue.length < 32) return None
      val iKey =
        if (r == 5) sha("SHA-256", emptyPw, kSalt)
        else hash2B(emptyPw, kSalt, Array.emptyByteArray)
      val c = Cipher.getInstance("AES/CBC/NoPadding")
      c.init(Cipher.DECRYPT_MODE, new SecretKeySpec(iKey, "AES"),
        new IvParameterSpec(new Array[Byte](16)))
      val fileKey = c.doFinal(ue, 0, 32)
      Some(Decryptor(fileKey, v, aes = true, streamsEncrypted = !stmIdentity,
        encryptMetadata = encryptMetadata))
    } else {
      val keyBits = intAfter(encDict, "/Length").getOrElse(40L).toInt
      val keyBytes = if (r == 2) 5 else math.max(5, math.min(16, keyBits / 8))
      val id0 = firstFileId(raw)
      val key = fileKeyClassic(o, p, id0, r, keyBytes, encryptMetadata)
      val expectU = userValueClassic(key, id0, r)
      val ok =
        if (r == 2) java.util.Arrays.equals(expectU, u.take(32))
        else u.length >= 16 &&
          java.util.Arrays.equals(expectU.take(16), u.take(16))
      if (!ok) return None // non-empty user password
      val aes = cfm == "AESV2"
      if (v == 4 && !aes && cfm != "V2" && !stmIdentity) return None
      Some(Decryptor(key, v, aes, streamsEncrypted = !stmIdentity,
        encryptMetadata = encryptMetadata))
    }
  }
}
