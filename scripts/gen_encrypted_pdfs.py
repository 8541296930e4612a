#!/usr/bin/env python3
"""Generate encrypted-PDF test fixtures for PdfCrypt/MiniPdf.

Implements the ISO 32000 standard security handler INDEPENDENTLY of the
Scala code under test (Python hashlib for MD5/SHA-2, a from-scratch RC4,
and the `cryptography` package for AES-CBC), so a symmetric bug in
PdfCrypt's key derivation cannot hide: the Scala decryptor must open
ciphertext produced by THIS implementation, and its derived file key
must equal the hex recorded here.

Covered variants (all with the EMPTY user password — the crawled-PDF
case PyMuPDF opens transparently):
  rc4_40        V1 R2  RC4, 40-bit key           (Algorithms 2,3,4)
  rc4_128       V2 R3  RC4, 128-bit key          (Algorithms 2,3,5)
  aesv2         V4 R4  AES-128-CBC via /StdCF    (/StmF /StdCF)
  aesv2_nometa  V4 R4  + /EncryptMetadata false  (key derivation differs;
                        includes a PLAINTEXT /Metadata stream)
  aesv3_r5      V5 R5  AES-256-CBC (SHA-256 password check)
  aesv3_r6      V5 R6  AES-256-CBC (Algorithm 2.B hardened hash)
  wrong_u       V2 R3  /U computed for password "secret" -> fail CLOSED
  stmf_absent   V4     /CF present but /StmF absent -> /Identity per
                        spec (streams stored as PLAINTEXT)

Output: src/test/scala/graft/EncryptedPdfFixtures.scala (base64-embedded).
Deterministic: all salts/IVs/file keys derive from SHA-256 of fixed tags.
"""
import base64
import hashlib
import re
import struct
import sys
from cryptography.hazmat.primitives.ciphers import Cipher, algorithms, modes

PAD = bytes([
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
    0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
    0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A])

P_VALUE = -3904  # typical permission mask; arbitrary but consistent


def det(tag: str, n: int) -> bytes:
    """Deterministic pseudo-random bytes for salts/IVs/keys."""
    out = b""
    i = 0
    while len(out) < n:
        out += hashlib.sha256(f"graft-fixture:{tag}:{i}".encode()).digest()
        i += 1
    return out[:n]


def rc4(key: bytes, data: bytes) -> bytes:
    s = list(range(256))
    j = 0
    for i in range(256):
        j = (j + s[i] + key[i % len(key)]) & 0xFF
        s[i], s[j] = s[j], s[i]
    out = bytearray()
    x = y = 0
    for b in data:
        x = (x + 1) & 0xFF
        y = (y + s[x]) & 0xFF
        s[x], s[y] = s[y], s[x]
        out.append(b ^ s[(s[x] + s[y]) & 0xFF])
    return bytes(out)


def aes_cbc_encrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    enc = Cipher(algorithms.AES(key), modes.CBC(iv)).encryptor()
    return enc.update(data) + enc.finalize()


def pad_pw(pw: bytes) -> bytes:
    return (pw + PAD)[:32]


def file_key_classic(o: bytes, p: int, id0: bytes, r: int, key_bytes: int,
                     encrypt_metadata: bool, user_pw: bytes = b"") -> bytes:
    """Algorithm 2."""
    h = hashlib.md5()
    h.update(pad_pw(user_pw))
    h.update(o[:32])
    h.update(struct.pack("<i", p))
    h.update(id0)
    if r >= 4 and not encrypt_metadata:
        h.update(b"\xff\xff\xff\xff")
    key = h.digest()
    if r >= 3:
        for _ in range(50):
            key = hashlib.md5(key[:key_bytes]).digest()
    return key[:key_bytes]


def owner_value(r: int, key_bytes: int, owner_pw: bytes, user_pw: bytes) -> bytes:
    """Algorithm 3: the /O entry."""
    key = hashlib.md5(pad_pw(owner_pw)).digest()
    if r >= 3:
        for _ in range(50):
            key = hashlib.md5(key).digest()
    key = key[:key_bytes]
    o = rc4(key, pad_pw(user_pw))
    if r >= 3:
        for i in range(1, 20):
            o = rc4(bytes(b ^ i for b in key), o)
    return o


def user_value(r: int, file_key: bytes, id0: bytes) -> bytes:
    """Algorithms 4 (R2) / 5 (R3+): the /U entry."""
    if r == 2:
        return rc4(file_key, PAD)
    u = rc4(file_key, hashlib.md5(PAD + id0).digest())
    for i in range(1, 20):
        u = rc4(bytes(b ^ i for b in file_key), u)
    return u + det("upad", 16)  # R3+ /U is 32 bytes; tail is arbitrary


def object_key(file_key: bytes, num: int, gen: int, aes: bool) -> bytes:
    """Algorithm 1 per-object key (V <= 4)."""
    h = hashlib.md5()
    h.update(file_key)
    h.update(struct.pack("<i", num)[:3])
    h.update(struct.pack("<i", gen)[:2])
    if aes:
        h.update(b"sAlT")
    return h.digest()[:min(len(file_key) + 5, 16)]


def hash_2b(pw: bytes, salt: bytes, udata: bytes) -> bytes:
    """ISO 32000-2 Algorithm 2.B (R6 hardened hash)."""
    k = hashlib.sha256(pw + salt + udata).digest()
    rnd = 0
    while True:
        k1 = (pw + k + udata) * 64
        e = aes_cbc_encrypt(k[:16], k[16:32], k1)
        mod = sum(e[:16]) % 3
        k = [hashlib.sha256, hashlib.sha384, hashlib.sha512][mod](e).digest()
        rnd += 1
        if rnd >= 64 and e[-1] <= rnd - 32:
            return k[:32]


def pkcs7(data: bytes) -> bytes:
    n = 16 - (len(data) % 16)
    return data + bytes([n] * n)


def hexs(b: bytes) -> str:
    return b.hex().upper()


def build_pdf(objects, trailer: str) -> bytes:
    out = bytearray(b"%PDF-1.6\n")
    for num, dict_text, stream in objects:
        out += f"{num} 0 obj\n{dict_text}\n".encode("latin-1")
        if stream is not None:
            out += b"stream\n" + stream + b"\nendstream\n"
        out += b"endobj\n"
    out += trailer.encode("latin-1")
    return bytes(out)


def doc_objects(content_enc: bytes, extra=()):
    return [
        (1, "<< /Type /Catalog /Pages 2 0 R >>", None),
        (2, "<< /Type /Pages /Kids [ 3 0 R ] /Count 1 >>", None),
        (3, "<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>", None),
        (4, f"<< /Length {len(content_enc)} >>", content_enc),
    ] + list(extra)


def trailer_for(enc_num: int, id0: bytes) -> str:
    idh = hexs(id0)
    return (f"trailer\n<< /Root 1 0 R /Encrypt {enc_num} 0 R "
            f"/ID [ <{idh}> <{idh}> ] >>\n%%EOF\n")


def classic_fixture(name, text, v, r, key_bits, aes, encrypt_metadata=True,
                    user_pw=b"", extra_objs=(), cf_extra=""):
    """V<=4 fixture; returns (pdf_bytes, file_key_for_empty_pw)."""
    id0 = det(name + ":id", 16)
    key_bytes = key_bits // 8
    o = owner_value(r, key_bytes, b"", b"")  # empty owner == empty user
    fkey = file_key_classic(o, P_VALUE, id0, r, key_bytes, encrypt_metadata,
                            user_pw=user_pw)
    u = user_value(r, fkey, id0)
    content = f"BT ({text}) Tj ET".encode("latin-1")
    okey = object_key(fkey, 4, 0, aes)
    if aes:
        iv = det(name + ":iv", 16)
        content_enc = iv + aes_cbc_encrypt(okey, iv, pkcs7(content))
    else:
        content_enc = rc4(okey, content)
    cf = ""
    if v == 4:
        cfm = "/AESV2" if aes else "/V2"
        cf = (f" /CF << /StdCF << /CFM {cfm} /Length {key_bytes} >> >>"
              f" /StmF /StdCF /StrF /StdCF")
    meta = "" if encrypt_metadata else " /EncryptMetadata false"
    enc_dict = (f"<< /Filter /Standard /V {v} /R {r} /Length {key_bits}"
                f" /O <{hexs(o)}> /U <{hexs(u[:32])}> /P {P_VALUE}{cf}{meta}"
                f"{cf_extra} >>")
    objs = doc_objects(content_enc, extra_objs) + [(5, enc_dict, None)]
    pdf = build_pdf(objs, trailer_for(5, id0))
    # file key for the EMPTY user password (what the decryptor derives)
    fkey_empty = file_key_classic(o, P_VALUE, id0, r, key_bytes,
                                  encrypt_metadata, user_pw=b"")
    return pdf, fkey_empty


def v5_fixture(name, text, r):
    file_key = det(name + ":fk", 32)
    v_salt = det(name + ":vs", 8)
    k_salt = det(name + ":ks", 8)
    if r == 6:
        u_hash = hash_2b(b"", v_salt, b"")
        ikey = hash_2b(b"", k_salt, b"")
    else:  # R5
        u_hash = hashlib.sha256(b"" + v_salt).digest()
        ikey = hashlib.sha256(b"" + k_salt).digest()
    u = u_hash + v_salt + k_salt  # 48 bytes
    ue = aes_cbc_encrypt(ikey, b"\x00" * 16, file_key)
    # /O, /OE computed properly for an empty owner password (udata = U48)
    ov_salt = det(name + ":ovs", 8)
    ok_salt = det(name + ":oks", 8)
    if r == 6:
        o_hash = hash_2b(b"", ov_salt, u)
        oikey = hash_2b(b"", ok_salt, u)
    else:
        o_hash = hashlib.sha256(b"" + ov_salt + u).digest()
        oikey = hashlib.sha256(b"" + ok_salt + u).digest()
    o = o_hash + ov_salt + ok_salt
    oe = aes_cbc_encrypt(oikey, b"\x00" * 16, file_key)
    content = f"BT ({text}) Tj ET".encode("latin-1")
    iv = det(name + ":iv", 16)
    content_enc = iv + aes_cbc_encrypt(file_key, iv, pkcs7(content))
    perms = b"\xd4\xff\xff\xff\xff\xff\xff\xffTadb" + det(name + ":pr", 4)
    perms_enc = aes_cbc_encrypt(file_key, b"\x00" * 16, perms[:16])
    enc_dict = (f"<< /Filter /Standard /V 5 /R {r} /Length 256"
                f" /CF << /StdCF << /CFM /AESV3 /Length 32 >> >>"
                f" /StmF /StdCF /StrF /StdCF"
                f" /O <{hexs(o)}> /U <{hexs(u)}>"
                f" /OE <{hexs(oe)}> /UE <{hexs(ue)}>"
                f" /Perms <{hexs(perms_enc)}> /P {P_VALUE} >>")
    id0 = det(name + ":id", 16)
    objs = doc_objects(content_enc) + [(5, enc_dict, None)]
    pdf = build_pdf(objs, trailer_for(5, id0))
    return pdf, file_key


def check_clean(name: str, pdf: bytes):
    """Ciphertext must not fabricate PDF object headers (the xref-free
    scanner would pick them up); deterministic fixtures let us assert
    this once at generation time."""
    text = pdf.decode("latin-1")
    heads = re.findall(r"(\d+)\s+(\d+)\s+obj", text)
    nums = sorted(int(a) for a, b in heads)
    assert nums == sorted({1, 2, 3, 4, 5} | ({6} if "meta" in name else set())), \
        f"{name}: stray object header in ciphertext: {nums}"


def main():
    fixtures = []  # (name, pdf, planted_text, file_key_hex)

    pdf, fk = classic_fixture("rc4_40", "RC4 forty bit sesame", 1, 2, 40, False)
    fixtures.append(("rc4_40", pdf, "RC4 forty bit sesame", hexs(fk)))

    pdf, fk = classic_fixture("rc4_128", "RC4 onetwentyeight sesame", 2, 3, 128, False)
    fixtures.append(("rc4_128", pdf, "RC4 onetwentyeight sesame", hexs(fk)))

    pdf, fk = classic_fixture("aesv2", "AES one two eight sesame", 4, 4, 128, True)
    fixtures.append(("aesv2", pdf, "AES one two eight sesame", hexs(fk)))

    # V4 crypt-filter dict routing to RC4 (/CFM /V2) — same cipher as
    # rc4_128 but through the /CF /StdCF indirection
    pdf, fk = classic_fixture("rc4_v4", "RC4 behind StdCF sesame", 4, 4, 128, False)
    fixtures.append(("rc4_v4", pdf, "RC4 behind StdCF sesame", hexs(fk)))

    meta_xml = b"<?xpacket?><x:xmpmeta xmlns:x='adobe:ns:meta/'/>"
    pdf, fk = classic_fixture(
        "aesv2_nometa", "AES without metadata sesame", 4, 4, 128, True,
        encrypt_metadata=False,
        extra_objs=[(6, f"<< /Type /Metadata /Subtype /XML /Length {len(meta_xml)} >>",
                     meta_xml)])
    fixtures.append(("aesv2_nometa", pdf, "AES without metadata sesame", hexs(fk)))

    pdf, fk = v5_fixture("aesv3_r5", "AES two five six R5 sesame", 5)
    fixtures.append(("aesv3_r5", pdf, "AES two five six R5 sesame", hexs(fk)))

    pdf, fk = v5_fixture("aesv3_r6", "AES two five six R6 sesame", 6)
    fixtures.append(("aesv3_r6", pdf, "AES two five six R6 sesame", hexs(fk)))

    # encrypted OBJECT STREAM: the whole page tree (catalog, pages, page)
    # lives inside a /Type /ObjStm whose bytes are deflate-compressed THEN
    # RC4-encrypted (encryption is the outermost layer per spec) — the
    # modern-writer layout; the decryptor must decipher the ObjStm BEFORE
    # its inner objects can be parsed at all
    import zlib
    name = "objstm_rc4"
    text = "ObjStm under RC4 sesame"
    id0 = det(name + ":id", 16)
    o = owner_value(3, 16, b"", b"")
    fkey = file_key_classic(o, P_VALUE, id0, 3, 16, True)
    u = user_value(3, fkey, id0)
    inner_objs = [
        (1, "<< /Type /Catalog /Pages 2 0 R >>"),
        (2, "<< /Type /Pages /Kids [ 3 0 R ] /Count 1 >>"),
        (3, "<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>"),
    ]
    bodies = [d for _, d in inner_objs]
    offsets = []
    pos = 0
    for b in bodies:
        offsets.append(pos)
        pos += len(b) + 1
    header = " ".join(f"{n} {off}" for (n, _), off in zip(inner_objs, offsets))
    payload = (header + "\n").encode("latin-1") + \
        "\n".join(bodies).encode("latin-1") + b"\n"
    first = len(header) + 1
    objstm_plain = zlib.compress(payload)
    objstm_enc = rc4(object_key(fkey, 9, 0, False), objstm_plain)
    content = f"BT ({text}) Tj ET".encode("latin-1")
    content_enc = rc4(object_key(fkey, 4, 0, False), content)
    enc_dict = (f"<< /Filter /Standard /V 2 /R 3 /Length 128"
                f" /O <{hexs(o)}> /U <{hexs(u[:32])}> /P {P_VALUE} >>")
    objs = [
        (9, f"<< /Type /ObjStm /N {len(inner_objs)} /First {first}"
            f" /Filter /FlateDecode /Length {len(objstm_enc)} >>", objstm_enc),
        (4, f"<< /Length {len(content_enc)} >>", content_enc),
        (5, enc_dict, None),
    ]
    pdf = build_pdf(objs, trailer_for(5, id0))
    fk = file_key_classic(o, P_VALUE, id0, 3, 16, True)
    fixtures.append((name, pdf, text, hexs(fk)))

    for name, pdf, _, _ in fixtures:
        if name == "objstm_rc4":
            continue  # object numbers differ by construction
        check_clean(name, pdf)

    # wrong /U: content encrypted under password "secret"; the empty-pw
    # check must fail -> decoder surfaces 'encrypted', never garbage
    wrong_pdf, _ = classic_fixture("wrong_u", "locked away", 2, 3, 128, False,
                                   user_pw=b"secret")
    check_clean("wrong_u", wrong_pdf)

    # /StmF absent while /CF present: per ISO 32000-1 Table 20 the
    # default stream filter is /Identity -> streams stored PLAINTEXT
    id0 = det("stmf_absent:id", 16)
    o = owner_value(4, 16, b"", b"")
    u = user_value(4, file_key_classic(o, P_VALUE, id0, 4, 16, True), id0)
    content = b"BT (StmF absent plaintext sesame) Tj ET"
    enc_dict = (f"<< /Filter /Standard /V 4 /R 4 /Length 128"
                f" /CF << /StdCF << /CFM /AESV2 /Length 16 >> >>"
                f" /O <{hexs(o)}> /U <{hexs(u[:32])}> /P {P_VALUE} >>")
    stmf_pdf = build_pdf(doc_objects(content) + [(5, enc_dict, None)],
                         trailer_for(5, id0))

    out = ["package graft",
           "",
           "/** GENERATED by scripts/gen_encrypted_pdfs.py — do not edit.",
           "  *",
           "  * Encrypted-PDF fixtures whose /O, /U, file keys and ciphertext",
           "  * were derived by an INDEPENDENT implementation (Python hashlib +",
           "  * the cryptography package) of ISO 32000 Algorithms 1/2/3/4/5 and",
           "  * 2.B — never by PdfCrypt itself, so a symmetric derivation bug",
           "  * cannot hide. `fileKeyHex` is the expected empty-user-password",
           "  * file key; `text` the exact planted page text. */",
           "object EncryptedPdfFixtures {",
           "",
           "  final case class Fx(name: String, pdfB64: String, text: String,",
           "                      fileKeyHex: String) {",
           "    def pdf: Array[Byte] = java.util.Base64.getDecoder.decode(pdfB64)",
           "  }",
           "",
           "  val all: Seq[Fx] = Seq("]
    for i, (name, pdf, text, fk) in enumerate(fixtures):
        b64 = base64.b64encode(pdf).decode()
        chunks = [b64[j:j + 72] for j in range(0, len(b64), 72)]
        lit = ' +\n      '.join(f'"{c}"' for c in chunks)
        comma = "," if i + 1 < len(fixtures) else ""
        out.append(f'    Fx("{name}",\n      {lit},\n'
                   f'      "{text}", "{fk.lower()}"){comma}')
    out.append("  )")
    out.append("")
    out.append("  /** Content encrypted under user password \"secret\" — the")
    out.append("    * empty-password /U check must fail CLOSED. */")
    b64 = base64.b64encode(wrong_pdf).decode()
    chunks = [b64[j:j + 72] for j in range(0, len(b64), 72)]
    lit = ' +\n    '.join(f'"{c}"' for c in chunks)
    out.append(f"  val wrongU: Array[Byte] = java.util.Base64.getDecoder.decode(\n    {lit})")
    out.append("")
    out.append("  /** /CF present but /StmF ABSENT: spec default /Identity —")
    out.append("    * the content stream is stored as plaintext. */")
    b64 = base64.b64encode(stmf_pdf).decode()
    chunks = [b64[j:j + 72] for j in range(0, len(b64), 72)]
    lit = ' +\n    '.join(f'"{c}"' for c in chunks)
    out.append(f"  val stmfAbsent: Array[Byte] = java.util.Base64.getDecoder.decode(\n    {lit})")
    out.append("}")

    path = "src/test/scala/graft/EncryptedPdfFixtures.scala"
    with open(path, "w") as f:
        f.write("\n".join(out) + "\n")
    print(f"wrote {path}: {len(fixtures)} fixtures + wrongU + stmfAbsent")


if __name__ == "__main__":
    sys.exit(main())
