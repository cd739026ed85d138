package graft.engine.read

import java.nio.charset.StandardCharsets

/** Office document encryption, DEFAULT/BLANK PASSWORDS ONLY — the
  * [[PdfCrypt]] story's exact sibling. The dominant real-world
  * "encrypted" Office class in a crawl opens without any secret:
  *
  *  - legacy `.xls` sheets "protected" through the UI encrypt with
  *    the WELL-KNOWN default password `VelvetSweatshop` (MS-XLS
  *    §2.4.117: Excel tries it silently on open — the file reads as
  *    unprotected to every user);
  *  - OOXML packages (`EncryptionInfo`/`EncryptedPackage` inside a
  *    CFB) written by tooling that encrypts for RESTRICTIONS rather
  *    than secrecy verify against the empty password the same
  *    algorithm-driven way blank-user-password PDFs do.
  *
  * Implemented forward from the public MS-OFFCRYPTO spec:
  *
  *  - **ECMA-376 standard encryption** (EncryptionInfo version minor
  *    2): SHA-1 spun 50,000 times over `LE32(i) ‖ H`, the 0x36/0x5C
  *    X1‖X2 derivation, AES-ECB verifier check and package decrypt
  *    (§2.3.4.7, §2.3.4.9);
  *  - **agile encryption** (version 4.4, XML descriptor): spinCount
  *    password hash, the three published block keys for verifier
  *    input/value and the wrapped package key, AES-CBC per-4096-byte
  *    segments with `H(keyDataSalt ‖ LE32(seg))` IVs; SHA-1/256/384/
  *    512 per the descriptor (§2.3.4.10–15);
  *  - **BIFF8 RC4** (§2.3.6) and **RC4 CryptoAPI** (§2.3.5) for the
  *    legacy Workbook stream: MD5/SHA-1 key derivation, 1024-byte
  *    rekeying, the keystream advancing over EVERY stream byte while
  *    record headers and the never-encrypted records stay plaintext
  *    (MS-XLS §2.2.10).
  *
  * Anything that does not verify against the candidate passwords
  * (blank, then `VelvetSweatshop`) stays refused — the house stance
  * for genuinely protected content. All failures return None; torn
  * or lying headers must never throw out of a row kernel. MD5/SHA/
  * AES come from the JDK; RC4 is [[PdfCrypt.rc4]], the spec's own
  * key schedule.
  */
private[read] object OffCrypto {

  /** The passwords a crawl reader may legitimately try: the spec's
    * own defaults, not secrets. Order matters (cheapest first).
    */
  val CandidatePasswords: Seq[String] = Seq("", "VelvetSweatshop")

  private def sha(alg: String, parts: Array[Byte]*): Array[Byte] = {
    val d = java.security.MessageDigest.getInstance(alg)
    parts.foreach(d.update)
    d.digest()
  }

  private def md5(parts: Array[Byte]*): Array[Byte] = sha("MD5", parts: _*)

  private def le32(v: Int): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)

  private def u16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8)

  private def u32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xFFL) | ((b(off + 1) & 0xFFL) << 8) |
      ((b(off + 2) & 0xFFL) << 16) | ((b(off + 3) & 0xFFL) << 24)

  private def u64(b: Array[Byte], off: Int): Long =
    u32(b, off) | (u32(b, off + 4) << 32)

  private def utf16(pw: String): Array[Byte] =
    pw.getBytes(StandardCharsets.UTF_16LE)

  private def aesEcbDecrypt(key: Array[Byte],
                            data: Array[Byte]): Array[Byte] = {
    val c = javax.crypto.Cipher.getInstance("AES/ECB/NoPadding")
    c.init(javax.crypto.Cipher.DECRYPT_MODE,
      new javax.crypto.spec.SecretKeySpec(key, "AES"))
    c.doFinal(data)
  }

  private def aesCbcDecrypt(key: Array[Byte], iv: Array[Byte],
                            data: Array[Byte]): Array[Byte] = {
    val c = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
    c.init(javax.crypto.Cipher.DECRYPT_MODE,
      new javax.crypto.spec.SecretKeySpec(key, "AES"),
      new javax.crypto.spec.IvParameterSpec(iv))
    c.doFinal(data)
  }

  /** §2.3.4.13: keys and IVs truncate to the target length, or pad
    * with 0x36 when the hash is shorter.
    */
  private def fit(bytes: Array[Byte], len: Int): Array[Byte] = {
    if (bytes.length == len) return bytes
    val out = Array.fill[Byte](len)(0x36)
    System.arraycopy(bytes, 0, out, 0, math.min(bytes.length, len))
    out
  }

  // ==== OOXML: EncryptionInfo + EncryptedPackage ====================

  /** Decrypt an OOXML `EncryptedPackage` when one of the candidate
    * passwords verifies against `EncryptionInfo` — standard (ECMA-376
    * AES-ECB) or agile (XML descriptor, AES-CBC). The result is the
    * plaintext ZIP package; None refuses (wrong password, torn
    * header, out-of-scope scheme).
    */
  def decryptPackage(info: Array[Byte], pkg: Array[Byte],
                     passwords: Seq[String] = CandidatePasswords): Option[Array[Byte]] =
    try {
      if (info == null || pkg == null || info.length < 8) return None
      val vMajor = u16(info, 0)
      val vMinor = u16(info, 2)
      if (vMinor == 2 && (vMajor == 2 || vMajor == 3 || vMajor == 4))
        decryptStandard(info, pkg, passwords)
      else if (vMajor == 4 && vMinor == 4)
        decryptAgile(info, pkg, passwords)
      else None
    } catch { case _: Exception => None }

  // ---- standard (§2.3.4.5–9) ---------------------------------------

  private def decryptStandard(info: Array[Byte], pkg: Array[Byte],
                              passwords: Seq[String]): Option[Array[Byte]] = {
    // u32 flags, u32 headerSize, header, verifier
    val headerSize = u32(info, 8).toInt
    if (headerSize < 32 || 12 + headerSize > info.length) return None
    val h = 12
    val algId = u32(info, h + 8)
    val keyBits = u32(info, h + 16).toInt
    // ECMA-376 standard is AES (0x660E/0x660F/0x6610); 0 means
    // "determined by flags", which for fExternal=0 + fAES=1 is AES-128
    val keyLen = algId match {
      case 0x660E => 16
      case 0x660F => 24
      case 0x6610 => 32
      case 0      => if (keyBits > 0) keyBits / 8 else 16
      case _      => return None // RC4 CryptoAPI OOXML: out of scope
    }
    val p = 12 + headerSize
    if (p + 4 > info.length) return None
    val saltSize = u32(info, p).toInt
    if (saltSize != 16 || p + 4 + 16 + 16 + 4 + 32 > info.length) return None
    val salt = java.util.Arrays.copyOfRange(info, p + 4, p + 20)
    val encVerifier = java.util.Arrays.copyOfRange(info, p + 20, p + 36)
    val hashSize = u32(info, p + 36).toInt
    if (hashSize != 20) return None
    val encVerifierHash =
      java.util.Arrays.copyOfRange(info, p + 40, p + 72)

    passwords.iterator.map { pw =>
      val key = standardKey(salt, pw, keyLen)
      val verifier = aesEcbDecrypt(key, encVerifier)
      val vHash = aesEcbDecrypt(key, encVerifierHash)
      if (java.util.Arrays.equals(sha("SHA-1", verifier),
        java.util.Arrays.copyOfRange(vHash, 0, 20))) {
        val size = u64(pkg, 0)
        if (size < 0 || size > pkg.length - 8) None
        else {
          val ct = java.util.Arrays.copyOfRange(pkg, 8,
            8 + ((pkg.length - 8) / 16) * 16)
          val pt = aesEcbDecrypt(key, ct)
          Some(java.util.Arrays.copyOfRange(pt, 0,
            math.min(size, pt.length.toLong).toInt))
        }
      } else None
    }.collectFirst { case Some(zip) => zip }
  }

  /** §2.3.4.7: 50,000-spin SHA-1 then the 0x36/0x5C X1‖X2 fold. */
  private def standardKey(salt: Array[Byte], pw: String,
                          keyLen: Int): Array[Byte] = {
    var h = sha("SHA-1", salt, utf16(pw))
    var i = 0
    while (i < 50000) { h = sha("SHA-1", le32(i), h); i += 1 }
    val hFinal = sha("SHA-1", h, le32(0))
    def fold(pad: Byte): Array[Byte] = {
      val buf = Array.fill[Byte](64)(pad)
      var j = 0
      while (j < hFinal.length) {
        buf(j) = (buf(j) ^ hFinal(j)).toByte; j += 1
      }
      sha("SHA-1", buf)
    }
    java.util.Arrays.copyOfRange(fold(0x36) ++ fold(0x5C.toByte),
      0, keyLen)
  }

  // ---- agile (§2.3.4.10–15) ----------------------------------------

  /** The spec's published block keys (§2.3.4.13). */
  private val BlockVerifierInput = Array(0xfe, 0xa7, 0xd2, 0x76, 0x3b,
    0x4b, 0x9e, 0x79).map(_.toByte)
  private val BlockVerifierValue = Array(0xd7, 0xaa, 0x0f, 0x6d, 0x30,
    0x61, 0x34, 0x4e).map(_.toByte)
  private val BlockKeyValue = Array(0x14, 0x6e, 0x0b, 0xe7, 0xab,
    0xac, 0xd0, 0xd6).map(_.toByte)

  private def hashAlgName(declared: String): Option[String] =
    declared match {
      case "SHA1" | "SHA-1" => Some("SHA-1")
      case "SHA256"         => Some("SHA-256")
      case "SHA384"         => Some("SHA-384")
      case "SHA512"         => Some("SHA-512")
      case _                => None
    }

  private def decryptAgile(info: Array[Byte], pkg: Array[Byte],
                           passwords: Seq[String]): Option[Array[Byte]] = {
    val xmlStr = new String(info, 8, info.length - 8, StandardCharsets.UTF_8)
    val xml = ZipRead.parseXml(xmlStr) match {
      case Some(x) => x
      case None    => return None
    }
    def b64(s: String): Array[Byte] = java.util.Base64.getDecoder.decode(s)
    val keyData = (xml \\ "keyData").headOption match {
      case Some(kd) => kd
      case None     => return None
    }
    def attr(n: scala.xml.Node, a: String): Option[String] =
      n.attribute(a).map(_.text)
    val kdSalt = attr(keyData, "saltValue").map(b64).getOrElse(return None)
    val kdKeyLen = attr(keyData, "keyBits").map(_.toInt / 8).getOrElse(return None)
    val kdBlock = attr(keyData, "blockSize").map(_.toInt).getOrElse(16)
    val kdHash = attr(keyData, "hashAlgorithm").flatMap(hashAlgName)
      .getOrElse(return None)
    if (attr(keyData, "cipherAlgorithm").exists(_ != "AES") ||
      attr(keyData, "cipherChaining").exists(_ != "ChainingModeCBC"))
      return None
    val ek = (xml \\ "encryptedKey").headOption.getOrElse(return None)
    val spin = attr(ek, "spinCount").map(_.toInt).getOrElse(return None)
    // Hostile spin cap at the MS-OFFCRYPTO spec ceiling: the spec
    // permits spinCount up to 10,000,000, so a conforming (if
    // unusual) high-spin document must still verify; only values the
    // spec itself forbids are refused as hostile. Each candidate
    // password costs spinCount SHA rounds, so the ceiling bounds the
    // per-row CPU at ~10M hashes worst case.
    if (spin < 0 || spin > 10000000) return None
    val pSalt = attr(ek, "saltValue").map(b64).getOrElse(return None)
    val pKeyLen = attr(ek, "keyBits").map(_.toInt / 8).getOrElse(return None)
    val pBlock = attr(ek, "blockSize").map(_.toInt).getOrElse(16)
    val pHash = attr(ek, "hashAlgorithm").flatMap(hashAlgName)
      .getOrElse(return None)
    if (attr(ek, "cipherAlgorithm").exists(_ != "AES") ||
      attr(ek, "cipherChaining").exists(_ != "ChainingModeCBC"))
      return None
    val encInput = attr(ek, "encryptedVerifierHashInput").map(b64)
      .getOrElse(return None)
    val encValue = attr(ek, "encryptedVerifierHashValue").map(b64)
      .getOrElse(return None)
    val encKey = attr(ek, "encryptedKeyValue").map(b64)
      .getOrElse(return None)
    val hashSize = java.security.MessageDigest.getInstance(pHash)
      .getDigestLength

    passwords.iterator.map { pw =>
      // §2.3.4.11: spinCount iterations of H(LE32(i) ‖ H)
      var h = sha(pHash, pSalt, utf16(pw))
      var i = 0
      while (i < spin) { h = sha(pHash, le32(i), h); i += 1 }
      def blockKeyOf(bk: Array[Byte]): Array[Byte] =
        fit(sha(pHash, h, bk), pKeyLen)
      val iv = fit(pSalt, pBlock)
      val input = aesCbcDecrypt(blockKeyOf(BlockVerifierInput), iv, encInput)
      val expected = sha(pHash,
        java.util.Arrays.copyOfRange(input, 0, pSalt.length))
      val value = aesCbcDecrypt(blockKeyOf(BlockVerifierValue), iv, encValue)
      val ok = java.util.Arrays.equals(expected,
        java.util.Arrays.copyOfRange(value, 0,
          math.min(hashSize, value.length)))
      if (!ok) None
      else {
        val packageKey = java.util.Arrays.copyOfRange(
          aesCbcDecrypt(blockKeyOf(BlockKeyValue), iv, encKey), 0, kdKeyLen)
        decryptAgilePackage(pkg, packageKey, kdSalt, kdHash, kdBlock)
      }
    }.collectFirst { case Some(zip) => zip }
  }

  /** §2.3.4.15: 4096-byte segments, IV = H(keyDataSalt ‖ LE32(seg)). */
  private def decryptAgilePackage(pkg: Array[Byte], key: Array[Byte],
                                  kdSalt: Array[Byte], kdHash: String,
                                  blockSize: Int): Option[Array[Byte]] = {
    if (pkg.length < 8) return None
    val size = u64(pkg, 0)
    if (size < 0 || size > pkg.length.toLong * 2) return None
    val out = new java.io.ByteArrayOutputStream()
    var seg = 0
    var pos = 8
    while (pos < pkg.length && out.size < size) {
      val segLen = math.min(4096, pkg.length - pos)
      val ctLen = (segLen / 16) * 16
      if (ctLen == 0) pos = pkg.length
      else {
        val iv = fit(sha(kdHash, kdSalt, le32(seg)), blockSize)
        val pt = aesCbcDecrypt(key, iv,
          java.util.Arrays.copyOfRange(pkg, pos, pos + ctLen))
        out.write(pt, 0, pt.length)
        pos += segLen
        seg += 1
      }
    }
    val all = out.toByteArray
    if (all.length < size) None
    else Some(java.util.Arrays.copyOfRange(all, 0, size.toInt))
  }

  // ==== BIFF8 Workbook stream (legacy .xls) =========================

  /** MS-XLS §2.2.10: these records' payloads stay plaintext (the
    * keystream still advances over them).
    */
  private val NeverEncrypted = Set(0x0809, 0x002F, 0x0194, 0x0195,
    0x00E1, 0x0196, 0x0138) // BOF FilePass UsrExcl FileLock InterfaceHdr RRDInfo RRDHead
  private val RecBoundSheet8 = 0x0085

  private final case class Rc4Spec(blockKey: Int => Array[Byte])

  /** Parse a FilePass payload into a per-block RC4 key factory for
    * the password that VERIFIES, trying candidates in order. None:
    * XOR obfuscation (out of scope), an unknown layout, or no
    * candidate verifies.
    */
  private def rc4SpecFor(fp: Array[Byte],
                         passwords: Seq[String]): Option[Rc4Spec] = {
    if (fp.length < 6 || u16(fp, 0) != 1) return None // 0 = XOR: refuse
    val vMajor = u16(fp, 2)
    val vMinor = u16(fp, 4)
    if (vMajor == 1 && vMinor == 1) {
      // §2.3.6: RC4 standard — Salt16 ‖ EncryptedVerifier16 ‖ Hash16
      if (fp.length < 6 + 48) return None
      val salt = java.util.Arrays.copyOfRange(fp, 6, 22)
      val encVerifier = java.util.Arrays.copyOfRange(fp, 22, 38)
      val encHash = java.util.Arrays.copyOfRange(fp, 38, 54)
      passwords.iterator.map { pw =>
        // §2.3.6.2: MD5 of password, truncate 5, 16× (trunc‖salt) fold
        val trunc = java.util.Arrays.copyOfRange(md5(utf16(pw)), 0, 5)
        val buf = new Array[Byte](336)
        var i = 0
        while (i < 16) {
          System.arraycopy(trunc, 0, buf, i * 21, 5)
          System.arraycopy(salt, 0, buf, i * 21 + 5, 16)
          i += 1
        }
        val keyBase = java.util.Arrays.copyOfRange(md5(buf), 0, 5)
        def blockKey(b: Int): Array[Byte] = md5(keyBase, le32(b))
        // §2.3.6.4: one keystream decrypts verifier then its hash
        val both = PdfCrypt.rc4(blockKey(0), encVerifier ++ encHash)
        val verifier = java.util.Arrays.copyOfRange(both, 0, 16)
        val vHash = java.util.Arrays.copyOfRange(both, 16, 32)
        if (java.util.Arrays.equals(md5(verifier), vHash))
          Some(Rc4Spec(blockKey)) else None
      }.collectFirst { case Some(s) => s }
    } else if (vMinor == 2 && (vMajor == 2 || vMajor == 3 || vMajor == 4)) {
      // §2.3.5: RC4 CryptoAPI — wEncryptionType(2) ‖ version(4) ‖
      // headerFlags(4) ‖ headerSize(4) ‖ header ‖ verifier
      if (fp.length < 14) return None
      val headerSize = u32(fp, 10).toInt
      if (headerSize < 32 || 14 + headerSize > fp.length) return None
      val keyBits = u32(fp, 14 + 16).toInt
      val keyLen = if (keyBits == 0) 5 else keyBits / 8 // 0 → 40-bit
      val p = 14 + headerSize
      if (p + 4 > fp.length) return None
      val saltSize = u32(fp, p).toInt
      if (saltSize != 16 || p + 4 + 16 + 16 + 4 + 20 > fp.length) return None
      val salt = java.util.Arrays.copyOfRange(fp, p + 4, p + 20)
      val encVerifier = java.util.Arrays.copyOfRange(fp, p + 20, p + 36)
      val encHash = java.util.Arrays.copyOfRange(fp, p + 40, p + 60)
      passwords.iterator.map { pw =>
        val h = sha("SHA-1", salt, utf16(pw))
        def blockKey(b: Int): Array[Byte] = {
          val full = sha("SHA-1", h, le32(b))
          // §2.3.5.2: a 40-bit key zero-pads to 16 bytes
          if (keyLen == 5) fitZero(full, 5, 16)
          else java.util.Arrays.copyOfRange(full, 0, keyLen)
        }
        val both = PdfCrypt.rc4(blockKey(0), encVerifier ++ encHash)
        val verifier = java.util.Arrays.copyOfRange(both, 0, 16)
        val vHash = java.util.Arrays.copyOfRange(both, 16, 36)
        if (java.util.Arrays.equals(sha("SHA-1", verifier), vHash))
          Some(Rc4Spec(blockKey)) else None
      }.collectFirst { case Some(s) => s }
    } else None
  }

  private def fitZero(bytes: Array[Byte], take: Int,
                      len: Int): Array[Byte] = {
    val out = new Array[Byte](len)
    System.arraycopy(bytes, 0, out, 0, take)
    out
  }

  /** Decrypt a BIFF8 Workbook stream whose FilePass record verifies
    * against a candidate password. The cipher position covers EVERY
    * byte of the stream (headers and plaintext records advance the
    * keystream without being XOR'd), rekeying at each 1024-byte
    * boundary; the FilePass record itself, the never-encrypted
    * records and BoundSheet8's lbPlyPos stay plaintext (MS-XLS
    * §2.2.10). Returns the decrypted stream copy, or None when the
    * stream is not RC4-encrypted or no candidate verifies.
    */
  def decryptBiff8(wb: Array[Byte],
                   passwords: Seq[String] = CandidatePasswords): Option[Array[Byte]] = try {
    // find the FilePass record (it precedes any encrypted payload)
    var fpBody: Array[Byte] = null
    var pos = 0
    while (fpBody == null && pos + 4 <= wb.length) {
      val typ = u16(wb, pos)
      val len = u16(wb, pos + 2)
      if (pos + 4 + len > wb.length) return None
      if (typ == 0x002F)
        fpBody = java.util.Arrays.copyOfRange(wb, pos + 4, pos + 4 + len)
      pos += 4 + len
    }
    if (fpBody == null) return None
    val spec = rc4SpecFor(fpBody, passwords) match {
      case Some(s) => s
      case None    => return None
    }

    // one sequential pass: a keystream synchronized to the absolute
    // stream position, applied only to encrypted payload bytes
    val out = wb.clone()
    var ks: Array[Byte] = null // current 1024-byte block's keystream
    var ksBlock = -1
    def keyByte(streamPos: Int): Byte = {
      val block = streamPos / 1024
      if (block != ksBlock) {
        ks = PdfCrypt.rc4(spec.blockKey(block), new Array[Byte](1024))
        ksBlock = block
      }
      ks(streamPos % 1024)
    }
    def decrypt(from: Int, len: Int): Unit = {
      var i = 0
      while (i < len) {
        out(from + i) = (out(from + i) ^ keyByte(from + i)).toByte
        i += 1
      }
    }
    pos = 0
    while (pos + 4 <= wb.length) {
      val typ = u16(wb, pos)
      val len = u16(wb, pos + 2)
      val body = pos + 4
      if (body + len > wb.length) return Some(out) // torn tail
      if (!NeverEncrypted.contains(typ) && len > 0) {
        if (typ == RecBoundSheet8 && len >= 4)
          decrypt(body + 4, len - 4) // lbPlyPos stays plaintext
        else decrypt(body, len)
      }
      pos = body + len
    }
    Some(out)
  } catch { case _: Exception => None }
}
