package graft.engine.read

/** PDF standard security handler (ISO 32000-1 §7.6.3), EMPTY USER
  * PASSWORD only — the dominant real-world case: most "encrypted"
  * PDFs in a crawl are owner-password-protected (printing/editing
  * restrictions) with a blank user password, which the spec's own
  * algorithms open without any secret. Anything that does not verify
  * against the blank password stays refused (the house stance for
  * genuinely protected content).
  *
  * Covered: revisions 2–4 — RC4 40–128 bit (V1/V2) and AES-128-CBC
  * (V4 `/CFM /AESV2`, per-object `sAlT` salt, leading IV, PKCS#5
  * padding) — plus revisions 5/6 (V5 AES-256): the /U validation
  * salt hash (R6 with the hardened ISO 32000-2 §7.6.4.3.4 2.B
  * iteration) validates the blank password and /UE unwraps the file
  * key, which V5 uses directly for every object (no per-object
  * derivation). MD5/SHA/AES come from the JDK; RC4 is the spec's
  * 20-line key-schedule, written here.
  */
private[read] object PdfCrypt {

  /** The 32-byte standard padding string (ISO 32000-1 Table 21's
    * algorithm inputs).
    */
  val Pad: Array[Byte] = Array(
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
    0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
    0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A).map(_.toByte)

  def md5(parts: Array[Byte]*): Array[Byte] = {
    val d = java.security.MessageDigest.getInstance("MD5")
    parts.foreach(d.update)
    d.digest()
  }

  /** Plain RC4 (the published key schedule + PRGA). */
  def rc4(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val s = Array.tabulate(256)(identity)
    var j = 0
    var i = 0
    while (i < 256) {
      j = (j + s(i) + (key(i % key.length) & 0xFF)) & 0xFF
      val t = s(i); s(i) = s(j); s(j) = t
      i += 1
    }
    val out = new Array[Byte](data.length)
    var a = 0
    var b = 0
    var k = 0
    while (k < data.length) {
      a = (a + 1) & 0xFF
      b = (b + s(a)) & 0xFF
      val t = s(a); s(a) = s(b); s(b) = t
      out(k) = (data(k) ^ s((s(a) + s(b)) & 0xFF)).toByte
      k += 1
    }
    out
  }

  private def intLE(v: Long): Array[Byte] = Array(
    (v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
    ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)

  /** Algorithm 2: the file encryption key for the EMPTY user
    * password. `length` in bits (ignored below R3 — 40-bit).
    */
  def fileKey(r: Int, length: Int, o: Array[Byte], p: Long,
              id0: Array[Byte], encryptMetadata: Boolean): Array[Byte] = {
    val n = if (r == 2) 5 else math.max(5, math.min(16, length / 8))
    val extra =
      if (r >= 4 && !encryptMetadata)
        Array(0xFF.toByte, 0xFF.toByte, 0xFF.toByte, 0xFF.toByte)
      else Array.emptyByteArray
    var key = md5(Pad, o, intLE(p), id0, extra).take(n)
    if (r >= 3) {
      var i = 0
      while (i < 50) { key = md5(key.take(n)).take(n); i += 1 }
    }
    key
  }

  /** Algorithms 4/5 check: does `key` open the blank user password
    * against the stored /U?
    */
  def verifyEmptyUser(r: Int, key: Array[Byte], u: Array[Byte],
                      id0: Array[Byte]): Boolean = {
    if (u == null || u.length < 16) return false
    if (r == 2) {
      java.util.Arrays.equals(rc4(key, Pad), u.take(32))
    } else {
      var x = md5(Pad, id0)
      x = rc4(key, x)
      var i = 1
      while (i <= 19) {
        val k = key.map(b => (b ^ i).toByte)
        x = rc4(k, x)
        i += 1
      }
      java.util.Arrays.equals(x, u.take(16))
    }
  }

  /** Algorithm 1: the per-object key. */
  def objectKey(base: Array[Byte], num: Int, gen: Int,
                aes: Boolean): Array[Byte] = {
    val salt =
      if (aes) Array(0x73.toByte, 0x41.toByte, 0x6C.toByte, 0x54.toByte)
      else Array.emptyByteArray
    val ext = md5(base,
      Array((num & 0xFF).toByte, ((num >> 8) & 0xFF).toByte,
        ((num >> 16) & 0xFF).toByte,
        (gen & 0xFF).toByte, ((gen >> 8) & 0xFF).toByte),
      salt)
    ext.take(math.min(base.length + 5, 16))
  }

  // ---- AES-256 (V5: R5 legacy / R6 ISO 32000-2) ---------------------

  private def sha(alg: String, parts: Array[Byte]*): Array[Byte] = {
    val d = java.security.MessageDigest.getInstance(alg)
    parts.foreach(d.update)
    d.digest()
  }

  private def aesCbc(mode: Int, key: Array[Byte], iv: Array[Byte],
                     data: Array[Byte]): Array[Byte] = {
    val c = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
    c.init(mode, new javax.crypto.spec.SecretKeySpec(key, "AES"),
      new javax.crypto.spec.IvParameterSpec(iv))
    c.doFinal(data)
  }

  /** Algorithm 2.B (R6): the hardened hash — SHA-256 seed, then
    * rounds of AES-128-CBC over 64 repetitions of (pw ‖ K ‖ udata)
    * with the digest choice steered by the ciphertext, at least 64
    * rounds, stopping when the last byte of E ≤ rounds − 32.
    */
  def hash2B(password: Array[Byte], salt: Array[Byte],
             udata: Array[Byte]): Array[Byte] = {
    var k = sha("SHA-256", password, salt, udata)
    var e = Array.emptyByteArray
    var i = 0
    while (i < 64 || (e.last & 0xFF) > i - 32) {
      val block = password ++ k ++ udata
      val k1 = new Array[Byte](block.length * 64)
      var j = 0
      while (j < 64) {
        System.arraycopy(block, 0, k1, j * block.length, block.length)
        j += 1
      }
      e = aesCbc(javax.crypto.Cipher.ENCRYPT_MODE,
        k.take(16), k.slice(16, 32), k1)
      var sum = 0
      var b = 0
      while (b < 16) { sum += e(b) & 0xFF; b += 1 }
      k = sum % 3 match {
        case 0 => sha("SHA-256", e)
        case 1 => sha("SHA-384", e)
        case _ => sha("SHA-512", e)
      }
      i += 1
    }
    k.take(32)
  }

  /** The 32-byte file key for the BLANK user password under V5:
    * validate against /U (48 bytes: hash ‖ validation salt ‖ key
    * salt), then unwrap /UE. None when validation fails.
    */
  def fileKeyV5(r: Int, u: Array[Byte], ue: Array[Byte]): Option[Array[Byte]] = {
    if (u == null || u.length < 48 || ue == null || ue.length < 32)
      return None
    val hash = u.take(32)
    val validationSalt = u.slice(32, 40)
    val keySalt = u.slice(40, 48)
    val empty = Array.emptyByteArray
    val candidate =
      if (r == 6) hash2B(empty, validationSalt, empty)
      else sha("SHA-256", validationSalt) // R5: simple SHA-256(pw‖salt)
    if (!java.util.Arrays.equals(candidate, hash)) return None
    val intermediate =
      if (r == 6) hash2B(empty, keySalt, empty)
      else sha("SHA-256", keySalt)
    try Some(aesCbc(javax.crypto.Cipher.DECRYPT_MODE,
      intermediate, new Array[Byte](16), ue.take(32)))
    catch { case _: Exception => None }
  }

  /** Decrypt one object's bytes: RC4, or AES-128-CBC with the
    * leading IV and PKCS#5 padding (tolerantly stripped — torn
    * ciphertext keeps what decodes).
    */
  def decrypt(objKey: Array[Byte], data: Array[Byte],
              aes: Boolean): Array[Byte] = {
    if (data == null || data.isEmpty) return data
    if (!aes) return rc4(objKey, data)
    if (data.length < 32 || (data.length - 16) % 16 != 0) {
      // not a whole AES block layout: keep the usable whole blocks
      if (data.length <= 16) return Array.emptyByteArray
    }
    try {
      val usable = ((data.length - 16) / 16) * 16
      if (usable <= 0) return Array.emptyByteArray
      val cipher = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
      cipher.init(javax.crypto.Cipher.DECRYPT_MODE,
        new javax.crypto.spec.SecretKeySpec(objKey, "AES"),
        new javax.crypto.spec.IvParameterSpec(data.take(16)))
      val out = cipher.doFinal(data, 16, usable)
      val padLen = out.last & 0xFF
      if (padLen >= 1 && padLen <= 16 && padLen <= out.length)
        java.util.Arrays.copyOfRange(out, 0, out.length - padLen)
      else out
    } catch { case _: Exception => Array.emptyByteArray }
  }
}
