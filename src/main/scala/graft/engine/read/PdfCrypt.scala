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
  * padding). Revision 5/6 (AES-256) is NOT attempted. MD5/AES come
  * from the JDK; RC4 is the spec's 20-line key-schedule, written
  * here.
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
