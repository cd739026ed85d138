package graft.multimodal

/** Shared spec-side media fixture builders — RIFF/AVI envelopes and
  * the deterministic JPEG frame family. Builder code independent of
  * the walks under test (the house fixture stance), kept in ONE
  * place instead of a copy per spec.
  */
object MediaTestBuilders {

  def u32le(v: Long): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  def chunk(id: String, body: Array[Byte]): Array[Byte] =
    id.getBytes("US-ASCII") ++ u32le(body.length.toLong) ++ body ++
      (if (body.length % 2 == 1) Array(0.toByte) else Array.empty[Byte])

  def list(subtype: String, body: Array[Byte]): Array[Byte] =
    chunk("LIST", subtype.getBytes("US-ASCII") ++ body)

  def avi(parts: Array[Byte]*): Array[Byte] = {
    val inner = "AVI ".getBytes("US-ASCII") ++ parts.flatten
    "RIFF".getBytes("US-ASCII") ++ u32le(inner.length.toLong) ++ inner
  }

  def movi(frames: Seq[Array[Byte]], id: String = "00dc"): Array[Byte] =
    list("movi", frames.flatMap(f => chunk(id, f)).toArray)

  /** Gray PNG of `v(x, y)` luma values through JDK ImageIO. */
  def grayPng(w: Int, h: Int, v: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val g = v(x, y) & 0xFF
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val bos = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(img, "png", bos), "no png writer")
    bos.toByteArray
  }

  /** Mono 16-bit PCM WAV of the given [-1, 1] samples. */
  def wav16(x: Array[Double], rate: Int): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def w32(v: Long): Unit =
      (0 to 3).foreach(i => bos.write(((v >> (8 * i)) & 0xff).toInt))
    def w16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
    bos.write("RIFF".getBytes); w32(36L + x.length * 2)
    bos.write("WAVE".getBytes)
    bos.write("fmt ".getBytes); w32(16L)
    w16(1); w16(1); w32(rate.toLong); w32(rate.toLong * 2); w16(2); w16(16)
    bos.write("data".getBytes); w32(x.length.toLong * 2)
    for (s <- x) {
      val v = math.round(s * 32767).toInt
      bos.write(v & 0xff); bos.write((v >> 8) & 0xff)
    }
    bos.toByteArray
  }

  /** Deterministic 64×64 gray block-pattern JPEG; distinct `mul`
    * values give distinct dHashes (every expectation built on these
    * derives from frame BYTE identity, never JPEG numerics).
    */
  def jpegFrame(mul: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      64, 64, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 64; x <- 0 until 64) {
      val g = 20 + ((x / 8 * mul + (y / 8) * 17) % 90)
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val bos = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(img, "jpg", bos), "no jpg writer")
    bos.toByteArray
  }
}
