package graft.multimodal

/** Windows ICO/CUR (favicon) decode — a web-crawl staple ImageIO has
  * no reader for. The container (ICONDIR, from the published Windows
  * format) is a 6-byte header + 16-byte directory entries; each
  * member is either a PNG (modern, magic-detectable — routed through
  * the existing [[ImageDecode]] PNG path untouched) or a BMP *DIB*:
  * a `BITMAPINFOHEADER` whose `biHeight` is DOUBLED (XOR image +
  * AND transparency mask) with no `BITMAPFILEHEADER`. Decoding the
  * DIB is a RE-WRAP, not a new codec: synthesize the 14-byte file
  * header, halve the height, and the JDK's own BMP reader — already
  * the front door's BMP decoder — does the pixels. The AND mask is
  * ignored (dedup/stats read luma, not alpha — the ImageMask
  * posture).
  *
  * [[decode]] picks the LARGEST member (the inventory/dedup
  * representative); [[dimensions]] reads the directory alone.
  */
object Ico {

  private def u16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8)
  private def u32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xFFL) | ((b(off + 1) & 0xFFL) << 8) |
      ((b(off + 2) & 0xFFL) << 16) | ((b(off + 3) & 0xFFL) << 24)
  private def putU32(b: Array[Byte], off: Int, v: Long): Unit = {
    b(off) = (v & 0xFF).toByte
    b(off + 1) = ((v >> 8) & 0xFF).toByte
    b(off + 2) = ((v >> 16) & 0xFF).toByte
    b(off + 3) = ((v >> 24) & 0xFF).toByte
  }

  /** ICONDIR: reserved 0, type 1 (icon) or 2 (cursor), count ≥ 1. */
  def isIco(b: Array[Byte]): Boolean =
    b != null && b.length >= 6 + 16 && b(0) == 0 && b(1) == 0 &&
      (b(2) == 1 || b(2) == 2) && b(3) == 0 && {
        val n = u16(b, 4)
        n >= 1 && n <= 1024 && 6 + 16L * n <= b.length
      }

  /** Directory entries as (width, height, size, offset); a directory
    * 0 means 256 per the format.
    */
  private def entries(b: Array[Byte]): Seq[(Int, Int, Long, Long)] = {
    val n = u16(b, 4)
    (0 until n).flatMap { i =>
      val e = 6 + 16 * i
      val w = if ((b(e) & 0xFF) == 0) 256 else b(e) & 0xFF
      val h = if ((b(e + 1) & 0xFF) == 0) 256 else b(e + 1) & 0xFF
      val size = u32(b, e + 8)
      val off = u32(b, e + 12)
      if (size >= 8 && off >= 6 + 16L * n && off + size <= b.length)
        Some((w, h, size, off))
      else None
    }
  }

  /** Largest member's DECLARED dimensions from the directory alone
    * (the ImageProbe discipline — no pixel decode). PNG members over
    * 255px lie in the directory (0 = 256 caps it); the probe prefers
    * the member's own header when it is a PNG.
    */
  def dimensions(b: Array[Byte]): Option[(Int, Int)] = {
    if (!isIco(b)) return None
    val es = entries(b)
    if (es.isEmpty) return None
    val (w, h, size, off) = es.maxBy { case (ww, hh, _, _) =>
      ww.toLong * hh
    }
    // a PNG member declares its real size in its own IHDR
    if (size >= 24 && (b(off.toInt) & 0xFF) == 0x89 &&
      b(off.toInt + 1) == 'P') {
      val p = off.toInt
      val iw = ((b(p + 16) & 0xFF) << 24) | ((b(p + 17) & 0xFF) << 16) |
        ((b(p + 18) & 0xFF) << 8) | (b(p + 19) & 0xFF)
      val ih = ((b(p + 20) & 0xFF) << 24) | ((b(p + 21) & 0xFF) << 16) |
        ((b(p + 22) & 0xFF) << 8) | (b(p + 23) & 0xFF)
      if (iw > 0 && ih > 0) return Some((iw, ih))
    }
    Some((w, h))
  }

  /** The largest member as a BufferedImage: PNG members route through
    * [[ImageDecode]] untouched; DIB members re-wrap into a BMP file
    * for the JDK's own reader. None when nothing decodes.
    */
  def decode(b: Array[Byte]): Option[java.awt.image.BufferedImage] = {
    if (!isIco(b)) return None
    val es = entries(b).sortBy { case (w, h, _, _) => -(w.toLong * h) }
    es.iterator.flatMap { case (_, _, size, off) =>
      decodeMember(b, off.toInt, size.toInt)
    }.take(1).toSeq.headOption
  }

  private def decodeMember(b: Array[Byte], off: Int,
                           size: Int): Option[java.awt.image.BufferedImage] = {
    if ((b(off) & 0xFF) == 0x89 && b(off + 1) == 'P')
      return ImageDecode.decode(
        java.util.Arrays.copyOfRange(b, off, off + size))
    // BITMAPINFOHEADER: biSize 40 leads; biHeight at +8 is DOUBLED
    val biSize = u32(b, off)
    if (biSize != 40 || size < 40) return None
    val dib = java.util.Arrays.copyOfRange(b, off, off + size)
    val h2 = u32(dib, 8)
    // the doubled height is even and positive for a well-formed icon
    if (h2 <= 0 || h2 % 2 != 0 || h2 > 4096) return None
    putU32(dib, 8, h2 / 2)
    val bpp = u16(dib, 14)
    val clrUsed = u32(dib, 32)
    val palette =
      if (bpp > 8) 0L
      else if (clrUsed > 0) clrUsed else 1L << bpp
    // ICO DIBs conventionally write biSizeImage to include the AND
    // mask (or 0); recompute the XOR image size so the BMP reader
    // never walks into the mask
    val w = u32(dib, 4)
    if (w <= 0 || w > 4096) return None
    val xorRow = ((w * bpp + 31) / 32) * 4
    putU32(dib, 20, xorRow * (h2 / 2))
    val pixelOff = 14L + 40L + palette * 4
    val header = new Array[Byte](14)
    header(0) = 'B'; header(1) = 'M'
    putU32(header, 2, 14L + dib.length)
    putU32(header, 10, pixelOff)
    ImageDecode.decode(header ++ dib)
  }
}
