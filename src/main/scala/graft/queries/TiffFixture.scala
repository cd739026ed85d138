package graft.queries

/** INDEPENDENT spec-side baseline-TIFF writer (the [[WebpFixture]]
  * m28 discipline): TIFF 6.0 headers/IFDs written forward from the
  * public spec — both byte orders, 8-bit grayscale, single strip,
  * uncompressed (Compression=1) and PackBits (32773, per-row runs as
  * §9 requires). The scanner class: this is what a digitized-document
  * corpus actually ships. No code shared with the engine's decode
  * path (JDK ImageIO's TIFF plugin).
  */
object TiffFixture {

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
  private def le32(v: Long): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
  private def be16(v: Int): Array[Byte] =
    Array(((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
  private def be32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
      ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)

  /** PackBits one row (TIFF 6.0 §9: each row starts fresh). */
  private def packBitsRow(row: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var i = 0
    while (i < row.length) {
      // count a run at i
      var run = 1
      while (i + run < row.length && row(i + run) == row(i) && run < 128)
        run += 1
      if (run >= 2) {
        out.write(257 - run) // -(run-1) as unsigned byte
        out.write(row(i))
        i += run
      } else {
        // literal stretch until the next run of >= 3 (or 128 cap)
        var lit = 1
        var j = i + 1
        var break = false
        while (!break && j < row.length && lit < 128) {
          var r = 1
          while (j + r < row.length && row(j + r) == row(j) && r < 3) r += 1
          if (r >= 3) break = true
          else { lit += 1; j += 1 }
        }
        out.write(lit - 1)
        out.write(row, i, lit)
        i += lit
      }
    }
    out.toByteArray
  }

  /** A baseline TIFF: 8-bit samples, one strip, grayscale
    * (BlackIsZero) or RGB per `rgb`. `pixels(i)` is the gray value of
    * pixel i in row-major order (RGB writes it to all three
    * channels, keeping expectations exact — the JDK reads gray
    * payloads through a LINEAR-light color model whose `getRGB`
    * applies the sRGB curve, so only RGB rows carry closed-form
    * values). `bigEndian` writes the MM variant; `packBits` swaps
    * Compression 1 → 32773 with per-row runs.
    */
  def tiff(w: Int, h: Int, pixels: Int => Int,
           bigEndian: Boolean = false,
           packBits: Boolean = false,
           rgb: Boolean = false): Array[Byte] = {
    val spp = if (rgb) 3 else 1
    val raw = new Array[Byte](w * h * spp)
    var i = 0
    while (i < w * h) {
      val v = (pixels(i) & 0xFF).toByte
      var s = 0
      while (s < spp) { raw(i * spp + s) = v; s += 1 }
      i += 1
    }
    val strip =
      if (!packBits) raw
      else (0 until h).flatMap(y => packBitsRow(
        java.util.Arrays.copyOfRange(raw, y * w * spp, (y + 1) * w * spp))
      ).toArray
    val u16 = if (bigEndian) be16 _ else le16 _
    val u32 = if (bigEndian) be32 _ else le32 _
    val nEntries = 9
    val ifdOffset = 8L
    // layout: header(8) ‖ IFD ‖ [RGB BitsPerSample triple] ‖ strip
    val afterIfd = 8 + 2 + nEntries * 12 + 4
    val bpsOffset = afterIfd.toLong
    val stripOffset = if (rgb) afterIfd + 6L else afterIfd.toLong
    // a SHORT value is LEFT-justified in the 4-byte value field,
    // in either byte order (TIFF 6.0 "Value/Offset")
    def shortVal(v: Int): Array[Byte] = u16(v) ++ Array[Byte](0, 0)
    def entry(tag: Int, typ: Int, count: Long,
              value: Array[Byte]): Array[Byte] =
      u16(tag) ++ u16(typ) ++ u32(count) ++ value
    val bitsEntry =
      if (rgb) entry(258, 3, 3, u32(bpsOffset)) // offset to 3 shorts
      else entry(258, 3, 1, shortVal(8))
    val entries =
      entry(256, 3, 1, shortVal(w)) ++ // ImageWidth
        entry(257, 3, 1, shortVal(h)) ++ // ImageLength
        bitsEntry ++
        entry(259, 3, 1, shortVal(if (packBits) 32773 else 1)) ++
        entry(262, 3, 1, shortVal(if (rgb) 2 else 1)) ++ // photometric
        entry(273, 4, 1, u32(stripOffset)) ++ // StripOffsets
        entry(277, 3, 1, shortVal(spp)) ++ // SamplesPerPixel
        entry(278, 3, 1, shortVal(h)) ++ // RowsPerStrip
        entry(279, 4, 1, u32(strip.length.toLong)) // StripByteCounts
    val header =
      (if (bigEndian) Array[Byte]('M', 'M') ++ be16(42)
       else Array[Byte]('I', 'I') ++ le16(42)) ++ u32(ifdOffset)
    header ++ u16(nEntries) ++ entries ++ u32(0L) ++
      (if (rgb) u16(8) ++ u16(8) ++ u16(8) else Array.emptyByteArray) ++
      strip
  }

  /** MULTI-PAGE RGB TIFF (little-endian, uncompressed): the scanned-
    * document shape — IFDs chained through their next-IFD pointers,
    * one strip per page. RGB for the closed-form `getRGB` round-trip.
    */
  def multiPageRgbTiff(pages: Seq[(Int, Int, Int => Int)]): Array[Byte] = {
    val nEntries = 9
    val ifdSize = 2 + nEntries * 12 + 4
    // block i = IFD ++ bps(6) ++ strip; blocks laid out sequentially
    val stripLens = pages.map { case (w, h, _) => w * h * 3 }
    val starts = pages.indices.scanLeft(8L) { (acc, i) =>
      acc + ifdSize + 6 + stripLens(i)
    }
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array[Byte]('I', 'I'), 0, 2)
    out.write(le16(42), 0, 2); out.write(le32(8L), 0, 4)
    pages.zipWithIndex.foreach { case ((w, h, pixels), pi) =>
      val ifdOff = starts(pi)
      val bpsOff = ifdOff + ifdSize
      val stripOff = bpsOff + 6
      val next = if (pi == pages.length - 1) 0L else starts(pi + 1)
      def shortVal(v: Int): Array[Byte] = le16(v) ++ Array[Byte](0, 0)
      def entry(tag: Int, typ: Int, count: Long,
                value: Array[Byte]): Array[Byte] =
        le16(tag) ++ le16(typ) ++ le32(count) ++ value
      val entries =
        entry(256, 3, 1, shortVal(w)) ++
          entry(257, 3, 1, shortVal(h)) ++
          entry(258, 3, 3, le32(bpsOff)) ++
          entry(259, 3, 1, shortVal(1)) ++
          entry(262, 3, 1, shortVal(2)) ++
          entry(273, 4, 1, le32(stripOff)) ++
          entry(277, 3, 1, shortVal(3)) ++
          entry(278, 3, 1, shortVal(h)) ++
          entry(279, 4, 1, le32(stripLens(pi).toLong))
      out.write(le16(nEntries), 0, 2)
      out.write(entries, 0, entries.length)
      out.write(le32(next), 0, 4)
      out.write(le16(8) ++ le16(8) ++ le16(8), 0, 6)
      val strip = new Array[Byte](stripLens(pi))
      var i = 0
      while (i < w * h) {
        val v = (pixels(i) & 0xFF).toByte
        strip(i * 3) = v; strip(i * 3 + 1) = v; strip(i * 3 + 2) = v
        i += 1
      }
      out.write(strip, 0, strip.length)
    }
    out.toByteArray
  }

  /** Grayscale convenience (the scanner class). */
  def grayTiff(w: Int, h: Int, pixels: Int => Int,
               bigEndian: Boolean = false,
               packBits: Boolean = false): Array[Byte] =
    tiff(w, h, pixels, bigEndian, packBits)

  /** RGB convenience (exact `getRGB` round-trip for closed forms). */
  def rgbTiff(w: Int, h: Int, pixels: Int => Int,
              bigEndian: Boolean = false,
              packBits: Boolean = false): Array[Byte] =
    tiff(w, h, pixels, bigEndian, packBits, rgb = true)
}
