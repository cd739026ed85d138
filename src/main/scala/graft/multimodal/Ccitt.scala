package graft.multimodal

/** CCITT Group 3 / Group 4 fax decoder (ITU-T T.4 / T.6), written
  * from the published recommendations — the sample-decode behind PDF
  * `CCITTFaxDecode` (ISO 32000-1 §7.4.6) and TIFF compressions 2/3/4.
  * Scanned fax-era documents are a dominant slice of document crawls;
  * without this codec a G3/G4 PDF page extracts no pixels and never
  * joins image dedup (reference behavior: tracebloc ingestors treat
  * scans as opaque binaries — this is the beyond-reference path that
  * lets a fax scan dedup against its PNG/TIFF/JPEG twins).
  *
  * Decode-only, crawl posture: any structural violation returns None
  * (the caller records a skipped image), never a throw. Verified by
  * JDK triangulation (CcittSpec): the JDK's bundled TIFF plugin
  * independently encodes and decodes T.4/T.6, so house-decoded pixels
  * are compared bit-for-bit against the JDK's on the same payloads.
  *
  * Supported: T.4 1-D (Modified Huffman), T.4 2-D (Modified READ,
  * K&gt;0 with per-line EOL+mode bit), T.6 (MMR, K&lt;0), TIFF
  * compression-2 byte-aligned MH rows (`encodedByteAlign`), fill
  * bits, RTC/EOFB tails, `BlackIs1` both ways. Refused: uncompressed
  * (T.4 §4.2.1.6 extension) and any 2-D extension code.
  */
object Ccitt {

  /** Hard bounds: a 100-byte hostile stream declaring a giant raster
    * must refuse before allocation (same posture as Pdf.MaxImagePixels).
    */
  private val MaxPixels: Long = 64L << 20
  private val MaxColumns = 1 << 16

  /** Decode `data` to packed 1-bpp rows, MSB-first, rowBytes =
    * ceil(columns/8). Bit sense follows PDF semantics: with
    * `blackIs1=false` (the default) black pixels decode to 0 bits and
    * white to 1; with `blackIs1=true` the opposite. `k` selects the
    * scheme exactly like `CCITTFaxDecode /K`: 0 pure 1-D, &gt;0 mixed
    * 1-D/2-D (mode bit after each EOL), &lt;0 pure 2-D (T.6).
    * Returns None unless exactly `rows` lines decode cleanly at
    * exactly `columns` pixels each.
    */
  def decode(data: Array[Byte], columns: Int, rows: Int, k: Int,
             encodedByteAlign: Boolean = false,
             blackIs1: Boolean = false): Option[Array[Byte]] = {
    if (data == null || data.isEmpty) return None
    if (columns <= 0 || columns > MaxColumns || rows <= 0 ||
      columns.toLong * rows > MaxPixels) return None
    val rowBytes = (columns + 7) >> 3
    val out = new Array[Byte](rowBytes * rows)
    val br = new BitReader(data)
    // `true` in a run/transition sense below always means BLACK; the
    // output bit for black is blackIs1, for white its complement.
    val blackBit = blackIs1

    // reference line transitions (positions where color changes,
    // strictly increasing; color at transition index i is black iff
    // i is even — lines start white). The imaginary line above the
    // first is all white: zero transitions.
    var ref = new Array[Int](0)
    val cur = new java.util.ArrayList[Int](64)

    var row = 0
    var firstLine = true
    while (row < rows) {
      cur.clear()
      if (encodedByteAlign && k >= 0) br.alignToByte()
      var is2d = k < 0
      if (k >= 0) {
        // consume fill + EOL when present; T.4 mandates an EOL before
        // every line but common writers (and TIFF compression-2 rows)
        // omit it — tolerate absence, assuming 1-D (the only
        // self-consistent reading for a missing mode bit).
        val sawEol = br.tryConsumeEol()
        if (sawEol && k > 0) {
          val b = br.readBit()
          if (b < 0) return None
          is2d = b == 0
        } else if (!sawEol && k > 0 && !firstLine) {
          // mid-stream lines of a K>0 stream carry their scheme in
          // the EOL's trailing bit; without an EOL fall back to 1-D
          is2d = false
        }
      } else if (encodedByteAlign) br.alignToByte()

      val ok = if (is2d) decode2dLine(br, columns, ref, cur)
      else decode1dLine(br, columns, cur)
      if (!ok) return None

      // render: line starts white; transitions flip. Set only the
      // bits of the "1" color.
      renderLine(out, row * rowBytes, columns, cur, blackBit)
      // adjacent equal transitions (zero-length runs from H-mode)
      // cancel for the next reference line
      ref = normalized(cur)
      row += 1
      firstLine = false
    }
    Some(out)
  }

  /** TIFF strip decode by compression tag: 2 = MH byte-aligned rows,
    * 3 = T.4 (t4Options bit0 selects 2-D, bit2 byte-align), 4 = T.6.
    * The house TIFF *image* route goes through the JDK plugin; this
    * entry exists so specs can triangulate house-vs-JDK on the same
    * strip bytes.
    */
  def decodeTiffStrip(data: Array[Byte], columns: Int, rows: Int,
                      compression: Int, t4Options: Long = 0L,
                      blackIs1: Boolean = false): Option[Array[Byte]] =
    compression match {
      case 2 => decode(data, columns, rows, k = 0,
        encodedByteAlign = true, blackIs1 = blackIs1)
      case 3 =>
        val k = if ((t4Options & 1L) != 0) 4 else 0
        decode(data, columns, rows, k,
          encodedByteAlign = (t4Options & 4L) != 0, blackIs1 = blackIs1)
      case 4 => decode(data, columns, rows, k = -1,
        encodedByteAlign = false, blackIs1 = blackIs1)
      case _ => None
    }

  /** Decode a whole CCITT-compressed bilevel TIFF to a BufferedImage
    * — the [[ImageDecode]] FALLBACK for payloads the JDK's own
    * `TIFFFaxDecompressor` crashes on (it throws AIOOBE on some
    * valid small strips, observed on its own writer's T.4/RLE
    * output). Deliberately narrow: bilevel (BitsPerSample 1),
    * PhotometricInterpretation WhiteIsZero (the universal CCITT
    * convention), FillOrder MSB-first, compressions 2/3/4 — anything
    * else returns None and stays with the JDK plugin.
    */
  def decodeTiffImage(b: Array[Byte]): Option[java.awt.image.BufferedImage] = {
    if (b == null || b.length < 16) return None
    val le = b(0) == 'I' && b(1) == 'I'
    val be = b(0) == 'M' && b(1) == 'M'
    if (!le && !be) return None
    def u16(o: Int): Int =
      if (o < 0 || o + 2 > b.length) -1
      else if (le) (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
      else ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
    def u32(o: Int): Long =
      if (o < 0 || o + 4 > b.length) -1L
      else if (le) (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
        ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
      else ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
        ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
    if (u16(2) != 42) return None
    val ifd = u32(4)
    if (ifd <= 0 || ifd > Int.MaxValue - 2) return None
    val n = u16(ifd.toInt)
    if (n <= 0 || n > 512) return None
    var tags = Map.empty[Int, (Int, Int, Int)]
    var i = 0
    while (i < n) {
      val e = ifd.toInt + 2 + i * 12
      if (e + 12 > b.length) return None
      tags += u16(e) -> ((u16(e + 2), u32(e + 4).toInt, e + 8))
      i += 1
    }
    def values(tag: Int): Seq[Long] = tags.get(tag) match {
      case None => Seq.empty
      case Some((tpe, count, valOff)) =>
        val sz = tpe match { case 3 => 2; case 4 => 4; case _ => 0 }
        if (sz == 0 || count <= 0 || count > (1 << 20)) return Seq.empty
        val base =
          if (sz * count <= 4) valOff
          else {
            val o = u32(valOff)
            if (o <= 0 || o + sz.toLong * count > b.length ||
              o > Int.MaxValue) return Seq.empty
            o.toInt
          }
        (0 until count).map(k =>
          if (sz == 2) u16(base + k * 2).toLong else u32(base + k * 4))
    }
    def one(tag: Int, dft: Long): Long = values(tag).headOption.getOrElse(dft)
    val w = one(256, -1).toInt
    val h = one(257, -1).toInt
    val comp = one(259, 1).toInt
    if (w <= 0 || h <= 0 || w.toLong * h > MaxPixels) return None
    if (comp != 2 && comp != 3 && comp != 4) return None
    if (one(258, 1) != 1) return None  // bilevel only
    if (one(262, 0) != 0) return None  // WhiteIsZero only
    if (one(266, 1) != 1) return None  // MSB-first fill order only
    val t4opts = one(293, one(292, 0))
    val rps = math.min(one(278, Long.MaxValue), h.toLong).toInt
    if (rps <= 0) return None
    val offs = values(273); val cnts = values(279)
    if (offs.isEmpty || offs.length != cnts.length) return None
    val rowBytes = (w + 7) >> 3
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_BINARY)
    val raster = img.getRaster
    var row0 = 0
    offs.zip(cnts).foreach { case (o, c) =>
      if (o < 0 || c <= 0 || o + c > b.length || row0 >= h) return None
      val sr = math.min(rps, h - row0)
      val strip = java.util.Arrays.copyOfRange(b, o.toInt, (o + c).toInt)
      // blackIs1 = true: sample 1 = black, matching WhiteIsZero
      val dec = decodeTiffStrip(strip, w, sr, comp, t4opts,
        blackIs1 = true).getOrElse(return None)
      var y = 0
      while (y < sr) {
        var x = 0
        while (x < w) {
          val bit = (dec(y * rowBytes + (x >> 3)) >> (7 - (x & 7))) & 1
          // TYPE_BYTE_BINARY default palette: 0 = black, 1 = white
          raster.setSample(x, row0 + y, 0, 1 - bit)
          x += 1
        }
        y += 1
      }
      row0 += sr
    }
    if (row0 == h) Some(img) else None
  }

  // ---- line decoders ----------------------------------------------

  private def decode1dLine(br: BitReader, columns: Int,
                           cur: java.util.ArrayList[Int]): Boolean = {
    var pos = 0
    var black = false
    while (pos < columns) {
      val run = decodeRun(br, black, columns)
      if (run < 0) return false
      pos += run
      if (pos > columns) return false
      cur.add(pos) // transition at end of this run (may be == columns)
      black = !black
    }
    // the final transition lands exactly at columns; drop it — it is
    // the line end, not a changing element
    if (!cur.isEmpty && cur.get(cur.size - 1) == columns)
      cur.remove(cur.size - 1)
    pos == columns
  }

  private def decode2dLine(br: BitReader, columns: Int, ref: Array[Int],
                           cur: java.util.ArrayList[Int]): Boolean = {
    var a0 = -1
    var black = false
    var ri = 0 // monotone pointer into ref
    var guard = 0
    while (a0 < columns) {
      guard += 1
      if (guard > (columns << 1) + 8) return false
      // b1: first ref transition > a0 whose color != current color
      while (ri < ref.length && ref(ri) <= a0) ri += 1
      var idx = ri
      // transition idx is a white→black change iff idx even
      val wantEven = !black
      if (idx < ref.length && ((idx & 1) == 0) != wantEven) idx += 1
      val b1 = if (idx < ref.length) ref(idx) else columns
      val b2 = if (idx + 1 < ref.length) ref(idx + 1) else columns

      mode(br) match {
        case ModePass =>
          if (b2 > columns) return false
          a0 = b2 // color unchanged, no transition recorded
          if (a0 >= columns && b2 == columns) {
            // pass running off the end only legal when it lands
            // exactly at columns
            return a0 == columns
          }
        case ModeHoriz =>
          val start = if (a0 < 0) 0 else a0
          val r1 = decodeRun(br, black, columns)
          if (r1 < 0) return false
          val r2 = decodeRun(br, !black, columns)
          if (r2 < 0) return false
          val t1 = start + r1
          val t2 = t1 + r2
          if (t2 > columns) return false
          cur.add(t1); cur.add(t2)
          a0 = t2
          if (a0 == columns) {
            trimLineEnd(cur, columns); return true
          }
        case ModeVert(d) =>
          val a1 = b1 + d
          if (a1 <= a0 && !(a0 < 0 && a1 == 0)) return false
          if (a1 < 0 || a1 > columns) return false
          cur.add(a1)
          black = !black
          a0 = a1
          if (a0 == columns) {
            trimLineEnd(cur, columns); return true
          }
        case ModeErr => return false
      }
    }
    a0 == columns
  }

  /** Transitions at exactly `columns` are the line end, not changing
    * elements — but only a trailing ODD count is droppable; a pair at
    * columns is a zero-length run that [[normalized]] cancels.
    */
  private def trimLineEnd(cur: java.util.ArrayList[Int],
                          columns: Int): Unit = {
    var n = 0
    var i = cur.size - 1
    while (i >= 0 && cur.get(i) == columns) { n += 1; i -= 1 }
    if ((n & 1) == 1) cur.remove(cur.size - 1)
  }

  private def normalized(cur: java.util.ArrayList[Int]): Array[Int] = {
    // cancel adjacent equal pairs (zero-length runs): they flip the
    // color twice at one position
    val buf = new java.util.ArrayList[Int](cur.size)
    var i = 0
    while (i < cur.size) {
      val v = cur.get(i)
      if (!buf.isEmpty && buf.get(buf.size - 1) == v)
        buf.remove(buf.size - 1)
      else buf.add(v)
      i += 1
    }
    val out = new Array[Int](buf.size)
    var j = 0
    while (j < out.length) { out(j) = buf.get(j); j += 1 }
    out
  }

  private def renderLine(out: Array[Byte], off: Int, columns: Int,
                         cur: java.util.ArrayList[Int],
                         blackBit: Boolean): Unit = {
    // line starts white; cur transitions flip color left→right
    var black = false
    var pos = 0
    var i = 0
    while (pos < columns) {
      val next = if (i < cur.size) math.min(cur.get(i), columns) else columns
      if (black == blackBit) {
        // this segment carries the "1" bit sense
        var p = pos
        while (p < next) { out(off + (p >> 3)) =
          (out(off + (p >> 3)) | (0x80 >> (p & 7))).toByte; p += 1 }
      }
      pos = next
      black = !black
      i += 1
      if (i > (columns << 1) + 8) return
    }
  }

  // ---- run-length (Modified Huffman) codes ------------------------

  /** Total run of `black` pixels: zero or more make-up codes then one
    * terminating code (T.4 §4.1/tables 2–4). −1 on malformed input.
    */
  private def decodeRun(br: BitReader, black: Boolean,
                        columns: Int): Int = {
    var total = 0
    var loops = 0
    while (loops < 40) {
      loops += 1
      val v = nextCode(br, black)
      if (v < 0) return -1
      total += v
      if (total > columns) return -1
      if (v < 64) return total // terminating code
    }
    -1
  }

  /** One Huffman code of the given color, −1 if nothing matches
    * within 14 bits (EOLs never match: no run code is ≥11 zeros).
    */
  private def nextCode(br: BitReader, black: Boolean): Int = {
    val table = if (black) BlackMap else WhiteMap
    var bits = 0
    var len = 0
    while (len < 14) {
      val b = br.readBit()
      if (b < 0) return -1
      bits = (bits << 1) | b
      len += 1
      val v = table.get((len << 16) | bits)
      if (v != null) return v.intValue()
    }
    -1
  }

  // ---- 2-D mode codes (T.4 table 1 / T.6 §2.2.4) ------------------

  private sealed trait Mode
  private case object ModePass extends Mode
  private case object ModeHoriz extends Mode
  private final case class ModeVert(d: Int) extends Mode
  private case object ModeErr extends Mode

  private def mode(br: BitReader): Mode = {
    // V0=1, VR1=011, VL1=010, H=001, P=0001, VR2=000011, VL2=000010,
    // VR3=0000011, VL3=0000010; anything longer (extensions,
    // uncompressed mode 0000001xxx, EOL) refuses.
    if (br.readBit() == 1) return ModeVert(0)
    if (br.readBit() == 1) {
      return if (br.readBit() == 1) ModeVert(1) else ModeVert(-1)
    }
    if (br.readBit() == 1) return ModeHoriz
    if (br.readBit() == 1) return ModePass
    if (br.readBit() == 1) {
      return if (br.readBit() == 1) ModeVert(2) else ModeVert(-2)
    }
    if (br.readBit() == 1) {
      return if (br.readBit() == 1) ModeVert(3) else ModeVert(-3)
    }
    ModeErr
  }

  // ---- bit reader -------------------------------------------------

  private final class BitReader(data: Array[Byte]) {
    private var bitPos = 0
    private val bitEnd = data.length * 8

    def readBit(): Int = {
      if (bitPos >= bitEnd) return -1
      val b = (data(bitPos >> 3) >> (7 - (bitPos & 7))) & 1
      bitPos += 1
      b
    }

    def alignToByte(): Unit = bitPos = (bitPos + 7) & ~7

    /** Consume fill zeros + EOL (000000000001) if present from the
      * current position; restores position and returns false when the
      * zeros do not terminate in an EOL within a bounded fill.
      */
    def tryConsumeEol(): Boolean = {
      val mark = bitPos
      var zeros = 0
      var b = readBit()
      while (b == 0 && zeros <= 4096) { zeros += 1; b = readBit() }
      if (b == 1 && zeros >= 11) true
      else { bitPos = mark; false }
    }
  }

  // ---- code tables (ITU-T T.4 tables 2, 3 and 3a) -----------------

  private def key(code: String): Int = {
    var bits = 0
    var i = 0
    while (i < code.length) {
      bits = (bits << 1) | (if (code.charAt(i) == '1') 1 else 0); i += 1
    }
    (code.length << 16) | bits
  }

  private val WhiteCodes: Seq[(String, Int)] = Seq(
    "00110101" -> 0, "000111" -> 1, "0111" -> 2, "1000" -> 3,
    "1011" -> 4, "1100" -> 5, "1110" -> 6, "1111" -> 7,
    "10011" -> 8, "10100" -> 9, "00111" -> 10, "01000" -> 11,
    "001000" -> 12, "000011" -> 13, "110100" -> 14, "110101" -> 15,
    "101010" -> 16, "101011" -> 17, "0100111" -> 18, "0001100" -> 19,
    "0001000" -> 20, "0010111" -> 21, "0000011" -> 22, "0000100" -> 23,
    "0101000" -> 24, "0101011" -> 25, "0010011" -> 26, "0100100" -> 27,
    "0011000" -> 28, "00000010" -> 29, "00000011" -> 30,
    "00011010" -> 31, "00011011" -> 32, "00010010" -> 33,
    "00010011" -> 34, "00010100" -> 35, "00010101" -> 36,
    "00010110" -> 37, "00010111" -> 38, "00101000" -> 39,
    "00101001" -> 40, "00101010" -> 41, "00101011" -> 42,
    "00101100" -> 43, "00101101" -> 44, "00000100" -> 45,
    "00000101" -> 46, "00001010" -> 47, "00001011" -> 48,
    "01010010" -> 49, "01010011" -> 50, "01010100" -> 51,
    "01010101" -> 52, "00100100" -> 53, "00100101" -> 54,
    "01011000" -> 55, "01011001" -> 56, "01011010" -> 57,
    "01011011" -> 58, "01001010" -> 59, "01001011" -> 60,
    "00110010" -> 61, "00110011" -> 62, "00110100" -> 63,
    // make-up codes
    "11011" -> 64, "10010" -> 128, "010111" -> 192, "0110111" -> 256,
    "00110110" -> 320, "00110111" -> 384, "01100100" -> 448,
    "01100101" -> 512, "01101000" -> 576, "01100111" -> 640,
    "011001100" -> 704, "011001101" -> 768, "011010010" -> 832,
    "011010011" -> 896, "011010100" -> 960, "011010101" -> 1024,
    "011010110" -> 1088, "011010111" -> 1152, "011011000" -> 1216,
    "011011001" -> 1280, "011011010" -> 1344, "011011011" -> 1408,
    "010011000" -> 1472, "010011001" -> 1536, "010011010" -> 1600,
    "011000" -> 1664, "010011011" -> 1728)

  private val BlackCodes: Seq[(String, Int)] = Seq(
    "0000110111" -> 0, "010" -> 1, "11" -> 2, "10" -> 3,
    "011" -> 4, "0011" -> 5, "0010" -> 6, "00011" -> 7,
    "000101" -> 8, "000100" -> 9, "0000100" -> 10, "0000101" -> 11,
    "0000111" -> 12, "00000100" -> 13, "00000111" -> 14,
    "000011000" -> 15, "0000010111" -> 16, "0000011000" -> 17,
    "0000001000" -> 18, "00001100111" -> 19, "00001101000" -> 20,
    "00001101100" -> 21, "00000110111" -> 22, "00000101000" -> 23,
    "00000010111" -> 24, "00000011000" -> 25, "000011001010" -> 26,
    "000011001011" -> 27, "000011001100" -> 28, "000011001101" -> 29,
    "000001101000" -> 30, "000001101001" -> 31, "000001101010" -> 32,
    "000001101011" -> 33, "000011010010" -> 34, "000011010011" -> 35,
    "000011010100" -> 36, "000011010101" -> 37, "000011010110" -> 38,
    "000011010111" -> 39, "000001101100" -> 40, "000001101101" -> 41,
    "000011011010" -> 42, "000011011011" -> 43, "000001010100" -> 44,
    "000001010101" -> 45, "000001010110" -> 46, "000001010111" -> 47,
    "000001100100" -> 48, "000001100101" -> 49, "000001010010" -> 50,
    "000001010011" -> 51, "000000100100" -> 52, "000000110111" -> 53,
    "000000111000" -> 54, "000000100111" -> 55, "000000101000" -> 56,
    "000001011000" -> 57, "000001011001" -> 58, "000000101011" -> 59,
    "000000101100" -> 60, "000001011010" -> 61, "000001100110" -> 62,
    "000001100111" -> 63,
    // make-up codes
    "0000001111" -> 64, "000011001000" -> 128, "000011001001" -> 192,
    "000001011011" -> 256, "000000110011" -> 320, "000000110100" -> 384,
    "000000110101" -> 448, "0000001101100" -> 512,
    "0000001101101" -> 576, "0000001001010" -> 640,
    "0000001001011" -> 704, "0000001001100" -> 768,
    "0000001001101" -> 832, "0000001110010" -> 896,
    "0000001110011" -> 960, "0000001110100" -> 1024,
    "0000001110101" -> 1088, "0000001110110" -> 1152,
    "0000001110111" -> 1216, "0000001010010" -> 1280,
    "0000001010011" -> 1344, "0000001010100" -> 1408,
    "0000001010101" -> 1472, "0000001011010" -> 1536,
    "0000001011011" -> 1600, "0000001100100" -> 1664,
    "0000001100101" -> 1728)

  /** Extended make-up codes 1792–2560 are shared by both colors
    * (T.4 table 3a).
    */
  private val SharedExt: Seq[(String, Int)] = Seq(
    "00000001000" -> 1792, "00000001100" -> 1856, "00000001101" -> 1920,
    "000000010010" -> 1984, "000000010011" -> 2048,
    "000000010100" -> 2112, "000000010101" -> 2176,
    "000000010110" -> 2240, "000000010111" -> 2304,
    "000000011100" -> 2368, "000000011101" -> 2432,
    "000000011110" -> 2496, "000000011111" -> 2560)

  private def toMap(codes: Seq[(String, Int)])
  : java.util.HashMap[Integer, Integer] = {
    val m = new java.util.HashMap[Integer, Integer](codes.size * 2)
    codes.foreach { case (c, v) => m.put(key(c), v) }
    m
  }

  private val WhiteMap = toMap(WhiteCodes ++ SharedExt)
  private val BlackMap = toMap(BlackCodes ++ SharedExt)
}
