package graft.queries

/** INDEPENDENT spec-side WebP/VP8L writer for gate fixtures — the
  * m28 discipline (the Ogg page writer there recomputes CRCs bitwise
  * rather than importing the reader's): everything here is written
  * forward from the RFC 9649 bitstream grammar, sharing NO code with
  * [[graft.multimodal.Vp8l]], so an encode→decode identity actually
  * crosses the spec, not one implementation talking to itself. The
  * PNG-twin gate closes the remaining loop through a third party:
  * the SAME pixels encoded by JDK ImageIO's PNG writer must produce
  * the SAME perceptual hash as this writer's VP8L.
  *
  * Deliberately minimal — literal-coded pixels under hand-chosen
  * COMPLETE prefix codes (flat 8-bit literals; Kraft sums checked by
  * construction), plus just enough surface to exercise each decoder
  * feature: subtract-green, a 4-color indexed palette with pixel
  * bundling, a color cache, one LZ77 row copy, and the lossy-VP8 /
  * VP8X container shapes for the probe.
  */
object WebpFixture {

  /** LSB-first bit writer (VP8L bit order); prefix-code bits are
    * written most-significant-code-bit first per RFC 1951 §3.1.1.
    */
  final class BitWriter {
    private val buf = scala.collection.mutable.ArrayBuffer.empty[Byte]
    private var cur = 0
    private var n = 0
    def writeBits(v: Int, bits: Int): Unit = {
      var i = 0
      while (i < bits) {
        cur |= ((v >> i) & 1) << n
        n += 1
        if (n == 8) { buf += cur.toByte; cur = 0; n = 0 }
        i += 1
      }
    }
    def writeCode(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) { writeBits((code >> i) & 1, 1); i -= 1 }
    }
    def bytes: Array[Byte] = {
      val out = buf.toArray
      if (n > 0) out :+ cur.toByte else out
    }
  }

  /** RFC 1951 §3.2.2 canonical code assignment: symbol → (code, len).
    */
  def canonicalCodes(lengths: Seq[Int]): Map[Int, (Int, Int)] = {
    val maxLen = if (lengths.isEmpty) 0 else lengths.max
    val blCount = new Array[Int](maxLen + 1)
    lengths.foreach(l => if (l > 0) blCount(l) += 1)
    val nextCode = new Array[Int](maxLen + 2)
    var code = 0
    for (l <- 1 to maxLen) {
      code = (code + blCount(l - 1)) << 1
      nextCode(l) = code
    }
    lengths.zipWithIndex.collect { case (l, sym) if l > 0 =>
      val c = nextCode(l)
      nextCode(l) += 1
      sym -> (c, l)
    }.toMap
  }

  private val ClOrder =
    Array(17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

  /** Write one "simple" prefix code (1 or 2 symbols). */
  def writeSimpleCode(bw: BitWriter, symbols: Seq[Int]): Unit = {
    require(symbols.nonEmpty && symbols.size <= 2)
    bw.writeBits(1, 1)
    bw.writeBits(symbols.size - 1, 1)
    if (symbols.head <= 1) { bw.writeBits(0, 1); bw.writeBits(symbols.head, 1) }
    else { bw.writeBits(1, 1); bw.writeBits(symbols.head, 8) }
    if (symbols.size == 2) bw.writeBits(symbols(1), 8)
  }

  /** Write a "normal" prefix code transmitting `lengths` (which must
    * satisfy Kraft equality over its nonzero entries). Lengths are
    * emitted one code-length symbol per alphabet symbol (no repeat
    * ops), stopped early by the max-symbol field when the tail is
    * all-zero.
    */
  def writeNormalCode(bw: BitWriter, lengths: Seq[Int]): Unit = {
    val kraft = lengths.filter(_ > 0).map(l => math.pow(2, -l)).sum
    require(math.abs(kraft - 1.0) < 1e-9, s"incomplete code: kraft=$kraft")
    bw.writeBits(0, 1) // normal form
    val last = lengths.lastIndexWhere(_ > 0)
    val region = lengths.take(last + 1)
    // code-length-code lengths: k distinct symbols get the complete
    // ladder (1, 2, ..., k-1, k-1), most frequent shortest
    val byFreq = region.groupBy(identity).toSeq
      .sortBy { case (s, g) => (-g.size, s) }.map(_._1)
    val clLen: Map[Int, Int] = byFreq.size match {
      case 1 => Map(byFreq.head -> 1)
      case k => byFreq.zipWithIndex.map { case (s, i) =>
        s -> math.min(i + 1, k - 1)
      }.toMap
    }
    val numCl = math.max(4,
      clLen.keys.map(s => ClOrder.indexOf(s) + 1).max)
    bw.writeBits(numCl - 4, 4)
    for (i <- 0 until numCl)
      bw.writeBits(clLen.getOrElse(ClOrder(i), 0), 3)
    val clCodes = canonicalCodes(
      (0 until 19).map(s => clLen.getOrElse(s, 0)))
    // stop-early via max symbol when a tail is trimmed
    if (last + 1 < lengths.length && last + 1 >= 2) {
      bw.writeBits(1, 1)
      val value = last + 1 - 2
      val k = (0 to 7).find(k => value < (1 << (2 + 2 * k))).get
      bw.writeBits(k, 3)
      bw.writeBits(value, 2 + 2 * k)
    } else bw.writeBits(0, 1)
    // the degenerate one-distinct-length code reads zero bits per
    // symbol; otherwise emit each length through the CL code
    if (byFreq.size > 1) region.foreach { l =>
      val (c, len) = clCodes(l)
      bw.writeCode(c, len)
    }
  }

  /** Flat 8-bit literal code: symbols 0..255 at length 8 (Kraft = 1),
    * everything above absent — the canonical code of byte b IS b.
    */
  def writeFlat256(bw: BitWriter, alphabetSize: Int): Unit =
    writeNormalCode(bw, Seq.fill(256)(8).padTo(alphabetSize, 0))

  /** VP8L header bits (after the signature byte). */
  private def writeHeader(bw: BitWriter, w: Int, h: Int,
                          alpha: Boolean): Unit = {
    bw.writeBits(w - 1, 14)
    bw.writeBits(h - 1, 14)
    bw.writeBits(if (alpha) 1 else 0, 1)
    bw.writeBits(0, 3)
  }

  /** The five prefix codes of a literal-only group: flat green/red/
    * blue, single-symbol alpha and distance.
    */
  private def writeLiteralGroup(bw: BitWriter, alpha: Int,
                                greenAlphabet: Int = 280): Unit = {
    writeFlat256(bw, greenAlphabet)
    writeFlat256(bw, 256)
    writeFlat256(bw, 256)
    writeSimpleCode(bw, Seq(alpha))
    writeSimpleCode(bw, Seq(0))
  }

  /** Bare VP8L chunk payload of literal-coded opaque pixels
    * (`argb(y*w + x)`, alpha must be constant).
    */
  def vp8lPayload(w: Int, h: Int, argb: Array[Int]): Array[Byte] = {
    require(argb.length == w * h)
    val alpha = (argb(0) >>> 24)
    require(argb.forall(p => (p >>> 24) == alpha), "constant alpha only")
    val bw = new BitWriter
    writeHeader(bw, w, h, alpha != 255)
    bw.writeBits(0, 1) // no transforms
    bw.writeBits(0, 1) // no color cache
    bw.writeBits(0, 1) // no meta prefix image
    writeLiteralGroup(bw, alpha)
    argb.foreach { p =>
      bw.writeCode((p >> 8) & 0xff, 8)
      bw.writeCode((p >> 16) & 0xff, 8)
      bw.writeCode(p & 0xff, 8)
    }
    0x2f.toByte +: bw.bytes
  }

  /** VP8L payload with the subtract-green transform: stored red/blue
    * carry green subtracted mod 256; the decoder must add it back.
    */
  def vp8lSubtractGreenPayload(w: Int, h: Int,
                               argb: Array[Int]): Array[Byte] = {
    require(argb.length == w * h)
    val alpha = (argb(0) >>> 24)
    require(argb.forall(p => (p >>> 24) == alpha), "constant alpha only")
    val bw = new BitWriter
    writeHeader(bw, w, h, alpha != 255)
    bw.writeBits(1, 1) // one transform...
    bw.writeBits(2, 2) // ...subtract green
    bw.writeBits(0, 1) // no more transforms
    bw.writeBits(0, 1) // no color cache
    bw.writeBits(0, 1) // no meta prefix image
    writeLiteralGroup(bw, alpha)
    argb.foreach { p =>
      val g = (p >> 8) & 0xff
      bw.writeCode(g, 8)
      bw.writeCode((((p >> 16) & 0xff) - g) & 0xff, 8)
      bw.writeCode(((p & 0xff) - g) & 0xff, 8)
    }
    0x2f.toByte +: bw.bytes
  }

  /** VP8L payload via a color-indexing transform: `indices(y*w + x)`
    * into `palette` (≤ 4 colors here → 2-bit indices, 4 per coded
    * pixel — exercises pixel bundling). Palette entries are stored
    * delta-coded per the spec — deltas touch EVERY channel (the
    * first entry's alpha delta is 0xff−0 = 0xff, later ones 0), so
    * the palette stream's alpha code is flat, not single-symbol.
    */
  def vp8lPalette(w: Int, h: Int, palette: Array[Int],
                  indices: Array[Int]): Array[Byte] = {
    require(palette.length >= 2 && palette.length <= 4)
    require(indices.length == w * h)
    require(indices.forall(i => i >= 0 && i < palette.length))
    val bw = new BitWriter
    writeHeader(bw, w, h, alpha = false)
    bw.writeBits(1, 1)
    bw.writeBits(3, 2)
    bw.writeBits(palette.length - 1, 8)
    // palette sub-image (not level 0): cache bit, 5 codes, pixels.
    // Entries are CHANNEL deltas vs the previous entry.
    bw.writeBits(0, 1)
    writeFlat256(bw, 280) // green
    writeFlat256(bw, 256) // red
    writeFlat256(bw, 256) // blue
    writeFlat256(bw, 256) // alpha — deltas need 0xff then 0x00
    writeSimpleCode(bw, Seq(0)) // distance, unused
    var prev = 0
    palette.foreach { p =>
      val d = deltaPixel(p, prev)
      bw.writeCode((d >> 8) & 0xff, 8)
      bw.writeCode((d >> 16) & 0xff, 8)
      bw.writeCode(d & 0xff, 8)
      bw.writeCode((d >>> 24) & 0xff, 8)
      prev = p
    }
    bw.writeBits(0, 1) // no more transforms
    // main (packed) image: ceil(w/4) coded pixels per row, 2-bit
    // indices bundled into the green channel low-to-high
    bw.writeBits(0, 1) // no color cache
    bw.writeBits(0, 1) // no meta prefix image
    writeLiteralGroup(bw, 255)
    val packedW = (w + 3) / 4
    for (y <- 0 until h; px <- 0 until packedW) {
      var g = 0
      for (k <- 0 until 4) {
        val x = px * 4 + k
        if (x < w) g |= indices(y * w + x) << (2 * k)
      }
      bw.writeCode(g, 8)
      bw.writeCode(0, 8)
      bw.writeCode(0, 8)
    }
    0x2f.toByte +: bw.bytes
  }

  private def deltaPixel(p: Int, prev: Int): Int = {
    ((((p >>> 24) - (prev >>> 24)) & 0xff) << 24) |
      (((((p >> 16) & 0xff) - ((prev >> 16) & 0xff)) & 0xff) << 16) |
      (((((p >> 8) & 0xff) - ((prev >> 8) & 0xff)) & 0xff) << 8) |
      ((((p & 0xff) - (prev & 0xff)) & 0xff))
  }

  /** VP8L payload exercising the color cache AND one LZ77 backward
    * reference: `h` rows, every row identical to row 0. Row 0 is
    * literal-coded (populating the cache); each later row is one
    * backward copy of length `w` at distance `w` — short-distance
    * code 1, the (0, 1) neighborhood entry. The green code carries
    * literals at 9 bits, the length-code symbol and cache symbols on
    * the side (Kraft-complete by construction).
    */
  def vp8lRowCopy(w: Int, h: Int, row: Array[Int]): Array[Byte] = {
    require(row.length == w && h >= 2)
    require(row.forall(p => (p >>> 24) == 255), "opaque fixture")
    // distance w must land on short-distance code 1 = (dx 0, dy 1)
    val lenCode = lz77Code(w)
    val bw = new BitWriter
    writeHeader(bw, w, h, alpha = false)
    bw.writeBits(0, 1) // no transforms
    bw.writeBits(1, 1) // color cache...
    bw.writeBits(2, 4) // ...4 entries
    bw.writeBits(0, 1) // no meta prefix image
    // green: literals 0..255 @9 (Kraft 1/2) + the one length symbol
    // @1 (1/2) — complete. Cache symbols carry no code here: the
    // cache is populated but never read back ([[vp8lCacheHit]]
    // covers reads)
    val greenLens = Array.fill(284)(0)
    (0 until 256).foreach(greenLens(_) = 9)
    greenLens(256 + lenCode._1) = 1
    writeNormalCode(bw, greenLens.toSeq)
    val greenCodes = canonicalCodes(greenLens.toSeq)
    writeFlat256(bw, 256)
    writeFlat256(bw, 256)
    writeSimpleCode(bw, Seq(255)) // alpha
    // distance: the degenerate single-symbol code always yields
    // prefix code 0 → value 1 → short-distance entry (0, 1) → one
    // row up = distance w
    writeSimpleCode(bw, Seq(0))
    row.foreach { p =>
      val (gc, gl) = greenCodes((p >> 8) & 0xff)
      bw.writeCode(gc, gl)
      bw.writeCode((p >> 16) & 0xff, 8)
      bw.writeCode(p & 0xff, 8)
    }
    for (_ <- 1 until h) {
      val (gc, gl) = greenCodes(256 + lenCode._1)
      bw.writeCode(gc, gl)
      bw.writeBits(lenCode._2, lenCode._3) // length extra bits
      // distance symbol is the degenerate single code: zero bits
    }
    0x2f.toByte +: bw.bytes
  }

  /** VP8L payload via the predictor transform, one mode for the whole
    * image (size_bits = 9 → a single 512-px block; the sub-image is
    * 1×1 with the mode in its green channel, coded entirely by
    * zero-bit degenerate codes). Residuals are derived FORWARD from
    * the spec's prediction rules, re-stated here independently of the
    * decoder: (0,0) predicts opaque black, the rest of row 0 predicts
    * L, column 0 predicts T, and the block mode applies elsewhere
    * (supported here: 0 black, 1 L, 2 T, 3 TR with the rightmost-
    * column wrap to the current row's first pixel, 12 ClampAddSubtract
    * Full).
    */
  def vp8lPredictor(w: Int, h: Int, argb: Array[Int],
                    mode: Int): Array[Byte] = {
    require(argb.length == w * h)
    require(w <= 512 && h <= 512, "single-block fixture")
    require(Set(0, 1, 2, 3, 12).contains(mode), s"unsupported mode $mode")
    def ch(v: Int, s: Int) = (v >>> s) & 0xff
    def clamp(v: Int) = if (v < 0) 0 else if (v > 255) 255 else v
    def casf(l: Int, t: Int, tl: Int): Int =
      (0 to 24 by 8).map(s =>
        clamp(ch(l, s) + ch(t, s) - ch(tl, s)) << s).sum
    def pred(x: Int, y: Int): Int =
      if (x == 0 && y == 0) 0xff000000
      else if (y == 0) argb(x - 1)
      else if (x == 0) argb((y - 1) * w)
      else {
        val l = argb(y * w + x - 1)
        val t = argb((y - 1) * w + x)
        val tl = argb((y - 1) * w + x - 1)
        val tr = if (x == w - 1) argb(y * w) else argb((y - 1) * w + x + 1)
        mode match {
          case 0  => 0xff000000
          case 1  => l
          case 2  => t
          case 3  => tr
          case 12 => casf(l, t, tl)
        }
      }
    val bw = new BitWriter
    writeHeader(bw, w, h, alpha = false)
    bw.writeBits(1, 1) // one transform...
    bw.writeBits(0, 2) // ...predictor
    bw.writeBits(7, 3) // size_bits − 2 → 9 → 512-px blocks
    // 1×1 mode sub-image: all five codes degenerate → zero data bits
    bw.writeBits(0, 1) // no cache
    writeSimpleCode(bw, Seq(mode))
    writeSimpleCode(bw, Seq(0))
    writeSimpleCode(bw, Seq(0))
    writeSimpleCode(bw, Seq(0))
    writeSimpleCode(bw, Seq(0))
    bw.writeBits(0, 1) // no more transforms
    bw.writeBits(0, 1) // no color cache
    bw.writeBits(0, 1) // no meta prefix image
    // residual alphas are 255 at (0,0) then 0 → flat alpha code
    writeFlat256(bw, 280)
    writeFlat256(bw, 256)
    writeFlat256(bw, 256)
    writeFlat256(bw, 256)
    writeSimpleCode(bw, Seq(0))
    for (y <- 0 until h; x <- 0 until w) {
      val p = pred(x, y)
      val a = argb(y * w + x)
      bw.writeCode((ch(a, 8) - ch(p, 8)) & 0xff, 8)
      bw.writeCode((ch(a, 16) - ch(p, 16)) & 0xff, 8)
      bw.writeCode((ch(a, 0) - ch(p, 0)) & 0xff, 8)
      bw.writeCode((ch(a, 24) - ch(p, 24)) & 0xff, 8)
    }
    0x2f.toByte +: bw.bytes
  }

  /** The spec's color-cache key. */
  def cacheKey(px: Int, cacheBits: Int): Int =
    (0x1e35a7bd * px) >>> (32 - cacheBits)

  /** VP8L payload exercising color-cache READS: a 4×1 image
    * `[a, b, a, b]` where the first two pixels are literals (each
    * insertion keyed by the spec hash) and the last two are cache
    * symbols. Requires `a` and `b` to land in distinct cache slots
    * (checked) — callers pick colors accordingly.
    */
  def vp8lCacheHit(a: Int, b: Int): Array[Byte] = {
    require((a >>> 24) == 255 && (b >>> 24) == 255, "opaque fixture")
    val ka = cacheKey(a, 2)
    val kb = cacheKey(b, 2)
    require(ka != kb, s"colors collide in the 4-slot cache: $ka")
    val bw = new BitWriter
    writeHeader(bw, 4, 1, alpha = false)
    bw.writeBits(0, 1) // no transforms
    bw.writeBits(1, 1) // color cache...
    bw.writeBits(2, 4) // ...4 entries
    bw.writeBits(0, 1) // no meta prefix image
    // green: literals @9 (Kraft 1/2) + the two cache symbols @2 (1/4
    // each) — complete
    val greenLens = Array.fill(284)(0)
    (0 until 256).foreach(greenLens(_) = 9)
    greenLens(280 + ka) = 2
    greenLens(280 + kb) = 2
    writeNormalCode(bw, greenLens.toSeq)
    val greenCodes = canonicalCodes(greenLens.toSeq)
    writeFlat256(bw, 256)
    writeFlat256(bw, 256)
    writeSimpleCode(bw, Seq(255))
    writeSimpleCode(bw, Seq(0))
    Seq(a, b).foreach { p =>
      val (gc, gl) = greenCodes((p >> 8) & 0xff)
      bw.writeCode(gc, gl)
      bw.writeCode((p >> 16) & 0xff, 8)
      bw.writeCode(p & 0xff, 8)
    }
    Seq(ka, kb).foreach { k =>
      val (gc, gl) = greenCodes(280 + k)
      bw.writeCode(gc, gl)
    }
    0x2f.toByte +: bw.bytes
  }

  /** VP8L payload exercising META PREFIX IMAGES: an 8-wide image
    * split into two 4-px-wide blocks, each naming its own code group.
    * Both groups share flat literal codes but carry DIFFERENT
    * single-symbol alpha codes (255 vs 128), so the decoded alpha
    * proves which group decoded each block — with zero emission
    * difference to confound the proof.
    */
  def vp8lTwoGroupAlpha(h: Int, rgb: Array[Int]): Array[Byte] = {
    val w = 8
    require(rgb.length == w * h)
    require(rgb.forall(p => (p >>> 24) == 0), "alpha comes from the groups")
    val bw = new BitWriter
    writeHeader(bw, w, h, alpha = true)
    bw.writeBits(0, 1) // no transforms
    bw.writeBits(0, 1) // no color cache
    bw.writeBits(1, 1) // meta prefix image...
    bw.writeBits(0, 3) // ...block bits = 2 → 4-px blocks → 2×ceil(h/4)
    // meta sub-image: ceil(8/4)=2 wide, ceil(h/4) tall; group code
    // rides (red<<8 | green): columns 0..3 → group 0, 4..7 → group 1
    val metaH = (h + 3) / 4
    bw.writeBits(0, 1) // meta image: no color cache
    writeFlat256(bw, 280) // green: codes 0 and 1 as literals
    writeSimpleCode(bw, Seq(0)) // red
    writeSimpleCode(bw, Seq(0)) // blue
    writeSimpleCode(bw, Seq(255)) // alpha (irrelevant to group codes)
    writeSimpleCode(bw, Seq(0)) // distance
    for (_ <- 0 until metaH; gx <- 0 until 2) bw.writeCode(gx, 8)
    // two code groups, group order 0 then 1
    for (alpha <- Seq(255, 128)) {
      writeFlat256(bw, 280)
      writeFlat256(bw, 256)
      writeFlat256(bw, 256)
      writeSimpleCode(bw, Seq(alpha))
      writeSimpleCode(bw, Seq(0))
    }
    rgb.foreach { p =>
      bw.writeCode((p >> 8) & 0xff, 8)
      bw.writeCode((p >> 16) & 0xff, 8)
      bw.writeCode(p & 0xff, 8)
    }
    0x2f.toByte +: bw.bytes
  }

  /** VP8L payload exercising a PLAIN (>120) distance code: an 8×1
    * image of five literals then a 3-pixel backward copy at distance
    * 5 — distance code 125 (length code 2 → 3; both through their
    * prefix-value forms).
    */
  def vp8lLongDistance(five: Array[Int]): Array[Byte] = {
    require(five.length == 5 && five.forall(p => (p >>> 24) == 255))
    val bw = new BitWriter
    writeHeader(bw, 8, 1, alpha = false)
    bw.writeBits(0, 1); bw.writeBits(0, 1); bw.writeBits(0, 1)
    val greenLens = Array.fill(280)(0)
    (0 until 256).foreach(greenLens(_) = 9)
    greenLens(256 + 2) = 1 // length code 2 → value 3
    writeNormalCode(bw, greenLens.toSeq)
    val greenCodes = canonicalCodes(greenLens.toSeq)
    writeFlat256(bw, 256)
    writeFlat256(bw, 256)
    writeSimpleCode(bw, Seq(255))
    // distance tree: the single symbol is prefix code 13 → base 97 +
    // 5 extra bits; 125 − 120 = plain distance 5
    writeSimpleCode(bw, Seq(13))
    five.foreach { p =>
      val (gc, gl) = greenCodes((p >> 8) & 0xff)
      bw.writeCode(gc, gl)
      bw.writeCode((p >> 16) & 0xff, 8)
      bw.writeCode(p & 0xff, 8)
    }
    val (gc, gl) = greenCodes(256 + 2)
    bw.writeCode(gc, gl) // length 3, no extra bits
    bw.writeBits(125 - 97, 5) // distance extra bits
    0x2f.toByte +: bw.bytes
  }

  /** LZ77 prefix code for `value`: (code, extraValue, extraBits). */
  def lz77Code(value: Int): (Int, Int, Int) = {
    require(value >= 1)
    if (value <= 4) (value - 1, 0, 0)
    else {
      var code = 4
      while (true) {
        val extraBits = (code - 2) >> 1
        val offset = (2 + (code & 1)) << extraBits
        val lo = offset + 1
        val hi = offset + (1 << extraBits)
        if (value >= lo && value <= hi) return (code, value - lo, extraBits)
        code += 1
        if (code >= 24) sys.error(s"value out of range: $value")
      }
      sys.error("unreachable")
    }
  }

  // ---- container wrapping ------------------------------------------

  private def fourcc(s: String): Array[Byte] =
    s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)

  private def u32le(v: Long): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  def chunk(cc: String, payload: Array[Byte]): Array[Byte] = {
    val pad = if (payload.length % 2 == 1) Array(0.toByte) else Array.empty[Byte]
    fourcc(cc) ++ u32le(payload.length.toLong) ++ payload ++ pad
  }

  /** Wrap chunks into a RIFF/WEBP file. */
  def container(chunks: Array[Byte]*): Array[Byte] = {
    val body = fourcc("WEBP") ++ chunks.flatten
    fourcc("RIFF") ++ u32le(body.length.toLong) ++ body
  }

  /** Bare lossless file: RIFF + one VP8L chunk. */
  def losslessWebp(w: Int, h: Int, argb: Array[Int]): Array[Byte] =
    container(chunk("VP8L", vp8lPayload(w, h, argb)))

  /** Lossy VP8 HEADER fixture (probe-only: dims parse, pixels are the
    * documented skip): valid frame tag + start code + dims, then
    * padding bytes standing in for the partition data.
    */
  def lossyWebpHeader(w: Int, h: Int): Array[Byte] = {
    require(w >= 1 && w <= 0x3fff && h >= 1 && h <= 0x3fff)
    val p = Array.fill[Byte](26)(0)
    // frame tag: key frame (bit0 = 0), version 0, show_frame = 1,
    // first partition size arbitrary
    p(0) = 0x10.toByte; p(1) = 0; p(2) = 0
    p(3) = 0x9d.toByte; p(4) = 0x01; p(5) = 0x2a
    p(6) = (w & 0xff).toByte; p(7) = ((w >> 8) & 0x3f).toByte
    p(8) = (h & 0xff).toByte; p(9) = ((h >> 8) & 0x3f).toByte
    container(chunk("VP8 ", p))
  }

  /** VP8X-wrapped lossless still (canvas dims must match the frame). */
  def vp8xLossless(w: Int, h: Int, argb: Array[Int],
                   animated: Boolean = false): Array[Byte] = {
    val flags = (if (animated) 2 else 0)
    val hdr = Array[Byte](flags.toByte, 0, 0, 0) ++
      Array(((w - 1) & 0xff).toByte, (((w - 1) >> 8) & 0xff).toByte,
        (((w - 1) >> 16) & 0xff).toByte) ++
      Array(((h - 1) & 0xff).toByte, (((h - 1) >> 8) & 0xff).toByte,
        (((h - 1) >> 16) & 0xff).toByte)
    val anim = if (animated) Seq(chunk("ANIM", Array.fill[Byte](6)(0)))
      else Seq.empty
    container((Seq(chunk("VP8X", hdr)) ++ anim ++
      Seq(chunk("VP8L", vp8lPayload(w, h, argb)))): _*)
  }

  /** Animated container: VP8X (ANIM flag) + ANIM + `frames` ANMF
    * chunks (frame payloads are opaque — the probe counts, the
    * documented VP8-decode skip stands).
    */
  def animatedWebp(w: Int, h: Int, frames: Int): Array[Byte] = {
    val hdr = Array[Byte](2, 0, 0, 0) ++
      Array(((w - 1) & 0xff).toByte, (((w - 1) >> 8) & 0xff).toByte,
        (((w - 1) >> 16) & 0xff).toByte) ++
      Array(((h - 1) & 0xff).toByte, (((h - 1) >> 8) & 0xff).toByte,
        (((h - 1) >> 16) & 0xff).toByte)
    container((Seq(chunk("VP8X", hdr),
      chunk("ANIM", Array.fill[Byte](6)(0))) ++
      (0 until frames).map(_ => chunk("ANMF", Array.fill[Byte](24)(7)))): _*)
  }
}
