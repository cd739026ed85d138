package graft.multimodal

/** Pure-JVM VP8L (WebP lossless) decoder — the second half of WebP
  * support ([[WebP]] holds the container walk and header probe).
  *
  * Implemented from the public format specification (RFC 9649, "WebP
  * Image Format", §3 "Specification for WebP Lossless Bitstream"; the
  * reference treats images as opaque PIL handles —
  * `image_validator.py:187-225` — so everything here is
  * beyond-reference surface). VP8L is SELF-DESCRIBING: every prefix
  * code travels in the stream (built from transmitted code lengths,
  * canonical per RFC 1951 §3.2.2), so there are no large literal spec
  * tables to misremember — the posture that ruled out MP3 Layer III
  * and brotli holds here. The one table the format does fix, the
  * 120-entry short-distance map, is GENERATED in [[distanceMap]] from
  * its defining geometric rule rather than transcribed (see there).
  *
  * Decoding pipeline per the spec:
  *  1. 5-byte header: 0x2F signature, 14-bit width-1 / height-1,
  *     1 alpha hint, 3-bit version (must be 0);
  *  2. up to four transforms, each at most once (predictor, color,
  *     subtract-green, color-indexing), inverses applied in REVERSE
  *     read order after pixel decoding;
  *  3. optional color cache (`cache_bits` 1..11, insert-on-produce,
  *     key = `(0x1e35a7bd * argb) >>> (32 - cache_bits)`);
  *  4. optional meta prefix image (level-0 only) selecting one of N
  *     5-code groups per pixel block;
  *  5. LZ77-style symbol stream: green symbol < 256 = literal (then
  *     red/blue/alpha), < 280 = length prefix code + distance prefix
  *     code (backward copy, overlap legal), else color-cache index.
  *
  * Everything is bounds-checked; ANY structural violation (bad magic,
  * over-subscribed code, reference before start, truncated stream,
  * pixel count over `maxPixels`) returns None — the house
  * NULL-for-undecodable stance, never a partial image.
  *
  * Scale shape: a pure per-payload kernel (no Spark here); callers
  * ride the one-decode-per-image bill that [[ImageHash]]/[[ImageStats]]
  * already pay, via [[ImageDecode]].
  */
object Vp8l {

  /** Decoded image: `argb(y * width + x)`, 8 bits per channel packed
    * as A<<24|R<<16|G<<8|B (the BufferedImage TYPE_INT_ARGB layout).
    */
  final case class Image(width: Int, height: Int, argb: Array[Int])

  /** Hard pixel cap: a 5-byte header can claim 16383×16383 (~268M
    * pixels, >1 GiB of Int) — a hostile-dimension bomb must fail the
    * decode, not the executor ([[ImageStats]]'s rolling-buffer
    * lesson applied at the allocation site).
    */
  val DefaultMaxPixels: Int = 1 << 26

  private final class Bail extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }
  private def bail(): Nothing = throw new Bail

  /** LSB-first bit reader (spec §3.2: values are assembled from bits
    * in increasing significance, bytes in stream order).
    */
  private final class BitReader(bytes: Array[Byte], startByte: Int) {
    private var pos: Long = startByte.toLong * 8
    private val end: Long = bytes.length.toLong * 8
    def readBits(n: Int): Int = {
      if (n == 0) return 0
      if (pos + n > end) bail()
      var v = 0
      var i = 0
      while (i < n) {
        val p = pos + i
        val bit = (bytes((p >> 3).toInt) >> (p & 7).toInt) & 1
        v |= bit << i
        i += 1
      }
      pos += n
      v
    }
    def readBit(): Int = {
      if (pos >= end) bail()
      val bit = (bytes((pos >> 3).toInt) >> (pos & 7).toInt) & 1
      pos += 1
      bit
    }
  }

  /** Canonical prefix code over `lengths` (RFC 1951 §3.2.2 numbering:
    * codes assigned in symbol order within each length, shorter
    * lengths first; decoded bit-by-bit, first bit read = most
    * significant code bit). Over-subscribed or incomplete codes fail —
    * EXCEPT the spec's degenerate single-symbol code, which consumes
    * zero bits. Kept as parallel arrays sorted by (length, symbol):
    * decode walks lengths, maintaining the canonical `first` code per
    * length — alphabet sizes here are ≤ 2328, streams are small
    * relative to pixel work, and the O(maxLen) walk keeps the builder
    * trivially correct.
    */
  private final class PrefixCode(lengths: Array[Int]) {
    private val maxLen = {
      var m = 0
      var i = 0
      while (i < lengths.length) {
        val l = lengths(i)
        if (l < 0 || l > 15) bail()
        if (l > m) m = l
        i += 1
      }
      m
    }
    // count per length, then Kraft check
    private val count = new Array[Int](maxLen + 1)
    locally {
      var i = 0
      while (i < lengths.length) {
        if (lengths(i) > 0) count(lengths(i)) += 1
        i += 1
      }
    }
    private val nSymbols = count.sum
    val single: Int = if (nSymbols == 1) {
      var s = -1
      var i = 0
      while (i < lengths.length) { if (lengths(i) > 0) s = i; i += 1 }
      s
    } else -1
    locally {
      if (nSymbols == 0) bail()
      if (nSymbols > 1) {
        // Kraft must sum to exactly 1 (complete, not over-subscribed)
        var left = 1L << maxLen
        var l = 1
        while (l <= maxLen) {
          left -= count(l).toLong << (maxLen - l)
          if (left < 0) bail()
          l += 1
        }
        if (left != 0) bail()
      }
    }
    // firstCode(l) = canonical code of the first symbol of length l;
    // offset(l) = index into `sorted` of that symbol
    private val firstCode = new Array[Int](maxLen + 2)
    private val offset = new Array[Int](maxLen + 2)
    private val sorted = new Array[Int](math.max(nSymbols, 1))
    locally {
      var code = 0
      var off = 0
      var l = 1
      while (l <= maxLen) {
        firstCode(l) = code
        offset(l) = off
        code = (code + count(l)) << 1
        off += count(l)
        l += 1
      }
      var i = 0
      var idx = 0
      val next = new Array[Int](maxLen + 1)
      while (i < lengths.length) {
        val len = lengths(i)
        if (len > 0) {
          sorted(offset(len) + next(len)) = i
          next(len) += 1
          idx += 1
        }
        i += 1
      }
    }
    def readSymbol(br: BitReader): Int = {
      if (single >= 0) return single
      var code = 0
      var l = 1
      while (l <= maxLen) {
        code = (code << 1) | br.readBit()
        val c = count(l)
        if (c > 0 && code - firstCode(l) < c)
          return sorted(offset(l) + (code - firstCode(l)))
        l += 1
      }
      bail()
    }
  }

  /** The spec's fixed reading order for code-length-code lengths. */
  private val CodeLengthOrder =
    Array(17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

  /** Read one prefix code (simple or normal form) over `alphabetSize`
    * symbols (spec §3.5.1-3.5.2).
    */
  private def readPrefixCode(br: BitReader, alphabetSize: Int): PrefixCode = {
    if (alphabetSize < 1) bail()
    if (br.readBit() == 1) {
      // simple: 1 or 2 symbols
      val numSymbols = br.readBit() + 1
      val first =
        if (br.readBit() == 1) br.readBits(8) else br.readBit()
      val lengths = new Array[Int](alphabetSize)
      if (first >= alphabetSize) bail()
      if (numSymbols == 1) lengths(first) = 1 // degenerate: 0-bit reads
      else {
        val second = br.readBits(8)
        if (second >= alphabetSize || second == first) bail()
        lengths(first) = 1
        lengths(second) = 1
      }
      new PrefixCode(lengths)
    } else {
      val numCodeLengths = 4 + br.readBits(4)
      if (numCodeLengths > CodeLengthOrder.length) bail()
      val clcLengths = new Array[Int](19)
      var i = 0
      while (i < numCodeLengths) {
        clcLengths(CodeLengthOrder(i)) = br.readBits(3)
        i += 1
      }
      val clc = new PrefixCode(clcLengths)
      val lengths = new Array[Int](alphabetSize)
      var maxSymbol =
        if (br.readBit() == 1) {
          val lengthNBits = 2 + 2 * br.readBits(3)
          2 + br.readBits(lengthNBits)
        } else alphabetSize
      var symbol = 0
      var prevLen = 8
      while (symbol < alphabetSize && maxSymbol > 0) {
        maxSymbol -= 1
        val s = clc.readSymbol(br)
        if (s < 16) {
          lengths(symbol) = s
          symbol += 1
          if (s != 0) prevLen = s
        } else {
          val (repeat, value) = s match {
            case 16 => (3 + br.readBits(2), prevLen)
            case 17 => (3 + br.readBits(3), 0)
            case 18 => (11 + br.readBits(7), 0)
            case _  => bail()
          }
          if (symbol + repeat > alphabetSize) bail()
          var r = 0
          while (r < repeat) { lengths(symbol) = value; symbol += 1; r += 1 }
        }
      }
      new PrefixCode(lengths)
    }
  }

  /** One 5-code group: green+length+cache / red / blue / alpha /
    * distance (spec §3.5.3).
    */
  private final class CodeGroup(br: BitReader, cacheSize: Int) {
    val green: PrefixCode = readPrefixCode(br, 256 + 24 + cacheSize)
    val red: PrefixCode = readPrefixCode(br, 256)
    val blue: PrefixCode = readPrefixCode(br, 256)
    val alpha: PrefixCode = readPrefixCode(br, 256)
    val distance: PrefixCode = readPrefixCode(br, 40)
  }

  /** LZ77 prefix-coded value (spec §3.6.2.2): codes 0-3 map to 1-4;
    * above that, `extra = (code - 2) >> 1` extra bits. Length codes
    * run 0..23, distance codes 0..39 — `maxCode` picks the bound.
    */
  private def lz77Value(code: Int, maxCode: Int, br: BitReader): Int = {
    if (code < 0 || code >= maxCode) bail()
    if (code < 4) code + 1
    else {
      val extraBits = (code - 2) >> 1
      val offset = (2 + (code & 1)) << extraBits
      offset + br.readBits(extraBits) + 1
    }
  }

  /** The 120-entry short-distance map (spec §3.6.2.2): distance codes
    * 1..120 address a 2D pixel neighborhood. The spec lists the table
    * literally, but it is exactly the enumeration of the codable
    * offsets `(dx, dy)` — `dy` in 0..7, `dx` in -7..8 (the nibble
    * packing `(dy << 4) | (8 - dx)`), upper half-plane only (`dy > 0`,
    * or `dy == 0` with `dx ≥ 1`) — sorted by squared Euclidean
    * distance, nearer rows first (`dy` descending) on ties, positive
    * `dx` before negative. Generating from the rule instead of
    * transcribing 120 literals removes the misremembered-entry risk
    * class; the [[graft.multimodal]] test suite pins the first
    * entries to spec-derived fixtures.
    */
  private[multimodal] val distanceMap: Array[Int] = {
    val pairs = for {
      dy <- 0 to 7
      dx <- -7 to 8
      if dy > 0 || dx >= 1
    } yield (dx, dy)
    pairs.sortBy { case (dx, dy) => (dx * dx + dy * dy, -dy, -dx) }
      .map { case (dx, dy) => (dy << 16) | (dx & 0xffff) }
      .toArray
  }

  private def planeCodeToDistance(xsize: Int, code: Int): Int = {
    if (code > 120) code - 120
    else {
      val packed = distanceMap(code - 1)
      val dy = packed >> 16
      val dx = (packed << 16) >> 16 // sign-extend
      val dist = dy * xsize + dx
      if (dist >= 1) dist else 1
    }
  }

  // ---- transforms -------------------------------------------------

  private sealed trait Transform { def inverse(img: Image): Image }

  /** Block-size helper: ceil(size / 2^bits). */
  private def subSize(size: Int, bits: Int): Int =
    (size + (1 << bits) - 1) >> bits

  private def avg2(a: Int, b: Int): Int = {
    // per-channel (a + b) / 2, floor — SWAR over the packed ARGB
    (((a ^ b) & 0xfefefefe) >>> 1) + (a & b)
  }

  private def clamp255(v: Int): Int =
    if (v < 0) 0 else if (v > 255) 255 else v

  private def addPixels(a: Int, b: Int): Int = {
    // per-channel modular add
    (((a >>> 24) + (b >>> 24)) & 0xff) << 24 |
      ((((a >> 16) & 0xff) + ((b >> 16) & 0xff)) & 0xff) << 16 |
      ((((a >> 8) & 0xff) + ((b >> 8) & 0xff)) & 0xff) << 8 |
      (((a & 0xff) + (b & 0xff)) & 0xff)
  }

  private def select(l: Int, t: Int, tl: Int): Int = {
    // Manhattan distance of L and T to the full gradient L + T - TL;
    // the spec returns L strictly-closer, T otherwise
    def ch(v: Int, s: Int) = (v >>> s) & 0xff
    var pL = 0
    var pT = 0
    var s = 0
    while (s < 32) {
      val p = ch(l, s) + ch(t, s) - ch(tl, s)
      pL += math.abs(p - ch(l, s))
      pT += math.abs(p - ch(t, s))
      s += 8
    }
    if (pL < pT) l else t
  }

  private def clampAddSubtractFull(l: Int, t: Int, tl: Int): Int = {
    def ch(v: Int, s: Int) = (v >>> s) & 0xff
    var out = 0
    var s = 0
    while (s < 32) {
      out |= clamp255(ch(l, s) + ch(t, s) - ch(tl, s)) << s
      s += 8
    }
    out
  }

  private def clampAddSubtractHalf(l: Int, t: Int, tl: Int): Int = {
    val ave = avg2(l, t)
    def ch(v: Int, s: Int) = (v >>> s) & 0xff
    var out = 0
    var s = 0
    while (s < 32) {
      val a = ch(ave, s)
      // (a - b) / 2 truncates toward zero per the spec pseudocode
      out |= clamp255(a + (a - ch(tl, s)) / 2) << s
      s += 8
    }
    out
  }

  /** Predictor transform (spec §3.4.1): 14 modes selected per block
    * by the green channel of the sub-image. Edge rules: (0,0) is
    * predicted black-opaque, the rest of row 0 uses L, column 0 uses
    * T; the top-right neighbor of a rightmost pixel wraps to the
    * current row's first pixel (the spec's contiguous-buffer rule).
    */
  private final case class PredictorTransform(bits: Int, modes: Image)
      extends Transform {
    def inverse(img: Image): Image = {
      val w = img.width
      val h = img.height
      val a = img.argb
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val i = y * w + x
          val pred =
            if (x == 0 && y == 0) 0xff000000
            else if (y == 0) a(i - 1)
            else if (x == 0) a(i - w)
            else {
              val l = a(i - 1)
              val t = a(i - w)
              val tl = a(i - w - 1)
              val tr = a(i - w + 1) // x == w-1 wraps to current row x=0
              val mode = (modes.argb(
                (y >> bits) * modes.width + (x >> bits)) >> 8) & 0xff
              mode match {
                case 0  => 0xff000000
                case 1  => l
                case 2  => t
                case 3  => tr
                case 4  => tl
                case 5  => avg2(avg2(l, tr), t)
                case 6  => avg2(l, tl)
                case 7  => avg2(l, t)
                case 8  => avg2(tl, t)
                case 9  => avg2(t, tr)
                case 10 => avg2(avg2(l, tl), avg2(t, tr))
                case 11 => select(l, t, tl)
                case 12 => clampAddSubtractFull(l, t, tl)
                case 13 => clampAddSubtractHalf(l, t, tl)
                case _  => bail()
              }
            }
          a(i) = addPixels(a(i), pred)
          x += 1
        }
        y += 1
      }
      img
    }
  }

  /** Color (cross-color) transform (spec §3.4.2): per-block signed
    * deltas green→red, green→blue, red→blue; `(t * c) >> 5` on
    * sign-extended bytes, arithmetic shift.
    */
  private final case class ColorTransform(bits: Int, elements: Image)
      extends Transform {
    private def delta(t: Int, c: Int): Int = ((t.toByte * c.toByte) >> 5)
    def inverse(img: Image): Image = {
      val w = img.width
      val h = img.height
      val a = img.argb
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val i = y * w + x
          val px = a(i)
          // element channel layout per the spec: green_to_red rides
          // the BLUE channel, green_to_blue the green, red_to_blue
          // the red
          val cte = elements.argb(
            (y >> bits) * elements.width + (x >> bits))
          val g2r = cte & 0xff
          val g2b = (cte >> 8) & 0xff
          val r2b = (cte >> 16) & 0xff
          val green = (px >> 8) & 0xff
          var red = (px >> 16) & 0xff
          var blue = px & 0xff
          red = (red + delta(g2r, green)) & 0xff
          blue = (blue + delta(g2b, green)) & 0xff
          blue = (blue + delta(r2b, red)) & 0xff
          a(i) = (px & 0xff00ff00) | (red << 16) | blue
          x += 1
        }
        y += 1
      }
      img
    }
  }

  /** Subtract-green transform (spec §3.4.3): red/blue had green
    * subtracted; inverse adds it back mod 256.
    */
  private case object SubtractGreenTransform extends Transform {
    def inverse(img: Image): Image = {
      val a = img.argb
      var i = 0
      while (i < a.length) {
        val px = a(i)
        val g = (px >> 8) & 0xff
        val r = (((px >> 16) & 0xff) + g) & 0xff
        val b = ((px & 0xff) + g) & 0xff
        a(i) = (px & 0xff00ff00) | (r << 16) | b
        i += 1
      }
      img
    }
  }

  /** Color-indexing transform (spec §3.4.4): pixels are palette
    * indices in the green channel; palettes of ≤16 colors pack
    * several indices per decoded pixel (`widthBits`), shrinking the
    * coded width. Out-of-range indices map to transparent black per
    * the spec.
    */
  private final case class ColorIndexTransform(origWidth: Int,
                                               widthBits: Int,
                                               palette: Array[Int])
      extends Transform {
    def inverse(img: Image): Image = {
      val h = img.height
      val out = new Array[Int](origWidth * h)
      val perPixel = 1 << widthBits        // indices per coded pixel
      val bitsPer = 8 >> widthBits         // bits per index
      val mask = (1 << bitsPer) - 1
      var y = 0
      while (y < h) {
        var x = 0
        while (x < origWidth) {
          val packed = (img.argb(y * img.width + (x >> widthBits)) >> 8) & 0xff
          val shift = (x & (perPixel - 1)) * bitsPer
          val idx = (packed >> shift) & mask
          out(y * origWidth + x) =
            if (idx < palette.length) palette(idx) else 0
          x += 1
        }
        y += 1
      }
      Image(origWidth, h, out)
    }
  }

  // ---- image stream decode ----------------------------------------

  /** Decode one "image stream" (spec DecodeImageStream): transforms
    * (level 0 only) + color cache + prefix groups + pixel data.
    * Returns the pixel array BEFORE inverse transforms (caller
    * applies them), plus the transform list.
    */
  private def decodeImageStream(br: BitReader, xsize0: Int, ysize: Int,
                                isLevel0: Boolean,
                                maxPixels: Int): (Image, List[Transform]) = {
    var xsize = xsize0
    var transforms = List.empty[Transform]
    if (isLevel0) {
      var seen = Set.empty[Int]
      while (br.readBit() == 1) {
        val ttype = br.readBits(2)
        if (seen(ttype)) bail() // each transform at most once
        seen += ttype
        ttype match {
          case 0 | 1 => // predictor / color: block sub-image
            val bits = br.readBits(3) + 2
            val sub = decodeSubImage(br, subSize(xsize, bits),
              subSize(ysize, bits), maxPixels)
            transforms ::=
              (if (ttype == 0) PredictorTransform(bits, sub)
               else ColorTransform(bits, sub))
          case 2 =>
            transforms ::= SubtractGreenTransform
          case 3 =>
            val numColors = br.readBits(8) + 1
            val pal = decodeSubImage(br, numColors, 1, maxPixels).argb
            // palette entries are stored as deltas: accumulate
            var i = 1
            while (i < pal.length) {
              pal(i) = addPixels(pal(i), pal(i - 1))
              i += 1
            }
            val widthBits =
              if (numColors > 16) 0
              else if (numColors > 4) 1
              else if (numColors > 2) 2
              else 3
            transforms ::= ColorIndexTransform(xsize, widthBits, pal)
            xsize = subSize(xsize, widthBits)
          case _ => bail()
        }
      }
    }

    // color cache
    val cacheBits =
      if (br.readBit() == 1) {
        val b = br.readBits(4)
        if (b < 1 || b > 11) bail()
        b
      } else 0
    val cacheSize = if (cacheBits > 0) 1 << cacheBits else 0
    val cache = if (cacheBits > 0) new Array[Int](cacheSize) else null

    // meta prefix image (level 0 only)
    var metaBits = 0
    var meta: Image = null
    if (isLevel0 && br.readBit() == 1) {
      metaBits = br.readBits(3) + 2
      meta = decodeSubImage(br, subSize(xsize, metaBits),
        subSize(ysize, metaBits), maxPixels)
    }
    val numGroups =
      if (meta == null) 1
      else {
        var m = 0
        var i = 0
        while (i < meta.argb.length) {
          val code = (meta.argb(i) >> 8) & 0xffff
          if (code > m) m = code
          i += 1
        }
        m + 1
      }
    // the format bound is 65536 (meta code = red<<8|green); a stream
    // also cannot legitimately name more groups than it has meta
    // blocks, and that bound keeps a hostile 4-pixel meta image from
    // demanding 65536 × 5 code-table allocations
    if (meta != null && numGroups > meta.argb.length + 1) bail()
    val groups = Array.fill(numGroups)(new CodeGroup(br, cacheSize))

    // pixel stream
    val n = xsize.toLong * ysize
    if (n <= 0 || n > maxPixels) bail()
    val argb = new Array[Int](n.toInt)
    var pos = 0
    while (pos < n) {
      val x = pos % xsize
      val y = pos / xsize
      val group =
        if (meta == null) groups(0)
        else {
          val code = (meta.argb(
            (y >> metaBits) * meta.width + (x >> metaBits)) >> 8) & 0xffff
          if (code >= numGroups) bail()
          groups(code)
        }
      val s = group.green.readSymbol(br)
      if (s < 256) {
        val red = group.red.readSymbol(br)
        val blue = group.blue.readSymbol(br)
        val alpha = group.alpha.readSymbol(br)
        val px = (alpha << 24) | (red << 16) | (s << 8) | blue
        argb(pos) = px
        if (cache != null)
          cache(((0x1e35a7bd * px) >>> (32 - cacheBits))) = px
        pos += 1
      } else if (s < 256 + 24) {
        val length = lz77Value(s - 256, 24, br)
        val distCode = lz77Value(group.distance.readSymbol(br), 40, br)
        val dist = planeCodeToDistance(xsize, distCode)
        if (dist > pos || pos + length > n) bail()
        var k = 0
        while (k < length) {
          val px = argb(pos - dist)
          argb(pos) = px
          if (cache != null)
            cache(((0x1e35a7bd * px) >>> (32 - cacheBits))) = px
          pos += 1
          k += 1
        }
      } else {
        val idx = s - 256 - 24
        if (cache == null || idx >= cacheSize) bail()
        argb(pos) = cache(idx)
        pos += 1
      }
    }
    (Image(xsize, ysize, argb), transforms)
  }

  /** Sub-images (transform data, palettes, meta prefix image) decode
    * as non-level-0 streams: no transforms, no meta codes of their
    * own.
    */
  private def decodeSubImage(br: BitReader, xsize: Int, ysize: Int,
                             maxPixels: Int): Image =
    decodeImageStream(br, xsize, ysize, isLevel0 = false, maxPixels)._1

  /** Decode a VP8L chunk payload (first byte = 0x2F signature).
    * Returns None on any malformation — never a partial image.
    */
  def decode(payload: Array[Byte],
             maxPixels: Int = DefaultMaxPixels): Option[Image] = {
    if (payload == null || payload.length < 5) return None
    if ((payload(0) & 0xff) != 0x2f) return None
    try {
      val br = new BitReader(payload, 1)
      val width = br.readBits(14) + 1
      val height = br.readBits(14) + 1
      br.readBit() // alpha hint — informational
      if (br.readBits(3) != 0) return None // version must be 0
      if (width.toLong * height > maxPixels) return None
      val (decoded, transforms) =
        decodeImageStream(br, width, height, isLevel0 = true, maxPixels)
      // inverse transforms in reverse read order = list head first
      // (transforms were prepended on read)
      val out = transforms.foldLeft(decoded)((img, t) => t.inverse(img))
      if (out.width != width || out.height != height) return None
      Some(out)
    } catch {
      case _: Bail | _: ArrayIndexOutOfBoundsException |
          _: NegativeArraySizeException | _: OutOfMemoryError => None
    }
  }
}
