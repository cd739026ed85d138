package graft.multimodal

/** Pure-JVM FLAC decoder (the public xiph.org FLAC format
  * specification; no third-party codec) — the lossless container most
  * crawled audio that is not WAV ships in, decoded far enough that
  * [[AudioFingerprint]] fingerprints it like PCM:
  *
  *  - STREAMINFO metadata (sample rate, channels, bit depth, totals);
  *  - frame headers (sync, block size / sample rate codes, UTF-8-coded
  *    frame number, CRC-8) and the CRC-16 frame footer — both CRCs
  *    VERIFIED, a corrupt frame fails loud with its offset;
  *  - all four subframe types: CONSTANT, VERBATIM, FIXED (orders 0–4,
  *    the binomial predictors) and LPC (quantized coefficients +
  *    signed shift), with wasted-bits unpacking;
  *  - Rice-coded residuals, 4- and 5-bit parameter variants,
  *    partition orders, and the escape-to-raw encoding;
  *  - stereo decorrelation: independent, left/side, right/side,
  *    mid/side (side channels carry one extra bit, per spec).
  *
  * Not implemented (and stated, not guessed): the STREAMINFO MD5 is
  * not re-verified (the per-frame CRC-16 already gates corruption),
  * and sample sizes are 8/12/16/20/24 bits — the depths the format
  * codes define unambiguously in the classic spec.
  */
object FlacDecode {

  final case class FlacAudio(channels: Int, sampleRateHz: Int,
                             bitsPerSample: Int,
                             samples: Array[Array[Int]]) {
    /** Channel-averaged samples scaled to [-1, 1]. */
    def mono: Array[Double] = {
      val n = if (samples.isEmpty) 0 else samples(0).length
      val out = new Array[Double](n)
      val scale = (1L << (bitsPerSample - 1)).toDouble * channels
      var i = 0
      while (i < n) {
        var acc = 0L
        var c = 0
        while (c < channels) { acc += samples(c)(i); c += 1 }
        out(i) = acc / scale
        i += 1
      }
      out
    }
  }

  def isFlac(b: Array[Byte]): Boolean =
    b != null && b.length >= 4 && b(0) == 'f' && b(1) == 'L' &&
      b(2) == 'a' && b(3) == 'C'

  /** MSB-first bit reader over a byte array (FLAC is big-endian at
    * the bit level). Reads past the end fail loud.
    */
  private final class BitReader(val b: Array[Byte], var bytePos: Int) {
    var bitPos: Int = 0 // 0..7, next bit = MSB-first within b(bytePos)

    def aligned: Boolean = bitPos == 0

    def readBit(): Int = {
      if (bytePos >= b.length)
        throw new IllegalStateException(s"FLAC bitstream truncated at byte $bytePos")
      val v = (b(bytePos) >> (7 - bitPos)) & 1
      bitPos += 1
      if (bitPos == 8) { bitPos = 0; bytePos += 1 }
      v
    }

    def readUInt(bits: Int): Long = {
      var v = 0L
      var i = 0
      while (i < bits) { v = (v << 1) | readBit(); i += 1 }
      v
    }

    def readSInt(bits: Int): Int = {
      val raw = readUInt(bits)
      // sign-extend
      if (bits == 0) 0
      else if ((raw & (1L << (bits - 1))) != 0) (raw - (1L << bits)).toInt
      else raw.toInt
    }

    def readUnary(): Int = {
      var q = 0
      while (readBit() == 0) q += 1
      q
    }

    def alignToByte(): Unit = if (bitPos != 0) { bitPos = 0; bytePos += 1 }
  }

  // CRC-8, polynomial x^8+x^2+x+1 (0x07), init 0 — the frame-header CRC.
  private def crc8(b: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= b(i) & 0xff
      var k = 0
      while (k < 8) {
        crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xff else (crc << 1) & 0xff
        k += 1
      }
      i += 1
    }
    crc
  }

  // CRC-16, polynomial x^16+x^15+x^2+1 (0x8005), init 0 — the frame CRC.
  private def crc16(b: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= (b(i) & 0xff) << 8
      var k = 0
      while (k < 8) {
        crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xffff
        else (crc << 1) & 0xffff
        k += 1
      }
      i += 1
    }
    crc
  }

  private val FixedBlockSizes = Array(
    0, 192, 576, 1152, 2304, 4608, -1, -1,
    256, 512, 1024, 2048, 4096, 8192, 16384, 32768)

  private val SampleRates = Array(
    0, 88200, 176400, 192000, 8000, 16000, 22050, 24000,
    32000, 44100, 48000, 96000, -1, -2, -3, -4)

  private val SampleSizes = Array(0, 8, 12, -1, 16, 20, 24, -1)

  /** Decode a complete FLAC stream. None when not FLAC; a structurally
    * broken stream fails LOUD (bad CRC, reserved code, truncation) —
    * silently returning wrong samples is the one unforgivable decoder
    * behavior.
    */
  def decode(bytes: Array[Byte]): Option[FlacAudio] = {
    if (!isFlac(bytes)) return None
    // metadata blocks: walk to the end; keep STREAMINFO
    var pos = 4
    var last = false
    var sr = 0
    var channels = 0
    var bits = 0
    var total = 0L
    var sawInfo = false
    while (!last) {
      if (pos + 4 > bytes.length)
        throw new IllegalStateException(s"FLAC metadata truncated at $pos")
      val h = bytes(pos) & 0xff
      last = (h & 0x80) != 0
      val btype = h & 0x7f
      val len = ((bytes(pos + 1) & 0xff) << 16) | ((bytes(pos + 2) & 0xff) << 8) |
        (bytes(pos + 3) & 0xff)
      if (btype == 0) { // STREAMINFO
        val r = new BitReader(bytes, pos + 4)
        r.readUInt(16); r.readUInt(16) // min/max block size
        r.readUInt(24); r.readUInt(24) // min/max frame size
        sr = r.readUInt(20).toInt
        channels = r.readUInt(3).toInt + 1
        bits = r.readUInt(5).toInt + 1
        total = r.readUInt(36)
        sawInfo = true
      }
      pos += 4 + len
    }
    require(sawInfo, "FLAC stream without STREAMINFO")
    require(sr > 0, s"FLAC sample rate $sr")
    val out = Array.fill(channels)(Array.newBuilder[Int])
    var decoded = 0L
    while (pos < bytes.length && (total == 0 || decoded < total)) {
      val (block, next) = decodeFrame(bytes, pos, sr, channels, bits)
      for (c <- 0 until channels) out(c) ++= block(c)
      decoded += block(0).length
      pos = next
    }
    val chans = out.map(_.result())
    // total == 0 is legal (unknown); otherwise trim the final frame's
    // padding down to the declared total
    val trimmed =
      if (total > 0 && chans(0).length > total)
        chans.map(a => java.util.Arrays.copyOf(a, total.toInt))
      else chans
    Some(FlacAudio(channels, sr, bits, trimmed))
  }

  /** One frame: returns (per-channel samples, next byte offset). */
  private def decodeFrame(b: Array[Byte], start: Int, siSr: Int,
                          siChannels: Int, siBits: Int)
  : (Array[Array[Int]], Int) = {
    val r = new BitReader(b, start)
    val sync = r.readUInt(14)
    require(sync == 0x3FFE, f"FLAC frame sync not found at $start (0x$sync%x)")
    require(r.readBit() == 0, s"reserved frame bit set at $start")
    r.readBit() // blocking strategy (fixed/variable) — both handled
    val bsCode = r.readUInt(4).toInt
    val srCode = r.readUInt(4).toInt
    val chCode = r.readUInt(4).toInt
    val ssCode = r.readUInt(3).toInt
    require(r.readBit() == 0, s"reserved frame bit set at $start")
    // UTF-8-coded frame/sample number: leading byte tells the width
    val lead = r.readUInt(8).toInt
    val extra =
      if (lead < 0x80) 0
      else if ((lead & 0xE0) == 0xC0) 1
      else if ((lead & 0xF0) == 0xE0) 2
      else if ((lead & 0xF8) == 0xF0) 3
      else if ((lead & 0xFC) == 0xF8) 4
      else if ((lead & 0xFE) == 0xFC) 5
      else if (lead == 0xFE) 6
      else throw new IllegalStateException(s"bad frame-number coding at $start")
    (0 until extra).foreach(_ => r.readUInt(8))
    val blockSize = bsCode match {
      case 0 => throw new IllegalStateException(s"reserved block size at $start")
      case 6 => r.readUInt(8).toInt + 1
      case 7 => r.readUInt(16).toInt + 1
      case n => FixedBlockSizes(n)
    }
    srCode match {
      case 0 => ()                       // from STREAMINFO
      case 12 => r.readUInt(8)           // kHz
      case 13 => r.readUInt(16)          // Hz
      case 14 => r.readUInt(16)          // daHz
      case 15 => throw new IllegalStateException(s"invalid sample-rate code at $start")
      case _ => ()
    }
    val sampleSize = ssCode match {
      case 0 => siBits
      case n if SampleSizes(n) > 0 => SampleSizes(n)
      case _ => throw new IllegalStateException(s"reserved sample size at $start")
    }
    val headerCrc = crc8(b, start, r.bytePos)
    val statedCrc = r.readUInt(8).toInt
    require(headerCrc == statedCrc,
      s"FLAC frame-header CRC mismatch at $start: computed $headerCrc stated $statedCrc")
    // channel assignment: 0..7 independent (count-1), 8 L/S, 9 R/S,
    // 10 M/S; 11-15 reserved
    require(chCode <= 10, s"reserved channel assignment $chCode at $start")
    val nCh = if (chCode < 8) chCode + 1 else 2
    // a decorrelated frame IS a 2-channel frame — STREAMINFO must
    // agree, or the stream is lying to one of its readers (silently
    // keeping channel 0 of two would betray the fail-loud posture)
    require(nCh == siChannels,
      s"frame channel count $nCh (assignment code $chCode) != " +
        s"STREAMINFO $siChannels at $start")
    val subframes = Array.ofDim[Array[Int]](nCh)
    for (c <- 0 until nCh) {
      val extraBit = chCode match {
        case 8 => if (c == 1) 1 else 0 // left/side
        case 9 => if (c == 0) 1 else 0 // side/right
        case 10 => if (c == 1) 1 else 0 // mid/side
        case _ => 0
      }
      subframes(c) = decodeSubframe(r, blockSize, sampleSize + extraBit, start)
    }
    r.alignToByte()
    val frameCrc = crc16(b, start, r.bytePos)
    val statedFrameCrc = r.readUInt(16).toInt
    require(frameCrc == statedFrameCrc,
      s"FLAC frame CRC-16 mismatch at $start: computed $frameCrc stated $statedFrameCrc")
    // undo stereo decorrelation
    val outCh: Array[Array[Int]] = chCode match {
      case 8 => // left/side: R = L - S
        val l = subframes(0); val s = subframes(1)
        Array(l, Array.tabulate(blockSize)(i => l(i) - s(i)))
      case 9 => // side/right: L = R + S
        val s = subframes(0); val rr = subframes(1)
        Array(Array.tabulate(blockSize)(i => rr(i) + s(i)), rr)
      case 10 => // mid/side
        val m = subframes(0); val s = subframes(1)
        val l = Array.tabulate(blockSize) { i =>
          val mid2 = (m(i) << 1) | (s(i) & 1)
          (mid2 + s(i)) >> 1
        }
        val rr = Array.tabulate(blockSize) { i =>
          val mid2 = (m(i) << 1) | (s(i) & 1)
          (mid2 - s(i)) >> 1
        }
        Array(l, rr)
      case _ => subframes
    }
    (outCh, r.bytePos)
  }

  private def decodeSubframe(r: BitReader, n: Int, bits: Int,
                             frameStart: Int): Array[Int] = {
    require(r.readBit() == 0, s"subframe padding bit set in frame at $frameStart")
    val t = r.readUInt(6).toInt
    val wasted =
      if (r.readBit() == 1) r.readUnary() + 1 else 0
    val eff = bits - wasted
    val x: Array[Int] =
      if (t == 0) { // CONSTANT
        val v = r.readSInt(eff)
        Array.fill(n)(v)
      } else if (t == 1) { // VERBATIM
        Array.fill(n)(r.readSInt(eff))
      } else if ((t & 0x38) == 0x08 && (t & 0x07) <= 4) { // FIXED
        val order = t & 0x07
        val warm = Array.fill(order)(r.readSInt(eff))
        val e = residuals(r, n, order, frameStart)
        val out = new Array[Int](n)
        System.arraycopy(warm, 0, out, 0, order)
        var i = order
        while (i < n) {
          val p = order match {
            case 0 => 0L
            case 1 => out(i - 1).toLong
            case 2 => 2L * out(i - 1) - out(i - 2)
            case 3 => 3L * out(i - 1) - 3L * out(i - 2) + out(i - 3)
            case _ => 4L * out(i - 1) - 6L * out(i - 2) +
              4L * out(i - 3) - out(i - 4)
          }
          out(i) = (p + e(i - order)).toInt
          i += 1
        }
        out
      } else if ((t & 0x20) != 0) { // LPC, order = low 5 bits + 1
        val order = (t & 0x1f) + 1
        val warm = Array.fill(order)(r.readSInt(eff))
        val precision = r.readUInt(4).toInt + 1
        // the 4-bit code 1111 (precision 16) is invalid per spec
        require(precision <= 15, s"invalid LPC precision in frame at $frameStart")
        val shift = r.readSInt(5)
        require(shift >= 0, s"negative LPC shift in frame at $frameStart")
        val coefs = Array.fill(order)(r.readSInt(precision))
        val e = residuals(r, n, order, frameStart)
        val out = new Array[Int](n)
        System.arraycopy(warm, 0, out, 0, order)
        var i = order
        while (i < n) {
          var acc = 0L
          var j = 0
          while (j < order) { acc += coefs(j).toLong * out(i - 1 - j); j += 1 }
          out(i) = ((acc >> shift) + e(i - order)).toInt
          i += 1
        }
        out
      } else throw new IllegalStateException(
        s"reserved subframe type $t in frame at $frameStart")
    if (wasted > 0) x.map(_ << wasted) else x
  }

  /** Rice-coded residual section: `n - order` values. */
  private def residuals(r: BitReader, n: Int, order: Int,
                        frameStart: Int): Array[Int] = {
    val method = r.readUInt(2).toInt
    require(method <= 1, s"reserved residual method in frame at $frameStart")
    val paramBits = if (method == 0) 4 else 5
    val escape = (1 << paramBits) - 1
    val partOrder = r.readUInt(4).toInt
    val parts = 1 << partOrder
    require(n % parts == 0 && (n >> partOrder) > order,
      s"invalid rice partition order $partOrder in frame at $frameStart")
    val out = new Array[Int](n - order)
    var idx = 0
    var p = 0
    while (p < parts) {
      val count = (n >> partOrder) - (if (p == 0) order else 0)
      val param = r.readUInt(paramBits).toInt
      if (param == escape) {
        val raw = r.readUInt(5).toInt
        var i = 0
        while (i < count) { out(idx) = r.readSInt(raw); idx += 1; i += 1 }
      } else {
        var i = 0
        while (i < count) {
          val q = r.readUnary()
          val rem = r.readUInt(param)
          val u = (q.toLong << param) | rem
          // zigzag: even → u/2, odd → -(u/2)-1
          out(idx) = (if ((u & 1) == 0) u >> 1 else -(u >> 1) - 1).toInt
          idx += 1
          i += 1
        }
      }
      p += 1
    }
    out
  }
}
