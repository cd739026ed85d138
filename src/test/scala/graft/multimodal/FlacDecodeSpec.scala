package graft.multimodal

import graft.SparkSpec

/** FLAC decode against streams authored bit-by-bit by an INDEPENDENT
  * writer in this spec (the m8 fixture stance): every subframe type,
  * rice variants, stereo decorrelation modes, wasted bits, multi-frame
  * assembly, CRC fail-loud, and the lossless-identity property that
  * makes a FLAC re-encode fingerprint exactly like its WAV.
  */
class FlacDecodeSpec extends SparkSpec {

  // ---- independent bit-level FLAC writer -----------------------------
  private final class BitWriter {
    private val buf = scala.collection.mutable.ArrayBuffer[Byte]()
    private var cur = 0
    private var nBits = 0
    def bit(v: Int): Unit = {
      cur = (cur << 1) | (v & 1)
      nBits += 1
      if (nBits == 8) { buf += cur.toByte; cur = 0; nBits = 0 }
    }
    def uint(v: Long, bits: Int): Unit =
      (bits - 1 to 0 by -1).foreach(i => bit(((v >> i) & 1).toInt))
    def sint(v: Int, bits: Int): Unit = uint(v.toLong & ((1L << bits) - 1), bits)
    def unary(q: Int): Unit = { (0 until q).foreach(_ => bit(0)); bit(1) }
    def align(): Unit = while (nBits != 0) bit(0)
    def bytes: Array[Byte] = { require(nBits == 0, "unaligned"); buf.toArray }
  }

  private def crc8(b: Array[Byte]): Int = {
    var crc = 0
    for (x <- b) {
      crc ^= x & 0xff
      for (_ <- 0 until 8)
        crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xff else (crc << 1) & 0xff
    }
    crc
  }

  private def crc16(b: Array[Byte]): Int = {
    var crc = 0
    for (x <- b) {
      crc ^= (x & 0xff) << 8
      for (_ <- 0 until 8)
        crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xffff
        else (crc << 1) & 0xffff
    }
    crc
  }

  private def streamInfo(sr: Int, channels: Int, bits: Int,
                         total: Long): Array[Byte] = {
    val w = new BitWriter
    w.uint(1, 1); w.uint(0, 7); w.uint(34, 24) // last, type 0, length
    w.uint(16, 16); w.uint(65535, 16)          // min/max block size
    w.uint(0, 24); w.uint(0, 24)               // min/max frame size
    w.uint(sr.toLong, 20)
    w.uint((channels - 1).toLong, 3)
    w.uint((bits - 1).toLong, 5)
    w.uint(total, 36)
    (0 until 16).foreach(_ => w.uint(0, 8))    // MD5 unset
    w.bytes
  }

  /** Rice-encode one residual at `param` (zigzag + unary quotient). */
  private def rice(w: BitWriter, v: Int, param: Int): Unit = {
    val u = if (v >= 0) 2L * v else -2L * v - 1
    w.unary((u >> param).toInt)
    w.uint(u & ((1L << param) - 1), param)
  }

  /** One frame over per-channel SUBFRAME payload writers. `chCode` is
    * the channel-assignment nibble; `frameNo` the UTF-8-coded index.
    */
  private def frame(blockSize: Int, srCode: Int, chCode: Int, ssCode: Int,
                    frameNo: Int, sub: BitWriter => Unit): Array[Byte] = {
    val w = new BitWriter
    w.uint(0x3FFE, 14); w.bit(0); w.bit(0) // sync, reserved, fixed-block
    w.uint(7, 4)                           // block size: 16-bit at end
    w.uint(srCode.toLong, 4)
    w.uint(chCode.toLong, 4)
    w.uint(ssCode.toLong, 3); w.bit(0)
    require(frameNo < 0x80, "spec writer: single-byte frame numbers only")
    w.uint(frameNo.toLong, 8)
    w.uint((blockSize - 1).toLong, 16)
    val headNoCrc = w.bytes
    val w2 = new BitWriter
    headNoCrc.foreach(b => w2.uint(b.toLong & 0xff, 8))
    w2.uint(crc8(headNoCrc).toLong, 8)
    sub(w2)
    w2.align()
    val body = w2.bytes
    val out = new BitWriter
    body.foreach(b => out.uint(b.toLong & 0xff, 8))
    out.uint(crc16(body).toLong, 16)
    out.bytes
  }

  private def flac(sr: Int, channels: Int, bits: Int, total: Long,
                   frames: Array[Byte]*): Array[Byte] =
    "fLaC".getBytes("US-ASCII") ++ streamInfo(sr, channels, bits, total) ++
      frames.flatten

  /** Verbatim mono subframe writer. */
  private def verbatim(xs: Seq[Int], bits: Int)(w: BitWriter): Unit = {
    w.bit(0); w.uint(1, 6); w.bit(0) // type VERBATIM, no wasted bits
    xs.foreach(v => w.sint(v, bits))
  }

  test("verbatim mono: lossless byte-for-byte sample identity") {
    val xs = Seq(0, 1, -1, 12345, -12345, 32767, -32768, 7, -7, 100,
      -100, 250, 4, -9999, 31000, -31000)
    val b = flac(8000, 1, 16, xs.length.toLong,
      frame(xs.length, 0, 0, 4, 0, verbatim(xs, 16)))
    val a = FlacDecode.decode(b).get
    assert(a.sampleRateHz == 8000 && a.channels == 1 && a.bitsPerSample == 16)
    assert(a.samples(0).toSeq == xs)
  }

  test("constant subframe expands to the block") {
    val b = flac(8000, 1, 16, 16L,
      frame(16, 0, 0, 4, 0, { w =>
        w.bit(0); w.uint(0, 6); w.bit(0)
        w.sint(-777, 16)
      }))
    assert(FlacDecode.decode(b).get.samples(0).toSeq == Seq.fill(16)(-777))
  }

  test("fixed order-2 predictor + rice residuals reconstruct exactly") {
    // x[n] = 2x[n-1] - x[n-2] + e[n] — author x, derive e by the spec
    val xs = Array(100, 103, 108, 111, 112, 110, 107, 106, 108, 113,
      119, 124, 126, 125, 121, 118)
    val e = (2 until xs.length).map(i => xs(i) - 2 * xs(i - 1) + xs(i - 2))
    val b = flac(8000, 1, 16, xs.length.toLong,
      frame(xs.length, 0, 0, 4, 0, { w =>
        w.bit(0); w.uint(0x08 | 2, 6); w.bit(0) // FIXED order 2
        w.sint(xs(0), 16); w.sint(xs(1), 16)    // warmup
        w.uint(0, 2)                            // rice, 4-bit params
        w.uint(0, 4)                            // partition order 0
        w.uint(3, 4)                            // param 3
        e.foreach(v => rice(w, v, 3))
      }))
    assert(FlacDecode.decode(b).get.samples(0).toSeq == xs.toSeq)
  }

  test("LPC subframe: quantized coefficients + shift reconstruct exactly") {
    // order 2, coefs (c0, c1) at shift 4: pred = (c0·x[n-1] + c1·x[n-2]) >> 4
    val xs = Array(500, 480, 470, 478, 492, 505, 511, 508, 499, 490,
      486, 489, 497, 506, 511, 509)
    val (c0, c1, shift) = (29, -14, 4)
    val e = (2 until xs.length).map { i =>
      xs(i) - (((c0.toLong * xs(i - 1) + c1.toLong * xs(i - 2)) >> shift).toInt)
    }
    val b = flac(8000, 1, 16, xs.length.toLong,
      frame(xs.length, 0, 0, 4, 0, { w =>
        w.bit(0); w.uint(0x20 | (2 - 1), 6); w.bit(0) // LPC order 2
        w.sint(xs(0), 16); w.sint(xs(1), 16)
        w.uint((6 - 1).toLong, 4)                     // precision 6
        w.sint(shift, 5)
        w.sint(c0, 6); w.sint(c1, 6)
        w.uint(0, 2); w.uint(0, 4); w.uint(4, 4)      // rice p0, param 4
        e.foreach(v => rice(w, v, 4))
      }))
    assert(FlacDecode.decode(b).get.samples(0).toSeq == xs.toSeq)
  }

  test("rice partitions and the raw-escape encoding decode") {
    val xs = (0 until 16).map(i => (i * 37) % 101 - 50)
    val b = flac(8000, 1, 16, 16L,
      frame(16, 0, 0, 4, 0, { w =>
        w.bit(0); w.uint(0x08, 6); w.bit(0) // FIXED order 0: e = x
        w.uint(0, 2)
        w.uint(1, 4)                        // partition order 1 → 2 parts
        w.uint(5, 4)                        // part 1: rice param 5
        xs.take(8).foreach(v => rice(w, v, 5))
        w.uint(15, 4)                       // part 2: ESCAPE
        w.uint(12, 5)                       // 12-bit raw residuals
        xs.drop(8).foreach(v => w.sint(v, 12))
      }))
    assert(FlacDecode.decode(b).get.samples(0).toSeq == xs)
  }

  test("wasted bits unpack (samples shifted back up)") {
    val xs = Seq(4, -8, 12, 0, 16, -4, 8, -12, 4, 0, -16, 8, 12, -4, 0, 4)
    require(xs.forall(_ % 4 == 0))
    val b = flac(8000, 1, 16, 16L,
      frame(16, 0, 0, 4, 0, { w =>
        w.bit(0); w.uint(1, 6)         // VERBATIM
        w.bit(1); w.unary(1)           // wasted-bits flag, count-1=1 → 2
        xs.foreach(v => w.sint(v >> 2, 14))
      }))
    assert(FlacDecode.decode(b).get.samples(0).toSeq == xs)
  }

  test("stereo: independent, left/side, right/side, mid/side all reconstruct L/R") {
    val l = Array(100, 120, 90, 80, 105, 130, 125, 95, 88, 101, 117, 93,
      84, 99, 126, 111)
    val r = Array(60, 75, 82, 64, 58, 70, 91, 66, 73, 85, 62, 77, 69,
      81, 59, 88)
    val n = l.length
    def subV(xs: Array[Int], bits: Int)(w: BitWriter): Unit = {
      w.bit(0); w.uint(1, 6); w.bit(0)
      xs.foreach(v => w.sint(v, bits))
    }
    val indep = flac(8000, 2, 16, n.toLong,
      frame(n, 0, 1, 4, 0, { w => subV(l, 16)(w); subV(r, 16)(w) }))
    val ls = flac(8000, 2, 16, n.toLong,
      frame(n, 0, 8, 4, 0, { w =>
        subV(l, 16)(w)
        subV(l.indices.map(i => l(i) - r(i)).toArray, 17)(w) // side: +1 bit
      }))
    val rs = flac(8000, 2, 16, n.toLong,
      frame(n, 0, 9, 4, 0, { w =>
        subV(l.indices.map(i => l(i) - r(i)).toArray, 17)(w)
        subV(r, 16)(w)
      }))
    val ms = flac(8000, 2, 16, n.toLong,
      frame(n, 0, 10, 4, 0, { w =>
        subV(l.indices.map(i => (l(i) + r(i)) >> 1).toArray, 16)(w)
        subV(l.indices.map(i => l(i) - r(i)).toArray, 17)(w)
      }))
    for ((b, name) <- Seq((indep, "independent"), (ls, "left/side"),
        (rs, "right/side"), (ms, "mid/side"))) {
      val a = FlacDecode.decode(b).get
      assert(a.samples(0).toSeq == l.toSeq, s"$name left")
      assert(a.samples(1).toSeq == r.toSeq, s"$name right")
    }
  }

  test("a decorrelated frame inside a mono-declared stream fails loud") {
    // left/side IS a 2-channel frame; STREAMINFO says channels=1 —
    // the stream lies to one of its readers, so the decoder must
    // refuse rather than silently keep channel 0 of two
    val l = Array(10, 20, 30, 40, 50, 60, 70, 80, 10, 20, 30, 40, 50,
      60, 70, 80)
    val s = Array.fill(16)(5)
    def subV(xs: Array[Int], bits: Int)(w: BitWriter): Unit = {
      w.bit(0); w.uint(1, 6); w.bit(0)
      xs.foreach(v => w.sint(v, bits))
    }
    val lying = flac(8000, 1, 16, 16L,
      frame(16, 0, 8, 4, 0, { w => subV(l, 16)(w); subV(s, 17)(w) }))
    val e = intercept[IllegalArgumentException](FlacDecode.decode(lying))
    assert(e.getMessage.contains("STREAMINFO"), e.getMessage)
    // reserved channel-assignment codes (11-15) are refused too
    val reserved = flac(8000, 2, 16, 16L,
      frame(16, 0, 11, 4, 0, { w => subV(l, 16)(w); subV(s, 16)(w) }))
    val e2 = intercept[IllegalArgumentException](FlacDecode.decode(reserved))
    assert(e2.getMessage.contains("reserved channel assignment"),
      e2.getMessage)
  }

  test("multi-frame streams concatenate; declared total trims padding") {
    val f0 = (1 to 16).toSeq
    val f1 = (17 to 32).toSeq
    val b = flac(8000, 1, 16, 30L, // total 30 < 32: final 2 trimmed
      frame(16, 0, 0, 4, 0, verbatim(f0, 16)),
      frame(16, 0, 0, 4, 1, verbatim(f1, 16)))
    assert(FlacDecode.decode(b).get.samples(0).toSeq == (1 to 30).toSeq)
  }

  test("corrupt bytes fail LOUD with an offset, never wrong samples") {
    val xs = (1 to 16).toSeq
    val good = flac(8000, 1, 16, 16L, frame(16, 0, 0, 4, 0, verbatim(xs, 16)))
    val bad = good.clone()
    bad(good.length - 10) = (bad(good.length - 10) ^ 0x40).toByte
    val e = intercept[Exception](FlacDecode.decode(bad))
    assert(e.getMessage.contains("CRC") || e.getMessage.contains("FLAC"),
      e.getMessage)
    assert(FlacDecode.decode("not flac".getBytes).isEmpty)
  }

  test("fingerprint identity: a FLAC re-encode hashes exactly like its WAV") {
    // 16-bit quantized samples of a 1024-sample-per-segment tone clip,
    // written BOTH as WAV and as verbatim FLAC: identical integers →
    // identical spectra → identical hash
    val n = 8 * 1024
    val ints = Array.tabulate(n) { i =>
      math.round(0.2 * math.sin(2.0 * math.Pi * 100 * i / 1024) * 32767).toInt
    }
    // WAV writer (AudioFingerprintSpec shape, ints directly)
    val bos = new java.io.ByteArrayOutputStream()
    def w32(v: Long): Unit = (0 to 3).foreach(i => bos.write(((v >> (8 * i)) & 0xff).toInt))
    def w16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
    bos.write("RIFF".getBytes); w32(36L + n * 2); bos.write("WAVE".getBytes)
    bos.write("fmt ".getBytes); w32(16L); w16(1); w16(1); w32(8000L)
    w32(16000L); w16(2); w16(16)
    bos.write("data".getBytes); w32(n.toLong * 2)
    ints.foreach(v => w16(v & 0xffff))
    val wavBytes = bos.toByteArray
    val flacBytes = flac(8000, 1, 16, n.toLong,
      ints.grouped(1024).zipWithIndex.map { case (g, i) =>
        frame(1024, 0, 0, 4, i, verbatim(g.toSeq, 16))
      }.toSeq: _*)
    val hWav = AudioFingerprint.spectralHash64(wavBytes)
    val hFlac = AudioFingerprint.spectralHash64(flacBytes)
    assert(hWav == hFlac && hWav.nonEmpty,
      s"wav=$hWav flac=$hFlac")
  }
}
