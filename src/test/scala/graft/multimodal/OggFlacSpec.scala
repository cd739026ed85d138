package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Ogg-FLAC unwrap against an INDEPENDENT spec-side page writer
  * (RFC 3533 page framing + the xiph FLAC-to-Ogg mapping, built
  * bit-by-bit here, never by the code under test): splice identity
  * with the native stream, packet reassembly across lacing and page
  * boundaries, multiplexed foreign serials, and the fail-loud
  * posture on CRC/truncation damage.
  */
class OggFlacSpec extends AnyFunSuite {

  // ---- native FLAC builder (the FlacDecodeSpec verbatim writer,
  //      reduced to what these cases need) ----
  private final class BitWriter {
    private val buf = scala.collection.mutable.ArrayBuffer[Byte]()
    private var cur = 0
    private var nBits = 0
    def bit(v: Int): Unit = {
      cur = (cur << 1) | (v & 1); nBits += 1
      if (nBits == 8) { buf += cur.toByte; cur = 0; nBits = 0 }
    }
    def uint(v: Long, bits: Int): Unit =
      (bits - 1 to 0 by -1).foreach(i => bit(((v >> i) & 1).toInt))
    def sint(v: Int, bits: Int): Unit =
      uint(v.toLong & ((1L << bits) - 1), bits)
    def bytes: Array[Byte] = { require(nBits == 0, "unaligned"); buf.toArray }
  }

  private def crc8(b: Array[Byte]): Int = b.foldLeft(0) { (c0, x) =>
    (0 until 8).foldLeft(c0 ^ (x & 0xff)) { (c, _) =>
      if ((c & 0x80) != 0) ((c << 1) ^ 0x07) & 0xff else (c << 1) & 0xff
    }
  }

  private def crc16(b: Array[Byte]): Int = b.foldLeft(0) { (c0, x) =>
    (0 until 8).foldLeft(c0 ^ ((x & 0xff) << 8)) { (c, _) =>
      if ((c & 0x8000) != 0) ((c << 1) ^ 0x8005) & 0xffff
      else (c << 1) & 0xffff
    }
  }

  private def streamInfo(sr: Int, total: Long, last: Boolean): Array[Byte] = {
    val w = new BitWriter
    w.uint(if (last) 1 else 0, 1); w.uint(0, 7); w.uint(34, 24)
    w.uint(16, 16); w.uint(65535, 16); w.uint(0, 24); w.uint(0, 24)
    w.uint(sr.toLong, 20); w.uint(0, 3); w.uint(15, 5) // mono, 16-bit
    w.uint(total, 36)
    (0 until 16).foreach(_ => w.uint(0, 8))
    w.bytes
  }

  /** One verbatim mono 16-bit FLAC frame. */
  private def flacFrame(xs: Seq[Int], frameNo: Int): Array[Byte] = {
    val w = new BitWriter
    w.uint(0x3FFE, 14); w.bit(0); w.bit(0)
    w.uint(7, 4); w.uint(0, 4); w.uint(0, 4); w.uint(4, 3); w.bit(0)
    w.uint(frameNo.toLong, 8)
    w.uint((xs.length - 1).toLong, 16)
    val head = w.bytes
    val w2 = new BitWriter
    head.foreach(b => w2.uint(b.toLong & 0xff, 8))
    w2.uint(crc8(head).toLong, 8)
    w2.bit(0); w2.uint(1, 6); w2.bit(0) // VERBATIM
    xs.foreach(v => w2.sint(v, 16))
    val body = w2.bytes
    val out = new BitWriter
    body.foreach(b => out.uint(b.toLong & 0xff, 8))
    out.uint(crc16(body).toLong, 16)
    out.bytes
  }

  private def nativeFlac(sr: Int, xs: Seq[Int]): Array[Byte] =
    "fLaC".getBytes("US-ASCII") ++ streamInfo(sr, xs.length.toLong,
      last = true) ++ xs.grouped(256).zipWithIndex.flatMap {
      case (g, i) => flacFrame(g, i) }.toArray

  // ---- independent Ogg page writer ----
  private def crc32Ogg(b: Array[Byte]): Long = {
    var crc = 0L
    for (x <- b) {
      crc ^= (x & 0xffL) << 24
      for (_ <- 0 until 8)
        crc = if ((crc & 0x80000000L) != 0)
          ((crc << 1) ^ 0x04C11DB7L) & 0xffffffffL
        else (crc << 1) & 0xffffffffL
    }
    crc
  }

  /** One page. `laces` must sum to `body.length`; a trailing 255
    * means the packet continues on the next page.
    */
  private def page(htype: Int, serial: Long, seq: Int,
                   laces: Seq[Int], body: Array[Byte]): Array[Byte] = {
    require(laces.sum == body.length && laces.forall(l => l >= 0 && l <= 255))
    val head = new java.io.ByteArrayOutputStream()
    head.write("OggS".getBytes("US-ASCII"))
    head.write(0); head.write(htype)
    (0 until 8).foreach(_ => head.write(0)) // granule (unchecked)
    (0 until 4).foreach(i => head.write(((serial >> (8 * i)) & 0xff).toInt))
    (0 until 4).foreach(i => head.write(((seq >> (8 * i)) & 0xff).toInt))
    (0 until 4).foreach(_ => head.write(0)) // CRC placeholder
    head.write(laces.length)
    laces.foreach(head.write)
    val full = head.toByteArray ++ body
    val crc = crc32Ogg(full)
    (0 until 4).foreach(i => full(22 + i) = ((crc >> (8 * i)) & 0xff).toByte)
    full
  }

  /** Lacing values for one whole packet inside a page (the 255-run +
    * final short value form; a multiple of 255 needs a trailing 0).
    */
  private def lacesOf(len: Int): Seq[Int] =
    Seq.fill(len / 255)(255) :+ (len % 255)

  /** The mapping's BOS packet for a native stream's STREAMINFO. */
  private def bosPacket(sr: Int, total: Long, nHeaders: Int): Array[Byte] =
    Array(0x7f.toByte, 'F'.toByte, 'L'.toByte, 'A'.toByte, 'C'.toByte,
      1.toByte, 0.toByte,
      ((nHeaders >> 8) & 0xff).toByte, (nHeaders & 0xff).toByte) ++
      "fLaC".getBytes("US-ASCII") ++ streamInfo(sr, total, last = false)

  /** Standard wrap: BOS page, `headers` packets on one page, one
    * audio frame packet per page.
    */
  private def oggWrap(sr: Int, xs: Seq[Int],
                      headers: Seq[Array[Byte]] = Nil): Array[Byte] = {
    val serial = 0x1234L
    var seq = 0
    def nextSeq(): Int = { seq += 1; seq - 1 }
    val out = new java.io.ByteArrayOutputStream()
    out.write(page(0x02, serial, nextSeq(),
      lacesOf(bosPacket(sr, xs.length.toLong, headers.length).length),
      bosPacket(sr, xs.length.toLong, headers.length)))
    if (headers.nonEmpty)
      out.write(page(0x00, serial, nextSeq(),
        headers.flatMap(h => lacesOf(h.length)), headers.flatten.toArray))
    val frames = xs.grouped(256).zipWithIndex
      .map { case (g, i) => flacFrame(g, i) }.toSeq
    frames.zipWithIndex.foreach { case (f, i) =>
      val htype = if (i == frames.length - 1) 0x04 else 0x00
      out.write(page(htype, serial, nextSeq(), lacesOf(f.length), f))
    }
    out.toByteArray
  }

  private val samples: Seq[Int] =
    (0 until 600).map(i => ((i * 37) % 401) - 200)

  test("splice identity: Ogg-FLAC decodes to the exact native samples") {
    val native = nativeFlac(8000, samples)
    val ogg = oggWrap(8000, samples)
    val direct = FlacDecode.decode(native).get
    val viaOgg = OggFlac.decode(ogg).get
    assert(viaOgg.sampleRateHz == 8000 && viaOgg.channels == 1)
    assert(viaOgg.samples(0).toSeq == direct.samples(0).toSeq)
    assert(viaOgg.samples(0).toSeq == samples)
  }

  test("header packets (VorbisComment etc.) are counted and skipped") {
    // two fake metadata header packets; nheaders=2 in the BOS packet
    val h1 = Array[Byte](4, 0, 0, 5, 1, 2, 3, 4, 5) // block type 4, len 5
    val h2 = Array[Byte](1, 0, 0, 2, 9, 9)
    val ogg = oggWrap(8000, samples, headers = Seq(h1, h2))
    assert(OggFlac.decode(ogg).get.samples(0).toSeq == samples)
  }

  test("a packet spanning pages (continued flag) reassembles exactly") {
    val serial = 7L
    val frame = flacFrame(samples.take(256), 0)
    require(frame.length > 300, "need a frame big enough to split")
    val cut = 200
    val bos = bosPacket(8000, 256L, 0)
    val p0 = page(0x02, serial, 0, lacesOf(bos.length), bos)
    // first half: a single 255-run that does NOT terminate (end the
    // lacing table on 255 → packet continues)
    val laces1 = Seq.fill(cut / 255)(255) ++
      (if (cut % 255 != 0) Seq(255) else Nil)
    // pad the first slice to the lacing total (255-multiples only)
    val take1 = laces1.sum
    require(take1 >= cut && take1 <= frame.length, "split arithmetic")
    val p1 = page(0x00, serial, 1, laces1, frame.take(take1))
    val rest = frame.drop(take1)
    val p2 = page(0x05, serial, 2, lacesOf(rest.length), rest) // cont+EOS
    val ogg = p0 ++ p1 ++ p2
    assert(OggFlac.decode(ogg).get.samples(0).toSeq == samples.take(256))
  }

  test("nheaders=0 means UNKNOWN (mapping spec): header packets skip by shape") {
    // a muxer that wrote 0x0000 for the header count still ships the
    // VorbisComment packet — it must be skipped as a header (leading
    // metadata-block byte), not spliced in as an audio frame
    val serial = 11L
    val bos = bosPacket(8000, 256L, nHeaders = 0)
    val vorbisComment = Array[Byte](4, 0, 0, 4, 0, 0, 0, 0) // type 4, len 4
    val frame = flacFrame(samples.take(256), 0)
    val ogg =
      page(0x02, serial, 0, lacesOf(bos.length), bos) ++
      page(0x00, serial, 1, lacesOf(vorbisComment.length), vorbisComment) ++
      page(0x04, serial, 2, lacesOf(frame.length), frame)
    assert(OggFlac.decode(ogg).get.samples(0).toSeq == samples.take(256))
  }

  test("multiplexed foreign serials are skipped, not spliced in") {
    val serial = 0x1234L
    val other = 0x9999L
    val bos = bosPacket(8000, 256L, 0)
    val frame = flacFrame(samples.take(256), 0)
    val vorbisBos = (Array(1.toByte) ++ "vorbis".getBytes("US-ASCII") ++
      Array.fill[Byte](20)(0))
    val ogg =
      page(0x02, other, 0, lacesOf(vorbisBos.length), vorbisBos) ++
      page(0x02, serial, 0, lacesOf(bos.length), bos) ++
      page(0x00, other, 1, lacesOf(3), Array[Byte](1, 2, 3)) ++
      page(0x04, serial, 1, lacesOf(frame.length), frame) ++
      page(0x04, other, 2, lacesOf(2), Array[Byte](4, 5))
    assert(OggFlac.decode(ogg).get.samples(0).toSeq == samples.take(256))
  }

  test("pure Ogg Vorbis is None (not ours), never a guess") {
    val vorbisBos = (Array(1.toByte) ++ "vorbis".getBytes("US-ASCII") ++
      Array.fill[Byte](20)(0))
    val ogg = page(0x02, 5L, 0, lacesOf(vorbisBos.length), vorbisBos) ++
      page(0x04, 5L, 1, lacesOf(2), Array[Byte](1, 2))
    assert(OggFlac.toNativeFlac(ogg).isEmpty)
    assert(OggFlac.toNativeFlac("no ogg here".getBytes).isEmpty)
  }

  test("page CRC damage and truncation fail LOUD, never wrong samples") {
    val ogg = oggWrap(8000, samples)
    val bad = ogg.clone()
    bad(bad.length - 3) = (bad(bad.length - 3) ^ 0x20).toByte
    val e = intercept[IllegalArgumentException](OggFlac.toNativeFlac(bad))
    assert(e.getMessage.contains("CRC"), e.getMessage)
    val truncated = ogg.take(ogg.length - 5)
    val e2 = intercept[IllegalArgumentException](
      OggFlac.toNativeFlac(truncated))
    assert(e2.getMessage.contains("truncated"), e2.getMessage)
  }

  test("property: EVERY legal paging of the packet stream unwraps to the same samples") {
    // RFC 3533 allows a muxer to break the lacing-entry stream into
    // pages at ANY entry boundary (a break after a 255 lace continues
    // the packet; after a short lace it does not). The walk must be
    // indifferent to the muxer's choices — pin it with ScalaCheck over
    // random break vectors.
    import org.scalacheck.{Gen, Prop}
    val xs = samples.take(512)
    val serial = 21L
    val bos = bosPacket(8000, xs.length.toLong, 0)
    val frames = xs.grouped(256).zipWithIndex
      .map { case (g, i) => flacFrame(g, i) }.toList
    val direct = FlacDecode.decode(nativeFlac(8000, xs)).get.samples(0).toSeq
    // one (bytes, lace) entry list per frame packet
    def entries(p: Array[Byte]): List[(Array[Byte], Int)] = {
      val full = (0 until p.length / 255).map(i =>
        (p.slice(i * 255, (i + 1) * 255), 255)).toList
      full :+ ((p.drop(p.length / 255 * 255), p.length % 255))
    }
    val all = frames.flatMap(entries)
    val gaps = all.length - 1
    val prop = Prop.forAll(Gen.listOfN(gaps, Gen.oneOf(true, false))) {
      breaks =>
        // group entries into pages per the break vector
        val pages = scala.collection.mutable.ArrayBuffer(
          scala.collection.mutable.ArrayBuffer(all.head))
        all.tail.zip(breaks).foreach { case (e, brk) =>
          if (brk) pages += scala.collection.mutable.ArrayBuffer(e)
          else pages.last += e
        }
        val out = new java.io.ByteArrayOutputStream()
        out.write(page(0x02, serial, 0, lacesOf(bos.length), bos))
        var prevLace = bos.length % 255 // short: BOS terminates its packet
        pages.zipWithIndex.foreach { case (pg, i) =>
          val continued = prevLace == 255
          val htype = (if (continued) 1 else 0) |
            (if (i == pages.length - 1) 4 else 0)
          out.write(page(htype, serial, i + 1,
            pg.map(_._2).toSeq, pg.flatMap(_._1).toArray))
          prevLace = pg.last._2
        }
        OggFlac.decode(out.toByteArray).exists(
          _.samples(0).toSeq == direct)
    }
    val r = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default
        .withMinSuccessfulTests(60)
        .withInitialSeed(org.scalacheck.rng.Seed(0x9A4E12L)), prop)
    assert(r.passed, r.status.toString)
  }

  test("hostile bytes: every prefix and random mutations fail CLEANLY (IAE/ISE), never out-of-bounds") {
    val ogg = oggWrap(8000, samples.take(300))
    def cleanly(b: Array[Byte]): Unit =
      try { OggFlac.toNativeFlac(b); () } catch {
        case _: IllegalArgumentException | _: IllegalStateException => ()
      }
    for (n <- 0 to math.min(ogg.length, 400)) cleanly(ogg.take(n))
    cleanly(ogg.take(ogg.length - 1))
    // deterministic byte mutations across the whole stream (seedless:
    // every 7th offset, three bit patterns)
    for (off <- 0 until ogg.length by 7; bit <- Seq(0x01, 0x10, 0x80)) {
      val m = ogg.clone()
      m(off) = (m(off) ^ bit).toByte
      cleanly(m)
    }
  }

  test("fingerprint face: .oga hashes through pcmMono like its WAV") {
    // pcmMono must route Ogg-FLAC through the same decode; equality
    // of the full pipelines is pinned by the m28 gate's level table —
    // here we pin the decode identity
    val ogg = oggWrap(8000, samples)
    val (mono, sr) = AudioFingerprint.pcmMono(ogg).get
    assert(sr == 8000 && mono.length == samples.length)
    assert(math.abs(mono(10) - samples(10) / 32768.0) < 1e-12)
    // broken Ogg follows the NULL-for-undecodable column contract
    val bad = ogg.clone()
    bad(30) = (bad(30) ^ 0x01).toByte
    assert(AudioFingerprint.pcmMono(bad).isEmpty)
  }
}
