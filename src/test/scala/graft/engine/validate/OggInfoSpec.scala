package graft.engine.validate

import org.scalatest.funsuite.AnyFunSuite

/** Ogg Vorbis/Opus inventory vs an independent in-spec page writer
  * (RFC 3533 framing + the two mappings' ID headers).
  */
class OggInfoSpec extends AnyFunSuite {

  private def crc(page: Array[Byte]): Long = {
    var c = 0L
    for (x <- page) {
      c ^= (x & 0xFFL) << 24
      var k = 0
      while (k < 8) {
        c = if ((c & 0x80000000L) != 0) ((c << 1) ^ 0x04C11DB7L) & 0xFFFFFFFFL
        else (c << 1) & 0xFFFFFFFFL
        k += 1
      }
    }
    c
  }

  private def page(htype: Int, serial: Long, seq: Int, granule: Long,
                   packet: Array[Byte]): Array[Byte] = {
    val laces = Seq.fill(packet.length / 255)(255) :+ (packet.length % 255)
    val out = new java.io.ByteArrayOutputStream()
    out.write("OggS".getBytes("US-ASCII"))
    out.write(0); out.write(htype)
    (0 until 8).foreach(i => out.write(((granule >> (8 * i)) & 0xFF).toInt))
    (0 until 4).foreach(i => out.write(((serial >> (8 * i)) & 0xFF).toInt))
    (0 until 4).foreach(i => out.write(((seq >> (8 * i)) & 0xFF).toInt))
    (0 until 4).foreach(_ => out.write(0))
    out.write(laces.length)
    laces.foreach(out.write)
    out.write(packet)
    val p = out.toByteArray
    val c = crc(p)
    (0 until 4).foreach(i => p(22 + i) = ((c >> (8 * i)) & 0xFF).toByte)
    p
  }

  private def le16(v: Int) = Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
  private def le32(v: Long) = Array((v & 0xFF).toByte,
    ((v >> 8) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
    ((v >> 24) & 0xFF).toByte)

  private def vorbisId(channels: Int, rate: Int): Array[Byte] =
    Array(1.toByte) ++ "vorbis".getBytes("US-ASCII") ++ le32(0) ++
      Array(channels.toByte) ++ le32(rate.toLong) ++
      le32(0) ++ le32(128000) ++ le32(0) ++
      Array(0xB8.toByte, 1.toByte)

  private def opusHead(channels: Int, preSkip: Int): Array[Byte] =
    "OpusHead".getBytes("US-ASCII") ++ Array(1.toByte, channels.toByte) ++
      le16(preSkip) ++ le32(48000) ++ le16(0) ++ Array(0.toByte)

  private def stream(id: Array[Byte], serial: Long,
                     lastGranule: Long): Array[Byte] =
    page(0x02, serial, 0, 0, id) ++
      page(0x00, serial, 1, lastGranule / 2, Array.fill[Byte](40)(7)) ++
      page(0x04, serial, 2, lastGranule, Array.fill[Byte](40)(8))

  test("vorbis and opus ID headers + tail granule inventory") {
    val v = stream(vorbisId(2, 44100), 0x1111L, 88200L)
    assert(AudioProbe.oggInfo(v) ==
      Some(AudioProbe.AudioMeta("vorbis", 2, 44100, 0, 88200L)))
    val o = stream(opusHead(1, 312), 0x2222L, 48312L)
    assert(AudioProbe.oggInfo(o) ==
      Some(AudioProbe.AudioMeta("opus", 1, 48000, 0, 48000L)))
  }

  test("corrupted tail CRC falls back to the last VALID page; " +
    "payload OggS cannot fake a granule") {
    val v = stream(vorbisId(2, 44100), 0x1111L, 88200L)
    val bad = v.clone()
    bad(bad.length - 3) = (bad(bad.length - 3) ^ 1).toByte
    assert(AudioProbe.oggInfo(bad).map(_.nSamples).contains(44100L))
    // a PAYLOAD containing fake OggS bytes (version 0, same serial,
    // garbage granule): its CRC never checks at that offset, so the
    // REAL page header that carries it wins
    val collide = "OggS".getBytes("US-ASCII") ++
      Array[Byte](0, 0) ++ Array.fill[Byte](8)(0x7F) ++
      Array[Byte](0x11, 0x11, 0, 0) ++ Array.fill[Byte](40)(9)
    val v2 = page(0x02, 0x1111L, 0, 0, vorbisId(2, 44100)) ++
      page(0x04, 0x1111L, 1, 88200L, collide)
    assert(AudioProbe.oggInfo(v2).map(_.nSamples).contains(88200L))
  }

  // ---- M4A (audio-in-MP4) -------------------------------------------

  private def be16b(v: Int) = Array(((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
  private def be32b(v: Long) = Array(((v >> 24) & 0xFF).toByte,
    ((v >> 16) & 0xFF).toByte, ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)

  /** Independent M4A builder over the generic ISO-BMFF box writers. */
  private def m4a(codec: String, channels: Int, rate: Int,
                  timescale: Int, duration: Long): Array[Byte] = {
    import graft.queries.HeifFixture.{box, ftyp, fullBox}
    val sampleEntry = box(codec,
      new Array[Byte](6), be16b(1),          // reserved + data_ref_idx
      new Array[Byte](8),                     // 2x u32 reserved
      be16b(channels), be16b(16),             // channelcount, samplesize
      be16b(0), be16b(0),                     // pre_defined, reserved
      be32b(rate.toLong << 16))               // 16.16 samplerate
    val stsd = fullBox("stsd", 0, 0, be32b(1), sampleEntry)
    val mdhd = fullBox("mdhd", 0, 0, be32b(0), be32b(0),
      be32b(timescale.toLong), be32b(duration), be16b(0), be16b(0))
    val hdlr = fullBox("hdlr", 0, 0, be32b(0),
      "soun".getBytes("US-ASCII"), new Array[Byte](12), Array[Byte](0))
    val trak = box("trak", box("mdia", mdhd, hdlr,
      box("minf", box("stbl", stsd))))
    ftyp("M4A ", Seq("M4A ", "isom")) ++ box("moov", trak) ++
      box("mdat", Array[Byte](1, 2, 3))
  }

  test("m4a inventory: soun sample entry + mdhd duration; video-only " +
    "and truncations refuse") {
    assert(AudioProbe.m4aInfo(m4a("mp4a", 2, 44100, 44100, 88200L)) ==
      Some(AudioProbe.AudioMeta("mp4a", 2, 44100, 0, 88200L)))
    // media timescale != rate: duration converts to sample frames
    assert(AudioProbe.m4aInfo(m4a("alac", 1, 48000, 1000, 2000L)) ==
      Some(AudioProbe.AudioMeta("alac", 1, 48000, 0, 96000L)))
    // a video handler is not audio; junk refuses; truncation fuzz
    val vid = {
      import graft.queries.HeifFixture.{box, ftyp, fullBox}
      ftyp("isom", Seq("isom")) ++ box("moov", box("trak", box("mdia",
        fullBox("hdlr", 0, 0, be32b(0), "vide".getBytes("US-ASCII"),
          new Array[Byte](12), Array[Byte](0)))))
    }
    assert(AudioProbe.m4aInfo(vid).isEmpty)
    assert(AudioProbe.m4aInfo("junk junk junk junk".getBytes).isEmpty)
    assert(AudioProbe.m4aInfo(null).isEmpty)
    val whole = m4a("mp4a", 2, 44100, 44100, 88200L)
    for (cut <- 0 to whole.length by 3)
      AudioProbe.m4aInfo(java.util.Arrays.copyOfRange(whole, 0, cut))
  }

  test("non-ogg, ogg-flac and truncations refuse quietly") {
    assert(AudioProbe.oggInfo("not ogg".getBytes).isEmpty)
    assert(AudioProbe.oggInfo(null).isEmpty)
    // an Ogg whose BOS is neither vorbis nor opus (FLAC mapping) is
    // None here — OggFlac owns that path
    val flacBos = Array(0x7F.toByte) ++ "FLAC".getBytes("US-ASCII") ++
      Array.fill[Byte](20)(0)
    assert(AudioProbe.oggInfo(page(0x02, 0x99L, 0, 0, flacBos)).isEmpty)
    val v = stream(vorbisId(2, 44100), 0x1111L, 88200L)
    for (cut <- 0 to v.length by 3)
      AudioProbe.oggInfo(java.util.Arrays.copyOfRange(v, 0, cut))
  }

  // ---- unified tags -----------------------------------------------

  private def comments(pairs: Seq[String]): Array[Byte] = {
    val vendor = "spec writer".getBytes("UTF-8")
    le32(vendor.length) ++ vendor ++ le32(pairs.length) ++
      pairs.flatMap { p =>
        val b = p.getBytes("UTF-8"); (le32(b.length) ++ b).toSeq
      }
  }

  test("tags: vorbis comment packet normalizes keys; a comment " +
    "packet spanning lacing segments assembles; = in values survives") {
    val tagsPkt = Array(3.toByte) ++ "vorbis".getBytes("US-ASCII") ++
      comments(Seq("title=A=B Song", "Artist=Someone",
        "novaluehere", "ALBUM=Third"))
    val ogg = page(0x02, 0x77L, 0, 0, vorbisId(2, 44100)) ++
      page(0x00, 0x77L, 1, 0, tagsPkt) ++
      page(0x04, 0x77L, 2, 44100L, Array.fill[Byte](10)(1))
    val got = AudioProbe.tags(ogg).get
    assert(got == Seq("ALBUM" -> "Third", "ARTIST" -> "Someone",
      "TITLE" -> "A=B Song"))
    // a 600-byte comment packet crosses the 255-lacing boundary
    val bigVal = "x" * 550
    val bigPkt = Array(3.toByte) ++ "vorbis".getBytes("US-ASCII") ++
      comments(Seq(s"TITLE=$bigVal"))
    val ogg2 = page(0x02, 0x78L, 0, 0, vorbisId(2, 44100)) ++
      page(0x00, 0x78L, 1, 0, bigPkt)
    assert(AudioProbe.tags(ogg2).get == Seq("TITLE" -> bigVal))
  }

  test("tags: OpusTags, native FLAC block 4, and ID3 map into the " +
    "same keyspace") {
    val opusOgg = page(0x02, 0x79L, 0, 0, opusHead(1, 0)) ++
      page(0x00, 0x79L, 1, 0, "OpusTags".getBytes("US-ASCII") ++
        comments(Seq("TITLE=Opus Cast")))
    assert(AudioProbe.tags(opusOgg).get == Seq("TITLE" -> "Opus Cast"))
    val cm = comments(Seq("DATE=2023", "TITLE=Flac Take"))
    val flac = "fLaC".getBytes("US-ASCII") ++
      Array(0x84.toByte, ((cm.length >> 16) & 0xff).toByte,
        ((cm.length >> 8) & 0xff).toByte, (cm.length & 0xff).toByte) ++ cm
    assert(AudioProbe.tags(flac).get ==
      Seq("DATE" -> "2023", "TITLE" -> "Flac Take"))
    assert(AudioProbe.tags("plain words".getBytes).isEmpty)
    assert(AudioProbe.tags(null).isEmpty)
  }

  test("tags: Ogg-FLAC metadata packets carry the comment block; " +
    "an ID3-prefixed bare-AAC stream keeps its ID3 tags") {
    // Ogg-FLAC mapping: BOS packet 0x7F 'FLAC' maj min nheaders +
    // fLaC + STREAMINFO; later packets are FLAC metadata blocks
    val bos0 = Array(0x7F.toByte) ++ "FLAC".getBytes("US-ASCII") ++
      Array[Byte](1, 0, 0, 1) ++ "fLaC".getBytes("US-ASCII") ++
      Array[Byte](0x80.toByte, 0, 0, 34) ++ new Array[Byte](34)
    val cm = comments(Seq("TITLE=Ogg Flac Cut"))
    val metaPkt = Array(0x84.toByte, ((cm.length >> 16) & 0xff).toByte,
      ((cm.length >> 8) & 0xff).toByte, (cm.length & 0xff).toByte) ++ cm
    val ogg = page(0x02, 0x90L, 0, 0, bos0) ++
      page(0x00, 0x90L, 1, 0, metaPkt)
    assert(AudioProbe.tags(ogg).get == Seq("TITLE" -> "Ogg Flac Cut"))
    // ID3v2 ahead of ADTS frames: tags() reads the ID3, adtsInfo
    // resyncs past it (the bare-.aac podcast shape)
    def syncsafe(v: Int) = Array(((v >> 21) & 0x7f).toByte,
      ((v >> 14) & 0x7f).toByte, ((v >> 7) & 0x7f).toByte,
      (v & 0x7f).toByte)
    val body = 0.toByte +: "Cast Title".getBytes("ISO-8859-1")
    val frame = "TIT2".getBytes("ISO-8859-1") ++
      Array((body.length >> 24).toByte, (body.length >> 16).toByte,
        (body.length >> 8).toByte, body.length.toByte) ++
      Array[Byte](0, 0) ++ body
    val id3 = "ID3".getBytes ++ Array[Byte](3, 0, 0) ++
      syncsafe(frame.length) ++ frame
    val adts = {
      val out = new scala.collection.mutable.ArrayBuffer[Byte]()
      for (_ <- 0 until 3) {
        val fl = 7 + 16
        out += 0xFF.toByte; out += 0xF1.toByte
        out += ((1 << 6) | (4 << 2)).toByte
        out += ((fl >> 11) & 0x3).toByte
        out += ((fl >> 3) & 0xff).toByte
        out += (((fl & 0x7) << 5) | 0x1f).toByte
        out += 0xfc.toByte
        (0 until 16).foreach(i => out += i.toByte)
      }
      out.toArray
    }
    val tagged = id3 ++ adts
    assert(AudioProbe.tags(tagged).get == Seq("TITLE" -> "Cast Title"))
    assert(AudioProbe.adtsInfo(tagged).exists(_.nSamples == 3 * 1024L))
    assert(AudioProbe.meta(tagged).exists(_.codec == "aac-adts"))
  }

  test("tags: hostile comment structures refuse without throwing") {
    // lying vendor length
    val bad = Array(3.toByte) ++ "vorbis".getBytes("US-ASCII") ++
      le32(0x7FFFFFFFL) ++ "x".getBytes
    val ogg = page(0x02, 0x80L, 0, 0, vorbisId(2, 44100)) ++
      page(0x00, 0x80L, 1, 0, bad)
    assert(AudioProbe.tags(ogg).isEmpty)
    // huge comment count refuses
    val badCount = Array(3.toByte) ++ "vorbis".getBytes("US-ASCII") ++
      le32(1) ++ "v".getBytes ++ le32(100000L)
    val ogg2 = page(0x02, 0x81L, 0, 0, vorbisId(2, 44100)) ++
      page(0x00, 0x81L, 1, 0, badCount)
    assert(AudioProbe.tags(ogg2).isEmpty)
    // every prefix of a tagged stream parses without throwing
    val good = page(0x02, 0x82L, 0, 0, vorbisId(2, 44100)) ++
      page(0x00, 0x82L, 1, 0, Array(3.toByte) ++
        "vorbis".getBytes("US-ASCII") ++ comments(Seq("TITLE=T")))
    for (cut <- 0 to good.length)
      AudioProbe.tags(java.util.Arrays.copyOfRange(good, 0, cut))
  }
}
