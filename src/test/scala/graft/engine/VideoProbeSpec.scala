package graft.engine

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.validate.VideoProbe

/** VideoProbe vs spec-authored container bytes: fixtures are built
  * box-by-box (ISO/IEC 14496-12) and chunk-by-chunk (AVI RIFF) by this
  * spec's own writers, independent of the walker under test. Plus
  * hostile-byte fuzzing, same stance as AudioProbeSpec: a header probe
  * that can throw or hang on a truncated crawl download is an executor
  * killer, so every prefix of a real file must parse or fail cleanly.
  */
class VideoProbeSpec extends AnyFunSuite {

  // ---- independent builders ----------------------------------------

  private def be32(v: Long): Array[Byte] = Array(
    ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
    ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def le32(v: Long): Array[Byte] = Array(
    (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
    ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  private def box(typ: String, payload: Array[Byte]): Array[Byte] =
    be32(8L + payload.length) ++ typ.getBytes("US-ASCII") ++ payload

  private def mvhd0(timescale: Int, duration: Long): Array[Byte] =
    box("mvhd", Array.fill[Byte](12)(0) ++ be32(timescale.toLong) ++
      be32(duration) ++ Array.fill[Byte](80)(0))

  private def tkhd0(w: Int, h: Int): Array[Byte] =
    box("tkhd", Array[Byte](0, 0, 0, 7) ++ Array.fill[Byte](72)(0) ++
      be32(w.toLong << 16) ++ be32(h.toLong << 16))

  private def hdlr(handler: String): Array[Byte] =
    box("hdlr", Array.fill[Byte](8)(0) ++ handler.getBytes("US-ASCII") ++
      Array.fill[Byte](13)(0))

  private def stbl(codec: String, frames: Seq[Int]): Array[Byte] = {
    val stsd = box("stsd", Array.fill[Byte](4)(0) ++ be32(1L) ++
      be32(16L) ++ codec.getBytes("US-ASCII") ++ Array.fill[Byte](8)(0))
    val stts = box("stts", Array.fill[Byte](4)(0) ++
      be32(frames.length.toLong) ++
      frames.flatMap(n => be32(n.toLong) ++ be32(512L)).toArray)
    box("stbl", stsd ++ stts)
  }

  private def trak(handler: String, w: Int, h: Int, codec: String,
                   frames: Seq[Int]): Array[Byte] =
    box("trak", tkhd0(w, h) ++
      box("mdia", hdlr(handler) ++ box("minf", stbl(codec, frames))))

  private def ftyp: Array[Byte] =
    box("ftyp", "isom".getBytes("US-ASCII") ++ be32(512L))

  private def mp4(traks: Array[Byte]*): Array[Byte] =
    ftyp ++ box("moov", mvhd0(1000, 5000L) ++ traks.flatten.toArray) ++
      box("mdat", Array.fill[Byte](24)(0x11))

  private def riffChunk(id: String, payload: Array[Byte]): Array[Byte] = {
    val padded = if (payload.length % 2 == 1) payload :+ 0.toByte else payload
    id.getBytes("US-ASCII") ++ le32(payload.length.toLong) ++ padded
  }

  private def riffList(t: String, kids: Array[Byte]): Array[Byte] =
    riffChunk("LIST", t.getBytes("US-ASCII") ++ kids)

  private def avi(w: Int, h: Int, usPerFrame: Int, frames: Int,
                  codec: String): Array[Byte] = {
    val avih = riffChunk("avih", le32(usPerFrame.toLong) ++ le32(0L) ++
      le32(0L) ++ le32(0x10L) ++ le32(frames.toLong) ++ le32(0L) ++
      le32(1L) ++ le32(0L) ++ le32(w.toLong) ++ le32(h.toLong) ++
      Array.fill[Byte](16)(0))
    val strh = riffChunk("strh", "vids".getBytes("US-ASCII") ++
      codec.getBytes("US-ASCII") ++ Array.fill[Byte](48)(0))
    val body = "AVI ".getBytes("US-ASCII") ++
      riffList("hdrl", avih ++ riffList("strl", strh)) ++
      riffList("movi", riffChunk("00dc", Array.fill[Byte](8)(0x22)))
    "RIFF".getBytes("US-ASCII") ++ le32(body.length.toLong) ++ body
  }

  // ---- happy paths --------------------------------------------------

  test("mp4: dims, duration, track count, frame count, codec") {
    val m = VideoProbe.meta(mp4(trak("vide", 1920, 1080, "avc1", Seq(120, 30))))
      .getOrElse(fail("no parse"))
    assert(m.container == "mp4")
    assert(m.width == 1920 && m.height == 1080)
    assert(m.durationMs == 5000L)
    assert(m.nTracks == 1)
    assert(m.nFrames == 150L)
    assert(m.codec == "avc1")
  }

  test("mp4: dims come from the vide track even when a soun track precedes it") {
    val m = VideoProbe.meta(mp4(
      trak("soun", 0, 0, "mp4a", Seq(99)),
      trak("vide", 640, 360, "hev1", Seq(48)))).getOrElse(fail("no parse"))
    assert(m.width == 640 && m.height == 360)
    assert(m.nTracks == 2)
    assert(m.nFrames == 48L)
    assert(m.codec == "hev1")
  }

  test("mp4: version-1 (64-bit) movie and track headers") {
    val mvhd1 = box("mvhd", Array[Byte](1, 0, 0, 0) ++
      Array.fill[Byte](16)(0) ++ be32(90000L) ++ be32(0L) ++ be32(450000L) ++
      Array.fill[Byte](80)(0))
    val tkhd1 = box("tkhd", Array[Byte](1, 0, 0, 7) ++
      Array.fill[Byte](84)(0) ++ be32(1280L << 16) ++ be32(720L << 16))
    val t = box("trak", tkhd1 ++
      box("mdia", hdlr("vide") ++ box("minf", stbl("av01", Seq(25)))))
    val bytes = ftyp ++ box("moov", mvhd1 ++ t)
    val m = VideoProbe.meta(bytes).getOrElse(fail("no parse"))
    assert(m.durationMs == 5000L) // 450000 / 90000 ticks
    assert(m.width == 1280 && m.height == 720)
    assert(m.codec == "av01")
  }

  test("mp4: a size==1 largesize box before moov is walked over") {
    val big = be32(1L) ++ "free".getBytes("US-ASCII") ++
      be32(0L) ++ be32(24L) ++ Array.fill[Byte](8)(0x5a) // largesize 24
    val bytes = ftyp ++ big ++
      box("moov", mvhd0(1000, 2000L) ++ trak("vide", 64, 48, "avc1", Seq(4)))
    val m = VideoProbe.meta(bytes).getOrElse(fail("no parse"))
    assert(m.width == 64 && m.durationMs == 2000L)
  }

  test("mp4: a size==0 final box extends to EOF without overrun") {
    val openEnded = be32(0L) ++ "mdat".getBytes("US-ASCII") ++
      Array.fill[Byte](100)(0x3c)
    val bytes = ftyp ++
      box("moov", mvhd0(1000, 750L) ++ trak("vide", 32, 32, "avc1", Seq(2))) ++
      openEnded
    assert(VideoProbe.meta(bytes).get.durationMs == 750L)
  }

  test("avi: dims, duration, frames, codec from avih/strh") {
    val m = VideoProbe.meta(avi(720, 576, 33333, 90, "MJPG"))
      .getOrElse(fail("no parse"))
    assert(m.container == "avi")
    assert(m.width == 720 && m.height == 576)
    assert(m.durationMs == 90L * 33333L / 1000L)
    assert(m.nFrames == 90L)
    assert(m.codec == "MJPG")
  }

  // ---- failure classes ---------------------------------------------

  test("diagnose covers the stable failure classes") {
    assert(VideoProbe.diagnose(null) == "file is empty")
    assert(VideoProbe.diagnose(Array.emptyByteArray) == "file is empty")
    assert(VideoProbe.diagnose("plain text".getBytes("UTF-8")) ==
      "not a recognized video container")
    assert(VideoProbe.diagnose(ftyp) == "mp4 movie header missing or truncated")
    assert(VideoProbe.diagnose("RIFF".getBytes("US-ASCII") ++ le32(4L) ++
      "AVI ".getBytes("US-ASCII")) == "avi header missing or truncated")
    assert(VideoProbe.diagnose(avi(10, 10, 1000, 1, "mjpg")) == "ok")
    assert(VideoProbe.diagnose(mp4(trak("vide", 8, 8, "avc1", Seq(1)))) == "ok")
  }

  test("zero movie timescale is a parse failure, not a divide-by-zero") {
    val bytes = ftyp ++
      box("moov", mvhd0(0, 1000L) ++ trak("vide", 8, 8, "avc1", Seq(1)))
    assert(VideoProbe.meta(bytes).isEmpty)
  }

  // ---- hostile bytes ------------------------------------------------

  test("every prefix of both containers parses or fails cleanly") {
    val files = Seq(
      mp4(trak("vide", 320, 200, "avc1", Seq(77))),
      avi(320, 200, 40000, 77, "XVID"))
    for (f <- files; n <- 0 to f.length) {
      val got = VideoProbe.meta(f.take(n)) // must never throw
      val diag = VideoProbe.diagnose(f.take(n))
      if (n == f.length) {
        assert(got.isDefined && diag == "ok")
      } else assert(diag.nonEmpty)
    }
  }

  test("lying box sizes end the walk instead of wrapping or looping") {
    // u32 size near 0xFFFFFFFF on the first box
    val huge = be32(0xfffffff0L) ++ "ftyp".getBytes("US-ASCII") ++
      Array.fill[Byte](16)(0)
    assert(VideoProbe.meta(huge).isEmpty)
    // size smaller than its own header (1..7) inside moov
    val tiny = ftyp ++ box("moov",
      be32(3L) ++ "mvhd".getBytes("US-ASCII") ++ Array.fill[Byte](16)(0))
    assert(VideoProbe.meta(tiny).isEmpty)
  }

  test("pathological LIST-in-LIST nesting stays stack-safe") {
    var kids = riffChunk("xxxx", Array.fill[Byte](2)(0))
    for (_ <- 1 to 2000) kids = riffList("nest", kids)
    val body = "AVI ".getBytes("US-ASCII") ++ kids
    val bytes = "RIFF".getBytes("US-ASCII") ++ le32(body.length.toLong) ++ body
    assert(VideoProbe.meta(bytes).isEmpty) // no avih anywhere — and no overflow
  }

  test("random junk never parses and never throws") {
    val rnd = new scala.util.Random(20260814L)
    for (_ <- 1 to 300) {
      val b = new Array[Byte](rnd.nextInt(512))
      rnd.nextBytes(b)
      VideoProbe.meta(b) // must not throw
      assert(VideoProbe.diagnose(b).nonEmpty)
    }
  }

  // ---- EBML / Matroska / WebM builders (RFC 8794, independent of
  // ---- the walker under test) --------------------------------------

  private def idBytes(id: Long): Array[Byte] = {
    val n = (64 - java.lang.Long.numberOfLeadingZeros(id) + 7) / 8
    (0 until n).map(i => ((id >> (8 * (n - 1 - i))) & 0xff).toByte).toArray
  }

  private def sizeBytes(v: Long): Array[Byte] = {
    var w = 1
    while (v >= (1L << (7 * w)) - 1) w += 1
    val marked = v | (1L << (7 * w))
    (0 until w).map(i => ((marked >> (8 * (w - 1 - i))) & 0xff).toByte).toArray
  }

  private def el(id: Long, payload: Array[Byte]): Array[Byte] =
    idBytes(id) ++ sizeBytes(payload.length.toLong) ++ payload

  private def uintBytes(v: Long): Array[Byte] = {
    val n = math.max(1, (64 - java.lang.Long.numberOfLeadingZeros(v) + 7) / 8)
    (0 until n).map(i => ((v >> (8 * (n - 1 - i))) & 0xff).toByte).toArray
  }

  private def f32(v: Float): Array[Byte] =
    be32(java.lang.Float.floatToIntBits(v).toLong & 0xffffffffL)

  private def ebmlHead(docType: String): Array[Byte] =
    el(0x1A45DFA3L, el(0x4282L, docType.getBytes("UTF-8")))

  private def videoTrack(codec: String, w: Int, h: Int): Array[Byte] =
    el(0xAEL, el(0x83L, uintBytes(1L)) ++
      el(0x86L, codec.getBytes("UTF-8")) ++
      el(0xE0L, el(0xB0L, uintBytes(w.toLong)) ++
        el(0xBAL, uintBytes(h.toLong))))

  private def audioTrack(codec: String): Array[Byte] =
    el(0xAEL, el(0x83L, uintBytes(2L)) ++ el(0x86L, codec.getBytes("UTF-8")))

  private def webm(tsScale: Option[Long], durationUnits: Float,
                   tracks: Array[Byte]): Array[Byte] = {
    val info = el(0x1549A966L,
      tsScale.map(s => el(0x2AD7B1L, uintBytes(s)))
        .getOrElse(Array.emptyByteArray) ++ el(0x4489L, f32(durationUnits)))
    ebmlHead("webm") ++
      el(0x18538067L, info ++ el(0x1654AE6BL, tracks))
  }

  test("webm: docType, dims, duration, track count, codec from EBML walk") {
    val b = webm(None, 2500f,
      videoTrack("V_VP9", 640, 360) ++ audioTrack("A_OPUS"))
    val m = VideoProbe.meta(b).get
    assert(m.container == "webm")
    assert(m.width == 640 && m.height == 360)
    assert(m.durationMs == 2500L) // default 1e6 ns scale: units ARE ms
    assert(m.nTracks == 2)
    assert(m.nFrames == 0L) // matroska headers carry no frame count
    assert(m.codec == "V_VP9")
  }

  test("mkv: explicit TimestampScale rescales the 8-byte float duration") {
    // 4000 units × 500000 ns = 2 s
    val info = el(0x1549A966L, el(0x2AD7B1L, uintBytes(500000L)) ++
      el(0x4489L, java.nio.ByteBuffer.allocate(8).putDouble(4000.0).array()))
    val b = ebmlHead("matroska") ++ el(0x18538067L,
      info ++ el(0x1654AE6BL, videoTrack("V_MPEG4/ISO/AVC", 1920, 1080)))
    val m = VideoProbe.meta(b).get
    assert(m.container == "mkv")
    assert(m.durationMs == 2000L)
    assert(m.width == 1920 && m.height == 1080)
    assert(m.codec == "V_MPEG4/ISO/AVC")
  }

  test("mkv: unknown-size Segment (live stream) parses to EOF") {
    val info = el(0x1549A966L, el(0x4489L, f32(1000f)))
    val seg = idBytes(0x18538067L) ++ Array(0xff.toByte) ++ // size: unknown
      info ++ el(0x1654AE6BL, videoTrack("V_AV1", 320, 240))
    val m = VideoProbe.meta(ebmlHead("webm") ++ seg).get
    assert(m.width == 320 && m.durationMs == 1000L && m.codec == "V_AV1")
  }

  test("mkv: audio-only file keeps -1 dims and empty codec") {
    val b = webm(None, 900f, audioTrack("A_VORBIS"))
    val m = VideoProbe.meta(b).get
    assert(m.nTracks == 1 && m.width == -1 && m.height == -1)
    assert(m.codec == "")
  }

  test("mkv: missing Segment or Info is a clean failure with diagnosis") {
    val noSeg = ebmlHead("webm")
    assert(VideoProbe.meta(noSeg).isEmpty)
    assert(VideoProbe.diagnose(noSeg) == "ebml segment info missing or truncated")
    val noInfo = ebmlHead("matroska") ++
      el(0x18538067L, el(0x1654AE6BL, videoTrack("V_VP8", 64, 64)))
    assert(VideoProbe.meta(noInfo).isEmpty)
  }

  test("mkv: zero TimestampScale is degenerate, not a divide-by-zero") {
    val info = el(0x1549A966L, el(0x2AD7B1L, Array(0.toByte)) ++
      el(0x4489L, f32(100f)))
    val b = ebmlHead("webm") ++ el(0x18538067L, info)
    assert(VideoProbe.meta(b).isEmpty)
  }

  test("mkv: every prefix parses or fails cleanly") {
    val full = webm(Some(1000000L), 2500f,
      videoTrack("V_VP9", 640, 360) ++ audioTrack("A_OPUS"))
    for (n <- 0 to full.length) {
      val m = VideoProbe.meta(full.take(n)) // must not throw
      assert(VideoProbe.diagnose(full.take(n)).nonEmpty)
      if (n == full.length) assert(m.isDefined)
    }
  }

  test("mkv: lying element sizes and zero-advance elements end the walk") {
    // declared size far past EOF
    val lying = ebmlHead("webm") ++ idBytes(0x18538067L) ++
      sizeBytes(1000000L) ++ Array.fill[Byte](8)(0x41)
    VideoProbe.meta(lying) // must not throw or loop
    // 0x00 lead byte (vint width > 8) aborts
    val zeroLead = ebmlHead("webm") ++ Array.fill[Byte](16)(0)
    assert(VideoProbe.meta(zeroLead).isEmpty)
  }
}
