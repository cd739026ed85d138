package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.multimodal.VideoFrameHash

/** Round-12 media gates (the [[MultimodalQueries]] continuation,
  * split out per the 2,000-line module guidance): bring-your-own-
  * frames video dedup, the subtitles→curation composed pipeline,
  * Ogg-FLAC fingerprint identity, and the MP3 stream inventory.
  * Same fixture discipline as the m6/m7-adjudicated pattern — every
  * expected value is hand-derived (or computed by INDEPENDENT
  * builder code) in the fixture writer and stored beside the input,
  * never read back from the implementation under test.
  */
object MediaGateQueries {

  // -- m25/m27 fixture: the m17 JPEG frame family, fed as EXTERNALLY
  //    extracted frames. Expectations derive from frame BYTE identity
  //    alone (byte-identical JPEGs decode to identical pixels →
  //    identical dHashes on both extraction paths); JPEG codec
  //    numerics never enter any expected value.
  private def framesA: Seq[Array[Byte]] =
    (0 until 8).map(i => MultimodalQueries.jpegFrame(29 + 2 * i))
  private def framesB: Seq[Array[Byte]] =
    (0 until 8).map(i => MultimodalQueries.jpegFrame(101 + 5 * i))

  // -- m26 fixture: subtitle payloads whose transcripts are DESIGNED
  //    to exercise one curation stage each. Hand-derived verdicts
  //    (marker sets and the quality formula are public engine
  //    contracts, replayed by eye in the comments):
  //    1 SRT  "the stars burn far away and the night sky turns
  //            slowly above" — en (3 marker hits), clean → SURVIVES;
  //    2 VTT  transcript IDENTICAL to the seen-index document →
  //            minhash jaccard 1 ≥ 0.8 → near-dup DROP;
  //    3 SRT  "buenas noches amigos hasta manana siempre dijo nadie"
  //            — zero marker hits in all four sets → unknown → DROP;
  //    4 SRT  "the 1234567890 9876543210 1234567890 to 55555" —
  //            digit_ratio 35/45, score 1.2 − 0.7778 < 0.8 → DROP;
  //    5 VTT  the probe text verbatim → contamination 1.0 > 0.2 →
  //            decontamination DROP;
  //    6 VTT  "a quiet morning of rain falls on the old roof of the
  //            house" — en (5 hits), clean → SURVIVES;
  //    7      prose without cues → no transcript row at all.
  //    Survivors: single source 'subs' (mixReweight threshold =
  //    buckets keeps all), n_tok 12 and 13 (whitespace tokens),
  //    pack_id 0 (12 + 13 < capacity 512); content_sha = sha-256 of
  //    the transcript, which DuckDB recomputes from the same literal.
  private val m26Dir = "/tmp/graft_gate_m26_subs"

  private[queries] val m26SeenText =
    "the ship sails to the harbor and the crew waves to the shore"
  private[queries] val m26ProbeText =
    "copy the exam answer key tonight and share it with everyone quickly"
  private[queries] val m26SurvivorA =
    "the stars burn far away and the night sky turns slowly above"
  private[queries] val m26SurvivorF =
    "a quiet morning of rain falls on the old roof of the house"

  private def writeM26Fixture(s: SparkSession): Unit = {
    import s.implicits._
    def srt(cues: Seq[(String, String, String)]): String =
      cues.zipWithIndex.flatMap { case ((from, to, text), i) =>
        Seq((i + 1).toString, s"$from --> $to", text, "")
      }.mkString("\n")
    def vtt(cues: Seq[(String, String, String)]): String =
      ("WEBVTT" +: "" +: cues.flatMap { case (from, to, text) =>
        Seq(s"$from --> $to", text, "")
      }).mkString("\n")
    val docs = Seq(
      (1L, srt(Seq(
        ("00:00:01,000", "00:00:03,000", "the <i>stars</i> burn far away"),
        ("00:00:04,000", "00:00:06,500",
          "and the night sky turns slowly above")))),
      (2L, vtt(Seq(
        ("00:10.000", "00:12.000", "the ship sails to the harbor"),
        ("00:13.000", "00:15.000", "and the crew waves to the shore")))),
      (3L, srt(Seq(
        ("00:00:02,000", "00:00:04,000",
          "buenas noches amigos hasta manana siempre dijo nadie")))),
      (4L, srt(Seq(
        ("00:00:01,000", "00:00:02,000", "the 1234567890 9876543210"),
        ("00:00:03,000", "00:00:04,000", "1234567890 to 55555")))),
      (5L, vtt(Seq(
        ("00:01.000", "00:03.000", "copy the exam answer key tonight"),
        ("00:04.000", "00:06.000", "and share it with everyone quickly")))),
      (6L, vtt(Seq(
        ("00:02.000", "00:04.000", "a quiet morning of rain"),
        ("00:05.000", "00:07.000", "falls on the old roof"),
        ("00:08.000", "00:09.000", "of the house")))),
      (7L, "plain prose, no cues anywhere"))
    docs.toDF("doc_id", "content")
      .coalesce(1).write.mode("overwrite").parquet(m26Dir + "_in")
  }

  // -- m28 fixture: Ogg-FLAC wrap of the m15 recording, pages written
  //    by INDEPENDENT builder code (RFC 3533 framing, one FLAC frame
  //    per packet per the mapping). The expected hash is the m15
  //    level-table value — container changes must not move a single
  //    bit. A page-CRC-corrupted copy must hash NULL (-999).
  private val m28Dir = "/tmp/graft_gate_m28_ogg"

  private def oggCrc(b: Array[Byte]): Long = {
    var crc = 0L
    for (x <- b) {
      crc ^= (x & 0xffL) << 24
      var k = 0
      while (k < 8) {
        crc = if ((crc & 0x80000000L) != 0)
          ((crc << 1) ^ 0x04C11DB7L) & 0xffffffffL
        else (crc << 1) & 0xffffffffL
        k += 1
      }
    }
    crc
  }

  private def oggPage(htype: Int, serial: Long, seq: Int,
                      packet: Array[Byte],
                      granule: Long = 0L): Array[Byte] = {
    val laces = Seq.fill(packet.length / 255)(255) :+ (packet.length % 255)
    val out = new java.io.ByteArrayOutputStream()
    out.write("OggS".getBytes("US-ASCII"))
    out.write(0); out.write(htype)
    (0 until 8).foreach(i => out.write(((granule >> (8 * i)) & 0xff).toInt))
    (0 until 4).foreach(i => out.write(((serial >> (8 * i)) & 0xff).toInt))
    (0 until 4).foreach(i => out.write(((seq >> (8 * i)) & 0xff).toInt))
    (0 until 4).foreach(_ => out.write(0))
    out.write(laces.length)
    laces.foreach(out.write)
    out.write(packet)
    val page = out.toByteArray
    val crc = oggCrc(page)
    (0 until 4).foreach(i => page(22 + i) = ((crc >> (8 * i)) & 0xff).toByte)
    page
  }

  private def oggFlacBytes(x: Array[Double], rate: Int): Array[Byte] = {
    val (meta, frames) = MultimodalQueries.flacVerbatimParts(x, rate)
    val bos = Array(0x7f.toByte, 'F'.toByte, 'L'.toByte, 'A'.toByte,
      'C'.toByte, 1.toByte, 0.toByte, 0.toByte, 0.toByte) ++
      "fLaC".getBytes("US-ASCII") ++ meta
    val out = new java.io.ByteArrayOutputStream()
    out.write(oggPage(0x02, 0x6772L, 0, bos))
    frames.zipWithIndex.foreach { case (f, i) =>
      val htype = if (i == frames.length - 1) 0x04 else 0x00
      out.write(oggPage(htype, 0x6772L, i + 1, f))
    }
    out.toByteArray
  }

  // -- m77 fixture: Ogg Vorbis/Opus inventory — ID headers + tail
  //    granules through the independent page writer; decode stays a
  //    recorded skip (the HEIF posture), ogg-FLAC keeps its own full
  //    path. --------------------------------------------------------
  private val m77Dir = "/tmp/graft_gate_m77_ogg"

  private def writeM77Fixture(s: SparkSession): Unit = {
    import s.implicits._
    def le16(v: Int) = Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
    def le32(v: Long) = Array((v & 0xFF).toByte,
      ((v >> 8) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
      ((v >> 24) & 0xFF).toByte)
    val vorbisId = Array(1.toByte) ++ "vorbis".getBytes("US-ASCII") ++
      le32(0) ++ Array(2.toByte) ++ le32(44100) ++
      le32(0) ++ le32(128000) ++ le32(0) ++
      Array(0xB8.toByte, 1.toByte)
    val opusId = "OpusHead".getBytes("US-ASCII") ++
      Array(1.toByte, 1.toByte) ++ le16(312) ++ le32(48000) ++
      le16(0) ++ Array(0.toByte)
    def stream(id: Array[Byte], serial: Long,
               lastGranule: Long): Array[Byte] =
      oggPage(0x02, serial, 0, id) ++
        oggPage(0x00, serial, 1, Array.fill[Byte](40)(7),
          granule = lastGranule / 2) ++
        oggPage(0x04, serial, 2, Array.fill[Byte](40)(8),
          granule = lastGranule)
    val vorbis = stream(vorbisId, 0x1111L, 88200L)
    val opus = stream(opusId, 0x2222L, 48312L)
    val tornTail = vorbis.clone()
    tornTail(tornTail.length - 3) =
      (tornTail(tornTail.length - 3) ^ 1).toByte
    val rows: Seq[(Long, Array[Byte], String, Int, Int, Long)] = Seq(
      (0L, vorbis, "vorbis", 2, 44100, 88200L),
      (1L, opus, "opus", 1, 48000, 48000L),
      // tail CRC corrupt: the last VALID page's granule wins
      (2L, tornTail, "vorbis", 2, 44100, 44100L),
      (3L, "OggS but junk".getBytes("UTF-8"), "none", -1, -1, -1L),
      (4L, Array[Byte](1, 2, 3), "none", -1, -1, -1L))
    s.createDataset(rows).toDF("audio_id", "payload", "exp_codec",
        "exp_channels", "exp_rate", "exp_samples")
      .coalesce(1).write.mode("overwrite").parquet(m77Dir)
  }

  // -- m87 fixture: unified audio TAGS — Vorbis comments (Ogg
  //    Vorbis/Opus comment packets, native-FLAC block 4) and ID3v2
  //    through ONE keyspace; payloads hand-authored per the published
  //    layouts (Vorbis I §5, RFC 7845 §5.2, ID3v2.3). ---------------
  private val m87Dir = "/tmp/graft_gate_m87_tags"

  private def writeM87Fixture(s: SparkSession): Unit = {
    import s.implicits._
    def le16(v: Int) = Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
    def le32(v: Long) = Array((v & 0xFF).toByte,
      ((v >> 8) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
      ((v >> 24) & 0xFF).toByte)
    def comments(pairs: Seq[String]): Array[Byte] = {
      val vendor = "graft fixture writer".getBytes("UTF-8")
      le32(vendor.length) ++ vendor ++ le32(pairs.length) ++
        pairs.flatMap { p =>
          val b = p.getBytes("UTF-8"); (le32(b.length) ++ b).toSeq
        }
    }
    val vorbisId = Array(1.toByte) ++ "vorbis".getBytes("US-ASCII") ++
      le32(0) ++ Array(2.toByte) ++ le32(44100) ++
      le32(0) ++ le32(128000) ++ le32(0) ++
      Array(0xB8.toByte, 1.toByte)
    val vorbisTags = Array(3.toByte) ++ "vorbis".getBytes("US-ASCII") ++
      comments(Seq("TITLE=Night Stream", "artist=Tag Writer"))
    val vorbisOgg = oggPage(0x02, 0x3333L, 0, vorbisId) ++
      oggPage(0x00, 0x3333L, 1, vorbisTags) ++
      oggPage(0x04, 0x3333L, 2, Array.fill[Byte](20)(5), granule = 44100L)
    val opusId = "OpusHead".getBytes("US-ASCII") ++
      Array(1.toByte, 1.toByte) ++ le16(312) ++ le32(48000) ++
      le16(0) ++ Array(0.toByte)
    val opusTags = "OpusTags".getBytes("US-ASCII") ++
      comments(Seq("TITLE=Podcast Nine", "ALBUM=Season One"))
    val opusOgg = oggPage(0x02, 0x4444L, 0, opusId) ++
      oggPage(0x00, 0x4444L, 1, opusTags) ++
      oggPage(0x04, 0x4444L, 2, Array.fill[Byte](20)(6), granule = 48000L)
    // native FLAC: STREAMINFO (not last) + VORBIS_COMMENT (last)
    val flacTagged = {
      val si = new Array[Byte](34)
      si(0) = 0x10; si(2) = 0x10
      si(10) = ((44100 >> 12) & 0xff).toByte
      si(11) = ((44100 >> 4) & 0xff).toByte
      si(12) = (((44100 & 0xf) << 4) | ((2 - 1) << 1)).toByte
      si(13) = (((16 - 1) & 0xf) << 4).toByte
      val cm = comments(Seq("TITLE=Lossless Cut", "DATE=2024"))
      "fLaC".getBytes("US-ASCII") ++
        Array(0x00.toByte, 0.toByte, 0.toByte, 34.toByte) ++ si ++
        Array(0x84.toByte, ((cm.length >> 16) & 0xff).toByte,
          ((cm.length >> 8) & 0xff).toByte, (cm.length & 0xff).toByte) ++
        cm
    }
    // ID3v2.3-tagged MP3 (the m58 builder arithmetic)
    def syncsafe(v: Int): Array[Byte] =
      Array(((v >> 21) & 0x7f).toByte, ((v >> 14) & 0x7f).toByte,
        ((v >> 7) & 0x7f).toByte, (v & 0x7f).toByte)
    def u32be(v: Int): Array[Byte] =
      Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    def frame(id: String, text: String): Array[Byte] = {
      val body = 0.toByte +: text.getBytes("ISO-8859-1")
      id.getBytes("ISO-8859-1") ++ u32be(body.length) ++
        Array[Byte](0, 0) ++ body
    }
    val frames = frame("TIT2", "Tape Deck") ++ frame("TPE1", "The Band")
    val mp3Tagged = "ID3".getBytes ++
      Array(3.toByte, 0.toByte, 0.toByte) ++
      syncsafe(frames.length) ++ frames ++
      (0 until 4).map(_ => mp3Frame(9, 0, mono = false)).reduce(_ ++ _)
    val rows: Seq[(Long, Array[Byte], String)] = Seq(
      (0L, vorbisOgg, "ARTIST=Tag Writer|TITLE=Night Stream"),
      (1L, opusOgg, "ALBUM=Season One|TITLE=Podcast Nine"),
      (2L, flacTagged, "DATE=2024|TITLE=Lossless Cut"),
      (3L, mp3Tagged, "ARTIST=The Band|TITLE=Tape Deck"),
      (4L, "no audio tags here at all".getBytes("UTF-8"), "<none>"))
    s.createDataset(rows).toDF("audio_id", "payload", "exp_tags")
      .coalesce(1).write.mode("overwrite").parquet(m87Dir)
    ()
  }

  // -- m81 fixture: M4A (audio-in-MP4, the podcast class) inventory —
  //    independent ISO-BMFF boxes via the HeifFixture writers; AAC/
  //    ALAC decode stays a recorded skip. --------------------------
  private val m81Dir = "/tmp/graft_gate_m81_m4a"

  private def writeM81Fixture(s: SparkSession): Unit = {
    import s.implicits._
    def be16(v: Int) = Array(((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
    def be32(v: Long) = Array(((v >> 24) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      (v & 0xFF).toByte)
    def m4a(codec: String, channels: Int, rate: Int,
            timescale: Int, duration: Long): Array[Byte] = {
      import HeifFixture.{box, ftyp, fullBox}
      val sampleEntry = box(codec,
        new Array[Byte](6), be16(1),
        new Array[Byte](8),
        be16(channels), be16(16), be16(0), be16(0),
        be32(rate.toLong << 16))
      val stsd = fullBox("stsd", 0, 0, be32(1), sampleEntry)
      val mdhd = fullBox("mdhd", 0, 0, be32(0), be32(0),
        be32(timescale.toLong), be32(duration), be16(0), be16(0))
      val hdlr = fullBox("hdlr", 0, 0, be32(0),
        "soun".getBytes("US-ASCII"), new Array[Byte](12), Array[Byte](0))
      val trak = box("trak", box("mdia", mdhd, hdlr,
        box("minf", box("stbl", stsd))))
      ftyp("M4A ", Seq("M4A ", "isom")) ++ box("moov", trak) ++
        box("mdat", Array[Byte](1, 2, 3))
    }
    val whole = m4a("mp4a", 2, 44100, 44100, 88200L)
    val rows: Seq[(Long, Array[Byte], String, Int, Int, Long)] = Seq(
      (0L, whole, "mp4a", 2, 44100, 88200L),
      (1L, m4a("alac", 1, 48000, 1000, 2000L), "alac", 1, 48000, 96000L),
      (2L, java.util.Arrays.copyOfRange(whole, 0, 40), "none", -1, -1, -1L),
      (3L, "neither box nor page".getBytes("UTF-8"), "none", -1, -1, -1L))
    s.createDataset(rows).toDF("audio_id", "payload", "exp_codec",
        "exp_channels", "exp_rate", "exp_samples")
      .coalesce(1).write.mode("overwrite").parquet(m81Dir)
  }

  private def writeM28Fixture(s: SparkSession): Unit = {
    import s.implicits._
    import MultimodalQueries.{m15Patterns, m15Samples, m15ExpectedHash, m15Sr}
    val good = oggFlacBytes(m15Samples(1.0, m15Patterns), m15Sr)
    val comp = m15Patterns.map(_.map(2 - _))
    val bad = good.clone()
    // flip one payload byte of the LAST page: its CRC no longer checks
    bad(bad.length - 3) = (bad(bad.length - 3) ^ 0x08).toByte
    val rows: Seq[(Long, Array[Byte], Long)] = Seq(
      (0L, good, m15ExpectedHash(m15Patterns)),
      (1L, oggFlacBytes(m15Samples(0.25, comp), m15Sr),
        m15ExpectedHash(comp)),
      (2L, bad, -999L))
    s.createDataset(rows).toDF("audio_id", "content", "exp_hash")
      .coalesce(1).write.mode("overwrite").parquet(m28Dir)
  }

  // -- m29 fixture: hand-built MPEG-1 Layer III streams (header
  //    arithmetic per ISO 11172-3; frameLen = 144·kbps·1000/rate).
  //    Expected values derive from the construction: frame counts,
  //    spf 1152, duration = samples·1000/rate, and the average
  //    bitrate recomputed here from the SAME definition
  //    (bytes·8/seconds) the probe documents. A Xing frame is
  //    metadata: excluded from audio counts, its declared fields
  //    surfaced.
  private val m29Dir = "/tmp/graft_gate_m29_mp3"

  private def mp3Frame(brIdx: Int, rateIdx: Int, mono: Boolean,
                       patches: Seq[(Int, Array[Byte])] = Nil): Array[Byte] = {
    val rates = Array(44100, 48000, 32000)
    val kbps = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192,
      224, 256, 320)
    val f = new Array[Byte](144 * kbps(brIdx) * 1000 / rates(rateIdx))
    f(0) = 0xff.toByte
    f(1) = 0xfb.toByte
    f(2) = ((brIdx << 4) | (rateIdx << 2)).toByte
    f(3) = (if (mono) 0xc0 else 0x00).toByte
    for ((off, b) <- patches) System.arraycopy(b, 0, f, off, b.length)
    f
  }

  private def u32be(v: Long): Array[Byte] = Array(
    ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
    ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def writeM29Fixture(s: SparkSession): Unit = {
    import s.implicits._
    // CBR: 10 stereo 128 kbps 44.1 kHz frames of 417 bytes
    val cbr = (0 until 10).map(_ => mp3Frame(9, 0, mono = false))
      .reduce(_ ++ _)
    val cbrAvg = 4170 * 8.0 / (11520.0 / 44100) / 1000.0
    // VBR with a Xing header frame (64 kbps mono → tag at 4+17=21)
    val xing = mp3Frame(5, 0, mono = true, patches = Seq(
      21 -> "Xing".getBytes("US-ASCII"), 25 -> u32be(0x3),
      29 -> u32be(7L), 33 -> u32be(12345L)))
    val vbrFrames = (0 until 7).map(i =>
      mp3Frame(if (i % 2 == 0) 7 else 9, 0, mono = true))
    val vbr = xing ++ vbrFrames.reduce(_ ++ _)
    val vbrBytes = vbrFrames.map(_.length).sum
    val vbrAvg = vbrBytes * 8.0 / (7 * 1152.0 / 44100) / 1000.0
    val rows: Seq[(Long, Array[Byte], Int, Int, Long, Long, Long,
        Boolean, Double, String, Long, Long)] = Seq(
      (0L, cbr, 2, 44100, 10L, 11520L, 11520L * 1000 / 44100,
        false, cbrAvg, "", -1L, -1L),
      (1L, vbr, 1, 44100, 7L, 7 * 1152L, 7 * 1152L * 1000 / 44100,
        true, vbrAvg, "xing", 7L, 12345L),
      (2L, "not an mpeg stream".getBytes, -1, -1, -1L, -1L, -1L,
        false, -1.0, "", -1L, -1L))
    rows.toDF("audio_id", "content", "exp_channels", "exp_rate",
        "exp_frames", "exp_samples", "exp_duration_ms", "exp_vbr",
        "exp_avg_kbps", "exp_vbr_header", "exp_decl_frames",
        "exp_decl_bytes")
      .coalesce(1).write.mode("overwrite").parquet(m29Dir)
  }

  // -- m58 fixture: ID3v2-tagged MP3s — the tag rides ahead of the
  //    same CBR frames m29 counts, so the DECLARED metadata (title/
  //    artist/album/date) and the SIGNAL inventory coexist on one
  //    payload; hand-authored tag bytes (syncsafe sizes, per-version
  //    frame headers — the Id3Spec writer's arithmetic).
  private val m58Dir = "/tmp/graft_gate_m58_id3"

  private def writeM58Fixture(s: SparkSession): Unit = {
    import s.implicits._
    def syncsafe(v: Int): Array[Byte] =
      Array(((v >> 21) & 0x7f).toByte, ((v >> 14) & 0x7f).toByte,
        ((v >> 7) & 0x7f).toByte, (v & 0x7f).toByte)
    def u32(v: Int): Array[Byte] =
      Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    def frame(major: Int, id: String, enc: Int, text: Array[Byte]): Array[Byte] = {
      val body = enc.toByte +: text
      id.getBytes("ISO-8859-1") ++
        (if (major == 4) syncsafe(body.length) else u32(body.length)) ++
        Array[Byte](0, 0) ++ body
    }
    def tagOf(major: Int, frames: Array[Byte]): Array[Byte] = {
      val pad = 8
      "ID3".getBytes ++ Array(major.toByte, 0.toByte, 0.toByte) ++
        syncsafe(frames.length + pad) ++ frames ++ new Array[Byte](pad)
    }
    val audio = (0 until 10).map(_ => mp3Frame(9, 0, mono = false))
      .reduce(_ ++ _)
    val rows: Seq[(Long, Array[Byte], String, String, String, String, Long)] = Seq(
      (0L, tagOf(3,
        frame(3, "TIT2", 0, "Night Drive".getBytes("ISO-8859-1")) ++
          frame(3, "TPE1", 1, "Μουσική".getBytes("UTF-16")) ++
          frame(3, "TALB", 0, "First Album".getBytes("ISO-8859-1")) ++
          frame(3, "TYER", 0, "1999".getBytes("ISO-8859-1"))) ++ audio,
        "Night Drive", "Μουσική", "First Album", "1999", 10L),
      (1L, tagOf(4,
        frame(4, "TIT2", 3, "καλημέρα τίτλος".getBytes("UTF-8")) ++
          frame(4, "TDRC", 3, "2024-06-01".getBytes("UTF-8"))) ++ audio,
        "καλημέρα τίτλος", "<none>", "<none>", "2024-06-01", 10L),
      // untagged audio: inventory works, tags NULL
      (2L, audio, "<none>", "<none>", "<none>", "<none>", 10L),
      (3L, "not audio at all".getBytes("UTF-8"),
        "<none>", "<none>", "<none>", "<none>", -1L))
    s.createDataset(rows).toDF("audio_id", "content", "exp_title",
        "exp_artist", "exp_album", "exp_date", "exp_frames")
      .coalesce(1).write.mode("overwrite").parquet(m58Dir)
  }

  // -- m30 fixture: constructed waveforms measured by INDEPENDENT
  //    arithmetic over the same 16-bit quantized integers the WAV
  //    carries (the m29 pattern): full-scale square (clip 1, peak =
  //    rms = 32767/32768), exact-bin sine at A = 0.5 (peak exactly
  //    0.5 — round(0.5·32767) = 16384), silence (dB floors), junk.
  private val m30Dir = "/tmp/graft_gate_m30_astats"

  private def writeM30Fixture(s: SparkSession): Unit = {
    import s.implicits._
    val sr = 8000
    def measure(x: Array[Double]): (Long, Long, Double, Double, Double, Double) = {
      val q = x.map(v => math.round(v * 32767).toDouble / 32768.0)
      val n = q.length
      val peak = q.map(math.abs).max
      val rms = math.sqrt(q.map(v => v * v).sum / n)
      def db(v: Double) =
        if (v <= 0) -120.0 else math.max(-120.0, 20.0 * math.log10(v))
      (n.toLong, n.toLong * 1000 / sr, db(peak), db(rms),
        q.count(v => math.abs(v) >= 127.0 / 128.0).toDouble / n,
        q.count(v => math.abs(v) < 0.001).toDouble / n)
    }
    val square = Array.tabulate(sr)(i => if (i % 2 == 0) 1.0 else -1.0)
    val sine = Array.tabulate(2048)(i =>
      0.5 * math.sin(2 * math.Pi * 4 * i / 1024.0))
    val silence = new Array[Double](4096)
    val rows = Seq((0L, square), (1L, sine), (2L, silence)).map {
      case (id, x) =>
        val (n, dur, pdb, rdb, clip, sil) = measure(x)
        (id, MultimodalQueries.wavBytes(x, sr, 16), n, dur, pdb, rdb,
          clip, sil)
    } :+ ((3L, "not audio".getBytes, -1L, -1L, -999.0, -999.0, -1.0, -1.0))
    rows.toDF("audio_id", "content", "exp_n", "exp_dur_ms", "exp_peak_db",
        "exp_rms_db", "exp_clip", "exp_silence")
      .coalesce(1).write.mode("overwrite").parquet(m30Dir)
  }

  // -- m31 fixture: constructed gray PNGs with CLOSED-FORM pixel
  //    statistics — flat fill (std 0, Laplacian var 0), 1-px vertical
  //    stripes (interior Laplacian ±510 in equal counts → var 510²),
  //    1-px checkerboard (±1020 → var 1020²). Values derived on paper
  //    in the gate doc; the oracle is a literal VALUES table.
  private val m31Dir = "/tmp/graft_gate_m31_istats"

  /** The one BufferedImage→PNG writer for gate fixtures (JDK ImageIO
    * — the independent third party in every PNG-twin expectation).
    */
  private def pngOf(w: Int, h: Int, argb: Array[Int]): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, w, h, argb, 0, w)
    val bos = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(img, "png", bos), "no png writer")
    bos.toByteArray
  }

  private def grayPng(w: Int, h: Int, v: (Int, Int) => Int): Array[Byte] =
    pngOf(w, h, Array.tabulate(w * h) { i =>
      val g = v(i % w, i / w) & 0xFF
      (g << 16) | (g << 8) | g
    })

  private def writeM31Fixture(s: SparkSession): Unit = {
    import s.implicits._
    val rows: Seq[(Long, Array[Byte])] = Seq(
      (0L, grayPng(16, 16, (_, _) => 77)),
      (1L, grayPng(16, 16, (x, _) => if (x % 2 == 0) 0 else 255)),
      (2L, grayPng(16, 16, (x, y) => if ((x + y) % 2 == 0) 0 else 255)),
      (3L, "broken image".getBytes))
    s.createDataset(rows).toDF("img_id", "content")
      .coalesce(1).write.mode("overwrite").parquet(m31Dir)
  }

  // -- m32 fixture: temporal video stats from frame BYTE identity
  //    alone (the m17 stance — JPEG numerics never enter an expected
  //    value): a static clip repeats ONE frame (all consecutive
  //    distances exactly 0), the montage alternates two distinct
  //    frames (distance ≥ 1 at every pair), thresholds cut=0/static=0
  //    so the verdicts follow from identity.
  private val m32Dir = "/tmp/graft_gate_m32_vstats"

  private def writeM32Fixture(s: SparkSession): Unit = {
    import s.implicits._
    val f = MultimodalQueries.jpegFrame(31)
    val g = MultimodalQueries.jpegFrame(113)
    def movi(frames: Seq[Array[Byte]]) = MultimodalQueries.riffList("movi",
      frames.flatMap(fr => MultimodalQueries.riffChunk("00dc", fr)).toArray)
    val rows: Seq[(Long, Array[Byte])] = Seq(
      (0L, MultimodalQueries.aviBytes(movi(Seq(f, f, f, f)))),
      (1L, MultimodalQueries.aviBytes(movi(Seq(f, g, f, g)))),
      (2L, "not a video".getBytes))
    s.createDataset(rows).toDF("video_id", "content")
      .coalesce(1).write.mode("overwrite").parquet(m32Dir)
  }

  // -- m33 fixture: WebP payloads from the INDEPENDENT spec-side
  //    writer (WebpFixture, the m28 discipline), pixel functions
  //    chosen so every expected value is closed-form:
  //      0 VP8L literal 9×8, gray v = 10·x — the 9×8 dHash grid is
  //        the identity at this size, each row strictly increases →
  //        all 64 bits set (dhash = -1); interior Laplacian of a
  //        linear ramp is exactly 0; mean 40, Σv² = 163200.
  //      1 the SAME pixels through JDK ImageIO's PNG writer — the
  //        third-party triangulation: both formats must agree bit
  //        for bit.
  //      2 gray v = 80 − 10·x via the SUBTRACT-GREEN transform —
  //        strictly decreasing rows → dhash 0; same mean/std, lap 0.
  //      3 4-color palette (grays 0/60/120/180, v = 60·(x mod 4))
  //        via COLOR-INDEXING with 2-bit pixel bundling; dhash bits
  //        11101110 per row; mean 80, Σv² = 806400; interior
  //        Laplacian row [0,0,240,-240,0,0,240] → ΣL = 1440,
  //        ΣL² = 1036800 over m = 42.
  //      4 row 0's pixels VP8X-WRAPPED (canvas = frame dims).
  //      5 lossy VP8 header: dims probe (640×480), pixels are the
  //        documented skip → dhash sentinel.
  //      6 corrupt VP8L (version bits ≠ 0): nothing probes or
  //        decodes.
  //      7 flat gray 77 at 16×16: dhash 0, stats (77, 0, 0).
  private val m33Dir = "/tmp/graft_gate_m33_webp"

  private def writeM33Fixture(s: SparkSession): Unit = {
    import s.implicits._
    def grays(w: Int, h: Int, v: Int => Int): Array[Int] =
      Array.tabulate(w * h) { i =>
        val g = v(i % w) & 0xff
        0xff000000 | (g << 16) | (g << 8) | g
      }
    // independent dHash arithmetic: 9-wide rows ARE the grid cells
    def dhashOfRows(v: Int => Int): Long = {
      var hash = 0L
      for (_ <- 0 until 8; j <- 0 until 8)
        hash = (hash << 1) | (if (v(j) < v(j + 1)) 1L else 0L)
      hash
    }
    val ramp = grays(9, 8, x => 10 * x)
    val rampPng = pngOf(9, 8, ramp)
    val rampStd = math.sqrt(163200.0 / 72 - 40.0 * 40.0)
    val palette = Array(0xff000000, 0xff3c3c3c, 0xff787878, 0xffb4b4b4)
    val palIdx = Array.tabulate(9 * 8)(i => (i % 9) % 4)
    val palStd = math.sqrt(806400.0 / 72 - 80.0 * 80.0)
    val palLap = 1036800.0 / 42 - (1440.0 / 42) * (1440.0 / 42)
    val corrupt = {
      val p = WebpFixture.vp8lPayload(9, 8, ramp)
      p(4) = (p(4) | 0xe0).toByte // version bits
      WebpFixture.container(WebpFixture.chunk("VP8L", p))
    }
    val rows: Seq[(Long, Array[Byte], String, Int, Int, Long,
        Double, Double, Double)] = Seq(
      (0L, WebpFixture.losslessWebp(9, 8, ramp),
        "VP8L", 9, 8, dhashOfRows(x => 10 * x), 40.0, rampStd, 0.0),
      (1L, rampPng,
        "PNG", 9, 8, dhashOfRows(x => 10 * x), 40.0, rampStd, 0.0),
      (2L, WebpFixture.container(WebpFixture.chunk("VP8L",
          WebpFixture.vp8lSubtractGreenPayload(9, 8,
            grays(9, 8, x => 80 - 10 * x)))),
        "VP8L", 9, 8, dhashOfRows(x => 80 - 10 * x), 40.0, rampStd, 0.0),
      (3L, WebpFixture.container(WebpFixture.chunk("VP8L",
          WebpFixture.vp8lPalette(9, 8, palette, palIdx))),
        "VP8L", 9, 8, dhashOfRows(x => 60 * (x % 4)), 80.0, palStd, palLap),
      (4L, WebpFixture.vp8xLossless(9, 8, ramp),
        "VP8X", 9, 8, dhashOfRows(x => 10 * x), 40.0, rampStd, 0.0),
      (5L, WebpFixture.lossyWebpHeader(640, 480),
        "VP8", 640, 480, -999L, -1.0, -1.0, -1.0),
      (6L, corrupt,
        "none", -1, -1, -999L, -1.0, -1.0, -1.0),
      (7L, WebpFixture.losslessWebp(16, 16, grays(16, 16, _ => 77)),
        "VP8L", 16, 16, 0L, 77.0, 0.0, 0.0),
      (8L, WebpFixture.container(WebpFixture.chunk("VP8L",
          WebpFixture.vp8lPredictor(9, 8, ramp, mode = 2))),
        // the PREDICTOR path must land on the same pixels as row 0
        "VP8L", 9, 8, dhashOfRows(x => 10 * x), 40.0, rampStd, 0.0),
      (9L, WebpFixture.container(WebpFixture.chunk("VP8L",
          WebpFixture.vp8lRowCopy(9, 8,
            Array.tabulate(9)(x => 0xff000000 | {
              val g = 60 * (x % 4); (g << 16) | (g << 8) | g
            })))),
        // LZ77 row copies reproduce the palette pattern exactly
        "VP8L", 9, 8, dhashOfRows(x => 60 * (x % 4)), 80.0, palStd, palLap))
    s.createDataset(rows).toDF("img_id", "content", "exp_format",
        "exp_w", "exp_h", "exp_dhash", "exp_mean", "exp_std", "exp_lap")
      .coalesce(1).write.mode("overwrite").parquet(m33Dir)
  }

  // -- m34 fixture: PDFs from the INDEPENDENT writer (PdfFixture),
  //    one per extractor feature; expected text/pages/version ride
  //    the fixture as literals. The encrypted and garbage rows carry
  //    the undecodable sentinel.
  private val m34Dir = "/tmp/graft_gate_m34_pdf"

  private def writeM34Fixture(s: SparkSession): Unit = {
    import s.implicits._
    val rows: Seq[(Long, Array[Byte], Int, String, String, Boolean)] = Seq(
      (0L, PdfFixture.simplePdf(Seq("BT /F1 12 Tf (Hello crawl world.) Tj ET")),
        1, "Hello crawl world.", "1.5", false),
      (1L, PdfFixture.simplePdf(Seq(
        "BT /F1 12 Tf (page one) Tj ET",
        "BT /F1 12 Tf (page two) Tj ET"), compress = true),
        2, "page one\fpage two", "1.5", false),
      (2L, PdfFixture.simplePdf(Seq(
        "BT /F1 12 Tf [(Hel) -20 (lo) -250 (world)] TJ ET")),
        1, "Hello world", "1.5", false),
      (3L, PdfFixture.simplePdf(Seq(
        "BT /F1 12 Tf (caf\\351 r\\351sum\\351) Tj ET")),
        1, "café résumé", "1.5", false),
      (4L, PdfFixture.type0Pdf(
        bfchars = Seq(1 -> "H", 2 -> "i", 3 -> "!"),
        codeSeq = Seq(1, 2, 3)),
        1, "Hi!", "1.5", false),
      (5L, PdfFixture.xrefStreamPdf("compressed xref works"),
        1, "compressed xref works", "1.5", false),
      (6L, PdfFixture.encryptedPdf("secret"),
        -1, "<undecodable>", "1.5", true),
      (7L, ("%PDF-1.4\n" + "x" * 64).getBytes("ISO-8859-1"),
        -1, "<undecodable>", "", false),
      (8L, { // lying startxref → the recovery scan extracts anyway
        val p = PdfFixture.simplePdf(Seq("BT /F1 12 Tf (recovered) Tj ET"))
        val i = new String(p, "ISO-8859-1").lastIndexOf("startxref") + 10
        p(i) = '9'; p(i + 1) = '\n'; p
      }, 1, "recovered", "1.5", false),
      (9L, { // LZW-filtered content stream
        val b = new PdfFixture.Builder
        b.add(1, "<< /Type /Catalog /Pages 2 0 R >>")
        b.add(2, "<< /Type /Pages /Count 1 /Kids [3 0 R] >>")
        b.add(3, "<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>")
        b.addStream(4, "/Filter /LZWDecode", PdfFixture.lzw(
          "BT /F1 12 Tf (lzw filtered) Tj ET".getBytes("ISO-8859-1")))
        b.finishClassic(1)
      }, 1, "lzw filtered", "1.5", false),
      (10L, // junk before the header re-anchors offsets
        "HTTP/1.1 200 OK\r\n\r\n".getBytes("ISO-8859-1") ++
          PdfFixture.simplePdf(Seq("BT /F1 12 Tf (anchored) Tj ET")),
        1, "anchored", "1.5", false))
    s.createDataset(rows).toDF("doc_id", "content", "exp_pages",
        "exp_text", "exp_version", "exp_encrypted")
      .coalesce(1).write.mode("overwrite").parquet(m34Dir)
  }

  // -- m35 fixture: the m26 curation verdicts, delivered as PDFs —
  //    same texts, same seen-index and probe documents, so every
  //    stage verdict carries over verbatim (near-dup, langid,
  //    quality, decontamination); the encrypted document takes doc
  //    7's no-row role. Survivor digests are DuckDB-recomputed from
  //    the same literals.
  private val m35Dir = "/tmp/graft_gate_m35_pdfcur"

  private def writeM35Fixture(s: SparkSession): Unit = {
    import s.implicits._
    def onePage(text: String) =
      PdfFixture.simplePdf(Seq(s"BT /F1 12 Tf ${PdfFixture.lit(text)} Tj ET"))
    val rows: Seq[(Long, Array[Byte])] = Seq(
      (1L, onePage(m26SurvivorA)),
      (2L, onePage(m26SeenText)),
      (3L, onePage("buenas noches amigos hasta manana siempre dijo nadie")),
      (4L, onePage("the 1234567890 9876543210 1234567890 to 55555")),
      (5L, onePage(m26ProbeText)),
      (6L, onePage(m26SurvivorF)),
      (7L, PdfFixture.encryptedPdf("never readable")))
    s.createDataset(rows).toDF("doc_id", "content")
      .coalesce(1).write.mode("overwrite").parquet(m35Dir)
  }

  // -- m36 fixture: EPUBs from the INDEPENDENT OCF writer
  //    (EpubFixture — the JDK ZipOutputStream is a third party to the
  //    reader's ZipInputStream walk). Expected text is hand-written
  //    from the pinned htmlToText semantics (block tags → newlines,
  //    entities decode, inline tags → space then normalize).
  private val m36Dir = "/tmp/graft_gate_m36_epub"

  private def writeM36Fixture(s: SparkSession): Unit = {
    import s.implicits._
    val rows: Seq[(Long, Array[Byte], String, Int, String)] = Seq(
      (0L, EpubFixture.epub("Gate Book", Seq(
        "a.xhtml" -> EpubFixture.xhtml("one &amp; two", "three"),
        "b.xhtml" -> EpubFixture.xhtml("four <b>bold</b> five"))),
        "Gate Book", 2, "one & two\nthree\ffour bold five"),
      (1L, EpubFixture.epub("Shuffled", Seq(
        "c1.xhtml" -> EpubFixture.xhtml("first chapter"),
        "c2.xhtml" -> EpubFixture.xhtml("second chapter"),
        "c3.xhtml" -> EpubFixture.xhtml("third chapter")),
        spineOrder = Seq(2, 0, 1)),
        // the SPINE is the reading order, not the file order
        "Shuffled", 3, "third chapter\ffirst chapter\fsecond chapter"),
      (2L, "not a zip at all".getBytes("UTF-8"),
        "<none>", -1, "<undecodable>"),
      (3L, EpubFixture.zip(Seq(
        "mimetype" -> "application/epub+zip".getBytes("UTF-8"))),
        "<none>", -1, "<undecodable>"))
    s.createDataset(rows).toDF("doc_id", "content", "exp_title",
        "exp_chapters", "exp_text")
      .coalesce(1).write.mode("overwrite").parquet(m36Dir)
  }

  // -- m37 fixture: DOCX from the INDEPENDENT OPC writer
  //    (DocxFixture); expected text is the typed piece list replayed
  //    by hand (tabs/breaks in document order, property subtrees
  //    excluded, table cells as paragraphs).
  private val m37Dir = "/tmp/graft_gate_m37_docx"

  private def writeM37Fixture(s: SparkSession): Unit = {
    import s.implicits._
    import DocxFixture.{Br, T, Tab}
    val rows: Seq[(Long, Array[Byte], Int, String)] = Seq(
      (0L, DocxFixture.docx(Seq(
        DocxFixture.para(T("alpha"), Tab, T("beta"), Br, T("gamma")),
        DocxFixture.para(T("a < b & c")))),
        2, "alpha\tbeta\ngamma\na < b & c"),
      (1L, DocxFixture.docx(Seq(
        DocxFixture.para(T("before")),
        DocxFixture.table("cell one", "cell two"),
        DocxFixture.para(T("after")))),
        4, "before\ncell one\ncell two\nafter"),
      (2L, DocxFixture.docx(Seq(DocxFixture.para(T("fallback"))),
        withRels = false),
        1, "fallback"),
      (3L, "not a zip at all".getBytes("UTF-8"),
        -1, "<undecodable>"))
    s.createDataset(rows).toDF("doc_id", "content", "exp_paras", "exp_text")
      .coalesce(1).write.mode("overwrite").parquet(m37Dir)
  }

  // -- m38 fixture: ONE document shipped as PDF, EPUB, DOCX, ODT, RTF,
  //    DOC, XLSX, XLSB and PPTX —
  //    legacy DOC and (r14) XLSX + PPTX — the eight extractors must
  //    converge on byte-identical text so cross-format copies dedup
  //    to one survivor (min doc_id), plus a genuinely different DOCX
  //    that must stay.
  private val m38Dir = "/tmp/graft_gate_m38_docmix"
  private val m38TextA = "the same document shipped six ways"
  private val m38TextB = "a different document entirely"

  private def writeM38Fixture(s: SparkSession): Unit = {
    import s.implicits._
    import DocxFixture.T
    val rows: Seq[(Long, String, Array[Byte])] = Seq(
      (1L, "pdf", PdfFixture.simplePdf(Seq(
        s"BT /F1 12 Tf ${PdfFixture.lit(m38TextA)} Tj ET"))),
      (2L, "epub", EpubFixture.epub("A", Seq(
        "a.xhtml" -> EpubFixture.xhtml(m38TextA)))),
      (3L, "docx", DocxFixture.docx(Seq(DocxFixture.para(T(m38TextA))))),
      (4L, "docx", DocxFixture.docx(Seq(DocxFixture.para(T(m38TextB))))),
      (5L, "odt", OdtFixture.odt(Seq(
        OdtFixture.para(OdtFixture.T(m38TextA))))),
      (6L, "rtf", s"{\\rtf1\\ansi $m38TextA\\par}"
        .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)),
      (7L, "doc", LegacyDocFixture.doc(Seq(
        LegacyDocFixture.Piece(m38TextA + "\r", compressed = true)))),
      (8L, "xlsx", XlsxFixture.xlsx1(
        Seq(XlsxFixture.SRef("A1", 0)),
        sharedStrings = Some(Seq(XlsxFixture.si(m38TextA))))),
      (9L, "pptx", PptxFixture.pptx(Seq(PptxFixture.Slide(Seq(
        PptxFixture.aPara(m38TextA)))))),
      // r15: the BINARY workbook makes it nine formats of one text
      (10L, "xlsb", XlsbFixture.xlsb1(
        Seq(XlsbFixture.cellIsst(0, 0)),
        sharedStrings = Some(Seq(XlsbFixture.sstItem(m38TextA))))))
    s.createDataset(rows).toDF("doc_id", "fmt", "content")
      .coalesce(1).write.mode("overwrite").parquet(m38Dir)
  }

  // -- m39 fixture: ODT from the INDEPENDENT ODF writer — headings,
  //    space runs, tabs, line breaks, spans, footnote exclusion,
  //    lists and tables; literal expectations ride the fixture.
  private val m39Dir = "/tmp/graft_gate_m39_odt"

  private def writeM39Fixture(s: SparkSession): Unit = {
    import s.implicits._
    import OdtFixture.{LineBreak, Note, Spaces, Span, T, Tab}
    val rows: Seq[(Long, Array[Byte], Int, String)] = Seq(
      (0L, OdtFixture.odt(Seq(
        OdtFixture.heading(1, T("Title")),
        OdtFixture.para(T("alpha"), Tab, T("beta"), LineBreak, T("gamma")),
        OdtFixture.para(T("a"), Spaces(3), T("b")),
        OdtFixture.para(Span("bold"), T(" plain"), Note("dropped")),
        OdtFixture.para(T("a < b & c")))),
        5, "Title\nalpha\tbeta\ngamma\na   b\nbold plain\na < b & c"),
      (1L, OdtFixture.odt(Seq(
        OdtFixture.para(T("before")),
        OdtFixture.list("item one", "item two"),
        OdtFixture.table("cell one", "cell two"),
        OdtFixture.para(T("after")))),
        6, "before\nitem one\nitem two\ncell one\ncell two\nafter"),
      // mimetype entry absent: content.xml is the real gate
      (2L, OdtFixture.odt(Seq(OdtFixture.para(T("no mimetype"))),
        mimetype = None),
        1, "no mimetype"),
      // declared class is NOT text (a spreadsheet) → NULL
      (3L, OdtFixture.odt(Seq(OdtFixture.para(T("wrong class"))),
        mimetype = Some("application/vnd.oasis.opendocument.spreadsheet")),
        -1, "<undecodable>"),
      (4L, "not a zip at all".getBytes("UTF-8"),
        -1, "<undecodable>"))
    s.createDataset(rows).toDF("doc_id", "content", "exp_paras", "exp_text")
      .coalesce(1).write.mode("overwrite").parquet(m39Dir)
  }

  // -- m40 fixture: RTF hand-authored forward from the published
  //    grammar (the format is an ASCII token stream, so the strings
  //    ARE the independent fixture); literal expectations ride along.
  private val m40Dir = "/tmp/graft_gate_m40_rtf"

  private def writeM40Fixture(s: SparkSession): Unit = {
    import s.implicits._
    val rows: Seq[(Long, Array[Byte], Int, String)] = Seq(
      // formatting words vanish, \par breaks paragraphs
      (0L, ("{\\rtf1\\ansi\\deff0{\\fonttbl{\\f0 Times;}}" +
        "Hello \\b world\\b0 !\\par Second para\\par}").getBytes("ISO-8859-1"),
        2, "Hello world!\nSecond para"),
      // \'xx through the declared code page; \uN consumes its uc
      // fallback; the space after \'e9 is literal text
      (1L, "{\\rtf1\\ansicpg1252\\uc1 caf\\'e9 \\u8364 ?!\\par}"
        .getBytes("ISO-8859-1"),
        1, "café €!"),
      // header tables, footnotes and field instructions are invisible;
      // field RESULTS are body text
      (2L, ("{\\rtf1{\\info{\\title T}}main{\\footnote fn} " +
        "{\\field{\\*\\fldinst HYPERLINK}{\\fldrslt link}}\\par}")
        .getBytes("ISO-8859-1"),
        1, "main link"),
      // table cells flush as paragraphs
      (3L, ("{\\rtf1\\trowd\\cellx1000\\cellx2000 " +
        "cell one\\cell cell two\\cell\\row\\par}").getBytes("ISO-8859-1"),
        2, "cell one\ncell two"),
      (4L, "not rtf at all".getBytes("ISO-8859-1"),
        -1, "<undecodable>"))
    s.createDataset(rows).toDF("doc_id", "content", "exp_paras", "exp_text")
      .coalesce(1).write.mode("overwrite").parquet(m40Dir)
  }

  // -- m41 fixture: legacy .doc from the INDEPENDENT CFB+FIB writer —
  //    compressed and UTF-16 pieces, field ranges, cell marks,
  //    1Table routing, Prc skip, encryption refusal; literal
  //    expectations ride the fixture.
  private val m41Dir = "/tmp/graft_gate_m41_doc"

  private def writeM41Fixture(s: SparkSession): Unit = {
    import s.implicits._
    import LegacyDocFixture.Piece
    val rows: Seq[(Long, Array[Byte], Int, String)] = Seq(
      (0L, LegacyDocFixture.doc(Seq(
        Piece("Hello world!\rSecond para\r", compressed = true))),
        2, "Hello world!\nSecond para"),
      // pieces in CP order across encodings; cp1252 high range
      (1L, LegacyDocFixture.doc(Seq(
        Piece("café then ", compressed = true),
        Piece("καλημέρα", compressed = false),
        Piece("\r", compressed = true))),
        1, "café then καλημέρα"),
      // field instruction drops, result stays; 1Table routing; Prc skip
      (2L, LegacyDocFixture.doc(Seq(
        Piece("see \u0013HYPERLINK x\u0014the link\u0015 here\r",
          compressed = false)),
        oneTable = true, prcPrefix = true),
        1, "see the link here"),
      // cell marks break cells into paragraphs (the Docx/Odt posture)
      (3L, LegacyDocFixture.doc(Seq(
        Piece("cell one\u0007cell two\u0007\r", compressed = true))),
        2, "cell one\ncell two"),
      // encrypted → NULL
      (4L, LegacyDocFixture.doc(Seq(
        Piece("secret\r", compressed = true)), encrypted = true),
        -1, "<undecodable>"),
      (5L, "not a compound file".getBytes("UTF-8"),
        -1, "<undecodable>"))
    s.createDataset(rows).toDF("doc_id", "content", "exp_paras", "exp_text")
      .coalesce(1).write.mode("overwrite").parquet(m41Dir)
  }

  // -- m84 fixture: data-file blob SHAPE inventory — every payload
  //    from an INDEPENDENT writer (python3 stdlib sqlite3, numpy,
  //    org.apache.avro, Spark's own parquet/ORC writers); the
  //    expected detail strings derive from what those writers were
  //    asked to write. ----------------------------------------------
  private val m84Dir = "/tmp/graft_gate_m84_datafiles"

  private def writeM84Fixture(s: SparkSession): Unit = {
    import s.implicits._
    val src = "/tmp/graft_gate_m84_src"
    val srcDir = new java.io.File(src)
    if (!srcDir.exists) srcDir.mkdirs()
    def slurp(p: String): Array[Byte] =
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p))
    // sqlite + npy via python3 (both writers ship with the box's
    // python — the same interpreter the driver's oracle runs on)
    val script =
      s"""import sqlite3, os
         |import numpy as np
         |p = "$src/inv.db"
         |if os.path.exists(p): os.remove(p)
         |c = sqlite3.connect(p)
         |c.execute("CREATE TABLE inv_a (x INTEGER, y TEXT)")
         |for i in range(4):
         |    c.execute("INSERT INTO inv_a VALUES (?, ?)", (i, "v%d" % i))
         |c.execute("CREATE TABLE inv_b (z REAL)")
         |c.commit(); c.close()
         |np.save("$src/m.npy", np.zeros((2, 3), dtype="<f4"))
         |""".stripMargin
    val proc = new ProcessBuilder("python3", "-c", script)
      .redirectErrorStream(true).start()
    val pout = new String(proc.getInputStream.readAllBytes, "UTF-8")
    require(proc.waitFor() == 0, s"m84 python writer failed:\n$pout")
    val avroBytes = {
      val schema = new org.apache.avro.Schema.Parser().parse(
        """{"type":"record","name":"R","fields":[
          |{"name":"s","type":"string"}]}""".stripMargin)
      val w = new org.apache.avro.file.DataFileWriter(
        new org.apache.avro.generic.GenericDatumWriter[
          org.apache.avro.generic.GenericRecord](schema))
      val bos = new java.io.ByteArrayOutputStream()
      w.create(schema, bos)
      (0 until 5).foreach { i =>
        val r = new org.apache.avro.generic.GenericData.Record(schema)
        r.put("s", s"row$i")
        w.append(r)
        if (i == 2) w.sync() // two blocks: 3 + 2 records
      }
      w.close()
      bos.toByteArray
    }
    def sparkFile(fmt: String): Array[Byte] = {
      val dir = s"$src/tiny_$fmt"
      val df = s.range(3).toDF("n")
      if (fmt == "orc") df.coalesce(1).write.mode("overwrite").orc(dir)
      else df.coalesce(1).write.mode("overwrite").parquet(dir)
      val part = new java.io.File(dir).listFiles()
        .find(f => f.getName.startsWith("part-")).get
      slurp(part.getAbsolutePath)
    }
    val hdf5 = Array[Byte](0x89.toByte, 'H', 'D', 'F', '\r', '\n',
      0x1a, '\n', 0) ++ Array.fill[Byte](56)(0)
    val arrowBytes = {
      val alloc = new org.apache.arrow.memory.RootAllocator(16L << 20)
      val field = new org.apache.arrow.vector.types.pojo.Field("v",
        org.apache.arrow.vector.types.pojo.FieldType.nullable(
          new org.apache.arrow.vector.types.pojo.ArrowType.Int(32, true)),
        null)
      val schema = new org.apache.arrow.vector.types.pojo.Schema(
        java.util.Arrays.asList(field))
      val root = org.apache.arrow.vector.VectorSchemaRoot
        .create(schema, alloc)
      val vec = root.getVector("v")
        .asInstanceOf[org.apache.arrow.vector.IntVector]
      vec.allocateNew(4)
      (0 until 4).foreach(i => vec.setSafe(i, i * 7))
      root.setRowCount(4)
      val bos = new java.io.ByteArrayOutputStream()
      val w = new org.apache.arrow.vector.ipc.ArrowFileWriter(root, null,
        java.nio.channels.Channels.newChannel(bos))
      w.start(); w.writeBatch(); w.end(); w.close()
      root.close(); alloc.close()
      bos.toByteArray
    }
    val tornArrow = "ARROW1".getBytes("US-ASCII") ++
      Array.fill[Byte](10)(0)
    val rows: Seq[(Long, Array[Byte], String, String)] = Seq(
      (0L, slurp(s"$src/inv.db"), "sqlite", "tables=inv_a:4,inv_b:0"),
      (1L, slurp(s"$src/m.npy"), "npy",
        "dtype=<f4 shape=2x3 fortran=false"),
      (2L, hdf5, "hdf5", "superblock=v0"),
      (3L, avroBytes, "avro", "records=5 cols=s:string"),
      (4L, sparkFile("parquet"), "parquet", "records=3 cols=n:int64"),
      (5L, sparkFile("orc"), "orc", "records=3 cols=n:long"),
      (6L, arrowBytes, "arrow", "records=4 cols=v:int"),
      (7L, tornArrow, "arrow", "header-only"),
      (100L, Array[Byte](0x01, 0x02, 0x03, 0x7f, 0x00, 0x04),
        "<unknown>", "none"))
    s.createDataset(rows).toDF("blob_id", "payload", "exp_format",
        "exp_detail")
      .coalesce(1).write.mode("overwrite").parquet(m84Dir)
    ()
  }

  // -- m42 fixture: a MIXED document column with unreliable labels —
  //    the dispatch key must be the payload magic. All readable
  //    formats (incl. r14's xlsx/pptx/html/txt) plus the
  //    classify-only and refusal classes.
  private val m42Dir = "/tmp/graft_gate_m42_docprobe"

  private def writeM42Fixture(s: SparkSession): Unit = {
    import s.implicits._
    val t = "route by magic"
    val rows: Seq[(Long, Array[Byte], String, String)] = Seq(
      (0L, PdfFixture.simplePdf(Seq(
        s"BT /F1 12 Tf ${PdfFixture.lit(t)} Tj ET")), "pdf", t),
      (1L, DocxFixture.docx(Seq(
        DocxFixture.para(DocxFixture.T(t)))), "docx", t),
      (2L, OdtFixture.odt(Seq(
        OdtFixture.para(OdtFixture.T(t)))), "odt", t),
      (3L, EpubFixture.epub("R", Seq(
        "c.xhtml" -> EpubFixture.xhtml(t))), "epub", t),
      (4L, s"{\\rtf1 $t\\par}".getBytes("ISO-8859-1"), "rtf", t),
      (5L, LegacyDocFixture.doc(Seq(
        LegacyDocFixture.Piece(t + "\r", compressed = true))), "doc", t),
      // refusals: encrypted PDF and encrypted legacy doc classify but
      // never decode
      (6L, PdfFixture.encryptedPdf("x"), "pdf", "<undecodable>"),
      (7L, LegacyDocFixture.doc(Seq(
        LegacyDocFixture.Piece("x\r", compressed = true)),
        encrypted = true), "doc", "<undecodable>"),
      // legacy Excel decodes its referenced cells; encrypted refuses
      (8L, XlsFixture.workbook(Seq(
        XlsFixture.sst(Seq(XlsFixture.sstEntry(t)), total = 1),
        XlsFixture.labelSst(0, 0, 0))), "xls", t),
      (14L, XlsFixture.workbook(Seq(
        XlsFixture.filePass(),
        XlsFixture.sst(Seq(XlsFixture.sstEntry("x")), total = 1))),
        "xls", "<undecodable>"),
      // legacy PowerPoint decodes; an encrypted deck refuses
      (12L, PptFixture.ppt(Seq(
        PptFixture.textCharsAtom(t))), "ppt", t),
      (13L, PptFixture.ppt(Seq(
        PptFixture.encryptionAtom(),
        PptFixture.textCharsAtom("x"))), "ppt", "<undecodable>"),
      (9L, LegacyDocFixture.cfb(Seq(
        "EncryptionInfo" -> Array[Byte](1),
        "EncryptedPackage" -> Array[Byte](2))),
        "encrypted-ooxml", "<undecodable>"),
      // a plain zip and BINARY junk (plain text ROUTES since r14)
      (10L, EpubFixture.zip(Seq("readme.txt" -> "hi".getBytes)),
        "zip", "<undecodable>"),
      (11L, Array[Byte](0x00, 0x01, 0x02, 0x03, 0x7F, 0x04),
        "<unknown>", "<undecodable>"),
      // modern Office decodes too (r14): SpreadsheetML cells and
      // PresentationML runs through the same single ZIP walk
      (15L, XlsxFixture.xlsx1(
        Seq(XlsxFixture.SRef("A1", 0)),
        sharedStrings = Some(Seq(XlsxFixture.si(t)))), "xlsx", t),
      (16L, PptxFixture.pptx(Seq(PptxFixture.Slide(Seq(
        PptxFixture.aPara(t))))), "pptx", t),
      // the crawl residual classes: raw HTML through the charset
      // sniff + htmlToText cascade, plain UTF-8 text as itself
      (17L, s"<!DOCTYPE html><html><body><p>$t</p></body></html>"
        .getBytes("UTF-8"), "html", t),
      (18L, t.getBytes("UTF-8"), "txt", t),
      // an RFC 5322 message upgrades from txt to eml by its headers
      (19L, (s"From: a@b.c\r\nTo: l@b.c\r\nSubject: s\r\n\r\n$t")
        .getBytes("UTF-8"), "eml", t),
      // LaTeX source upgrades from txt and detexes
      (20L, (s"\\documentclass{article}\n\\begin{document}\n$t\n" +
        "\\end{document}\n").getBytes("UTF-8"), "latex", t),
      // the ODF siblings (r14): spreadsheet cells and slide text
      (21L, OdtFixture.ods(Seq(Seq(OdtFixture.cell(t)))), "ods", t),
      (22L, OdtFixture.odp(Seq((Seq(t), Seq.empty))), "odp", t),
      // r15: default-password Office encryption OPENS — the
      // VelvetSweatshop xls reads as an xls, a blank-password
      // standard/agile OOXML package reports its INNER kind (exactly
      // as Excel/Word show them); a real password keeps refusing
      (23L, OffCryptFixture.rc4Xls(Seq(
        XlsFixture.sst(Seq(XlsFixture.sstEntry(t)), total = 1),
        XlsFixture.labelSst(0, 0, 0)), "VelvetSweatshop"), "xls", t),
      (24L, OffCryptFixture.stdEncryptedOoxml(DocxFixture.docx(Seq(
        DocxFixture.para(DocxFixture.T(t)))), ""), "docx", t),
      (25L, OffCryptFixture.agileEncryptedOoxml(DocxFixture.docx(Seq(
        DocxFixture.para(DocxFixture.T(t)))), ""), "docx", t),
      (26L, OffCryptFixture.stdEncryptedOoxml(DocxFixture.docx(Seq(
        DocxFixture.para(DocxFixture.T("x")))), "realpassword"),
        "encrypted-ooxml", "<undecodable>"),
      // a notebook upgrades from txt to its authored cells (r15)
      (27L, (s"""{"nbformat": 4, "cells": [{"cell_type": "markdown",""" +
        s""" "source": ["$t"]}]}""").getBytes("UTF-8"), "ipynb", t),
      // r16: data-file blobs classify by magic instead of reading as
      // unknown binary (text stays undecodable — the table readers
      // own their rows); the "ORC"-leading TEXT control guards the
      // 3-byte magic
      (28L, "PAR1".getBytes("US-ASCII") ++ Array.fill[Byte](64)(7) ++
        "PAR1".getBytes("US-ASCII"), "parquet", "<undecodable>"),
      (29L, ("SQLite format 3\u0000" + "x" * 48).getBytes("ISO-8859-1"),
        "sqlite", "<undecodable>"),
      (30L, "ORC".getBytes("US-ASCII") ++ Array.fill[Byte](24)(3) ++
        "ORC".getBytes("US-ASCII") ++ Array[Byte](23),
        "orc", "<undecodable>"),
      (31L, "ORCHESTRAS played plain text here".getBytes("UTF-8"),
        "txt", "ORCHESTRAS played plain text here"),
      (32L, "Obj".getBytes("US-ASCII") ++ Array[Byte](1) ++
        Array.fill[Byte](32)(9), "avro", "<undecodable>"),
      // r16: BOM-declared UTF-16LE text (the Windows-export class)
      // routes exactly like its narrow twin; BOM-less stays refused
      (33L, ("\uFEFF" + t).getBytes("UTF-16LE"), "txt", t),
      (34L, t.getBytes("UTF-16LE"), "<unknown>", "<undecodable>"))
    s.createDataset(rows)
      .toDF("doc_id", "content", "exp_format", "exp_text")
      .coalesce(1).write.mode("overwrite").parquet(m42Dir)
  }

  // -- m43 fixture: LaTeX sources hand-authored forward from the TeX
  //    surface grammar (text format — the strings ARE the independent
  //    fixture); literal expectations ride along.
  private val m43Dir = "/tmp/graft_gate_m43_latex"

  private def writeM43Fixture(s: SparkSession): Unit = {
    import s.implicits._
    val rows: Seq[(Long, String, Int, String)] = Seq(
      (0L, "\\documentclass{article}\n\\begin{document}\n" +
        "\\section{Intro}\nHello \\emph{world}~here. % comment\n" +
        "Math $x+y$ drops.\n\n\\par Done.\n\\end{document}\n",
        3, "Intro\nHello world here.\nMath drops.\nDone."),
      (1L, "Caf\\'e costs 5~EUR.\n\\begin{equation}\nE=mc^2\n" +
        "\\end{equation}\nAfter \\begin{itemize}\\item one \\item two" +
        "\\end{itemize} list.\n\\begin{verbatim}\nraw <code> $x$\n" +
        "\\end{verbatim}\nEnd.",
        4, "Café costs 5 EUR.\nAfter one two list.\nraw <code> $x$\nEnd."),
      (2L, "See~\\cite{x2020} and \\ref{fig:1}.\\footnote{drop me} " +
        "Also \\href{http://x}{link text} and \\url{http://y} end.",
        1, "See and . Also link text and end."),
      (3L, "\\begin{figure}[h]\\includegraphics[width=5cm]{img.png}" +
        "\\caption{A nice plot}\\label{fig:x}\\end{figure}Body.",
        2, "A nice plot\nBody."))
    s.createDataset(rows).toDF("doc_id", "src", "exp_paras", "exp_text")
      .coalesce(1).write.mode("overwrite").parquet(m43Dir)
  }

  // -- m44 fixture: BIFF8 workbooks from the INDEPENDENT record
  //    writer — SST encodings, Continue splits (incl. an encoding
  //    switch at the split), rich-run skips, duplicate references,
  //    Book stream name, FilePass refusal.
  private val m44Dir = "/tmp/graft_gate_m44_xls"

  private def writeM44Fixture(s: SparkSession): Unit = {
    import s.implicits._
    val rows: Seq[(Long, Array[Byte], Int, String)] = Seq(
      (0L, XlsFixture.workbook(Seq(
        XlsFixture.sst(Seq(
          XlsFixture.sstEntry("alpha"),
          XlsFixture.sstEntry("καλημέρα", high = true),
          XlsFixture.sstEntry("styled", richRuns = 2)), total = 4),
        XlsFixture.labelSst(0, 0, 0),
        XlsFixture.labelSst(0, 1, 1),
        XlsFixture.labelSst(1, 0, 2),
        XlsFixture.labelSst(1, 1, 0))),
        4, "alpha\nκαλημέρα\nstyled\nalpha"),
      // the Continue split that switches encodings mid-string
      (1L, XlsFixture.workbook(
        XlsFixture.sstWithContinue("abc", "δε", tailHigh = true) :+
          XlsFixture.labelSst(0, 0, 0)),
        1, "abcδε"),
      // numbers-only sheet: valid, empty
      (2L, XlsFixture.workbook(Seq(XlsFixture.numberCell(0, 0, 42.5))),
        0, ""),
      (3L, XlsFixture.workbook(Seq(
        XlsFixture.sst(Seq(XlsFixture.sstEntry("book95")), total = 1),
        XlsFixture.labelSst(0, 0, 0)), streamName = "Book"),
        1, "book95"),
      (4L, XlsFixture.workbook(Seq(
        XlsFixture.filePass(),
        XlsFixture.sst(Seq(XlsFixture.sstEntry("secret")), total = 1))),
        -1, "<undecodable>"),
      (5L, "not a workbook".getBytes("UTF-8"),
        -1, "<undecodable>"))
    s.createDataset(rows).toDF("doc_id", "content", "exp_paras", "exp_text")
      .coalesce(1).write.mode("overwrite").parquet(m44Dir)
  }

  // -- m48 fixture: XLSX from the INDEPENDENT SpreadsheetML writer —
  //    shared strings (plain, rich runs, phonetic exclusion), inline
  //    and formula strings, numeric/boolean skips, workbook-order
  //    routing with scrambled member names; literal expectations
  //    ride the fixture.
  private val m48Dir = "/tmp/graft_gate_m48_xlsx"

  private def writeM48Fixture(s: SparkSession): Unit = {
    import s.implicits._
    import XlsxFixture.{Bool, Cell, FStr, Inline, Num, SRef}
    val rows: Seq[(Long, Array[Byte], Int, String)] = Seq(
      (0L, XlsxFixture.xlsx1(
        Seq(SRef("A1", 0), Num("B1", 42.5), Inline("C1", "inline cell"),
          Bool("D1", v = true), FStr("E1", "formula out"), SRef("F1", 1)),
        sharedStrings = Some(Seq(
          XlsxFixture.si("alpha"), XlsxFixture.si("καλημέρα")))),
        4, "alpha\ninline cell\nformula out\nκαλημέρα"),
      // rich runs concatenate; the phonetic block must not leak
      (1L, XlsxFixture.xlsx1(
        Seq(SRef("A1", 0), SRef("B1", 1)),
        sharedStrings = Some(Seq(
          XlsxFixture.si("styled run text", richRuns = 3),
          XlsxFixture.si("漢字", phonetic = "かんじ")))),
        2, "styled run text\n漢字"),
      // workbook list order wins over scrambled member names;
      // duplicate references repeat
      (2L, XlsxFixture.xlsx(
        Seq(("rId1", "First", Seq[Cell](Inline("A1", "one"))),
          ("rId2", "Second", Seq[Cell](Inline("A1", "two"), Inline("B1", "one")))),
        sharedStrings = None, scrambleNames = true),
        3, "one\ntwo\none"),
      // numbers-only: a valid empty text document
      (3L, XlsxFixture.xlsx1(Seq(Num("A1", 1.0), Num("B1", 2.0)),
        sharedStrings = None),
        0, ""),
      (4L, "not a workbook at all PK-less".getBytes("UTF-8"),
        -1, "<undecodable>"))
    s.createDataset(rows).toDF("doc_id", "content", "exp_paras", "exp_text")
      .coalesce(1).write.mode("overwrite").parquet(m48Dir)
  }

  // -- m49 fixture: PPTX from the INDEPENDENT PresentationML writer —
  //    a:t run concatenation, a:br line breaks, sldIdLst order with
  //    scrambled member names, speaker notes inclusion; literal
  //    expectations ride the fixture.
  private val m49Dir = "/tmp/graft_gate_m49_pptx"

  private def writeM49Fixture(s: SparkSession): Unit = {
    import s.implicits._
    import PptxFixture.Slide
    val rows: Seq[(Long, Array[Byte], Int, String)] = Seq(
      (0L, PptxFixture.pptx(Seq(Slide(Seq(
        PptxFixture.aPara("Title ", "run"),
        PptxFixture.aPara("line one\nline two"))))),
        2, "Title run\nline one\nline two"),
      // presentation order beats member-name order
      (1L, PptxFixture.pptx(Seq(
        Slide(Seq(PptxFixture.aPara("slide one"))),
        Slide(Seq(PptxFixture.aPara("slide two"))),
        Slide(Seq(PptxFixture.aPara("slide three")))),
        scrambleNames = true),
        3, "slide one\nslide two\nslide three"),
      // speaker notes contribute right after their slide
      (2L, PptxFixture.pptx(Seq(
        Slide(Seq(PptxFixture.aPara("deck intro")),
          notes = Seq(PptxFixture.aPara("remember the demo"))),
        Slide(Seq(PptxFixture.aPara("closing"))))),
        3, "deck intro\nremember the demo\nclosing"),
      // image-only deck: a valid empty text document
      (3L, PptxFixture.pptx(Seq(Slide(Seq.empty))),
        0, ""),
      (4L, "not a deck at all PK-less".getBytes("UTF-8"),
        -1, "<undecodable>"))
    s.createDataset(rows).toDF("doc_id", "content", "exp_paras", "exp_text")
      .coalesce(1).write.mode("overwrite").parquet(m49Dir)
  }

  // -- m50 fixture: RFC 5322 + MIME messages hand-authored forward
  //    from the RFCs (text format — the strings ARE the independent
  //    fixture, the RTF/LaTeX discipline): encoded-word headers,
  //    multipart/alternative preference, QP + base64 transfer
  //    encodings, nested multiparts with an attachment skip; literal
  //    expectations ride the fixture.
  private val m50Dir = "/tmp/graft_gate_m50_eml"

  private def writeM50Fixture(s: SparkSession): Unit = {
    import s.implicits._
    def eml(str: String): Array[Byte] =
      str.stripMargin.replace("\n", "\r\n").getBytes("ISO-8859-1")
    val b64 = java.util.Base64.getMimeEncoder.encodeToString(
      "base64 body καλημέρα".getBytes("UTF-8"))
    val rows: Seq[(Long, Array[Byte], String, Int, String)] = Seq(
      (0L, eml("""From: Alice <alice@example.org>
                 |To: list@example.org
                 |Subject: hello world
                 |Message-ID: <m1@example.org>
                 |
                 |This is the body.
                 |Second line."""),
        "hello world", 1, "This is the body.\nSecond line."),
      // B- and Q-encoded words decode; adjacent words join
      (1L, eml("""From: =?UTF-8?B?Sm9zw6k=?= <jose@example.org>
                 |Subject: =?ISO-8859-1?Q?caf=E9_menu?=
                 | =?ISO-8859-1?Q?_update?=
                 |To: a@b.c
                 |
                 |body"""),
        "café menu update", 1, "body"),
      // alternative picks ONE part: plain preferred over html
      (2L, eml("""From: a@b.c
                 |MIME-Version: 1.0
                 |Content-Type: multipart/alternative; boundary="XY"
                 |
                 |preamble drops
                 |--XY
                 |Content-Type: text/html
                 |
                 |<html><body><p>html version</p></body></html>
                 |--XY
                 |Content-Type: text/plain
                 |
                 |plain version
                 |--XY--"""),
        "", 1, "plain version"),
      // QP soft breaks + charset, base64 through the JDK MIME decoder
      (3L, eml(s"""From: a@b.c
                  |Content-Type: multipart/mixed; boundary=MM
                  |
                  |--MM
                  |Content-Type: text/plain; charset=iso-8859-1
                  |Content-Transfer-Encoding: quoted-printable
                  |
                  |caf=E9 cr=
                  |=E8me
                  |--MM
                  |Content-Type: text/plain; charset=utf-8
                  |Content-Transfer-Encoding: base64
                  |
                  |$b64
                  |--MM--"""),
        "", 2, "café crème\fbase64 body καλημέρα"),
      // nesting recurses in order; the PDF attachment is invisible
      (4L, eml("""From: a@b.c
                 |Content-Type: multipart/mixed; boundary=OUT
                 |
                 |--OUT
                 |Content-Type: multipart/alternative; boundary=IN
                 |
                 |--IN
                 |Content-Type: text/plain
                 |
                 |inner plain
                 |--IN--
                 |--OUT
                 |Content-Type: application/pdf; name="x.pdf"
                 |Content-Transfer-Encoding: base64
                 |
                 |JVBERi0=
                 |--OUT
                 |Content-Type: text/plain
                 |
                 |tail part
                 |--OUT--"""),
        "", 2, "inner plain\ftail part"),
      (5L, Array[Byte](0x00, 0x01, 0x02),
        "<not-a-message>", -1, "<not-a-message>"))
    s.createDataset(rows)
      .toDF("doc_id", "content", "exp_subject", "exp_parts", "exp_text")
      .coalesce(1).write.mode("overwrite").parquet(m50Dir)
  }

  // -- m51 fixture: an MBOX archive on disk (the mailing-list
  //    publication format) — envelope splitting, mboxrd unquoting,
  //    and the exact-dedup bridge over extracted bodies.
  private val m51Dir = "/tmp/graft_gate_m51_mbox"

  private def writeM51Fixture(): Unit = {
    val mbox =
      "From alice Mon Apr  1 10:00:00 2024\n" +
        "From: alice@example.org\nTo: list@example.org\n" +
        "Subject: announcement\nMessage-ID: <a1@list>\n\n" +
        "the release is out today.\n\n" +
        "From bob Tue Apr  2 11:00:00 2024\n" +
        "From: bob@example.org\nTo: list@example.org\n" +
        "Subject: Re: announcement\nMessage-ID: <b2@list>\n\n" +
        ">From the changelog, quoting:\nthe release is out today, nice.\n\n" +
        "From carol Wed Apr  3 12:00:00 2024\n" +
        "From: carol@example.org\nTo: list@example.org\n" +
        "Subject: duplicate repost\nMessage-ID: <c3@list>\n\n" +
        "the release is out today.\n"
    val dir = java.nio.file.Paths.get(m51Dir)
    java.nio.file.Files.createDirectories(dir)
    java.nio.file.Files.write(dir.resolve("list.mbox"),
      mbox.getBytes("UTF-8"))
    ()
  }

  // -- m52 fixture: a wild tar archive (commons-compress as the
  //    INDEPENDENT third-party writer, PAX long names) of mixed
  //    documents — the arXiv-dump shape: archive → member explode →
  //    magic-routed document layer.
  private val m52Dir = "/tmp/graft_gate_m52_tar"
  private val m52LongName = "papers/" + ("v" * 120) + "/main.rtf"

  private def writeM52Fixture(): Unit = {
    import org.apache.commons.compress.archivers.tar.{TarArchiveEntry, TarArchiveOutputStream}
    val bos = new java.io.ByteArrayOutputStream()
    val t = new TarArchiveOutputStream(bos)
    t.setLongFileMode(TarArchiveOutputStream.LONGFILE_POSIX)
    def add(name: String, data: Array[Byte]): Unit = {
      val e = new TarArchiveEntry(name)
      e.setSize(data.length.toLong); e.setModTime(0L)
      t.putArchiveEntry(e); t.write(data); t.closeArchiveEntry()
    }
    val dirE = new TarArchiveEntry("papers/")
    t.putArchiveEntry(dirE); t.closeArchiveEntry()
    add("a/readme.txt", "tar member plain text".getBytes("UTF-8"))
    add("b/page.html",
      "<html><body><p>tar member html</p></body></html>".getBytes("UTF-8"))
    add(m52LongName,
      "{\\rtf1 tar member rtf\\par}".getBytes("ISO-8859-1"))
    add("c/doc.docx", DocxFixture.docx(Seq(
      DocxFixture.para(DocxFixture.T("tar member docx")))))
    add("d/blob.bin", Array[Byte](0, 1, 2, 3, 4))
    add("e/paper.tex", ("\\documentclass{article}\n\\begin{document}\n" +
      "Tar member \\emph{latex} text.\n\\end{document}\n").getBytes("UTF-8"))
    t.close()
    val dir = java.nio.file.Paths.get(m52Dir)
    java.nio.file.Files.createDirectories(dir)
    java.nio.file.Files.write(dir.resolve("corpus.tar"), bos.toByteArray)
    // and the same content shipped .tar.gz / .tar.zst / .tar.bz2 —
    // all four compressions must read alike (r15: zstd + bzip2)
    val gz = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(gz)
    g.write(bos.toByteArray); g.close()
    java.nio.file.Files.write(dir.resolve("corpus2.tar.gz"), gz.toByteArray)
    val zs = new java.io.ByteArrayOutputStream()
    val z = new com.github.luben.zstd.ZstdOutputStream(zs)
    z.write(bos.toByteArray); z.close()
    java.nio.file.Files.write(dir.resolve("corpus3.tar.zst"), zs.toByteArray)
    val bz = new java.io.ByteArrayOutputStream()
    val b = new org.apache.commons.compress.compressors.bzip2
      .BZip2CompressorOutputStream(bz)
    b.write(bos.toByteArray); b.close()
    java.nio.file.Files.write(dir.resolve("corpus4.tar.bz2"), bz.toByteArray)
    val xzs = new java.io.ByteArrayOutputStream()
    val x = new org.tukaani.xz.XZOutputStream(xzs,
      new org.tukaani.xz.LZMA2Options())
    x.write(bos.toByteArray); x.close()
    java.nio.file.Files.write(dir.resolve("corpus5.tar.xz"), xzs.toByteArray)
    val lzs = new java.io.ByteArrayOutputStream()
    val l = new org.apache.commons.compress.compressors.lz4
      .FramedLZ4CompressorOutputStream(lzs)
    l.write(bos.toByteArray); l.close()
    java.nio.file.Files.write(dir.resolve("corpus6.tar.lz4"), lzs.toByteArray)
    ()
  }

  // -- m54 fixture: ODS from the extended INDEPENDENT ODF writer —
  //    text cells extract in document order, numeric cells are
  //    formatting (skipped), class gates hold; literal expectations
  //    ride the fixture.
  private val m54Dir = "/tmp/graft_gate_m54_ods"

  private def writeM54Fixture(s: SparkSession): Unit = {
    import s.implicits._
    import OdtFixture.cell
    val rows: Seq[(Long, Array[Byte], Int, String)] = Seq(
      (0L, OdtFixture.ods(Seq(
        Seq(cell("alpha"), cell("42.5", numeric = true), cell("beta")),
        Seq(cell("a < b & c")))),
        3, "alpha\nbeta\na < b & c"),
      // numbers-only sheet: a valid empty text document
      (1L, OdtFixture.ods(Seq(Seq(cell("1.5", numeric = true)))),
        0, ""),
      // mimetype absent: the content class is the real gate
      (2L, OdtFixture.ods(Seq(Seq(cell("no mimetype"))), mimetype = None),
        1, "no mimetype"),
      // a TEXT document through the spreadsheet extractor refuses
      (3L, OdtFixture.odt(Seq(OdtFixture.para(OdtFixture.T("wrong class")))),
        -1, "<undecodable>"),
      (4L, "not a zip".getBytes("UTF-8"), -1, "<undecodable>"))
    s.createDataset(rows).toDF("doc_id", "content", "exp_paras", "exp_text")
      .coalesce(1).write.mode("overwrite").parquet(m54Dir)
  }

  // -- m55 fixture: ODP from the extended INDEPENDENT ODF writer —
  //    slide frames in document order, speaker notes included after
  //    their slide (the Ppt/Pptx posture); literal expectations ride
  //    the fixture.
  private val m55Dir = "/tmp/graft_gate_m55_odp"

  private def writeM55Fixture(s: SparkSession): Unit = {
    import s.implicits._
    val rows: Seq[(Long, Array[Byte], Int, String)] = Seq(
      (0L, OdtFixture.odp(Seq(
        (Seq("deck intro", "second line"), Seq("remember the demo")),
        (Seq("closing"), Seq.empty))),
        4, "deck intro\nsecond line\nremember the demo\nclosing"),
      // an empty deck is a valid empty text document
      (1L, OdtFixture.odp(Seq.empty), 0, ""),
      (2L, OdtFixture.odp(Seq((Seq("no mimetype"), Seq.empty)),
        mimetype = None),
        1, "no mimetype"),
      (3L, "not a zip".getBytes("UTF-8"), -1, "<undecodable>"))
    s.createDataset(rows).toDF("doc_id", "content", "exp_paras", "exp_text")
      .coalesce(1).write.mode("overwrite").parquet(m55Dir)
  }

  // -- m56 fixture: declared TITLES across every format that carries
  //    one — OLEPS SummaryInformation (independent writer), OPC
  //    core.xml, ODF meta.xml, EPUB OPF, PDF Info, RTF info group,
  //    html <title>, mail Subject (RFC 2047), latex \title — plus
  //    title-less and junk rows.
  private val m56Dir = "/tmp/graft_gate_m56_titles"

  private def writeM56Fixture(s: SparkSession): Unit = {
    import s.implicits._
    val rows: Seq[(Long, Array[Byte], String)] = Seq(
      (0L, DocxFixture.docx(Seq(DocxFixture.para(DocxFixture.T("x"))),
        coreTitle = Some("Quarterly Report")), "Quarterly Report"),
      (1L, OdtFixture.odt(Seq(OdtFixture.para(OdtFixture.T("x"))),
        metaTitle = Some("Meeting Notes")), "Meeting Notes"),
      (2L, EpubFixture.epub("The Book Title", Seq(
        "c.xhtml" -> EpubFixture.xhtml("x"))), "The Book Title"),
      (3L, PdfFixture.titledPdf("A PDF Title", Seq("BT (x) Tj ET")),
        "A PDF Title"),
      (4L, LegacyDocFixture.cfb(Seq(
        "WordDocument" -> "stub".getBytes,
        "\u0005SummaryInformation" ->
          LegacyDocFixture.summaryInfo("Legacy café Title"))),
        "Legacy café Title"),
      (5L, LegacyDocFixture.cfb(Seq(
        "PowerPoint Document" -> "stub".getBytes,
        "\u0005SummaryInformation" ->
          LegacyDocFixture.summaryInfo("Wide καλημέρα", wide = true))),
        "Wide καλημέρα"),
      (6L, "{\\rtf1{\\info{\\title The RTF Title}}body\\par}"
        .getBytes("ISO-8859-1"), "The RTF Title"),
      (7L, ("<html><head><title>Page &amp; Title</title></head>" +
        "<body>x</body></html>").getBytes("UTF-8"), "Page & Title"),
      (8L, ("From: a@b.c\r\nTo: l@b.c\r\n" +
        "Subject: =?UTF-8?B?Sm9zw6k=?= speaks\r\n\r\nbody")
        .getBytes("UTF-8"), "José speaks"),
      (9L, ("\\documentclass{article}\\title{The \\emph{Tex} Title}" +
        "\\begin{document}x\\end{document}").getBytes("UTF-8"),
        "The Tex Title"),
      // title-less document and binary junk: NULL
      (10L, DocxFixture.docx(Seq(DocxFixture.para(DocxFixture.T("x")))),
        "<none>"),
      (11L, Array[Byte](0, 1, 2, 3, 4), "<none>"))
    s.createDataset(rows).toDF("doc_id", "content", "exp_title")
      .coalesce(1).write.mode("overwrite").parquet(m56Dir)
  }

  // -- m57 fixture: ONE document arriving through FOUR transports —
  //    a tar member (rtf), a zip member (html), an mbox message body
  //    and a standalone scanned file (txt) — plus one genuinely
  //    distinct scanned docx. The r14 surface composes: sources →
  //    document layer → exact dedup across CONTAINERS.
  private val m57Dir = "/tmp/graft_gate_m57_crossmodal"
  private val m57Text = "the same corpus document crossing containers"
  private val m57Other = "a genuinely different document that stays"

  private def writeM57Fixture(): Unit = {
    import org.apache.commons.compress.archivers.tar.{TarArchiveEntry, TarArchiveOutputStream}
    val dir = java.nio.file.Paths.get(m57Dir)
    java.nio.file.Files.createDirectories(dir)
    Seq("tar", "zip", "mbox", "files").foreach(sub =>
      java.nio.file.Files.createDirectories(dir.resolve(sub)))
    // tar: the document as RTF
    val bos = new java.io.ByteArrayOutputStream()
    val t = new TarArchiveOutputStream(bos)
    val rtf = s"{\\rtf1 $m57Text\\par}".getBytes("ISO-8859-1")
    val e = new TarArchiveEntry("doc.rtf")
    e.setSize(rtf.length.toLong); e.setModTime(0L)
    t.putArchiveEntry(e); t.write(rtf); t.closeArchiveEntry(); t.close()
    java.nio.file.Files.write(dir.resolve("tar/corpus.tar"), bos.toByteArray)
    // zip: the document as HTML
    java.nio.file.Files.write(dir.resolve("zip/release.zip"),
      EpubFixture.zip(Seq("page.html" ->
        s"<html><body><p>$m57Text</p></body></html>".getBytes("UTF-8"))))
    // mbox: the document as a message body
    java.nio.file.Files.write(dir.resolve("mbox/list.mbox"),
      ("From poster Mon Apr  1 10:00:00 2024\n" +
        "From: poster@example.org\nSubject: repost\nMessage-ID: <m1>\n\n" +
        m57Text + "\n").getBytes("UTF-8"))
    // standalone files: the document as plain text + the distinct docx
    java.nio.file.Files.write(dir.resolve("files/copy.txt"),
      m57Text.getBytes("UTF-8"))
    java.nio.file.Files.write(dir.resolve("files/other.docx"),
      DocxFixture.docx(Seq(DocxFixture.para(DocxFixture.T(m57Other)))))
    ()
  }

  // -- m59 fixture: the standard-security-handler classes — owner-
  //    locked PDFs with a BLANK user password (RC4-128 and AESV2,
  //    encrypted by the fixture's OWN algorithm-3.x implementation)
  //    must open; a real user password and the O/U-less stub must
  //    stay refused.
  private val m59Dir = "/tmp/graft_gate_m59_pdfcrypt"

  private def writeM59Fixture(s: SparkSession): Unit = {
    import s.implicits._
    val rows: Seq[(Long, Array[Byte], String, String, Boolean)] = Seq(
      (0L, PdfFixture.stdEncryptedPdf(
        "the rc4 body opens", "RC4 Report"),
        "the rc4 body opens", "RC4 Report", false),
      (1L, PdfFixture.stdEncryptedPdf(
        "the aes body opens", "AES Report", aes = true),
        "the aes body opens", "AES Report", false),
      (2L, PdfFixture.stdEncryptedPdf(
        "locked body", "Locked", userPw = "secret"),
        "<refused>", "<none>", true),
      (3L, PdfFixture.encryptedPdf("legacy stub"),
        "<refused>", "<none>", true),
      // AES-256: R6 (ISO 32000-2) and the legacy R5, plus a locked R6
      (4L, PdfFixture.stdEncryptedPdfV5(
        "the aes256 body opens", "R6 Report"),
        "the aes256 body opens", "R6 Report", false),
      (5L, PdfFixture.stdEncryptedPdfV5(
        "the legacy r5 body opens", "R5 Report", r = 5),
        "the legacy r5 body opens", "R5 Report", false),
      (6L, PdfFixture.stdEncryptedPdfV5(
        "locked body", "Locked", userPw = "pw"),
        "<refused>", "<none>", true),
      // r16: XMP-only metadata (no Info dict) — the modern-writer
      // shape surfaces through the same title path
      (7L, PdfFixture.xmpPdf(
        PdfFixture.xmpPacket("XMP Report", "XMP Author",
          "2021-03-04T05:06:07Z"),
        Seq("BT /F1 12 Tf (the xmp body reads) Tj ET")),
        "the xmp body reads", "XMP Report", false))
    s.createDataset(rows).toDF("doc_id", "content", "exp_text",
        "exp_title", "exp_encrypted")
      .coalesce(1).write.mode("overwrite").parquet(m59Dir)
  }

  // -- m68 fixture: Jupyter notebooks — hand-authored nbformat JSON
  //    (text format: the strings ARE the independent fixture); the
  //    authored cells extract, outputs drop, configs stay txt.
  private val m68Dir = "/tmp/graft_gate_m68_ipynb"

  private def writeM68Fixture(s: SparkSession): Unit = {
    import s.implicits._
    val v4 =
      """{"nbformat": 4, "metadata": {}, "cells": [
        | {"cell_type": "markdown", "source": ["# Intro\n", "prose\n"]},
        | {"cell_type": "code", "source": "x = 1\n",
        |  "outputs": [{"output_type": "stream", "text": ["DROPPED"]}]},
        | {"cell_type": "raw", "source": ["raw tail"]}
        |]}""".stripMargin
    val v3 =
      """{"nbformat": 3, "worksheets": [{"cells": [
        | {"cell_type": "markdown", "source": ["legacy prose"]},
        | {"cell_type": "code", "input": ["print(1)"]}
        |]}]}""".stripMargin
    val config = """{"nbformat": "doc", "cells": "none", "k": 1}"""
    val rows: Seq[(Long, Array[Byte], String, Int, String)] = Seq(
      (0L, v4.getBytes("UTF-8"), "ipynb", 3,
        "# Intro\nprose\n\nx = 1\n\nraw tail"),
      (1L, v3.getBytes("UTF-8"), "ipynb", 2,
        "legacy prose\n\nprint(1)"),
      (2L, config.getBytes("UTF-8"), "txt", -1, config),
      (3L, Array[Byte](0, 1, 2, 3, 4), "<unknown>", -1, "<undecodable>"))
    s.createDataset(rows).toDF("doc_id", "content", "exp_format",
        "exp_cells", "exp_text")
      .coalesce(1).write.mode("overwrite").parquet(m68Dir)
  }

  // -- m69 fixture: PDF embedded images — image XObjects from the
  //    INDEPENDENT PdfFixture writer carrying the SAME ramp pixels
  //    as the bare PNG row (and as m63's TIFF rows), so a scanned
  //    PDF's pages dedup against their PNG/JPEG/TIFF twins through
  //    the one ImageDecode front door; recorded-skip codecs and
  //    locked documents extract nothing. ---------------------------
  private val m69Dir = "/tmp/graft_gate_m69_pdfimg"

  private def writeM69Fixture(s: SparkSession): Unit = {
    import s.implicits._
    def dhashOfRows(v: Int => Int): Long = {
      var hash = 0L
      for (_ <- 0 until 8; j <- 0 until 8)
        hash = (hash << 1) | (if (v(j) < v(j + 1)) 1L else 0L)
      hash
    }
    val rampDhash = dhashOfRows(x => 10 * x)
    val rgbSamples = Array.tabulate(9 * 8 * 3) { i =>
      (10 * ((i / 3) % 9)).toByte
    }
    val graySamples = Array.tabulate(9 * 8) { i => (10 * (i % 9)).toByte }
    val rampPixels = Array.tabulate(9 * 8) { i =>
      val g = 10 * (i % 9); 0xff000000 | (g << 16) | (g << 8) | g
    }
    // flat 16x16 gray JPEG via the JDK writer (the m63 lzwTiff-style
    // triangulation): flat survives lossy DCT as flat -> dhash 0, and
    // the DCT pass-through is proven bit-identical in PdfSpec
    val flatJpeg = {
      val img = new java.awt.image.BufferedImage(16, 16,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 16; x <- 0 until 16) img.setRGB(x, y, 0x4D4D4D)
      val bos = new java.io.ByteArrayOutputStream()
      require(javax.imageio.ImageIO.write(img, "jpg", bos), "no jpg writer")
      bos.toByteArray
    }
    val rgbPdf = PdfFixture.imagePdf(Seq(("Im0",
      "/Type /XObject /Subtype /Image /Width 9 /Height 8" +
        " /ColorSpace /DeviceRGB /BitsPerComponent 8 /Filter /FlateDecode",
      PdfFixture.flate(rgbSamples))), pageText = Some("scanned page"))
    val grayPdf = PdfFixture.imagePdf(Seq(("Im0",
      "/Type /XObject /Subtype /Image /Width 9 /Height 8" +
        " /ColorSpace /DeviceGray /BitsPerComponent 8 /Filter /FlateDecode",
      PdfFixture.flate(graySamples))))
    val palette = new String(
      Array.tabulate(27)(i => (10 * (i / 3)).toChar))
    val idxPdf = PdfFixture.imagePdf(Seq(("Im0",
      "/Type /XObject /Subtype /Image /Width 9 /Height 8" +
        s" /ColorSpace [/Indexed /DeviceRGB 8 ${PdfFixture.lit(palette)}]" +
        " /BitsPerComponent 8 /Filter /FlateDecode",
      PdfFixture.flate(Array.tabulate[Byte](9 * 8)(i => (i % 9).toByte)))))
    val dctPdf = PdfFixture.imagePdf(Seq(("Im0",
      "/Type /XObject /Subtype /Image /Width 16 /Height 16" +
        " /ColorSpace /DeviceRGB /BitsPerComponent 8 /Filter /DCTDecode",
      flatJpeg)))
    val ccittPdf = PdfFixture.imagePdf(Seq(("Fax",
      "/Type /XObject /Subtype /Image /Width 9 /Height 8" +
        " /ColorSpace /DeviceGray /BitsPerComponent 1" +
        " /Filter /CCITTFaxDecode",
      Array[Byte](0, 0, 0))))
    // G4 fax triplet: the SAME alternating-column bilevel pixels as a
    // CCITTFaxDecode PDF page, a G4 TIFF and a bare PNG — the
    // scanned-fax class's cross-format dedup proof. The G4 payload
    // comes from the JDK's own T.6 ENCODER (independent of the house
    // decoder); the strip bytes are lifted by a local IFD walk.
    val binPattern: (Int, Int) => Boolean = (x, _) => x % 2 == 1
    val binDhash = dhashOfRows(x => if (binPattern(x, 0)) 0 else 255)
    val g4Tiff = {
      val img = new java.awt.image.BufferedImage(9, 8,
        java.awt.image.BufferedImage.TYPE_BYTE_BINARY)
      for (y <- 0 until 8; x <- 0 until 9)
        img.setRGB(x, y, if (binPattern(x, y)) 0x000000 else 0xFFFFFF)
      val it = javax.imageio.ImageIO.getImageWritersByFormatName("tiff")
      val w = it.next()
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      w.setOutput(ios)
      val p = w.getDefaultWriteParam
      p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      p.setCompressionType("CCITT T.6")
      w.write(null, new javax.imageio.IIOImage(img, null, null), p)
      ios.close(); w.dispose()
      bos.toByteArray
    }
    val g4Strip: Array[Byte] = {
      val b = g4Tiff
      val le = b(0) == 'I'
      def u16(o: Int) =
        if (le) (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
        else ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
      def u32(o: Int): Int =
        if (le) (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
          ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
        else ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) |
          ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)
      val ifd = u32(4)
      val n = u16(ifd)
      var off = -1; var cnt = -1
      for (i <- 0 until n) {
        val e = ifd + 2 + i * 12
        val tag = u16(e); val typ = u16(e + 2)
        def v = if (typ == 3) u16(e + 8) else u32(e + 8)
        if (tag == 273) off = v
        if (tag == 279) cnt = v
      }
      require(off > 0 && cnt > 0, "no strip in JDK G4 TIFF")
      java.util.Arrays.copyOfRange(b, off, off + cnt)
    }
    val g4Pdf = PdfFixture.imagePdf(Seq(("Fax0",
      "/Type /XObject /Subtype /Image /Width 9 /Height 8" +
        " /ColorSpace /DeviceGray /BitsPerComponent 1" +
        " /Filter /CCITTFaxDecode" +
        " /DecodeParms << /K -1 /Columns 9 /Rows 8 >>",
      g4Strip)))
    val binPng = pngOf(9, 8, Array.tabulate(9 * 8) { i =>
      if (binPattern(i % 9, i / 9)) 0xff000000 else 0xffffffff
    })
    val lockedPdf = PdfFixture.stdEncryptedPdfV5("hidden", "T",
      userPw = "pw")
    // the INLINE (BI/ID/EI) form of the same ramp — the scanned-PDF
    // writers' other image spelling, same dhash literal
    val inlinePdf = PdfFixture.rawContentPdf(
      "BI /W 9 /H 8 /CS /G /BPC 8 ID ".getBytes("US-ASCII") ++
        graySamples ++ "\nEI".getBytes("US-ASCII"))
    val rows: Seq[(Long, Array[Byte], Int, String, Int, Int, Long)] = Seq(
      (0L, rgbPdf, 1, "png", 9, 8, rampDhash),
      (1L, grayPdf, 1, "png", 9, 8, rampDhash),
      (2L, idxPdf, 1, "png", 9, 8, rampDhash),
      (3L, dctPdf, 1, "jpeg", 16, 16, 0L),
      (4L, pngOf(9, 8, rampPixels), 0, "bare", 9, 8, rampDhash),
      // hostile CCITT: junk fax bits + default Columns (1728 ≠ 9)
      // must skip the image, never the document
      (5L, ccittPdf, 0, "none", -1, -1, -999L),
      (6L, lockedPdf, 0, "none", -1, -1, -999L),
      (7L, inlinePdf, 1, "png", 9, 8, rampDhash),
      // the scanned-fax class: G4 PDF page, G4 TIFF and bare PNG all
      // carry the SAME dhash literal (r17, from-spec T.6 decoder)
      (8L, g4Pdf, 1, "png", 9, 8, binDhash),
      (9L, g4Tiff, 0, "bare", 9, 8, binDhash),
      (10L, binPng, 0, "bare", 9, 8, binDhash))
    s.createDataset(rows).toDF("doc_id", "content", "exp_n",
        "exp_format", "exp_w", "exp_h", "exp_dhash")
      .coalesce(1).write.mode("overwrite").parquet(m69Dir)
  }

  // -- m75 fixture: image cross-transport dedup — the SAME ramp
  //    pixels shipped five ways (bare PNG, bare TIFF, PDF XObject,
  //    PDF inline, ICO favicon) plus one genuinely different image;
  //    the ONE dhash keyspace (image_dhash ∪ pdf_image_dhashes)
  //    must converge them to exactly two groups. -------------------
  private val m75Dir = "/tmp/graft_gate_m75_imgtransport"

  private def writeM75Fixture(s: SparkSession): Unit = {
    import s.implicits._
    val ramp: Int => Int = i => 10 * (i % 9)
    val rampPixels = Array.tabulate(9 * 8) { i =>
      val g = ramp(i); 0xff000000 | (g << 16) | (g << 8) | g
    }
    val graySamples = Array.tabulate(9 * 8) { i => (10 * (i % 9)).toByte }
    val xobjPdf = PdfFixture.imagePdf(Seq(("Im0",
      "/Type /XObject /Subtype /Image /Width 9 /Height 8" +
        " /ColorSpace /DeviceGray /BitsPerComponent 8 /Filter /FlateDecode",
      PdfFixture.flate(graySamples))))
    val inlinePdf = PdfFixture.rawContentPdf(
      "BI /W 9 /H 8 /CS /G /BPC 8 ID ".getBytes("US-ASCII") ++
        graySamples ++ "\nEI".getBytes("US-ASCII"))
    val icoBytes = {
      val img = new java.awt.image.BufferedImage(9, 8,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      img.setRGB(0, 0, 9, 8, rampPixels, 0, 9)
      val bos = new java.io.ByteArrayOutputStream()
      require(javax.imageio.ImageIO.write(img, "bmp", bos), "no bmp")
      IcoFixture.ico(Seq((9, 8, IcoFixture.dibOf(bos.toByteArray))))
    }
    val flat = {
      val img = new java.awt.image.BufferedImage(9, 8,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 8; x <- 0 until 9) img.setRGB(x, y, 0x303030)
      val bos = new java.io.ByteArrayOutputStream()
      require(javax.imageio.ImageIO.write(img, "png", bos), "no png")
      bos.toByteArray
    }
    val rows: Seq[(Long, Array[Byte], String)] = Seq(
      (0L, pngOf(9, 8, rampPixels), "png"),
      (1L, TiffFixture.rgbTiff(9, 8, ramp), "tiff"),
      (2L, xobjPdf, "pdf-xobject"),
      (3L, inlinePdf, "pdf-inline"),
      (4L, icoBytes, "ico"),
      (5L, flat, "png-flat"))
    s.createDataset(rows).toDF("img_id", "content", "transport")
      .coalesce(1).write.mode("overwrite").parquet(m75Dir)
  }

  // -- m78 fixture: page-level scanned-document dedup — a 2-page
  //    TIFF and a 2-image PDF carrying the SAME page pixels hash
  //    page-by-page to the same sequence; a reversed book would not.
  private val m78Dir = "/tmp/graft_gate_m78_multipage"

  private def writeM78Fixture(s: SparkSession): Unit = {
    import s.implicits._
    val ramp: Int => Int = i => 28 * (i % 9)
    val tiff2 = TiffFixture.multiPageRgbTiff(Seq(
      (9, 8, ramp), (9, 8, (_: Int) => 77)))
    val rampGray = Array.tabulate[Byte](9 * 8)(i => (28 * (i % 9)).toByte)
    val flatGray = Array.fill[Byte](9 * 8)(77)
    val pdf2 = PdfFixture.imagePdf(Seq(
      ("A", "/Type /XObject /Subtype /Image /Width 9 /Height 8" +
        " /ColorSpace /DeviceGray /BitsPerComponent 8 /Filter /FlateDecode",
        PdfFixture.flate(rampGray)),
      ("B", "/Type /XObject /Subtype /Image /Width 9 /Height 8" +
        " /ColorSpace /DeviceGray /BitsPerComponent 8 /Filter /FlateDecode",
        PdfFixture.flate(flatGray))))
    val rampPng = {
      val img = new java.awt.image.BufferedImage(9, 8,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 8; x <- 0 until 9) {
        val g = 28 * x; img.setRGB(x, y, (g << 16) | (g << 8) | g)
      }
      val bos = new java.io.ByteArrayOutputStream()
      require(javax.imageio.ImageIO.write(img, "png", bos), "no png")
      bos.toByteArray
    }
    val rows: Seq[(Long, Array[Byte])] = Seq(
      (0L, tiff2), (1L, pdf2), (2L, rampPng),
      (3L, "no pages at all".getBytes("UTF-8")))
    s.createDataset(rows).toDF("doc_id", "content")
      .coalesce(1).write.mode("overwrite").parquet(m78Dir)
  }

  // -- m79 fixture: document outlinks — a PDF's /URI annotations and
  //    an HTML page's anchors feed ONE frontier edge list. ----------
  private val m79Dir = "/tmp/graft_gate_m79_outlinks"

  private def writeM79Fixture(s: SparkSession): Unit = {
    import s.implicits._
    val html = ("<html><body><a href=\"/a\">rel</a>" +
      "<a href=\"https://other.net/b\">abs</a></body></html>")
      .getBytes("UTF-8")
    val pdf = PdfFixture.linkPdf(Seq(
      "https://refs.example.org/cite1",
      "https://refs.example.org/cite2"))
    val bare = PdfFixture.simplePdf(Seq("BT /F1 12 Tf (quiet) Tj ET"))
    val hl = "http://schemas.openxmlformats.org/officeDocument/2006/" +
      "relationships/hyperlink"
    val docx = EpubFixture.zip(Seq(
      "_rels/.rels" -> ("<Relationships><Relationship Type=\"http://" +
        "schemas.openxmlformats.org/officeDocument/2006/relationships/" +
        "officeDocument\" Target=\"word/document.xml\"/>" +
        "</Relationships>").getBytes,
      "word/document.xml" -> "<document/>".getBytes,
      "word/_rels/document.xml.rels" -> ("<Relationships>" +
        s"""<Relationship Id="r9" Type="$hl" """ +
        "Target=\"https://cited.example.org/spec\" " +
        "TargetMode=\"External\"/></Relationships>").getBytes))
    val odt = EpubFixture.zip(Seq(
      "mimetype" -> "application/vnd.oasis.opendocument.text".getBytes,
      "content.xml" -> ("""<office:document-content
        | xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0"
        | xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0"
        | xmlns:xlink="http://www.w3.org/1999/xlink">
        |<office:body><office:text><text:p>
        |<text:a xlink:href="https://odf.example.net/ref">r</text:a>
        |</text:p></office:text></office:body>
        |</office:document-content>""".stripMargin).getBytes("UTF-8")))
    val rows: Seq[(Long, String, String, Array[Byte])] = Seq(
      (0L, "https://site.org/page", "html", html),
      (1L, "https://site.org/paper.pdf", "pdf", pdf),
      (2L, "https://site.org/quiet.pdf", "pdf", bare),
      (3L, "https://site.org/memo.docx", "doc", docx),
      (4L, "https://site.org/notes.odt", "doc", odt))
    s.createDataset(rows).toDF("doc_id", "src_url", "kind", "content")
      .coalesce(1).write.mode("overwrite").parquet(m79Dir)
  }

  // -- m67 fixture: BINARY Excel (.xlsb) from the INDEPENDENT
  //    record-level writer — the Office matrix's last member. All
  //    string-bearing cell records, workbook-order rels routing,
  //    rich-run skipping, the no-SST numbers-only class and junk.
  private val m67Dir = "/tmp/graft_gate_m67_xlsb"

  private def writeM67Fixture(s: SparkSession): Unit = {
    import s.implicits._
    val rows: Seq[(Long, Array[Byte], String, Int, String)] = Seq(
      (0L, XlsbFixture.xlsb1(Seq(
        XlsbFixture.rowHdr(0),
        XlsbFixture.cellIsst(0, 0),
        XlsbFixture.cellReal(1, 42.5),
        XlsbFixture.cellSt(2, "inline cell"),
        XlsbFixture.fmlaString(3, "formula value"),
        XlsbFixture.cellIsst(4, 1)),
        sharedStrings = Some(Seq(
          XlsbFixture.sstItem("alpha"),
          XlsbFixture.sstItem("beta", richRuns = 2)))),
        "xlsb", 4, "alpha\ninline cell\nformula value\nbeta"),
      (1L, XlsbFixture.xlsb(Seq(
        ("rId2", "Second", Seq(XlsbFixture.cellSt(0, "second sheet"))),
        ("rId1", "First", Seq(XlsbFixture.cellSt(0, "first sheet")))),
        sharedStrings = None, scrambleNames = true),
        "xlsb", 2, "second sheet\nfirst sheet"),
      (2L, XlsbFixture.xlsb1(Seq(
        XlsbFixture.cellReal(0, 1.5), XlsbFixture.cellReal(1, 2.5)),
        sharedStrings = None),
        "xlsb", 0, ""),
      (3L, Array[Byte](0, 1, 2, 3, 0x7F),
        "<unknown>", -1, "<undecodable>"))
    s.createDataset(rows).toDF("doc_id", "content", "exp_format",
        "exp_cells", "exp_text")
      .coalesce(1).write.mode("overwrite").parquet(m67Dir)
  }

  // -- m66 fixture: mail ATTACHMENTS — the PDF on the list message
  //    must join the same text layer as the PDF crawled from the
  //    web. One mbox, three messages: base64 pdf + an unnamed blob,
  //    a docx, and a no-attachment control. Hand-derived literals.
  private val m66Dir = "/tmp/graft_gate_m66_attachments"

  private def writeM66Fixture(): Unit = {
    def b64(b: Array[Byte]): String =
      java.util.Base64.getMimeEncoder(72, "\n".getBytes)
        .encodeToString(b)
    val pdf = PdfFixture.simplePdf(Seq(
      "BT /F1 12 Tf (attached pdf text) Tj ET"))
    val docx = DocxFixture.docx(Seq(
      DocxFixture.para(DocxFixture.T("attached docx text"))))
    val mbox =
      "From alice Mon Apr  1 10:00:00 2024\n" +
        "From: alice@example.org\nSubject: report\nMessage-ID: <a1>\n" +
        "Content-Type: multipart/mixed; boundary=AA\n\n" +
        "--AA\nContent-Type: text/plain\n\ncover one\n" +
        "--AA\nContent-Type: application/pdf; name=\"x.pdf\"\n" +
        "Content-Disposition: attachment; filename=\"q3.pdf\"\n" +
        "Content-Transfer-Encoding: base64\n\n" + b64(pdf) + "\n" +
        "--AA\nContent-Type: application/octet-stream\n" +
        "Content-Transfer-Encoding: base64\n\nAAECAw==\n--AA--\n\n" +
        "From bob Tue Apr  2 11:00:00 2024\n" +
        "From: bob@example.org\nSubject: doc\nMessage-ID: <b2>\n" +
        "Content-Type: multipart/mixed; boundary=BB\n\n" +
        "--BB\nContent-Type: text/plain\n\ncover two\n" +
        "--BB\nContent-Type: application/vnd.openxmlformats-" +
        "officedocument.wordprocessingml.document; name=\"d.docx\"\n" +
        "Content-Transfer-Encoding: base64\n\n" + b64(docx) +
        "\n--BB--\n\n" +
        "From carol Wed Apr  3 12:00:00 2024\n" +
        "From: carol@example.org\nSubject: plain\nMessage-ID: <c3>\n\n" +
        "nothing attached.\n"
    val dir = java.nio.file.Paths.get(m66Dir)
    java.nio.file.Files.createDirectories(dir)
    java.nio.file.Files.write(dir.resolve("list.mbox"),
      mbox.getBytes("UTF-8"))
    ()
  }

  // -- m71 fixture: archive-from-column loop closure — the
  //    zip-of-PDFs attached to a list message (and a tar.gz sibling)
  //    whose members re-probe through the ONE inventory dispatch;
  //    member archives refuse at depth 1; writers are third parties
  //    (JDK ZipOutputStream, commons-compress tar + JDK gzip). ------
  private val m71Dir = "/tmp/graft_gate_m71_arcmembers"

  private def writeM71Fixture(): Unit = {
    def b64(b: Array[Byte]): String =
      java.util.Base64.getMimeEncoder(72, "\n".getBytes)
        .encodeToString(b)
    val sharedPdf = PdfFixture.simplePdf(Seq(
      "BT /F1 12 Tf (shared body text) Tj ET"))
    val alphaPdf = PdfFixture.simplePdf(Seq(
      "BT /F1 12 Tf (alpha report body) Tj ET"))
    val nested = EpubFixture.zip(Seq(
      "inner.txt" -> "hidden one level too deep".getBytes("UTF-8")))
    val bundle = EpubFixture.zip(Seq(
      "a.pdf" -> alphaPdf,
      "b.pdf" -> sharedPdf,
      "notes.txt" -> "plain zip notes".getBytes("UTF-8"),
      "nested.zip" -> nested))
    val tarGz = {
      import org.apache.commons.compress.archivers.tar.{TarArchiveEntry, TarArchiveOutputStream}
      val bos = new java.io.ByteArrayOutputStream()
      val gz = new java.util.zip.GZIPOutputStream(bos)
      val t = new TarArchiveOutputStream(gz)
      val e = new TarArchiveEntry("x/log.txt")
      val data = "tar member log".getBytes("UTF-8")
      e.setSize(data.length.toLong); e.setModTime(0L)
      t.putArchiveEntry(e); t.write(data); t.closeArchiveEntry()
      t.close()
      bos.toByteArray
    }
    val mbox =
      "From pat Mon Apr  1 10:00:00 2024\n" +
        "From: pat@example.org\nSubject: solo\nMessage-ID: <p2>\n" +
        "Content-Type: multipart/mixed; boundary=PP\n\n" +
        "--PP\nContent-Type: text/plain\n\nbare attachment\n" +
        "--PP\nContent-Type: application/pdf; name=\"solo.pdf\"\n" +
        "Content-Transfer-Encoding: base64\n\n" + b64(sharedPdf) +
        "\n--PP--\n\n" +
        "From tia Tue Apr  2 11:00:00 2024\n" +
        "From: tia@example.org\nSubject: tarball\nMessage-ID: <t3>\n" +
        "Content-Type: multipart/mixed; boundary=TT\n\n" +
        "--TT\nContent-Type: text/plain\n\ncompressed tar\n" +
        "--TT\nContent-Type: application/gzip; name=\"data.tar.gz\"\n" +
        "Content-Transfer-Encoding: base64\n\n" + b64(tarGz) +
        "\n--TT--\n\n" +
        "From zoe Wed Apr  3 12:00:00 2024\n" +
        "From: zoe@example.org\nSubject: bundle\nMessage-ID: <z1>\n" +
        "Content-Type: multipart/mixed; boundary=ZZ\n\n" +
        "--ZZ\nContent-Type: text/plain\n\nzip of pdfs\n" +
        "--ZZ\nContent-Type: application/zip; name=\"bundle.zip\"\n" +
        "Content-Transfer-Encoding: base64\n\n" + b64(bundle) +
        "\n--ZZ--\n"
    val dir = java.nio.file.Paths.get(m71Dir)
    java.nio.file.Files.createDirectories(dir)
    java.nio.file.Files.write(dir.resolve("list.mbox"),
      mbox.getBytes("UTF-8"))
    ()
  }

  // -- m65 fixture: compressed single documents — the crawl column's
  //    `.txt.gz`/`.html.zst`/`.rtf.bz2`/`.eml.xz` blobs must route
  //    exactly like their plain twins (inner format reported, the
  //    encrypted-OOXML precedent); nesting bombs and collisions stay
  //    safe. Expectations ride the fixture.
  private val m65Dir = "/tmp/graft_gate_m65_compressed"

  private def writeM65Fixture(s: SparkSession): Unit = {
    import s.implicits._
    def gz(b: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos); g.write(b); g.close()
      bos.toByteArray
    }
    def zst(b: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val z = new com.github.luben.zstd.ZstdOutputStream(bos)
      z.write(b); z.close(); bos.toByteArray
    }
    def bz2(b: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val z = new org.apache.commons.compress.compressors.bzip2
        .BZip2CompressorOutputStream(bos)
      z.write(b); z.close(); bos.toByteArray
    }
    def xz(b: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val x = new org.tukaani.xz.XZOutputStream(bos,
        new org.tukaani.xz.LZMA2Options())
      x.write(b); x.close(); bos.toByteArray
    }
    val t = "route through the codec"
    val rows: Seq[(Long, Array[Byte], String, String)] = Seq(
      (0L, gz(t.getBytes("UTF-8")), "txt", t),
      (1L, zst((s"<html><body><p>$t</p></body></html>").getBytes("UTF-8")),
        "html", t),
      (2L, bz2(s"{\\rtf1 $t\\par}".getBytes("ISO-8859-1")), "rtf", t),
      (3L, xz((s"From: a@b.c\r\nTo: l@b.c\r\nSubject: s\r\n\r\n$t")
        .getBytes("UTF-8")), "eml", t),
      // an OPC container compressed as a blob (docx.gz)
      (4L, gz(DocxFixture.docx(Seq(DocxFixture.para(DocxFixture.T(t))))),
        "docx", t),
      // double wrap unwraps; a 4-layer nest refuses
      (5L, gz(zst(t.getBytes("UTF-8"))), "txt", t),
      (6L, gz(gz(gz(gz(t.getBytes("UTF-8"))))),
        "<unknown>", "<undecodable>"),
      // the collision class: TEXT that merely starts with the magic
      (7L, "BZh9 looks like bzip2 but is prose".getBytes("UTF-8"),
        "txt", "BZh9 looks like bzip2 but is prose"),
      (8L, {
        val bos = new java.io.ByteArrayOutputStream()
        val l = new org.apache.commons.compress.compressors.lz4
          .FramedLZ4CompressorOutputStream(bos)
        l.write(t.getBytes("UTF-8")); l.close(); bos.toByteArray
      }, "txt", t),
      // framed snappy (r16) — the .sz blob routes like its twin
      (9L, {
        val bos = new java.io.ByteArrayOutputStream()
        val z = new org.xerial.snappy.SnappyFramedOutputStream(bos)
        z.write(t.getBytes("UTF-8")); z.close(); bos.toByteArray
      }, "txt", t))
    s.createDataset(rows)
      .toDF("doc_id", "content", "exp_format", "exp_text")
      .coalesce(1).write.mode("overwrite").parquet(m65Dir)
  }

  // -- m63 fixture: baseline TIFF — the scanner class. Pixels reuse
  //    the m33 closed forms (ramp v = 10·x on a 9×8 grid, written
  //    RGB — the JDK's gray color model is linear-light and getRGB
  //    would gamma-shift the values:
  //    dhash all-ones, mean 40, Σv² = 163200, interior Laplacian 0)
  //    so every expectation is hand-derivable; the PNG row pins the
  //    cross-format dedup claim (identical pixels → identical hash)
  //    and the JDK-LZW row triangulates the third compression.
  private val m63Dir = "/tmp/graft_gate_m63_tiff"

  private def writeM63Fixture(s: SparkSession): Unit = {
    import s.implicits._
    val ramp: Int => Int = i => 10 * (i % 9)
    def dhashOfRows(v: Int => Int): Long = {
      var hash = 0L
      for (_ <- 0 until 8; j <- 0 until 8)
        hash = (hash << 1) | (if (v(j) < v(j + 1)) 1L else 0L)
      hash
    }
    val rampStd = math.sqrt(163200.0 / 72 - 40.0 * 40.0)
    val rampPixels = Array.tabulate(9 * 8) { i =>
      val g = ramp(i); 0xff000000 | (g << 16) | (g << 8) | g
    }
    val lzwTiff = {
      // JDK ImageIO TIFF writer with LZW — the m33 PNG-row style
      // triangulation for the compression this fixture doesn't
      // hand-roll. INT_RGB, not BYTE_GRAY: the gray color model is
      // linear-light and its setRGB round-trip can land off by one,
      // which would break the closed-form expectations
      val img = new java.awt.image.BufferedImage(9, 8,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 8; x <- 0 until 9) {
        val g = 10 * x
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
      }
      val bos = new java.io.ByteArrayOutputStream()
      val w = javax.imageio.ImageIO.getImageWritersByFormatName("tiff").next()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      w.setOutput(ios)
      val p = w.getDefaultWriteParam
      p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      p.setCompressionType("LZW")
      w.write(null, new javax.imageio.IIOImage(img, null, null), p)
      w.dispose(); ios.close()
      bos.toByteArray
    }
    val torn = java.util.Arrays.copyOfRange(
      TiffFixture.rgbTiff(9, 8, ramp), 0, 12)
    val rows: Seq[(Long, Array[Byte], String, Int, Int, Long,
        Double, Double, Double)] = Seq(
      (0L, TiffFixture.rgbTiff(9, 8, ramp),
        "TIFF", 9, 8, dhashOfRows(x => 10 * x), 40.0, rampStd, 0.0),
      (1L, TiffFixture.rgbTiff(9, 8, ramp, bigEndian = true),
        "TIFF", 9, 8, dhashOfRows(x => 10 * x), 40.0, rampStd, 0.0),
      (2L, TiffFixture.rgbTiff(9, 8, ramp, packBits = true),
        "TIFF", 9, 8, dhashOfRows(x => 10 * x), 40.0, rampStd, 0.0),
      (3L, lzwTiff,
        "TIFF", 9, 8, dhashOfRows(x => 10 * x), 40.0, rampStd, 0.0),
      (4L, pngOf(9, 8, rampPixels),
        "PNG", 9, 8, dhashOfRows(x => 10 * x), 40.0, rampStd, 0.0),
      (5L, TiffFixture.rgbTiff(16, 16, _ => 77),
        "TIFF", 16, 16, 0L, 77.0, 0.0, 0.0),
      (6L, torn,
        "none", -1, -1, -999L, -1.0, -1.0, -1.0))
    s.createDataset(rows).toDF("img_id", "content", "exp_format",
        "exp_w", "exp_h", "exp_dhash", "exp_mean", "exp_std", "exp_lap")
      .coalesce(1).write.mode("overwrite").parquet(m63Dir)
  }

  // -- m62 fixture: default/blank-password Office encryption — the
  //    m59 pattern for the OOXML/BIFF8 side: every payload encrypted
  //    by the fixture's OWN MS-OFFCRYPTO transcription; the
  //    default-password classes open (VelvetSweatshop xls, blank
  //    standard/agile packages), real passwords keep refusing.
  private val m62Dir = "/tmp/graft_gate_m62_offcrypt"

  private def writeM62Fixture(s: SparkSession): Unit = {
    import s.implicits._
    def sheet(text: String): Seq[Array[Byte]] = Seq(
      XlsFixture.sst(Seq(XlsFixture.sstEntry(text)), total = 1),
      XlsFixture.labelSst(0, 0, 0))
    def docx(text: String, title: String): Array[Byte] =
      DocxFixture.docx(Seq(DocxFixture.para(DocxFixture.T(text))),
        coreTitle = Some(title))
    val rows: Seq[(Long, Array[Byte], String, String, String, Boolean)] = Seq(
      (0L, OffCryptFixture.rc4Xls(sheet("velvet rc4 cells"),
        "VelvetSweatshop"),
        "xls", "velvet rc4 cells", "<none>", false),
      (1L, OffCryptFixture.cryptoApiXls(sheet("velvet cryptoapi cells"),
        "VelvetSweatshop"),
        "xls", "velvet cryptoapi cells", "<none>", false),
      (2L, OffCryptFixture.rc4Xls(sheet("locked cells"), "realpassword"),
        "xls", "<refused>", "<none>", true),
      (3L, OffCryptFixture.stdEncryptedOoxml(
        docx("standard body opens", "Standard Report"), ""),
        "docx", "standard body opens", "Standard Report", false),
      (4L, OffCryptFixture.stdEncryptedOoxml(
        docx("velvet ooxml body opens", "Velvet Report"),
        "VelvetSweatshop"),
        "docx", "velvet ooxml body opens", "Velvet Report", false),
      (5L, OffCryptFixture.agileEncryptedOoxml(
        docx("agile body opens", "Agile Report"), ""),
        "docx", "agile body opens", "Agile Report", false),
      (6L, OffCryptFixture.stdEncryptedOoxml(
        docx("locked body", "Locked"), "realpassword"),
        "encrypted-ooxml", "<refused>", "<none>", true),
      (7L, OffCryptFixture.agileEncryptedOoxml(
        docx("locked body", "Locked"), "realpassword"),
        "encrypted-ooxml", "<refused>", "<none>", true))
    s.createDataset(rows).toDF("doc_id", "content", "exp_format",
        "exp_text", "exp_title", "exp_encrypted")
      .coalesce(1).write.mode("overwrite").parquet(m62Dir)
  }

  // -- m60 fixture: declared AUTHORS — the m56 matrix's sibling
  //    (OLEPS PIDSI_AUTHOR, OPC/ODF dc:creator, EPUB OPF creator,
  //    PDF Info /Author, RTF info, html meta author, mail From,
  //    latex \author) plus author-less and junk rows.
  private val m60Dir = "/tmp/graft_gate_m60_authors"

  private def writeM60Fixture(s: SparkSession): Unit = {
    import s.implicits._
    val rows: Seq[(Long, Array[Byte], String)] = Seq(
      // OPC core.xml writes dc:creator "fixture"
      (0L, DocxFixture.docx(Seq(DocxFixture.para(DocxFixture.T("x"))),
        coreTitle = Some("T")), "fixture"),
      // ODF meta.xml writes dc:creator "odf author"
      (1L, OdtFixture.odt(Seq(OdtFixture.para(OdtFixture.T("x"))),
        metaTitle = Some("T")), "odf author"),
      // EPUB OPF writes dc:creator "epub author"
      (2L, EpubFixture.epub("B", Seq(
        "c.xhtml" -> EpubFixture.xhtml("x"))), "epub author"),
      (3L, PdfFixture.titledPdf("T", Seq("BT (x) Tj ET"),
        author = Some("Ada Lovelace")), "Ada Lovelace"),
      (4L, LegacyDocFixture.cfb(Seq(
        "WordDocument" -> "stub".getBytes,
        "\u0005SummaryInformation" -> LegacyDocFixture.summaryInfo(
          "T", author = Some("Clippy's Ghost")))), "Clippy's Ghost"),
      (5L, "{\\rtf1{\\info{\\author The RTF Author}}body\\par}"
        .getBytes("ISO-8859-1"), "The RTF Author"),
      (6L, ("<html><head><meta name=\"author\" content=\"Web Writer\">" +
        "</head><body>x</body></html>").getBytes("UTF-8"), "Web Writer"),
      (7L, ("From: =?UTF-8?B?Sm9zw6k=?= <j@b.c>\r\nTo: l@b.c\r\n\r\nbody")
        .getBytes("UTF-8"), "José <j@b.c>"),
      (8L, ("\\documentclass{article}\\author{A.\\emph{ }Student}" +
        "\\begin{document}x\\end{document}").getBytes("UTF-8"),
        "A. Student"),
      (9L, "plain text, nobody signed it".getBytes("UTF-8"), "<none>"),
      (10L, Array[Byte](0, 1, 2, 3, 4), "<none>"))
    s.createDataset(rows).toDF("doc_id", "content", "exp_author")
      .coalesce(1).write.mode("overwrite").parquet(m60Dir)
  }

  // -- m61 fixture: declared creation DATES — the metadata triple's
  //    third leg (temporal corpus filtering): binary forms normalize
  //    to ISO-8601 (OLEPS VT_FILETIME, PDF D:, RTF creatim), text
  //    declarations pass through as declared.
  private val m61Dir = "/tmp/graft_gate_m61_dates"

  private def writeM61Fixture(s: SparkSession): Unit = {
    import s.implicits._
    val rows: Seq[(Long, Array[Byte], String)] = Seq(
      (0L, DocxFixture.docx(Seq(DocxFixture.para(DocxFixture.T("x"))),
        coreTitle = Some("T")), "2024-05-01T10:00:00Z"),
      (1L, OdtFixture.odt(Seq(OdtFixture.para(OdtFixture.T("x"))),
        metaTitle = Some("T")), "2023-03-03T09:00:00"),
      (2L, EpubFixture.epub("B", Seq(
        "c.xhtml" -> EpubFixture.xhtml("x"))), "2022-02-02"),
      (3L, PdfFixture.titledPdf("T", Seq("BT (x) Tj ET"),
        created = Some("D:20240102030405+00'00'")), "2024-01-02T03:04:05"),
      (4L, LegacyDocFixture.cfb(Seq(
        "WordDocument" -> "stub".getBytes,
        "\u0005SummaryInformation" -> LegacyDocFixture.summaryInfo(
          "T", createdIso = Some("2020-06-01T00:00:00Z")))),
        "2020-06-01T00:00:00Z"),
      (5L, ("{\\rtf1{\\info{\\creatim\\yr2019\\mo7\\dy15\\hr8\\min30}}" +
        "x\\par}").getBytes("ISO-8859-1"), "2019-07-15T08:30:00"),
      (6L, ("<html><head><meta property=\"article:published_time\" " +
        "content=\"2021-09-09T12:00:00+02:00\"></head>" +
        "<body>x</body></html>").getBytes("UTF-8"),
        "2021-09-09T12:00:00+02:00"),
      (7L, ("From: a@b.c\r\nTo: l@b.c\r\n" +
        "Date: Mon, 01 Apr 2024 10:00:00 +0000\r\n\r\nbody")
        .getBytes("UTF-8"), "Mon, 01 Apr 2024 10:00:00 +0000"),
      (8L, ("\\documentclass{x}\\date{January 2024}" +
        "\\begin{document}x\\end{document}").getBytes("UTF-8"),
        "January 2024"),
      (9L, "undated plain text".getBytes("UTF-8"), "<none>"),
      (10L, Array[Byte](0, 1, 2, 3, 4), "<none>"))
    s.createDataset(rows).toDF("doc_id", "content", "exp_date")
      .coalesce(1).write.mode("overwrite").parquet(m61Dir)
  }

  // -- m53 fixture: a ZIP release archive of mixed documents (JDK
  //    ZipOutputStream via EpubFixture.zip — independent of the
  //    reader's ZipInputStream walk): the dataset-release shape.
  private val m53Dir = "/tmp/graft_gate_m53_zip"

  private def writeM53Fixture(): Unit = {
    val bytes = EpubFixture.zip(Seq(
      "notes/readme.txt" -> "zip member plain text".getBytes("UTF-8"),
      "site/index.html" ->
        "<html><body><p>zip member html</p></body></html>".getBytes("UTF-8"),
      "papers/main.rtf" ->
        "{\\rtf1 zip member rtf\\par}".getBytes("ISO-8859-1"),
      "img/blob.bin" -> Array[Byte](0, 1, 2, 3, 4)))
    val dir = java.nio.file.Paths.get(m53Dir)
    java.nio.file.Files.createDirectories(dir)
    java.nio.file.Files.write(dir.resolve("release.zip"), bytes)
    ()
  }

  // -- m86 fixture: a 7z release archive (the tar/zip siblings'
  //    missing third member) written by the FROM-SPEC SevenZFixture
  //    container writer — LZMA2 folders via org.tukaani.xz — and read
  //    back by the commons-compress engine route: two independent
  //    implementations on every row. --------------------------------
  private val m86Dir = "/tmp/graft_gate_m86_sevenz"

  private def writeM86Fixture(): Unit = {
    val docx = DocxFixture.docx(Seq(
      DocxFixture.para(DocxFixture.T("seven zip member docx"))))
    val bytes = SevenZFixture.sevenZ(Seq(
      "notes/readme.txt" -> "seven zip member text".getBytes("UTF-8"),
      "site/index.html" ->
        ("<html><body><p>seven zip member html</p></body></html>")
          .getBytes("UTF-8"),
      "papers/report.docx" -> docx,
      "img/blob.bin" -> Array[Byte](9, 8, 7, 6, 5, 4)),
      lzma2 = true)
    val dir = java.nio.file.Paths.get(m86Dir)
    java.nio.file.Files.createDirectories(dir)
    java.nio.file.Files.write(dir.resolve("release.7z"), bytes)
    ()
  }

  // -- m45 fixture: the adjudicated m26/m35 curation corpus, every
  //    document in a DIFFERENT format — the magic router must feed
  //    the pipeline the identical text layer regardless of container.
  //    r14 rotated four roles onto the NEW routes (xlsx, html, txt,
  //    pptx) — docx/odt/doc/epub keep their coverage in m38/m42 —
  //    so every verdict still carries over verbatim.
  private val m45Dir = "/tmp/graft_gate_m45_mixcur"

  private def writeM45Fixture(s: SparkSession): Unit = {
    import s.implicits._
    def pdf(text: String) =
      PdfFixture.simplePdf(Seq(s"BT /F1 12 Tf ${PdfFixture.lit(text)} Tj ET"))
    val rows: Seq[(Long, Array[Byte])] = Seq(
      (1L, XlsxFixture.xlsx1(
        Seq(XlsxFixture.SRef("A1", 0)),
        sharedStrings = Some(Seq(XlsxFixture.si(m26SurvivorA))))),
      (2L, s"<!DOCTYPE html><html><body><p>$m26SeenText</p></body></html>"
        .getBytes("UTF-8")),
      (3L, ("{\\rtf1 buenas noches amigos hasta manana siempre dijo " +
        "nadie\\par}").getBytes("ISO-8859-1")),
      (4L, "the 1234567890 9876543210 1234567890 to 55555"
        .getBytes("UTF-8")),
      (5L, PptxFixture.pptx(Seq(PptxFixture.Slide(Seq(
        PptxFixture.aPara(m26ProbeText)))))),
      (6L, pdf(m26SurvivorF)),
      (7L, PdfFixture.encryptedPdf("never readable")))
    s.createDataset(rows).toDF("doc_id", "content")
      .coalesce(1).write.mode("overwrite").parquet(m45Dir)
  }

  // -- m46 fixture: a MediaWiki dump hand-authored forward from the
  //    export schema, shipped as SPLITTABLE bz2 (the publication
  //    format — compressed by commons-compress, an independent
  //    third-party implementation, decoded at read time by Hadoop's
  //    own codec).
  private val m46Dir = "/tmp/graft_gate_m46_wikidump"

  private val m46Wikitext =
    "'''Alpha''' is {{short description|a letter}}the first " +
      "[[Greek alphabet|letter]].<ref>cite</ref>\n\n== History ==\n" +
      "It began in [[Phoenicia]]."

  private def writeM46Fixture(s: SparkSession): Unit = {
    val dump =
      s"""<mediawiki xmlns="http://www.mediawiki.org/xml/export-0.11/">
         |  <siteinfo><sitename>Testwiki</sitename></siteinfo>
         |  <page>
         |    <title>Alpha</title>
         |    <ns>0</ns>
         |    <id>1</id>
         |    <revision>
         |      <id>100</id>
         |      <timestamp>2024-01-01T00:00:00Z</timestamp>
         |      <text xml:space="preserve">old text</text>
         |    </revision>
         |    <revision>
         |      <id>101</id>
         |      <timestamp>2024-06-01T00:00:00Z</timestamp>
         |      <text xml:space="preserve">${
        m46Wikitext.replace("&", "&amp;").replace("<", "&lt;")
          .replace(">", "&gt;")}</text>
         |    </revision>
         |  </page>
         |  <page>
         |    <title>Pointer &amp; Co</title>
         |    <ns>0</ns>
         |    <id>2</id>
         |    <redirect title="Alpha" />
         |    <revision>
         |      <id>102</id>
         |      <timestamp>2024-02-02T00:00:00Z</timestamp>
         |      <text>#REDIRECT [[Alpha]]</text>
         |    </revision>
         |  </page>
         |  <page>
         |    <title>Talk:Alpha</title>
         |    <ns>1</ns>
         |    <id>3</id>
         |    <revision>
         |      <id>103</id>
         |      <timestamp>2024-03-03T00:00:00Z</timestamp>
         |      <text />
         |    </revision>
         |  </page>
         |</mediawiki>""".stripMargin
    val dir = java.nio.file.Paths.get(m46Dir)
    java.nio.file.Files.createDirectories(dir)
    val out = new org.apache.commons.compress.compressors.bzip2
      .BZip2CompressorOutputStream(
        java.nio.file.Files.newOutputStream(dir.resolve("dump.xml.bz2")))
    out.write(dump.getBytes("UTF-8")); out.close()
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // -- m46: MediaWiki dump source — lineSep record split + per-row
    //    kernel over the bz2 publication format; field literals are
    //    hand-derived from the fixture dump. ------------------------
    "m46_wiki_pages" -> { (s, _) =>
      writeM46Fixture(s)
      import graft.engine.read.WikiDump
      WikiDump.pages(s, s"$m46Dir/dump.xml.bz2")
        .select(col("page_id"), col("title"), col("ns"),
          coalesce(col("redirect"), lit("<none>")).as("redirect"),
          col("timestamp"),
          graft.ops.Wikitext.textCol(col("wikitext")).as("text"))
        .orderBy("page_id")
    },

    // -- m47: wikitext → plain text — templates/links/refs/headings;
    //    expectations are hand-derived literals. --------------------
    "m47_wikitext_extract" -> { (s, _) =>
      import s.implicits._
      val rows = Seq(
        (0L, "Born {{birth date|1879}} in [[Ulm]]."),
        (1L, "See [[Albert Einstein|Einstein]]<ref>c</ref> and " +
          "[https://example.org the site]."),
        (2L, "== History ==\n* '''bold''' item\n{| table\n|}\nTail."),
        (3L, "A [[File:x.jpg|thumb|a [[nested]] cap]] picture " +
          "[[Category:Things]]end."))
        .toDF("doc_id", "src")
      rows.select(col("doc_id"),
        graft.ops.Wikitext.textCol(col("src")).as("text"))
        .orderBy("doc_id")
    },

    // -- m45: mixed-format corpus → magic-routed text → the full
    //    nine-stage curation pipeline; verdicts are the adjudicated
    //    m26 set, format-blind. --------------------------------------
    "m45_mixed_curation" -> { (s, _) =>
      import s.implicits._
      writeM45Fixture(s)
      import graft.engine.read.DocumentProbe
      val docs = s.read.parquet(m45Dir)
        .select(col("doc_id"),
          DocumentProbe.textCol(col("content")).as("text"))
        .filter(col("text").isNotNull)
        .withColumn("source", lit("mixed"))
      val index = graft.ops.Dedup.buildMinhashIndex(
        Seq((100L, m26SeenText)).toDF("doc_id", "text"), "doc_id", "text")
      val probes = Seq(m26ProbeText).toDF("text")
      val out = graft.ops.CurationPipeline.curate(docs, index, probes,
        "text", graft.ops.CurationPipeline.Config(
          "doc_id", "text", "source", targetMix = Map("mixed" -> 1)))
      out.data.orderBy("doc_id")
    },

    // -- m52: tar archive source → document layer — the arXiv-dump
    //    shape: one binaryFile scan, one kernel explode per archive
    //    (PAX long names, dirs structural; .tar.gz/.tar.zst/.tar.bz2
    //    decompress by magic), members
    //    magic-routed through document_format/document_text.
    //    Hand-derived literals. ---------------------------------------
    "m52_tar_documents" -> { (s, _) =>
      writeM52Fixture()
      import graft.engine.read.{DocumentProbe, Tar}
      Tar.members(s, m52Dir + "/*")
        .withColumn("file", regexp_extract(col("archive"), "([^/]+)$", 1))
        .select(col("file"), col("member"),
          coalesce(DocumentProbe.formatCol(col("content")),
            lit("<unknown>")).as("format"),
          coalesce(DocumentProbe.textCol(col("content")),
            lit("<undecodable>")).as("text"))
        .orderBy("file", "member")
    },

    // -- m61: unified creation DATES — binary forms normalize to
    //    ISO-8601, text declarations pass through; expectations ride
    //    the fixture. ------------------------------------------------
    "m61_document_dates" -> { (s, _) =>
      writeM61Fixture(s)
      import graft.engine.read.DocumentProbe
      s.read.parquet(m61Dir)
        .select(col("doc_id"),
          coalesce(DocumentProbe.dateCol(col("content")),
            lit("<none>")).as("created"))
        .orderBy("doc_id")
    },

    // -- m60: unified document AUTHORS — the m56 matrix's sibling;
    //    expectations ride the fixture. ------------------------------
    "m60_document_authors" -> { (s, _) =>
      writeM60Fixture(s)
      import graft.engine.read.DocumentProbe
      s.read.parquet(m60Dir)
        .select(col("doc_id"),
          coalesce(DocumentProbe.authorCol(col("content")),
            lit("<none>")).as("author"))
        .orderBy("doc_id")
    },

    // -- m59: blank-user-password PDF decryption — owner-locked files
    //    (the dominant "encrypted" crawl class) open via the spec's
    //    own algorithms; real passwords stay refused. Expectations
    //    ride the fixture. -------------------------------------------
    // -- m64: document-corpus SCALE gate — the document layer's
    //    measured sf1 point. Every `documents` row renders into one
    //    of six wrappers whose extraction is IDENTITY for this
    //    single-line ASCII corpus (each wrapper shape is m42-proven:
    //    rows 4/17/18/19 + the docx/xlsx rows 1/15 — the OPC pair
    //    costs a ZIP deflate + inflate + XML parse per row, the real
    //    Office-crawl bill), then ONE inventory dispatch per row
    //    extracts text back; the gate reports, per routed format, the
    //    row count, how many texts round-tripped EXACTLY, and the
    //    exact-dup structure (distinct texts) — so extraction
    //    fidelity and dedup-relevant structure are both oracle-
    //    checked at whatever SF the bench throws at it. Scale shape:
    //    binaryless (content rendered in-flight), one kernel per row,
    //    one shuffle for the final per-format aggregate. ------------
    "m64_document_corpus" -> { (s, dir) =>
      import graft.engine.read.DocumentProbe
      val render = udf { (id: Long, text: String) =>
        (id % 6) match {
          case 0 => s"{\\rtf1 $text\\par}".getBytes("ISO-8859-1")
          case 1 => (s"<!DOCTYPE html><html><body><p>$text</p>" +
            "</body></html>").getBytes("UTF-8")
          case 2 => (s"From: gen@corpus.test\r\nTo: sink@corpus.test\r\n" +
            s"Subject: doc $id\r\n\r\n$text").getBytes("UTF-8")
          case 3 => text.getBytes("UTF-8")
          // the real OPC containers: a ZIP deflate + XML parse per
          // row is what a 100 TB Office crawl actually costs
          case 4 => DocxFixture.docx(Seq(
            DocxFixture.para(DocxFixture.T(text))))
          case _ => XlsxFixture.xlsx1(Seq(XlsxFixture.SRef("A1", 0)),
            sharedStrings = Some(Seq(XlsxFixture.si(text))))
        }
      }
      graft.Tables.documents(s, dir)
        .select(col("doc_id"), col("text"),
          render(col("doc_id"), col("text")).as("content"))
        .withColumn("__d", DocumentProbe.inventoryCol(col("content")))
        .groupBy(col("__d.format").as("format"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("__d.text") === col("text"), 1L)
            .otherwise(0L)).as("n_roundtrip"),
          countDistinct(col("__d.text")).as("n_distinct"))
        .orderBy("format")
    },

    // -- m72: the archive + decryption classes' sf-scaled point
    //    (m64's sibling): every documents row renders in-flight into
    //    an archive (zip of txt+rtf / tar.gz of txt+html / zip of
    //    REAL OPC docx+xlsx) or a bare docx blob, a bounded slice of
    //    which arrives standard-encrypted under the blank default
    //    password (the 50k-spin verify bill) — then ONE
    //    memberInventories dispatch explodes members and the gate
    //    reports per-format counts, exact round-trips and dup
    //    structure. DuckDB re-derives every column from the source
    //    texts alone (each wrapper is m42/m64/m62-proven identity).
    //    BenchSf1 Heavy member: archive explosion + decryption get a
    //    tripwired 10x number. ----------------------------------------
    "m72_archive_corpus" -> { (s, dir) =>
      import graft.engine.read.DocumentProbe
      val render = udf { (id: Long, text: String) =>
        def zipOf(entries: Seq[(String, Array[Byte])]): Array[Byte] = {
          val bos = new java.io.ByteArrayOutputStream()
          val z = new java.util.zip.ZipOutputStream(bos)
          entries.foreach { case (n, b) =>
            z.putNextEntry(new java.util.zip.ZipEntry(n))
            z.write(b); z.closeEntry()
          }
          z.close(); bos.toByteArray
        }
        (id % 4) match {
          case 0 => zipOf(Seq(
            "a.txt" -> text.getBytes("UTF-8"),
            "b.rtf" -> s"{\\rtf1 $text\\par}".getBytes("ISO-8859-1")))
          case 1 =>
            import org.apache.commons.compress.archivers.tar.{TarArchiveEntry, TarArchiveOutputStream}
            val bos = new java.io.ByteArrayOutputStream()
            val gz = new java.util.zip.GZIPOutputStream(bos)
            val t = new TarArchiveOutputStream(gz)
            def add(n: String, b: Array[Byte]): Unit = {
              val e = new TarArchiveEntry(n)
              e.setSize(b.length.toLong); e.setModTime(0L)
              t.putArchiveEntry(e); t.write(b); t.closeArchiveEntry()
            }
            add("x.txt", text.getBytes("UTF-8"))
            add("y.html", (s"<!DOCTYPE html><html><body><p>$text</p>" +
              "</body></html>").getBytes("UTF-8"))
            t.close()
            bos.toByteArray
          case 2 => zipOf(Seq(
            "doc.docx" -> DocxFixture.docx(Seq(
              DocxFixture.para(DocxFixture.T(text)))),
            "sheet.xlsx" -> XlsxFixture.xlsx1(
              Seq(XlsxFixture.SRef("A1", 0)),
              sharedStrings = Some(Seq(XlsxFixture.si(text))))))
          case _ =>
            val docx = DocxFixture.docx(Seq(
              DocxFixture.para(DocxFixture.T(text))))
            // the decryption slice: bounded so the fixed 50k-spin
            // verify bill scales with SF without dominating the gate
            if (id % 400 == 3) OffCryptFixture.stdEncryptedOoxml(docx, "")
            else docx
        }
      }
      graft.Tables.documents(s, dir)
        // the kernel (OPC builds + zip/tar + probe per row) dwarfs the
        // row width: spread rows across the cluster BEFORE rendering,
        // or a single-file corpus runs the whole bill on one thread.
        // EXPLICIT partition count — AQE's size-based coalescing sees
        // tiny bytes and would fold the compute-bound stage back to
        // one partition
        .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
        .select(col("doc_id"), col("text"),
          render(col("doc_id"), col("text")).as("content"))
        .select(col("doc_id"), col("text"),
          explode(DocumentProbe.memberInventoriesCol(col("content")))
            .as("m"))
        .groupBy(col("m._2").as("format"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("m._6") === col("text"), 1L)
            .otherwise(0L)).as("n_roundtrip"),
          countDistinct(col("m._6")).as("n_distinct"))
        .orderBy("format")
    },

    // -- m80: the image layer's sf-scaled point (m64/m72's sibling):
    //    every documents row renders in-flight into a REAL PNG (the
    //    JDK encoder — the actual encode+decode+hash bill), half
    //    flat-gray keyed by doc_id, half the canonical ramp, then the
    //    shared dHash + stats kernels read them back. Every output
    //    column is a closed form DuckDB re-derives from doc_id alone.
    //    BenchSf1 Heavy member: decode/hash/stats get a tripwired 10x
    //    number. ----------------------------------------------------
    "m80_image_corpus" -> { (s, dir) =>
      import graft.multimodal.{ImageHash, ImageStats}
      val render = udf { (id: Long) =>
        val img = new java.awt.image.BufferedImage(
          if (id % 2 == 0) 64 else 9, if (id % 2 == 0) 64 else 8,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        if (id % 2 == 0) {
          val v = (id % 256).toInt
          val rgb = (v << 16) | (v << 8) | v
          for (y <- 0 until 64; x <- 0 until 64) img.setRGB(x, y, rgb)
        } else {
          for (y <- 0 until 8; x <- 0 until 9) {
            val g = 10 * x
            img.setRGB(x, y, (g << 16) | (g << 8) | g)
          }
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        bos.toByteArray
      }
      graft.Tables.documents(s, dir)
        // the m72 lesson: the kernel dwarfs the row width — explicit
        // partition count so AQE's byte-based coalesce cannot fold
        // the compute-bound stage to one partition
        .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
        .select(col("doc_id"), render(col("doc_id")).as("content"))
        .withColumn("__s", ImageStats.statsCol(col("content")))
        .groupBy((col("doc_id") % 2).cast("int").as("cls"))
        .agg(count(lit(1)).as("n_images"),
          countDistinct(coalesce(ImageHash.dhash(col("content")),
            lit(-999L))).as("n_distinct_dhash"),
          round(avg(col("__s._3")), 6).as("avg_mean_luma"),
          round(max(col("__s._4")), 6).as("max_std_luma"))
        .orderBy("cls")
    },

    // -- m85: PDF embedded-image corpus (sf-scaled) — the XObject
    //    walk + decode + lossless PNG re-encode bill per documents
    //    row: even rows a Flate DeviceRGB flat page keyed by doc_id,
    //    odd rows a CCITT G4 fax page (the r17 from-spec decoder's
    //    own 10× number). One PDF built + parsed + image-extracted +
    //    hashed + statted per row; every output column closed-form.
    //    The m72/m80 lesson: explicit-count repartition so AQE's
    //    byte-based coalesce cannot fold the compute-bound stage. ----
    "m85_pdf_image_corpus" -> { (s, dir) =>
      import graft.engine.read.Pdf
      import graft.multimodal.{ImageHash, ImageStats}
      // constant G4 payload, JDK-encoded once on the driver: the
      // per-row bill is the house T.6 DECODE, not the encode
      val g4: Array[Byte] = {
        val img = new java.awt.image.BufferedImage(9, 8,
          java.awt.image.BufferedImage.TYPE_BYTE_BINARY)
        for (y <- 0 until 8; x <- 0 until 9)
          img.setRGB(x, y, if (x % 2 == 1) 0x000000 else 0xFFFFFF)
        val it = javax.imageio.ImageIO.getImageWritersByFormatName("tiff")
        val w = it.next()
        val bos = new java.io.ByteArrayOutputStream()
        val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
        w.setOutput(ios)
        val p = w.getDefaultWriteParam
        p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
        p.setCompressionType("CCITT T.6")
        w.write(null, new javax.imageio.IIOImage(img, null, null), p)
        ios.close(); w.dispose()
        val b = bos.toByteArray
        val le = b(0) == 'I'
        def u16(o: Int) =
          if (le) (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
          else ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
        def u32(o: Int): Int =
          if (le) (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
            ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
          else ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) |
            ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)
        val ifd = u32(4); val n = u16(ifd)
        var off = -1; var cnt = -1
        for (i <- 0 until n) {
          val e = ifd + 2 + i * 12
          val tag = u16(e); val typ = u16(e + 2)
          def v = if (typ == 3) u16(e + 8) else u32(e + 8)
          if (tag == 273) off = v
          if (tag == 279) cnt = v
        }
        java.util.Arrays.copyOfRange(b, off, off + cnt)
      }
      val extract = udf { (id: Long) =>
        val pdf =
          if (id % 2 == 0) {
            val v = (id % 256).toInt
            PdfFixture.imagePdf(Seq(("Im0",
              "/Type /XObject /Subtype /Image /Width 16 /Height 16" +
                " /ColorSpace /DeviceRGB /BitsPerComponent 8" +
                " /Filter /FlateDecode",
              PdfFixture.flate(Array.fill[Byte](16 * 16 * 3)(v.toByte)))))
          } else PdfFixture.imagePdf(Seq(("Fax0",
            "/Type /XObject /Subtype /Image /Width 9 /Height 8" +
              " /ColorSpace /DeviceGray /BitsPerComponent 1" +
              " /Filter /CCITTFaxDecode" +
              " /DecodeParms << /K -1 /Columns 9 /Rows 8 >>", g4)))
        Pdf.images(pdf).headOption.map(_.bytes).orNull
      }
      graft.Tables.documents(s, dir)
        .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
        .select(col("doc_id"), extract(col("doc_id")).as("png"))
        .withColumn("__s", ImageStats.statsCol(col("png")))
        .groupBy((col("doc_id") % 2).cast("int").as("cls"))
        .agg(count(lit(1)).as("n_pages"),
          countDistinct(coalesce(ImageHash.dhash(col("png")),
            lit(-999L))).as("n_distinct_dhash"),
          round(avg(col("__s._3")), 6).as("avg_mean_luma"),
          round(max(col("__s._4")), 6).as("max_std_luma"))
        .orderBy("cls")
    },

    // -- m68: notebook extraction — authored cells (outputs drop)
    //    through the probe and the dedicated kernel; the config
    //    collision stays txt. Expectations ride the fixture. ---------
    "m68_ipynb_extract" -> { (s, _) =>
      writeM68Fixture(s)
      import graft.engine.read.{DocumentProbe, Ipynb}
      val ext = udf { (b: Array[Byte]) =>
        Ipynb.extractText(b).map(t => (t.nCells, t.text))
      }
      s.read.parquet(m68Dir)
        .withColumn("__t", ext(col("content")))
        .select(col("doc_id"),
          coalesce(DocumentProbe.formatCol(col("content")),
            lit("<unknown>")).as("format"),
          coalesce(col("__t._1"), lit(-1)).as("n_cells"),
          coalesce(col("__t._2"),
            coalesce(DocumentProbe.textCol(col("content")),
              lit("<undecodable>"))).as("text"))
        .orderBy("doc_id")
    },

    // -- m67: binary Excel extraction — record framing + SST +
    //    workbook-order sheets through the probe and the dedicated
    //    kernel; expectations ride the fixture. ----------------------
    "m67_xlsb_extract" -> { (s, _) =>
      writeM67Fixture(s)
      import graft.engine.read.{DocumentProbe, Xlsb}
      val ext = udf { (b: Array[Byte]) =>
        Xlsb.extractText(b).map(t => (t.nParagraphs, t.text))
      }
      s.read.parquet(m67Dir)
        .withColumn("__t", ext(col("content")))
        .select(col("doc_id"),
          coalesce(DocumentProbe.formatCol(col("content")),
            lit("<unknown>")).as("format"),
          coalesce(col("__t._1"), lit(-1)).as("n_cells"),
          coalesce(col("__t._2"), lit("<undecodable>")).as("text"))
        .orderBy("doc_id")
    },

    // -- m71: archive-from-column loop closure — an attachment that
    //    IS an archive explodes via memberInventories and each member
    //    re-probes through the one inventory dispatch (the zip-of-
    //    PDFs attached to a list message joins the text layer its
    //    members would join crawled bare; b.pdf and solo.pdf carry
    //    the SAME text — the cross-transport dedup proof); nested
    //    archives refuse at depth 1. Hand-derived literals. ----------
    "m71_archive_members" -> { (s, _) =>
      writeM71Fixture()
      import graft.engine.read.{DocumentProbe, Mail}
      Mail.attachmentRows(s, m71Dir)
        .select(col("msg_id"), col("name"),
          explode(DocumentProbe.memberInventoriesCol(col("content")))
            .as("m"))
        .select(col("msg_id"), col("name"),
          coalesce(col("m._1"), lit("<self>")).as("member"),
          coalesce(col("m._2"), lit("<unknown>")).as("format"),
          coalesce(col("m._6"), lit("<none>")).as("text"))
        .orderBy("msg_id", "name", "member")
    },

    // -- m75: image cross-transport dedup — ONE dhash keyspace over
    //    bare rasters (image_dhash) and document-embedded pixels
    //    (pdf images through the same front door): the five
    //    transports of the ramp collapse to one group, the flat
    //    control stays its own. ----------------------------------------
    "m75_image_transport_dedup" -> { (s, _) =>
      writeM75Fixture(s)
      import graft.engine.read.Pdf
      import graft.multimodal.ImageHash
      val pdfHash = udf { (b: Array[Byte]) =>
        Pdf.images(b).headOption
          .flatMap(i => ImageHash.dhash64(i.bytes))
      }
      s.read.parquet(m75Dir)
        .withColumn("h", coalesce(ImageHash.dhash(col("content")),
          pdfHash(col("content"))))
        .groupBy(col("h").as("dhash"))
        .agg(count(lit(1)).as("n_transports"),
          concat_ws(",", sort_array(collect_list(col("transport"))))
            .as("transports"))
        .orderBy("dhash")
    },

    // -- m81: M4A inventory — the podcast class's codec/channels/
    //    rate/samples off the ISO-BMFF metadata boxes; decode stays
    //    a recorded skip. -------------------------------------------
    "m81_m4a_inventory" -> { (s, _) =>
      writeM81Fixture(s)
      import graft.engine.validate.AudioProbe
      val inv = udf { (b: Array[Byte]) =>
        AudioProbe.m4aInfo(b).map(m =>
          (m.codec, m.channels, m.sampleRateHz, m.nSamples))
      }
      s.read.parquet(m81Dir)
        .withColumn("__a", inv(col("payload")))
        .select(col("audio_id"),
          coalesce(col("__a._1"), lit("none")).as("codec"),
          coalesce(col("__a._2"), lit(-1)).as("channels"),
          coalesce(col("__a._3"), lit(-1)).as("rate"),
          coalesce(col("__a._4"), lit(-1L)).as("n_samples"))
        .orderBy("audio_id")
    },

    // -- m77: Ogg Vorbis/Opus inventory — the web's two dominant
    //    lossy-audio classes inventory codec/channels/rate/samples
    //    from ID headers + CRC-verified tail granules; decode stays
    //    a recorded skip. -------------------------------------------
    "m77_ogg_inventory" -> { (s, _) =>
      writeM77Fixture(s)
      import graft.engine.validate.AudioProbe
      val inv = udf { (b: Array[Byte]) =>
        AudioProbe.oggInfo(b).map(m =>
          (m.codec, m.channels, m.sampleRateHz, m.nSamples))
      }
      s.read.parquet(m77Dir)
        .withColumn("__a", inv(col("payload")))
        .select(col("audio_id"),
          coalesce(col("__a._1"), lit("none")).as("codec"),
          coalesce(col("__a._2"), lit(-1)).as("channels"),
          coalesce(col("__a._3"), lit(-1)).as("rate"),
          coalesce(col("__a._4"), lit(-1L)).as("n_samples"))
        .orderBy("audio_id")
    },

    // -- m78: page-level scanned-document dedup — one page-hash
    //    keyspace over multi-page TIFFs (image_page_dhashes) and
    //    multi-image PDFs (pdf_image_dhashes): the two containers of
    //    the same book agree page by page. --------------------------
    "m78_multipage_dedup" -> { (s, _) =>
      writeM78Fixture(s)
      import graft.engine.read.Pdf
      import graft.multimodal.ImageHash
      val hashes = udf { (b: Array[Byte]) =>
        if (b != null && b.length >= 5 && b(0) == '%' && b(1) == 'P')
          Pdf.images(b).flatMap(i => ImageHash.dhash64(i.bytes))
        else ImageHash.pageDhashes64(b)
      }
      s.read.parquet(m78Dir)
        .select(col("doc_id"),
          posexplode(hashes(col("content"))).as(Seq("page", "dhash")))
        .orderBy("doc_id", "page")
    },

    // -- m79: document outlinks — a whitepaper's references are
    //    crawl seeds like a page's anchors: PDF /URI annotations and
    //    HTML hrefs (base-resolved) union into one frontier edge
    //    list; link-less documents contribute nothing. ---------------
    "m79_document_outlinks" -> { (s, _) =>
      writeM79Fixture(s)
      import graft.engine.read.DocumentProbe
      import graft.ops.Links
      val out = udf { (kind: String, src: String, b: Array[Byte]) =>
        if (kind == "html")
          Links.extractFromHtml(src, new String(b, "UTF-8")).map(_.dst)
        else DocumentProbe.links(b)
      }
      s.read.parquet(m79Dir)
        .select(col("src_url"),
          explode(out(col("kind"), col("src_url"), col("content")))
            .as("dst_url"))
        .orderBy("src_url", "dst_url")
    },

    // -- m66: mail attachments → document layer — one splittable
    //    mbox scan, attachments explode as rows, each magic-routed
    //    through the probe (the attached PDF reads like the crawled
    //    one). Hand-derived literals. ---------------------------------
    "m66_mail_attachments" -> { (s, _) =>
      writeM66Fixture()
      import graft.engine.read.{DocumentProbe, Mail}
      Mail.attachmentRows(s, m66Dir)
        .select(col("msg_id"), col("name"), col("media_type"),
          coalesce(DocumentProbe.formatCol(col("content")),
            lit("<unknown>")).as("format"),
          coalesce(DocumentProbe.textCol(col("content")),
            lit("<undecodable>")).as("text"))
        .orderBy("msg_id", "name")
    },

    // -- m65: compressed single documents — gzip/zstd/bzip2/xz blobs
    //    route like their plain twins through the one probe call;
    //    bombs and magic collisions stay safe. Expectations ride the
    //    fixture. -----------------------------------------------------
    "m65_compressed_documents" -> { (s, _) =>
      writeM65Fixture(s)
      import graft.engine.read.DocumentProbe
      s.read.parquet(m65Dir)
        .select(col("doc_id"),
          coalesce(DocumentProbe.formatCol(col("content")),
            lit("<unknown>")).as("format"),
          coalesce(DocumentProbe.textCol(col("content")),
            lit("<undecodable>")).as("text"))
        .orderBy("doc_id")
    },

    // -- m69: PDF embedded-image extraction — image XObjects route
    //    through the ONE ImageDecode front door: a scanned PDF's
    //    pages carry the SAME dhash literal as the bare PNG row
    //    (and m63's TIFFs), the cross-format dedup proof; skip
    //    codecs and locked documents extract nothing. ---------------
    "m69_pdf_images" -> { (s, _) =>
      writeM69Fixture(s)
      import graft.engine.read.Pdf
      import graft.multimodal.ImageHash
      val dims = udf { (b: Array[Byte]) =>
        graft.engine.validate.ImageProbe.dimensions(b)
      }
      s.read.parquet(m69Dir)
        .withColumn("__imgs", Pdf.imagesCol(col("content")))
        .withColumn("__f", try_element_at(col("__imgs"), lit(1)))
        .withColumn("__d", dims(col("content")))
        .select(col("doc_id"),
          size(col("__imgs")).as("n_images"),
          when(size(col("__imgs")) > 0, col("__f._5"))
            .otherwise(when(col("__d._1").isNotNull, lit("bare"))
              .otherwise(lit("none"))).as("format"),
          when(size(col("__imgs")) > 0, col("__f._3"))
            .otherwise(coalesce(col("__d._1"), lit(-1))).as("w"),
          when(size(col("__imgs")) > 0, col("__f._4"))
            .otherwise(coalesce(col("__d._2"), lit(-1))).as("h"),
          coalesce(
            when(size(col("__imgs")) > 0, ImageHash.dhash(col("__f._6")))
              .otherwise(ImageHash.dhash(col("content"))),
            lit(-999L)).as("dhash"))
        .orderBy("doc_id")
    },

    // -- m63: baseline TIFF decode — the scanner class through the
    //    SAME dHash/stats kernels as every other format; the PNG row
    //    is the cross-format dedup proof (identical pixels, identical
    //    hash). Both byte orders, uncompressed + PackBits from the
    //    independent fixture writer, LZW by JDK triangulation. ------
    "m63_tiff_decode" -> { (s, _) =>
      writeM63Fixture(s)
      import graft.multimodal.{ImageHash, ImageStats}
      val fmt = udf { (b: Array[Byte]) =>
        if (b.length >= 4 &&
          ((b(0) == 'I' && b(1) == 'I' && b(2) == 42 && b(3) == 0) ||
            (b(0) == 'M' && b(1) == 'M' && b(2) == 0 && b(3) == 42)) &&
          graft.multimodal.ImageDecode.decode(b).isDefined) "TIFF"
        else if ((b(0) & 0xFF) == 0x89 && b(1) == 'P') "PNG"
        else "none"
      }
      val dims = udf { (b: Array[Byte]) =>
        graft.engine.validate.ImageProbe.dimensions(b)
      }
      s.read.parquet(m63Dir)
        .withColumn("__d", dims(col("content")))
        .withColumn("__s", ImageStats.statsCol(col("content")))
        .select(col("img_id"),
          fmt(col("content")).as("format"),
          coalesce(col("__d._1"), lit(-1)).as("w"),
          coalesce(col("__d._2"), lit(-1)).as("h"),
          coalesce(ImageHash.dhash(col("content")), lit(-999L)).as("dhash"),
          round(coalesce(col("__s._3"), lit(-1.0)), 6).as("mean_luma"),
          round(coalesce(col("__s._4"), lit(-1.0)), 6).as("std_luma"),
          round(coalesce(col("__s._5"), lit(-1.0)), 6).as("laplacian_var"))
        .orderBy("img_id")
    },

    // -- m62: default/blank-password Office decryption — the m59
    //    story's OOXML/BIFF8 sibling: VelvetSweatshop sheets and
    //    blank-password packages open (format reports the INNER
    //    kind), real passwords refuse; expectations ride the
    //    fixture, whose encryptors are independent transcriptions. --
    "m62_office_default_passwords" -> { (s, _) =>
      writeM62Fixture(s)
      import graft.engine.read.DocumentProbe
      val pr = udf { (b: Array[Byte]) =>
        DocumentProbe.probe(b).map(m => (m.format, m.encrypted))
      }
      s.read.parquet(m62Dir)
        .withColumn("__p", pr(col("content")))
        .select(col("doc_id"),
          coalesce(col("__p._1"), lit("<unknown>")).as("format"),
          coalesce(DocumentProbe.textCol(col("content")),
            lit("<refused>")).as("text"),
          coalesce(DocumentProbe.titleCol(col("content")),
            lit("<none>")).as("title"),
          coalesce(col("__p._2"), lit(true)).as("encrypted"))
        .orderBy("doc_id")
    },

    "m59_pdf_blank_password" -> { (s, _) =>
      writeM59Fixture(s)
      import graft.engine.read.{DocumentProbe, Pdf}
      val t = udf { (b: Array[Byte]) => Pdf.extractText(b).map(_.text) }
      val enc = udf { (b: Array[Byte]) => Pdf.meta(b).map(_.encrypted) }
      s.read.parquet(m59Dir)
        .select(col("doc_id"),
          coalesce(t(col("content")), lit("<refused>")).as("text"),
          coalesce(DocumentProbe.titleCol(col("content")),
            lit("<none>")).as("title"),
          coalesce(enc(col("content")), lit(true)).as("encrypted"))
        .orderBy("doc_id")
    },

    // -- m87: unified audio tags — ID3v2 and every Vorbis-comment
    //    carrier (Ogg Vorbis/Opus, native FLAC) through ONE
    //    normalized keyspace (uppercase keys, sorted), so curation
    //    buckets by ARTIST/TITLE regardless of container. -----------
    "m87_audio_tags" -> { (s, _) =>
      writeM87Fixture(s)
      import graft.engine.validate.AudioProbe
      val t = udf { (b: Array[Byte]) =>
        AudioProbe.tags(b)
          .map(_.map { case (k, v) => s"$k=$v" }.mkString("|"))
          .getOrElse("<none>")
      }
      s.read.parquet(m87Dir)
        .select(col("audio_id"), t(col("payload")).as("tags"))
        .orderBy("audio_id")
    },

    // -- m58: ID3v2 tags + signal inventory on one payload — declared
    //    audio metadata (the document_title story for sound) beside
    //    the m29 frame walk; hand-derived literals. ------------------
    "m58_id3_tags" -> { (s, _) =>
      writeM58Fixture(s)
      import graft.engine.validate.{AudioProbe, Id3}
      val inv = udf { (b: Array[Byte]) =>
        AudioProbe.mp3Inventory(b).map(_.nFrames)
      }
      s.read.parquet(m58Dir)
        .withColumn("__t", Id3.tagsCol(col("content")))
        .select(col("audio_id"),
          coalesce(col("__t._1"), lit("<none>")).as("title"),
          coalesce(col("__t._2"), lit("<none>")).as("artist"),
          coalesce(col("__t._3"), lit("<none>")).as("album"),
          coalesce(col("__t._4"), lit("<none>")).as("date"),
          coalesce(inv(col("content")), lit(-1L)).as("n_frames"))
        .orderBy("audio_id")
    },

    // -- m57: cross-container dedup — the r14 surface composed: tar +
    //    zip members, an mbox body and scanned files all feed ONE
    //    text layer, and the same document exact-dedups across
    //    transports to the min doc key. Hand-derived literals. -------
    "m57_crossmodal_dedup" -> { (s, _) =>
      writeM57Fixture()
      import graft.engine.read.{DocumentProbe, Mail, Tar, Zip}
      val fromTar = Tar.members(s, s"$m57Dir/tar")
        .select(concat(lit("1tar:"), col("member")).as("doc_key"),
          DocumentProbe.textCol(col("content")).as("text"))
      val fromZip = Zip.members(s, s"$m57Dir/zip")
        .select(concat(lit("2zip:"), col("member")).as("doc_key"),
          DocumentProbe.textCol(col("content")).as("text"))
      val fromMbox = Mail.messages(s, s"$m57Dir/mbox")
        .select(concat(lit("3mbox:"), col("msg_id")).as("doc_key"),
          col("text"))
      val fromFiles = DocumentProbe.scan(s, s"$m57Dir/files")
        .select(concat(lit("4file:"),
          regexp_extract(col("path"), "([^/]+)$", 1)).as("doc_key"),
          col("text"))
      val all = fromTar.unionByName(fromZip).unionByName(fromMbox)
        .unionByName(fromFiles)
        .filter(col("text").isNotNull)
      graft.ops.Dedup.exact(all, Seq("text"), "doc_key")
        .orderBy("doc_key")
    },

    // -- m56: unified document TITLES — the crawl-inventory metadata
    //    column, one magic-routed call across every declaring format;
    //    expectations ride the fixture. ------------------------------
    "m56_document_titles" -> { (s, _) =>
      writeM56Fixture(s)
      import graft.engine.read.DocumentProbe
      s.read.parquet(m56Dir)
        .select(col("doc_id"),
          coalesce(DocumentProbe.titleCol(col("content")),
            lit("<none>")).as("title"))
        .orderBy("doc_id")
    },

    // -- m54: ODS extraction — spreadsheet cells through the shared
    //    ODF walk; expectations ride the fixture. --------------------
    "m54_ods_extract" -> { (s, _) =>
      writeM54Fixture(s)
      import graft.engine.read.Ods
      val ext = udf { (b: Array[Byte]) =>
        Ods.extractText(b).map(t => (t.nParagraphs, t.text))
      }
      s.read.parquet(m54Dir)
        .withColumn("__t", ext(col("content")))
        .select(col("doc_id"),
          coalesce(col("__t._1"), lit(-1)).as("n_paras"),
          coalesce(col("__t._2"), lit("<undecodable>")).as("text"))
        .orderBy("doc_id")
    },

    // -- m55: ODP extraction — slide frames + notes through the
    //    shared ODF walk; expectations ride the fixture. -------------
    "m55_odp_extract" -> { (s, _) =>
      writeM55Fixture(s)
      import graft.engine.read.Odp
      val ext = udf { (b: Array[Byte]) =>
        Odp.extractText(b).map(t => (t.nParagraphs, t.text))
      }
      s.read.parquet(m55Dir)
        .withColumn("__t", ext(col("content")))
        .select(col("doc_id"),
          coalesce(col("__t._1"), lit(-1)).as("n_paras"),
          coalesce(col("__t._2"), lit("<undecodable>")).as("text"))
        .orderBy("doc_id")
    },

    // -- m53: ZIP archive source → document layer — the
    //    dataset-release shape, the m52 pattern over the shared
    //    capped ZipRead walk. Hand-derived literals. -----------------
    "m53_zip_documents" -> { (s, _) =>
      writeM53Fixture()
      import graft.engine.read.{DocumentProbe, Zip}
      Zip.members(s, m53Dir)
        .select(col("member"), col("size"),
          coalesce(DocumentProbe.formatCol(col("content")),
            lit("<unknown>")).as("format"),
          coalesce(DocumentProbe.textCol(col("content")),
            lit("<undecodable>")).as("text"))
        .orderBy("member")
    },

    // -- m86: 7z release archive — members explode through the SAME
    //    document dispatch as their tar/zip siblings (r17; closes the
    //    r15 skip — the fixture writer is from-spec, the reader is
    //    commons-compress, so the sides stay independent). -----------
    "m86_sevenz_documents" -> { (s, _) =>
      writeM86Fixture()
      import graft.engine.read.{DocumentProbe, SevenZ}
      SevenZ.members(s, m86Dir)
        .select(col("member"), col("size"),
          coalesce(DocumentProbe.formatCol(col("content")),
            lit("<unknown>")).as("format"),
          coalesce(DocumentProbe.textCol(col("content")),
            lit("<undecodable>")).as("text"))
        .orderBy("member")
    },

    // -- m50: EML extraction — RFC 5322 headers (encoded-words),
    //    MIME multipart walk, QP/base64; expectations ride the
    //    fixture. ----------------------------------------------------
    "m50_eml_extract" -> { (s, _) =>
      writeM50Fixture(s)
      import graft.engine.read.Mail
      val ext = udf { (b: Array[Byte]) =>
        Mail.parseEml(b).map(e => (e.subject, e.nParts, e.text))
      }
      s.read.parquet(m50Dir)
        .withColumn("__m", ext(col("content")))
        .select(col("doc_id"),
          coalesce(col("__m._1"), lit("<not-a-message>")).as("subject"),
          coalesce(col("__m._2"), lit(-1)).as("n_parts"),
          coalesce(col("__m._3"), lit("<not-a-message>")).as("text"))
        .orderBy("doc_id")
    },

    // -- m51: MBOX source + curation bridge — the archive splits on
    //    the envelope separator, bodies unquote per mboxrd, and the
    //    duplicate repost exact-dedups to the min message id (the
    //    mailing-list reality: cross-posts and reposts). Hand-derived
    //    literals. ----------------------------------------------------
    "m51_mbox_corpus" -> { (s, _) =>
      writeM51Fixture()
      import graft.engine.read.Mail
      val msgs = Mail.messages(s, m51Dir)
        .select(col("msg_id"), col("subject"), col("text"))
      graft.ops.Dedup.exact(msgs, Seq("text"), "msg_id")
        .orderBy("msg_id")
    },

    // -- m48: modern .xlsx extraction — SpreadsheetML shared/inline/
    //    formula strings, workbook-order routing; expectations ride
    //    the fixture. ------------------------------------------------
    "m48_xlsx_extract" -> { (s, _) =>
      writeM48Fixture(s)
      import graft.engine.read.Xlsx
      val ext = udf { (b: Array[Byte]) =>
        Xlsx.extractText(b).map(t => (t.nParagraphs, t.text))
      }
      s.read.parquet(m48Dir)
        .withColumn("__t", ext(col("content")))
        .select(col("doc_id"),
          coalesce(col("__t._1"), lit(-1)).as("n_paras"),
          coalesce(col("__t._2"), lit("<undecodable>")).as("text"))
        .orderBy("doc_id")
    },

    // -- m49: modern .pptx extraction — PresentationML a:t runs in
    //    sldIdLst order, notes included; expectations ride the
    //    fixture. ----------------------------------------------------
    "m49_pptx_extract" -> { (s, _) =>
      writeM49Fixture(s)
      import graft.engine.read.Pptx
      val ext = udf { (b: Array[Byte]) =>
        Pptx.extractText(b).map(t => (t.nParagraphs, t.text))
      }
      s.read.parquet(m49Dir)
        .withColumn("__t", ext(col("content")))
        .select(col("doc_id"),
          coalesce(col("__t._1"), lit(-1)).as("n_paras"),
          coalesce(col("__t._2"), lit("<undecodable>")).as("text"))
        .orderBy("doc_id")
    },

    // -- m44: legacy .xls extraction — SST/LabelSST across Continue
    //    splits; expectations ride the fixture. ---------------------
    "m44_xls_extract" -> { (s, _) =>
      writeM44Fixture(s)
      import graft.engine.read.Xls
      val ext = udf { (b: Array[Byte]) =>
        Xls.extractText(b).map(t => (t.nParagraphs, t.text))
      }
      s.read.parquet(m44Dir)
        .withColumn("__t", ext(col("content")))
        .select(col("doc_id"),
          coalesce(col("__t._1"), lit(-1)).as("n_paras"),
          coalesce(col("__t._2"), lit("<undecodable>")).as("text"))
        .orderBy("doc_id")
    },

    // -- m43: LaTeX detex — tokenizer over comments/math/envs/groups;
    //    expectations ride the fixture. -----------------------------
    "m43_latex_extract" -> { (s, _) =>
      writeM43Fixture(s)
      import graft.ops.Latex
      val ext = udf { (src: String) =>
        Option(src).map { t =>
          val r = Latex.extractText(t); (r.nParagraphs, r.text)
        }
      }
      s.read.parquet(m43Dir)
        .withColumn("__t", ext(col("src")))
        .select(col("doc_id"),
          coalesce(col("__t._1"), lit(-1)).as("n_paras"),
          coalesce(col("__t._2"), lit("<null>")).as("text"))
        .orderBy("doc_id")
    },

    // -- m42: unified document probe — format by payload magic and
    //    auto-routed text across all six modalities; expectations
    //    ride the fixture. ------------------------------------------
    "m42_document_probe" -> { (s, _) =>
      writeM42Fixture(s)
      import graft.engine.read.DocumentProbe
      s.read.parquet(m42Dir)
        .select(col("doc_id"),
          coalesce(DocumentProbe.formatCol(col("content")),
            lit("<unknown>")).as("format"),
          coalesce(DocumentProbe.textCol(col("content")),
            lit("<undecodable>")).as("text"))
        .orderBy("doc_id")
    },

    // -- m84: data-file SHAPE inventory (r17) — the r16 magic
    //    classification upgraded to facts: sqlite table names + row
    //    counts (from-spec b-tree walk vs python3's stdlib writer),
    //    npy dtype/shape (numpy-written), avro record counts from
    //    block headers (org.apache.avro writer), hdf5 superblock
    //    version; parquet/ORC/Arrow stay header-only (COVERAGE). ----
    "m84_datafile_inventory" -> { (s, _) =>
      writeM84Fixture(s)
      import graft.engine.read.{DataFiles, DocumentProbe}
      val inv = udf { (b: Array[Byte]) =>
        val fmt = DocumentProbe.probe(b).map(_.format)
          .getOrElse("<unknown>")
        val detail = DataFiles.inventory(b).getOrElse(
          if (Set("parquet", "orc", "arrow").contains(fmt)) "header-only"
          else "none")
        (fmt, detail)
      }
      s.read.parquet(m84Dir)
        .withColumn("__i", inv(col("payload")))
        .select(col("blob_id"), col("__i._1").as("format"),
          col("__i._2").as("detail"))
        .orderBy("blob_id")
    },

    // -- m41: legacy .doc extraction — CFB walk + FIB/piece-table
    //    decode; expectations ride the fixture. --------------------
    "m41_doc_extract" -> { (s, _) =>
      writeM41Fixture(s)
      import graft.engine.read.Doc
      val ext = udf { (b: Array[Byte]) =>
        Doc.extractText(b).map(t => (t.nParagraphs, t.text))
      }
      s.read.parquet(m41Dir)
        .withColumn("__t", ext(col("content")))
        .select(col("doc_id"),
          coalesce(col("__t._1"), lit(-1)).as("n_paras"),
          coalesce(col("__t._2"), lit("<undecodable>")).as("text"))
        .orderBy("doc_id")
    },

    // -- m40: RTF extraction — group/control-word walk, code pages,
    //    unicode fallbacks; expectations ride the fixture. ----------
    "m40_rtf_extract" -> { (s, _) =>
      writeM40Fixture(s)
      import graft.engine.read.Rtf
      val ext = udf { (b: Array[Byte]) =>
        Rtf.extractText(b).map(t => (t.nParagraphs, t.text))
      }
      s.read.parquet(m40Dir)
        .withColumn("__t", ext(col("content")))
        .select(col("doc_id"),
          coalesce(col("__t._1"), lit(-1)).as("n_paras"),
          coalesce(col("__t._2"), lit("<undecodable>")).as("text"))
        .orderBy("doc_id")
    },

    // -- m39: ODT extraction — ODF package walk + office:text body in
    //    document order; expectations ride the fixture. -------------
    "m39_odt_extract" -> { (s, _) =>
      writeM39Fixture(s)
      import graft.engine.read.Odt
      val ext = udf { (b: Array[Byte]) =>
        Odt.extractText(b).map(t => (t.nParagraphs, t.text))
      }
      s.read.parquet(m39Dir)
        .withColumn("__t", ext(col("content")))
        .select(col("doc_id"),
          coalesce(col("__t._1"), lit(-1)).as("n_paras"),
          coalesce(col("__t._2"), lit("<undecodable>")).as("text"))
        .orderBy("doc_id")
    },

    // -- m38: cross-format document dedup — the unified text layer's
    //    point: a PDF, EPUB, DOCX, ODT, RTF and legacy DOC of the SAME
    //    document extract to identical text and exact-dedup to the
    //    min-id copy. ------------------------------------------------
    "m38_document_mix" -> { (s, _) =>
      writeM38Fixture(s)
      import graft.engine.read.{Doc, Docx, Epub, Odt, Pdf, Pptx, Rtf, Xlsb, Xlsx}
      val pdfT = udf { (b: Array[Byte]) => Pdf.extractText(b).map(_.text) }
      val docxT = udf { (b: Array[Byte]) => Docx.extractText(b).map(_.text) }
      val odtT = udf { (b: Array[Byte]) => Odt.extractText(b).map(_.text) }
      val rtfT = udf { (b: Array[Byte]) => Rtf.extractText(b).map(_.text) }
      val docT = udf { (b: Array[Byte]) => Doc.extractText(b).map(_.text) }
      val xlsxT = udf { (b: Array[Byte]) => Xlsx.extractText(b).map(_.text) }
      val xlsbT = udf { (b: Array[Byte]) => Xlsb.extractText(b).map(_.text) }
      val pptxT = udf { (b: Array[Byte]) => Pptx.extractText(b).map(_.text) }
      val docs = s.read.parquet(m38Dir)
        .withColumn("text",
          when(col("fmt") === "pdf", pdfT(col("content")))
            .when(col("fmt") === "docx", docxT(col("content")))
            .when(col("fmt") === "odt", odtT(col("content")))
            .when(col("fmt") === "rtf", rtfT(col("content")))
            .when(col("fmt") === "doc", docT(col("content")))
            .when(col("fmt") === "xlsx", xlsxT(col("content")))
            .when(col("fmt") === "xlsb", xlsbT(col("content")))
            .when(col("fmt") === "pptx", pptxT(col("content")))
            .otherwise(Epub.textCol(col("content"))))
        .filter(col("text").isNotNull)
        .select("doc_id", "fmt", "text")
      graft.ops.Dedup.exact(docs, Seq("text"), "doc_id")
        .orderBy("doc_id")
    },

    // -- m37: DOCX extraction — OPC rels + WordprocessingML walk;
    //    expectations ride the fixture. ----------------------------
    "m37_docx_extract" -> { (s, _) =>
      writeM37Fixture(s)
      import graft.engine.read.Docx
      val ext = udf { (b: Array[Byte]) =>
        Docx.extractText(b).map(t => (t.nParagraphs, t.text))
      }
      s.read.parquet(m37Dir)
        .withColumn("__t", ext(col("content")))
        .select(col("doc_id"),
          coalesce(col("__t._1"), lit(-1)).as("n_paras"),
          coalesce(col("__t._2"), lit("<undecodable>")).as("text"))
        .orderBy("doc_id")
    },

    // -- m36: EPUB extraction — OCF walk + spine order + the shared
    //    htmlToText cascade; expectations ride the fixture. ---------
    "m36_epub_extract" -> { (s, _) =>
      writeM36Fixture(s)
      import graft.engine.read.Epub
      s.read.parquet(m36Dir)
        .withColumn("__b", Epub.bookCol(col("content")))
        .select(col("doc_id"),
          coalesce(col("__b._1"), lit("<none>")).as("title"),
          coalesce(size(col("__b._2")), lit(-1)).as("n_chapters"),
          coalesce(Epub.textCol(col("content")),
            lit("<undecodable>")).as("text"))
        .orderBy("doc_id")
    },

    // -- m34: PDF text extraction — xref/ObjStm/Flate/fonts through
    //    the one extractor; expectations ride the fixture. ---------
    "m34_pdf_extract" -> { (s, _) =>
      writeM34Fixture(s)
      import graft.engine.read.Pdf
      val ext = udf { (b: Array[Byte]) =>
        Pdf.extractText(b).map(t => (t.nPages, t.text))
      }
      val metaU = udf { (b: Array[Byte]) =>
        Pdf.meta(b).map(m => (m.version, m.encrypted))
      }
      s.read.parquet(m34Dir)
        .withColumn("__t", ext(col("content")))
        .withColumn("__m", metaU(col("content")))
        .select(col("doc_id"),
          coalesce(col("__t._1"), lit(-1)).as("n_pages"),
          coalesce(col("__t._2"), lit("<undecodable>")).as("text"),
          coalesce(col("__m._1"), lit("")).as("version"),
          coalesce(col("__m._2"), lit(false)).as("encrypted"))
        .orderBy("doc_id")
    },

    // -- m35: PDF → curation bridge (the m26 pattern): extracted page
    //    text flows through the full nine-stage pipeline; verdicts
    //    are the adjudicated m26 set, sources relabeled 'pdf'. ------
    "m35_pdf_curation" -> { (s, _) =>
      import s.implicits._
      writeM35Fixture(s)
      import graft.engine.read.Pdf
      val ext = udf { (b: Array[Byte]) => Pdf.extractText(b).map(_.text) }
      val docs = s.read.parquet(m35Dir)
        .select(col("doc_id"), ext(col("content")).as("text"))
        .filter(col("text").isNotNull)
        .withColumn("source", lit("pdf"))
      val index = graft.ops.Dedup.buildMinhashIndex(
        Seq((100L, m26SeenText)).toDF("doc_id", "text"), "doc_id", "text")
      val probes = Seq(m26ProbeText).toDF("text")
      val out = graft.ops.CurationPipeline.curate(docs, index, probes,
        "text", graft.ops.CurationPipeline.Config(
          "doc_id", "text", "source", targetMix = Map("pdf" -> 1)))
      out.data.orderBy("doc_id")
    },

    // -- m33: WebP decode — container probe (all three layouts) and
    //    VP8L pixels through the SAME dHash/stats kernels as every
    //    other format; the PNG row is the in-gate triangulation
    //    (identical pixels, identical hash). Expectations ride the
    //    fixture (closed forms in the fixture doc). ---------------
    "m33_webp_decode" -> { (s, _) =>
      writeM33Fixture(s)
      import graft.multimodal.{ImageHash, ImageStats, WebP}
      val fmt = udf { (b: Array[Byte]) =>
        if (WebP.isWebP(b)) WebP.probe(b).map(_.format).getOrElse("none")
        else if (graft.engine.validate.ImageProbe.dimensions(b).isDefined)
          "PNG"
        else "none"
      }
      val dims = udf { (b: Array[Byte]) =>
        graft.engine.validate.ImageProbe.dimensions(b)
      }
      s.read.parquet(m33Dir)
        .withColumn("__d", dims(col("content")))
        .withColumn("__s", ImageStats.statsCol(col("content")))
        .select(col("img_id"),
          fmt(col("content")).as("format"),
          coalesce(col("__d._1"), lit(-1)).as("w"),
          coalesce(col("__d._2"), lit(-1)).as("h"),
          coalesce(ImageHash.dhash(col("content")), lit(-999L)).as("dhash"),
          round(coalesce(col("__s._3"), lit(-1.0)), 6).as("mean_luma"),
          round(coalesce(col("__s._4"), lit(-1.0)), 6).as("std_luma"),
          round(coalesce(col("__s._5"), lit(-1.0)), 6).as("laplacian_var"))
        .orderBy("img_id")
    },
    // -- m32: temporal video stats — the static-clip/montage gate
    //    from consecutive sampled-frame hash distances; expectations
    //    by frame byte identity (see fixture doc). ----------------
    "m32_video_stats" -> { (s, _) =>
      writeM32Fixture(s)
      import graft.multimodal.VideoStats
      s.read.parquet(m32Dir)
        .withColumn("__s", VideoStats.statsCol(col("content"),
          cutHamming = 0, staticHamming = 0))
        .select(col("video_id"),
          coalesce(col("__s._1"), lit(-1)).as("n_frames"),
          coalesce(col("__s._2"), lit(-1)).as("n_cuts"),
          round(coalesce(col("__s._3"), lit(-1.0)), 6).as("static_ratio"))
        .orderBy("video_id")
    },

    // -- m31: pixel-level image stats — exposure/contrast/sharpness
    //    from the same luma pass the dHash pays; every expected value
    //    closed-form (see the fixture doc). -----------------------
    "m31_image_stats" -> { (s, _) =>
      writeM31Fixture(s)
      import graft.multimodal.ImageStats
      s.read.parquet(m31Dir)
        .withColumn("__s", ImageStats.statsCol(col("content")))
        .select(col("img_id"),
          coalesce(col("__s._1"), lit(-1)).as("w"),
          coalesce(col("__s._2"), lit(-1)).as("h"),
          round(coalesce(col("__s._3"), lit(-1.0)), 6).as("mean_luma"),
          round(coalesce(col("__s._4"), lit(-1.0)), 6).as("std_luma"),
          round(coalesce(col("__s._5"), lit(-1.0)), 6).as("laplacian_var"))
        .orderBy("img_id")
    },

    // -- m30: signal-level audio stats — the degenerate-clip gate a
    //    speech corpus filters on before fingerprinting; expectations
    //    measured by independent arithmetic over the same quantized
    //    integers. ------------------------------------------------
    "m30_audio_stats" -> { (s, _) =>
      writeM30Fixture(s)
      import graft.multimodal.AudioStats
      s.read.parquet(m30Dir)
        .withColumn("__s", AudioStats.statsCol(col("content")))
        .select(col("audio_id"),
          coalesce(col("__s._1"), lit(-1L)).as("n_samples"),
          coalesce(col("__s._3"), lit(-1L)).as("duration_ms"),
          round(coalesce(col("__s._4"), lit(-999.0)), 6).as("peak_db"),
          round(coalesce(col("__s._5"), lit(-999.0)), 6).as("rms_db"),
          round(coalesce(col("__s._6"), lit(-1.0)), 6).as("clip_ratio"),
          round(coalesce(col("__s._7"), lit(-1.0)), 6).as("silence_ratio"))
        .orderBy("audio_id")
    },
    // -- m25: bring-your-own-frames video near-dup — externally
    //    extracted frame rows (the realistic H.264 path) through the
    //    same dHash + set-signature machinery. Video 11 is a 4-frame
    //    subset of 10's 8 → containment reaches frac 1 on its own
    //    side; the different clip and the undecodable frame pair with
    //    nothing. --------------------------------------------------
    "m25_video_byo_frames" -> { (s, _) =>
      import s.implicits._
      val rows = framesA.map(f => (10L, f)) ++
        framesA.slice(2, 6).map(f => (11L, f)) ++
        framesB.map(f => (12L, f)) ++
        Seq((13L, "not an image".getBytes))
      VideoFrameHash.nearDuplicateVideosFromFrames(
          rows.toDF("video_id", "frame"), "video_id", "frame")
        .orderBy("vid_a", "vid_b")
    },

    // -- m27: BYO-frame batch against an index built by the MJPEG
    //    payload walk — the cross-extraction-path composition the
    //    shared hash kernel exists for. The keyframe copy of indexed
    //    clip 0 drops; the new clip and the frame-less video survive.
    "m27_video_byo_index_dedup" -> { (s, _) =>
      import s.implicits._
      MultimodalQueries.writeM17Fixture(s)
      val all = s.read.parquet(MultimodalQueries.m17Dir)
      val idx = VideoFrameHash.buildVideoIndex(
        all.filter(col("video_id") === 0L), "video_id", "content")
      val batch = Seq((20L, "keyframes of clip A"), (21L, "clip B"),
        (22L, "opaque")).toDF("video_id", "label")
      val frames = (framesA.map(f => (20L, f)) ++
        framesB.map(f => (21L, f)) :+
        ((22L, "undecodable".getBytes))).toDF("video_id", "frame")
      VideoFrameHash.dropNearDuplicateVideosFromFrames(
          batch, frames, idx, "video_id", "frame")
        .select("video_id").orderBy("video_id")
    },

    // -- m26: the subtitles→curation COMPOSED pipeline — SRT/VTT
    //    payloads parse to transcripts, transcripts run the full
    //    nine-stage curation program; each designed document exits at
    //    its stage (see the fixture doc). Survivors' digests are the
    //    sha-256 of transcripts DuckDB recomputes from the same
    //    literals. ------------------------------------------------
    "m26_subtitle_curation" -> { (s, _) =>
      import s.implicits._
      writeM26Fixture(s)
      val tr = graft.ops.Subtitles.transcripts(
          s.read.parquet(m26Dir + "_in"), "doc_id", "content")
        .withColumn("source", lit("subs"))
        .select("doc_id", "source", "transcript")
      val index = graft.ops.Dedup.buildMinhashIndex(
        Seq((100L, m26SeenText)).toDF("doc_id", "text"), "doc_id", "text")
      val probes = Seq(m26ProbeText).toDF("text")
      val out = graft.ops.CurationPipeline.curate(tr, index, probes,
        "text", graft.ops.CurationPipeline.Config(
          "doc_id", "transcript", "source", targetMix = Map("subs" -> 1)))
      out.data.orderBy("doc_id")
    },

    // -- m28: Ogg-FLAC fingerprint identity — the .oga wrap of the
    //    m15/m21 recording must hash to the SAME level-table value
    //    (container never moves a bit); a page-CRC-corrupted copy
    //    hashes NULL → -999. ---------------------------------------
    "m28_ogg_flac_fingerprint" -> { (s, _) =>
      writeM28Fixture(s)
      import graft.multimodal.AudioFingerprint
      s.read.parquet(m28Dir)
        .select(col("audio_id"),
          coalesce(AudioFingerprint.spectralHash(col("content")),
            lit(-999L)).as("ahash"))
        .orderBy("audio_id")
    },

    // -- m29: MP3 stream inventory — frame walk + Xing/VBRI headers;
    //    every expected value derives from the fixture's header
    //    arithmetic (the m6/m7 pattern). ---------------------------
    "m29_mp3_inventory" -> { (s, _) =>
      writeM29Fixture(s)
      import graft.engine.validate.AudioProbe
      val inv = udf { (b: Array[Byte]) =>
        AudioProbe.mp3Inventory(b).map(i => (i.channels, i.sampleRateHz,
          i.nFrames, i.nSamples, i.durationMs, i.vbr,
          i.avgBitrateKbps, i.vbrHeader.getOrElse(""),
          i.declaredFrames.getOrElse(-1L), i.declaredBytes.getOrElse(-1L)))
      }
      s.read.parquet(m29Dir)
        .withColumn("__i", inv(col("content")))
        .select(col("audio_id"),
          coalesce(col("__i._1"), lit(-1)).as("channels"),
          coalesce(col("__i._2"), lit(-1)).as("rate"),
          coalesce(col("__i._3"), lit(-1L)).as("n_frames"),
          coalesce(col("__i._4"), lit(-1L)).as("n_samples"),
          coalesce(col("__i._5"), lit(-1L)).as("duration_ms"),
          coalesce(col("__i._6"), lit(false)).as("vbr"),
          round(coalesce(col("__i._7"), lit(-1.0)), 4).as("avg_kbps"),
          coalesce(col("__i._8"), lit("")).as("vbr_header"),
          coalesce(col("__i._9"), lit(-1L)).as("decl_frames"),
          coalesce(col("__i._10"), lit(-1L)).as("decl_bytes"))
        .orderBy("audio_id")
    })

  def oracle: Map[String, String] = Map(
    // Cross-format convergence: the PDF copy (min id) survives for
    // text A, the distinct DOCX stays.
    "m38_document_mix" ->
      s"""SELECT * FROM (VALUES
         |  (1::BIGINT, 'pdf', '$m38TextA'),
         |  (4::BIGINT, 'docx', '$m38TextB'))
         |  t(doc_id, fmt, text)
         |ORDER BY doc_id""".stripMargin,
    // Hand-derived: five members per archive (PAX long-named rtf,
    // plain text, html, docx, binary blob), identical through the
    // plain tar and the .tar.gz twin.
    "m52_tar_documents" -> {
      def rowsFor(f: String) =
        s"""  ('$f', 'a/readme.txt', 'txt', 'tar member plain text'),
           |  ('$f', 'b/page.html', 'html', 'tar member html'),
           |  ('$f', 'c/doc.docx', 'docx', 'tar member docx'),
           |  ('$f', 'd/blob.bin', '<unknown>', '<undecodable>'),
           |  ('$f', 'e/paper.tex', 'latex', 'Tar member latex text.'),
           |  ('$f', '$m52LongName', 'rtf', 'tar member rtf')""".stripMargin
      s"""SELECT * FROM (VALUES
         |${rowsFor("corpus.tar")},
         |${rowsFor("corpus2.tar.gz")},
         |${rowsFor("corpus3.tar.zst")},
         |${rowsFor("corpus4.tar.bz2")},
         |${rowsFor("corpus5.tar.xz")},
         |${rowsFor("corpus6.tar.lz4")})
         |  t(file, member, format, text)
         |ORDER BY file, member""".stripMargin
    },
    // Literal expectations ride the fixture.
    "m61_document_dates" ->
      s"""SELECT doc_id, exp_date AS created
         |FROM read_parquet('$m61Dir/*.parquet')
         |ORDER BY doc_id""".stripMargin,
    "m60_document_authors" ->
      s"""SELECT doc_id, exp_author AS author
         |FROM read_parquet('$m60Dir/*.parquet')
         |ORDER BY doc_id""".stripMargin,
    "m62_office_default_passwords" ->
      s"""SELECT doc_id, exp_format AS format, exp_text AS text,
         |  exp_title AS title, exp_encrypted AS encrypted
         |FROM read_parquet('$m62Dir/*.parquet')
         |ORDER BY doc_id""".stripMargin,
    // The wrappers are identity for this corpus, so DuckDB re-derives
    // every column from the SOURCE texts alone.
    "m64_document_corpus" ->
      s"""SELECT CASE CAST(doc_id % 6 AS INTEGER)
         |    WHEN 0 THEN 'rtf' WHEN 1 THEN 'html' WHEN 2 THEN 'eml'
         |    WHEN 3 THEN 'txt' WHEN 4 THEN 'docx' ELSE 'xlsx'
         |    END AS format,
         |  count(*) AS n_docs, count(*) AS n_roundtrip,
         |  count(DISTINCT text) AS n_distinct
         |FROM documents
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "m85_pdf_image_corpus" ->
      """SELECT CAST(doc_id % 2 AS INTEGER) AS cls,
        |  count(*) AS n_pages,
        |  CAST(1 AS BIGINT) AS n_distinct_dhash,
        |  round(avg(CASE WHEN doc_id % 2 = 0
        |    THEN CAST(doc_id % 256 AS DOUBLE)
        |    ELSE 10200.0/72 END), 6) AS avg_mean_luma,
        |  round(max(CASE WHEN doc_id % 2 = 0 THEN 0.0
        |    ELSE sqrt(2601000.0/72 - (10200.0/72)*(10200.0/72)) END), 6)
        |    AS max_std_luma
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    "m80_image_corpus" ->
      """SELECT CAST(doc_id % 2 AS INTEGER) AS cls,
        |  count(*) AS n_images,
        |  CAST(1 AS BIGINT) AS n_distinct_dhash,
        |  round(avg(CASE WHEN doc_id % 2 = 0
        |    THEN CAST(doc_id % 256 AS DOUBLE) ELSE 40.0 END), 6)
        |    AS avg_mean_luma,
        |  round(max(CASE WHEN doc_id % 2 = 0 THEN 0.0
        |    ELSE sqrt(163200.0/72 - 1600.0) END), 6) AS max_std_luma
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    "m72_archive_corpus" ->
      """WITH m AS (
        |  SELECT doc_id, text, CASE CAST(doc_id % 4 AS INTEGER)
        |      WHEN 0 THEN 'txt' WHEN 1 THEN 'txt'
        |      WHEN 2 THEN 'docx' ELSE 'docx' END AS format
        |  FROM documents
        |  UNION ALL
        |  SELECT doc_id, text, CASE CAST(doc_id % 4 AS INTEGER)
        |      WHEN 0 THEN 'rtf' WHEN 1 THEN 'html'
        |      ELSE 'xlsx' END AS format
        |  FROM documents WHERE doc_id % 4 < 3
        |)
        |SELECT format, count(*) AS n_docs, count(*) AS n_roundtrip,
        |  count(DISTINCT text) AS n_distinct
        |FROM m GROUP BY 1 ORDER BY 1""".stripMargin,
    "m68_ipynb_extract" ->
      s"""SELECT doc_id, exp_format AS format, exp_cells AS n_cells,
         |  exp_text AS text
         |FROM read_parquet('$m68Dir/*.parquet')
         |ORDER BY doc_id""".stripMargin,
    "m67_xlsb_extract" ->
      s"""SELECT doc_id, exp_format AS format, exp_cells AS n_cells,
         |  exp_text AS text
         |FROM read_parquet('$m67Dir/*.parquet')
         |ORDER BY doc_id""".stripMargin,
    "m81_m4a_inventory" ->
      s"""SELECT audio_id, exp_codec AS codec, exp_channels AS channels,
         |  exp_rate AS rate, exp_samples AS n_samples
         |FROM read_parquet('$m81Dir/*.parquet')
         |ORDER BY audio_id""".stripMargin,
    "m77_ogg_inventory" ->
      s"""SELECT audio_id, exp_codec AS codec, exp_channels AS channels,
         |  exp_rate AS rate, exp_samples AS n_samples
         |FROM read_parquet('$m77Dir/*.parquet')
         |ORDER BY audio_id""".stripMargin,
    "m79_document_outlinks" ->
      """SELECT * FROM (VALUES
        |  ('https://site.org/memo.docx', 'https://cited.example.org/spec'),
        |  ('https://site.org/notes.odt', 'https://odf.example.net/ref'),
        |  ('https://site.org/page', 'https://other.net/b'),
        |  ('https://site.org/page', 'https://site.org/a'),
        |  ('https://site.org/paper.pdf', 'https://refs.example.org/cite1'),
        |  ('https://site.org/paper.pdf', 'https://refs.example.org/cite2'))
        |  t(src_url, dst_url)
        |ORDER BY src_url, dst_url""".stripMargin,
    "m78_multipage_dedup" ->
      """SELECT * FROM (VALUES
        |  (CAST(0 AS BIGINT), 0, CAST(-1 AS BIGINT)),
        |  (CAST(0 AS BIGINT), 1, CAST(0 AS BIGINT)),
        |  (CAST(1 AS BIGINT), 0, CAST(-1 AS BIGINT)),
        |  (CAST(1 AS BIGINT), 1, CAST(0 AS BIGINT)),
        |  (CAST(2 AS BIGINT), 0, CAST(-1 AS BIGINT)))
        |  t(doc_id, page, dhash)
        |ORDER BY doc_id, page""".stripMargin,
    "m75_image_transport_dedup" ->
      """SELECT * FROM (VALUES
        |  (CAST(-1 AS BIGINT), CAST(5 AS BIGINT),
        |   'ico,pdf-inline,pdf-xobject,png,tiff'),
        |  (CAST(0 AS BIGINT), CAST(1 AS BIGINT), 'png-flat'))
        |  t(dhash, n_transports, transports)
        |ORDER BY dhash""".stripMargin,
    "m71_archive_members" ->
      """SELECT * FROM (VALUES
        |  ('<p2>', 'solo.pdf', '<self>', 'pdf', 'shared body text'),
        |  ('<t3>', 'data.tar.gz', 'x/log.txt', 'txt', 'tar member log'),
        |  ('<z1>', 'bundle.zip', 'a.pdf', 'pdf', 'alpha report body'),
        |  ('<z1>', 'bundle.zip', 'b.pdf', 'pdf', 'shared body text'),
        |  ('<z1>', 'bundle.zip', 'nested.zip', 'zip', '<none>'),
        |  ('<z1>', 'bundle.zip', 'notes.txt', 'txt', 'plain zip notes'))
        |  t(msg_id, name, member, format, text)
        |ORDER BY msg_id, name, member""".stripMargin,
    "m66_mail_attachments" ->
      s"""SELECT * FROM (VALUES
         |  ('<a1>', '', 'application/octet-stream',
         |   '<unknown>', '<undecodable>'),
         |  ('<a1>', 'q3.pdf', 'application/pdf', 'pdf',
         |   'attached pdf text'),
         |  ('<b2>', 'd.docx', 'application/vnd.openxmlformats-officedocument.wordprocessingml.document',
         |   'docx', 'attached docx text'))
         |  t(msg_id, name, media_type, format, text)
         |ORDER BY msg_id, name""".stripMargin,
    "m65_compressed_documents" ->
      s"""SELECT doc_id, exp_format AS format, exp_text AS text
         |FROM read_parquet('$m65Dir/*.parquet')
         |ORDER BY doc_id""".stripMargin,
    "m69_pdf_images" ->
      s"""SELECT doc_id, exp_n AS n_images, exp_format AS format,
         |  exp_w AS w, exp_h AS h, exp_dhash AS dhash
         |FROM read_parquet('$m69Dir/*.parquet')
         |ORDER BY doc_id""".stripMargin,
    "m63_tiff_decode" ->
      s"""SELECT img_id, exp_format AS format, exp_w AS w, exp_h AS h,
         |  exp_dhash AS dhash, round(exp_mean, 6) AS mean_luma,
         |  round(exp_std, 6) AS std_luma, round(exp_lap, 6) AS laplacian_var
         |FROM read_parquet('$m63Dir/*.parquet')
         |ORDER BY img_id""".stripMargin,
    "m59_pdf_blank_password" ->
      s"""SELECT doc_id, exp_text AS text, exp_title AS title,
         |  exp_encrypted AS encrypted
         |FROM read_parquet('$m59Dir/*.parquet')
         |ORDER BY doc_id""".stripMargin,
    "m58_id3_tags" ->
      s"""SELECT audio_id, exp_title AS title, exp_artist AS artist,
         |  exp_album AS album, exp_date AS date, exp_frames AS n_frames
         |FROM read_parquet('$m58Dir/*.parquet')
         |ORDER BY audio_id""".stripMargin,
    "m87_audio_tags" ->
      s"""SELECT audio_id, exp_tags AS tags
         |FROM read_parquet('$m87Dir/*.parquet')
         |ORDER BY audio_id""".stripMargin,
    // Hand-derived: the tar copy wins (min key '1tar:doc.rtf'); the
    // distinct scanned docx stays.
    "m57_crossmodal_dedup" ->
      s"""SELECT * FROM (VALUES
         |  ('1tar:doc.rtf', '$m57Text'),
         |  ('4file:other.docx', '$m57Other'))
         |  t(doc_key, text)
         |ORDER BY doc_key""".stripMargin,
    // Literal expectations ride the fixture.
    "m56_document_titles" ->
      s"""SELECT doc_id, exp_title AS title
         |FROM read_parquet('$m56Dir/*.parquet')
         |ORDER BY doc_id""".stripMargin,
    "m54_ods_extract" ->
      s"""SELECT doc_id, exp_paras AS n_paras, exp_text AS text
         |FROM read_parquet('$m54Dir/*.parquet')
         |ORDER BY doc_id""".stripMargin,
    "m55_odp_extract" ->
      s"""SELECT doc_id, exp_paras AS n_paras, exp_text AS text
         |FROM read_parquet('$m55Dir/*.parquet')
         |ORDER BY doc_id""".stripMargin,
    // Hand-derived: four members, sizes = payload byte lengths.
    "m53_zip_documents" ->
      """SELECT * FROM (VALUES
        |  ('img/blob.bin', 5::BIGINT, '<unknown>', '<undecodable>'),
        |  ('notes/readme.txt', 21::BIGINT, 'txt', 'zip member plain text'),
        |  ('papers/main.rtf', 26::BIGINT, 'rtf', 'zip member rtf'),
        |  ('site/index.html', 48::BIGINT, 'html', 'zip member html'))
        |  t(member, size, format, text)
        |ORDER BY member""".stripMargin,
    "m86_sevenz_documents" ->
      """SELECT * FROM (VALUES
        |  ('img/blob.bin', 6::BIGINT, '<unknown>', '<undecodable>'),
        |  ('notes/readme.txt', 21::BIGINT, 'txt', 'seven zip member text'),
        |  ('papers/report.docx', 665::BIGINT, 'docx', 'seven zip member docx'),
        |  ('site/index.html', 54::BIGINT, 'html', 'seven zip member html'))
        |  t(member, size, format, text)
        |ORDER BY member""".stripMargin,
    // Literal expectations ride the fixture.
    "m50_eml_extract" ->
      s"""SELECT doc_id, exp_subject AS subject, exp_parts AS n_parts,
         |  exp_text AS text
         |FROM read_parquet('$m50Dir/*.parquet')
         |ORDER BY doc_id""".stripMargin,
    // Hand-derived: the repost (c3) exact-dedups to the min message
    // id; the reply's mboxrd-quoted line unquotes.
    "m51_mbox_corpus" ->
      """SELECT * FROM (VALUES
        |  ('<a1@list>', 'announcement', 'the release is out today.'),
        |  ('<b2@list>', 'Re: announcement',
        |   'From the changelog, quoting:' || chr(10) ||
        |   'the release is out today, nice.'))
        |  t(msg_id, subject, text)
        |ORDER BY msg_id""".stripMargin,
    "m48_xlsx_extract" ->
      s"""SELECT doc_id, exp_paras AS n_paras, exp_text AS text
         |FROM read_parquet('$m48Dir/*.parquet')
         |ORDER BY doc_id""".stripMargin,
    "m49_pptx_extract" ->
      s"""SELECT doc_id, exp_paras AS n_paras, exp_text AS text
         |FROM read_parquet('$m49Dir/*.parquet')
         |ORDER BY doc_id""".stripMargin,
    "m44_xls_extract" ->
      s"""SELECT doc_id, exp_paras AS n_paras, exp_text AS text
         |FROM read_parquet('$m44Dir/*.parquet')
         |ORDER BY doc_id""".stripMargin,
    "m43_latex_extract" ->
      s"""SELECT doc_id, exp_paras AS n_paras, exp_text AS text
         |FROM read_parquet('$m43Dir/*.parquet')
         |ORDER BY doc_id""".stripMargin,
    "m42_document_probe" ->
      s"""SELECT doc_id, exp_format AS format, exp_text AS text
         |FROM read_parquet('$m42Dir/*.parquet')
         |ORDER BY doc_id""".stripMargin,
    "m84_datafile_inventory" ->
      s"""SELECT blob_id, exp_format AS format, exp_detail AS detail
         |FROM read_parquet('$m84Dir/*.parquet')
         |ORDER BY blob_id""".stripMargin,
    "m41_doc_extract" ->
      s"""SELECT doc_id, exp_paras AS n_paras, exp_text AS text
         |FROM read_parquet('$m41Dir/*.parquet')
         |ORDER BY doc_id""".stripMargin,
    "m40_rtf_extract" ->
      s"""SELECT doc_id, exp_paras AS n_paras, exp_text AS text
         |FROM read_parquet('$m40Dir/*.parquet')
         |ORDER BY doc_id""".stripMargin,
    "m39_odt_extract" ->
      s"""SELECT doc_id, exp_paras AS n_paras, exp_text AS text
         |FROM read_parquet('$m39Dir/*.parquet')
         |ORDER BY doc_id""".stripMargin,
    "m37_docx_extract" ->
      s"""SELECT doc_id, exp_paras AS n_paras, exp_text AS text
         |FROM read_parquet('$m37Dir/*.parquet')
         |ORDER BY doc_id""".stripMargin,
    "m36_epub_extract" ->
      s"""SELECT doc_id, exp_title AS title, exp_chapters AS n_chapters,
         |  exp_text AS text
         |FROM read_parquet('$m36Dir/*.parquet')
         |ORDER BY doc_id""".stripMargin,
    "m34_pdf_extract" ->
      s"""SELECT doc_id, exp_pages AS n_pages, exp_text AS text,
         |  exp_version AS version, exp_encrypted AS encrypted
         |FROM read_parquet('$m34Dir/*.parquet')
         |ORDER BY doc_id""".stripMargin,
    // Hand-derived from the fixture dump: last revision wins, the
    // redirect column carries through, wikitext dewikifies (template
    // dropped, link labels kept, ref dropped, heading as paragraph).
    "m46_wiki_pages" ->
      s"""SELECT * FROM (VALUES
         |  (1::BIGINT, 'Alpha', 0::INT, '<none>',
         |   '2024-06-01T00:00:00Z',
         |   'Alpha is the first letter.' || chr(10) || 'History' ||
         |   chr(10) || 'It began in Phoenicia.'),
         |  (2::BIGINT, 'Pointer & Co', 0::INT, 'Alpha',
         |   '2024-02-02T00:00:00Z', 'REDIRECT Alpha'),
         |  (3::BIGINT, 'Talk:Alpha', 1::INT, '<none>',
         |   '2024-03-03T00:00:00Z', ''))
         |  t(page_id, title, ns, redirect, timestamp, text)
         |ORDER BY page_id""".stripMargin,
    "m47_wikitext_extract" ->
      s"""SELECT * FROM (VALUES
         |  (0::BIGINT, 'Born in Ulm.'),
         |  (1::BIGINT, 'See Einstein and the site.'),
         |  (2::BIGINT, 'History' || chr(10) || 'bold item' ||
         |   chr(10) || 'Tail.'),
         |  (3::BIGINT, 'A picture end.'))
         |  t(doc_id, text)
         |ORDER BY doc_id""".stripMargin,
    // The adjudicated m26 verdicts, format-blind: the same two
    // survivors whether the corpus arrived as subtitles (m26), PDFs
    // (m35) or a six-format mix routed by magic (m45).
    "m45_mixed_curation" ->
      s"""SELECT * FROM (VALUES
         |  (1::BIGINT, 'mixed', 12::BIGINT, 0::BIGINT,
         |   sha256('$m26SurvivorA')),
         |  (6::BIGINT, 'mixed', 13::BIGINT, 0::BIGINT,
         |   sha256('$m26SurvivorF')))
         |  t(doc_id, source, n_tok, pack_id, content_sha)
         |ORDER BY doc_id""".stripMargin,
    // The adjudicated m26 verdicts with source 'pdf': docs 1 and 6
    // survive (12 and 13 whitespace tokens, one pack), DuckDB
    // recomputes the digests from the same literals.
    "m35_pdf_curation" ->
      s"""SELECT * FROM (VALUES
         |  (1::BIGINT, 'pdf', 12::BIGINT, 0::BIGINT,
         |   sha256('$m26SurvivorA')),
         |  (6::BIGINT, 'pdf', 13::BIGINT, 0::BIGINT,
         |   sha256('$m26SurvivorF')))
         |  t(doc_id, source, n_tok, pack_id, content_sha)
         |ORDER BY doc_id""".stripMargin,
    // Closed-form expectations ride the fixture (derivations in the
    // fixture doc); both sides round doubles to 6.
    "m33_webp_decode" ->
      s"""SELECT img_id, exp_format AS format, exp_w AS w, exp_h AS h,
         |  exp_dhash AS dhash, round(exp_mean, 6) AS mean_luma,
         |  round(exp_std, 6) AS std_luma, round(exp_lap, 6) AS laplacian_var
         |FROM read_parquet('$m33Dir/*.parquet')
         |ORDER BY img_id""".stripMargin,
    // Byte-identity verdicts: the static clip's 4 identical frames
    // give 3 zero distances (0 cuts, static 1); the montage's
    // distinct alternation cuts at all 3 pairs (static 0).
    "m32_video_stats" ->
      """SELECT * FROM (VALUES
        |  (0::BIGINT, 4, 0, 1.0),
        |  (1::BIGINT, 4, 3, 0.0),
        |  (2::BIGINT, -1, -1, -1.0))
        |  t(video_id, n_frames, n_cuts, static_ratio)
        |ORDER BY video_id""".stripMargin,
    // Closed-form pixel statistics: flat (77, 0, 0); stripes/checker
    // mean = std = 127.5 (two-point 0/255 distribution), Laplacian
    // var 510² = 260100 and 1020² = 1040400; broken bytes sentinel.
    "m31_image_stats" ->
      """SELECT * FROM (VALUES
        |  (0::BIGINT, 16, 16, 77.0, 0.0, 0.0),
        |  (1::BIGINT, 16, 16, 127.5, 127.5, 260100.0),
        |  (2::BIGINT, 16, 16, 127.5, 127.5, 1040400.0),
        |  (3::BIGINT, -1, -1, -1.0, -1.0, -1.0))
        |  t(img_id, w, h, mean_luma, std_luma, laplacian_var)
        |ORDER BY img_id""".stripMargin,
    // Independent-arithmetic expectations ride the fixture; both
    // sides round to 6.
    "m30_audio_stats" ->
      s"""SELECT audio_id, exp_n AS n_samples, exp_dur_ms AS duration_ms,
         |  round(exp_peak_db, 6) AS peak_db, round(exp_rms_db, 6) AS rms_db,
         |  round(exp_clip, 6) AS clip_ratio,
         |  round(exp_silence, 6) AS silence_ratio
         |FROM read_parquet('$m30Dir/*.parquet')
         |ORDER BY audio_id""".stripMargin,
    // Frame-byte identity + containment arithmetic: 11's 4 frames are
    // 4 of 10's 8 → (8, 4, 4, 4); nothing else shares a frame.
    "m25_video_byo_frames" ->
      """SELECT * FROM (VALUES
        |  (10::BIGINT, 11::BIGINT, 8::BIGINT, 4::BIGINT, 4::BIGINT, 4::BIGINT))
        |  t(vid_a, vid_b, n_frames_a, n_frames_b, matched_a, matched_b)
        |ORDER BY vid_a, vid_b""".stripMargin,
    // Survivors: clip B's keyframes share nothing with indexed clip
    // 0; the opaque video has no signature and passes through.
    "m27_video_byo_index_dedup" ->
      """SELECT * FROM (VALUES (21::BIGINT), (22::BIGINT)) t(video_id)
        |ORDER BY video_id""".stripMargin,
    // Hand-derived survivors (stage verdicts in the fixture doc);
    // DuckDB recomputes the digests from the same transcript
    // literals, token counts are whitespace-token counts by eye.
    "m26_subtitle_curation" ->
      s"""SELECT * FROM (VALUES
         |  (1::BIGINT, 'subs', 12::BIGINT, 0::BIGINT,
         |   sha256('$m26SurvivorA')),
         |  (6::BIGINT, 'subs', 13::BIGINT, 0::BIGINT,
         |   sha256('$m26SurvivorF')))
         |  t(doc_id, source, n_tok, pack_id, content_sha)
         |ORDER BY doc_id""".stripMargin,
    // Level-table hashes ride the fixture (same derivation as
    // m15/m21); the page-corrupted copy is the -999 sentinel.
    "m28_ogg_flac_fingerprint" ->
      s"""SELECT audio_id, exp_hash AS ahash
         |FROM read_parquet('$m28Dir/*.parquet')
         |ORDER BY audio_id""".stripMargin,
    // Header-arithmetic expectations ride the fixture; the average
    // bitrate is recomputed there from its definition and rounded on
    // both sides.
    "m29_mp3_inventory" ->
      s"""SELECT audio_id, exp_channels AS channels, exp_rate AS rate,
         |  exp_frames AS n_frames, exp_samples AS n_samples,
         |  exp_duration_ms AS duration_ms, exp_vbr AS vbr,
         |  round(exp_avg_kbps, 4) AS avg_kbps,
         |  exp_vbr_header AS vbr_header, exp_decl_frames AS decl_frames,
         |  exp_decl_bytes AS decl_bytes
         |FROM read_parquet('$m29Dir/*.parquet')
         |ORDER BY audio_id""".stripMargin)
}
