package graft.engine.validate

/** Video metadata probe: header-only parsing of the two dominant
  * container families — ISO-BMFF / MP4 (big-endian box tree, published
  * as ISO/IEC 14496-12) and RIFF AVI (little-endian chunk tree, the
  * `avih` MainAVIHeader layout) — recovering width, height, duration,
  * track count, frame count and the video codec FourCC WITHOUT
  * decoding any frame. The video analogue of [[ImageProbe]] /
  * [[AudioProbe]]: pure-JVM byte parsing (no codec dependency), wired
  * behind [[graft.multimodal.MediaDecoder.decode]] for `kind="video"`.
  *
  * Parser stance (crawl data lies), same as the audio walker: all
  * offsets tracked as Long so hostile sizes end the walk instead of
  * wrapping; declared sizes are clamped to the bytes present;
  * unknown boxes/chunks are skipped; degenerate header values
  * (zero timescale, zero-size box that doesn't advance) are a parse
  * failure, never a divide-by-zero or infinite loop.
  */
object VideoProbe {

  /** Header facts of one video payload. `durationMs` comes from the
    * movie header (mvhd duration/timescale for MP4; frame count ×
    * micro-sec-per-frame for AVI); `nFrames` is the video track's
    * sample count (MP4 stts sum; AVI dwTotalFrames), 0 if the index
    * is absent; `codec` is the sample-entry FourCC (`avc1`, `hev1`,
    * `mp4v`, ... for MP4; the `strh` fccHandler for AVI), "" if no
    * video track was found.
    */
  final case class VideoMeta(container: String, width: Int, height: Int,
                             durationMs: Long, nTracks: Int,
                             nFrames: Long, codec: String)

  // ---- big-endian readers (ISO-BMFF) --------------------------------

  private[validate] def u16be(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)

  private[validate] def u32be(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
      ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)

  private[validate] def u64be(b: Array[Byte], off: Int): Long =
    (u32be(b, off) << 32) | u32be(b, off + 4)

  // ---- little-endian readers (RIFF/AVI) -----------------------------

  private def u32le(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  private[validate] def tag(b: Array[Byte], off: Int): String =
    new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

  // ------------------------------------------------------------------
  // ISO-BMFF / MP4
  // ------------------------------------------------------------------

  /** MP4 sniff: first top-level box is conventionally `ftyp`, but
    * bare/streamed files may open with `moov`/`mdat`/`free`/`wide`/
    * `skip` — accept any of those known top-level types with a sane
    * declared size shape.
    */
  private val mp4TopBoxes =
    Set("ftyp", "moov", "mdat", "free", "skip", "wide", "pdin", "styp", "sidx")

  private[validate] def isMp4(b: Array[Byte]): Boolean =
    b != null && b.length >= 8 && {
      val size = u32be(b, 0)
      mp4TopBoxes.contains(tag(b, 4)) && (size == 0L || size == 1L || size >= 8L)
    }

  /** Walk the boxes of `[start, end)` invoking `f(type, pStart, pEnd)`
    * per box payload. Box = u32 size + 4cc type; size==1 → u64
    * largesize follows; size==0 → box extends to `end`. A size that
    * is smaller than its own header, or that does not advance the
    * offset, ends the walk (hostile input, not an exception).
    */
  private[validate] def walkBoxes(b: Array[Byte], start: Long, end: Long)(
      f: (String, Long, Long) => Unit): Unit = {
    var off = start
    var sane = true
    while (sane && off + 8 <= end) {
      val o = off.toInt
      val declared = u32be(b, o)
      val typ = tag(b, o + 4)
      var hdr = 8L
      var size = declared
      if (declared == 1L) {
        if (off + 16 > end) { sane = false; size = 0 }
        else { hdr = 16L; size = u64be(b, o + 8) }
      } else if (declared == 0L) {
        size = end - off // last box: extends to the end of the range
      }
      if (sane) {
        if (size < hdr) sane = false // lying size: smaller than its header
        else if (off + size > end) {
          // a box overrunning the payload (truncated download — mdat
          // cut mid-stream is routine) is clamped and ENDS the walk:
          // the next box offset cannot be trusted past a lying size.
          f(typ, off + hdr, end)
          sane = false
        } else {
          f(typ, off + hdr, off + size)
          off += size
        }
      }
    }
  }

  /** First child box named `name` inside `[start, end)`. */
  private[validate] def findBox(b: Array[Byte], start: Long, end: Long,
                      name: String): Option[(Long, Long)] = {
    var found: Option[(Long, Long)] = None
    walkBoxes(b, start, end) { (t, s, e) =>
      if (found.isEmpty && t == name) found = Some((s, e))
    }
    found
  }

  /** mvhd payload → (timescale, duration). Version 0: u32 fields at
    * 12/16; version 1: 64-bit times, timescale at 20, duration u64
    * at 24.
    */
  private[validate] def mvhd(b: Array[Byte], s: Long, e: Long): Option[(Long, Long)] = {
    if (s + 4 > e) return None
    val v = b(s.toInt) & 0xff
    if (v == 1) {
      if (s + 32 > e) None
      else Some((u32be(b, s.toInt + 20), u64be(b, s.toInt + 24)))
    } else {
      if (s + 20 > e) None
      else Some((u32be(b, s.toInt + 12), u32be(b, s.toInt + 16)))
    }
  }

  /** tkhd payload → (width, height) as the integer part of the 16.16
    * fixed-point fields. Version 0: width at 76; version 1: at 88.
    */
  private def tkhd(b: Array[Byte], s: Long, e: Long): Option[(Int, Int)] = {
    if (s + 4 > e) return None
    val wOff = if ((b(s.toInt) & 0xff) == 1) 88L else 76L
    if (s + wOff + 8 > e) None
    else Some(((u32be(b, (s + wOff).toInt) >> 16).toInt,
      (u32be(b, (s + wOff + 4).toInt) >> 16).toInt))
  }

  /** hdlr payload → handler_type 4cc (offset 8: version/flags + pre_defined). */
  private[validate] def hdlr(b: Array[Byte], s: Long, e: Long): Option[String] =
    if (s + 12 > e) None else Some(tag(b, s.toInt + 8))

  /** stts payload → total sample count (sum of entry sample_counts). */
  private def sttsTotal(b: Array[Byte], s: Long, e: Long): Long = {
    if (s + 8 > e) return 0L
    val n = u32be(b, s.toInt + 4)
    var total = 0L
    var i = 0L
    while (i < n && s + 8 + i * 8 + 8 <= e) {
      total += u32be(b, (s + 8 + i * 8).toInt)
      i += 1
    }
    total
  }

  /** stsd payload → first sample-entry FourCC (entry: u32 size + 4cc). */
  private def stsdCodec(b: Array[Byte], s: Long, e: Long): Option[String] =
    if (s + 16 > e || u32be(b, s.toInt + 4) < 1) None
    else Some(tag(b, s.toInt + 12))

  def mp4Info(bytes: Array[Byte]): Option[VideoMeta] = {
    if (!isMp4(bytes)) return None
    val end = bytes.length.toLong
    val moov = findBox(bytes, 0L, end, "moov").getOrElse(return None)
    val header = findBox(bytes, moov._1, moov._2, "mvhd")
      .flatMap { case (s, e) => mvhd(bytes, s, e) }
      .getOrElse(return None)
    if (header._1 <= 0) return None // zero timescale: degenerate
    val durationMs = header._2 * 1000L / header._1
    var nTracks = 0
    var width = -1
    var height = -1
    var nFrames = 0L
    var codec = ""
    walkBoxes(bytes, moov._1, moov._2) { (t, s, e) =>
      if (t == "trak") {
        nTracks += 1
        val mdia = findBox(bytes, s, e, "mdia")
        val isVideo = mdia.flatMap { case (ms, me) =>
          findBox(bytes, ms, me, "hdlr").flatMap { case (hs, he) =>
            hdlr(bytes, hs, he)
          }
        }.contains("vide")
        if (isVideo && width < 0) {
          findBox(bytes, s, e, "tkhd").flatMap { case (ks, ke) =>
            tkhd(bytes, ks, ke)
          }.foreach { case (w, h) => width = w; height = h }
          for {
            (ms, me) <- mdia
            (fs, fe) <- findBox(bytes, ms, me, "minf")
            (ss, se) <- findBox(bytes, fs, fe, "stbl")
          } {
            findBox(bytes, ss, se, "stts").foreach { case (ts2, te2) =>
              nFrames = sttsTotal(bytes, ts2, te2)
            }
            findBox(bytes, ss, se, "stsd").foreach { case (ds, de) =>
              stsdCodec(bytes, ds, de).foreach(codec = _)
            }
          }
        }
      }
    }
    Some(VideoMeta("mp4", width, height, durationMs, nTracks, nFrames, codec))
  }

  // ------------------------------------------------------------------
  // RIFF / AVI
  // ------------------------------------------------------------------

  private def isAvi(b: Array[Byte]): Boolean =
    b != null && b.length >= 12 && tag(b, 0) == "RIFF" && tag(b, 8) == "AVI "

  /** Walk RIFF chunks of `[start, end)`, recursing into LIST chunks,
    * invoking `f(chunkId, listType, pStart, pEnd)` — `listType` is the
    * enclosing LIST's 4cc ("" at top level). Chunk sizes are unsigned
    * LE and even-padded; hostile sizes end the walk.
    */
  private def walkRiff(b: Array[Byte], start: Long, end: Long,
                       listType: String, depth: Int = 0)(
      f: (String, String, Long, Long) => Unit): Unit = {
    if (depth > 16) return // hostile LIST-in-LIST nesting: real AVIs sit at ≤4
    var off = start
    while (off + 8 <= end) {
      val o = off.toInt
      val id = tag(b, o)
      val declared = u32le(b, o + 4)
      val pStart = off + 8
      val pEnd = math.min(pStart + declared, end)
      if (id == "LIST" && declared >= 4 && pStart + 4 <= end) {
        walkRiff(b, pStart + 4, pEnd, tag(b, pStart.toInt), depth + 1)(f)
      } else {
        f(id, listType, pStart, pEnd)
      }
      off += 8L + declared + (declared & 1L)
    }
  }

  def aviInfo(bytes: Array[Byte]): Option[VideoMeta] = {
    if (!isAvi(bytes)) return None
    val end = bytes.length.toLong
    var meta: Option[VideoMeta] = None
    var codec = ""
    var sawVids = false
    walkRiff(bytes, 12L, end, "") { (id, _, s, e) =>
      if (id == "avih" && meta.isEmpty && e - s >= 40) {
        val o = s.toInt
        val usPerFrame = u32le(bytes, o)
        val totalFrames = u32le(bytes, o + 16)
        val streams = u32le(bytes, o + 24)
        val w = u32le(bytes, o + 32)
        val h = u32le(bytes, o + 36)
        meta = Some(VideoMeta("avi", w.toInt, h.toInt,
          totalFrames * usPerFrame / 1000L, streams.toInt, totalFrames, ""))
      } else if (id == "strh" && !sawVids && e - s >= 8 &&
        tag(bytes, s.toInt) == "vids") {
        sawVids = true
        codec = tag(bytes, s.toInt + 4).trim
      }
    }
    meta.map(m => if (codec.nonEmpty) m.copy(codec = codec) else m)
  }

  // ------------------------------------------------------------------
  // EBML / Matroska / WebM (RFC 8794 EBML structure; Matroska element
  // IDs from the public matroska.org specification)
  // ------------------------------------------------------------------

  private def isEbml(b: Array[Byte]): Boolean =
    b != null && b.length >= 4 &&
      (b(0) & 0xff) == 0x1A && (b(1) & 0xff) == 0x45 &&
      (b(2) & 0xff) == 0xDF && (b(3) & 0xff) == 0xA3

  /** Variable-length integer at `off`: the first byte's leading-zero
    * count picks the width (1–8). `keepMarker` keeps the length
    * marker bit (element IDs compare as their full encoded value);
    * sizes drop it. Returns (value, width, allDataBitsOne) — the last
    * flag is EBML's "unknown size" sentinel (stream to parent end).
    * A 0x00 lead byte (width > 8) or truncation returns None.
    */
  private def vint(b: Array[Byte], off: Long, end: Long,
                   keepMarker: Boolean): Option[(Long, Int, Boolean)] = {
    if (off >= end) return None
    val first = b(off.toInt) & 0xff
    if (first == 0) return None
    val width = Integer.numberOfLeadingZeros(first) - 23
    if (off + width > end) return None
    val dataMask = 0xff >>> width
    var v = if (keepMarker) first.toLong else (first & dataMask).toLong
    var allOnes = (first & dataMask) == dataMask
    var i = 1
    while (i < width) {
      val x = b((off + i).toInt) & 0xff
      v = (v << 8) | x
      if (x != 0xff) allOnes = false
      i += 1
    }
    Some((v, width, allOnes))
  }

  /** Walk EBML elements of `[start, end)` invoking `f(id, pStart,
    * pEnd)` per element payload. Unknown-size elements stream to the
    * parent end; a payload overrunning the range (truncated download)
    * is clamped and ENDS the walk, exactly like [[walkBoxes]].
    */
  private def walkEbml(b: Array[Byte], start: Long, end: Long)(
      f: (Long, Long, Long) => Unit): Unit = {
    var off = start
    var sane = true
    while (sane && off < end) {
      val parsed = for {
        (id, idW, _) <- vint(b, off, end, keepMarker = true)
        (sz, szW, unknown) <- vint(b, off + idW, end, keepMarker = false)
      } yield (id, off + idW + szW, sz, unknown)
      parsed match {
        case None => sane = false
        case Some((id, pStart, sz, unknown)) =>
          if (unknown || pStart + sz > end) {
            f(id, pStart, end)
            sane = false // next offset untrustworthy past a lying size
          } else {
            f(id, pStart, pStart + sz)
            val next = pStart + sz
            if (next <= off) sane = false // zero-advance: hostile
            else off = next
          }
      }
    }
  }

  /** First child element with `id` inside `[start, end)`. */
  private def findEbml(b: Array[Byte], start: Long, end: Long,
                       id: Long): Option[(Long, Long)] = {
    var found: Option[(Long, Long)] = None
    walkEbml(b, start, end) { (t, s, e) =>
      if (found.isEmpty && t == id) found = Some((s, e))
    }
    found
  }

  /** Big-endian unsigned integer payload (0–8 bytes; empty = 0, the
    * EBML default-value rule).
    */
  private def ebmlUint(b: Array[Byte], s: Long, e: Long): Long = {
    var v = 0L
    var i = s
    while (i < e && i - s < 8) { v = (v << 8) | (b(i.toInt) & 0xffL); i += 1 }
    v
  }

  /** IEEE float payload: 4 or 8 bytes; anything else is invalid. */
  private def ebmlFloat(b: Array[Byte], s: Long, e: Long): Option[Double] =
    (e - s) match {
      case 4 => Some(java.lang.Float.intBitsToFloat(u32be(b, s.toInt).toInt)
        .toDouble)
      case 8 => Some(java.lang.Double.longBitsToDouble(u64be(b, s.toInt)))
      case _ => None
    }

  private def ebmlString(b: Array[Byte], s: Long, e: Long): String =
    new String(b, s.toInt, (e - s).toInt,
      java.nio.charset.StandardCharsets.UTF_8).takeWhile(_ != '\u0000')

  // Matroska element IDs (full encoded values, marker bit kept).
  private val IdSegment = 0x18538067L
  private val IdDocType = 0x4282L
  private val IdInfo = 0x1549A966L
  private val IdTimestampScale = 0x2AD7B1L
  private val IdDuration = 0x4489L
  private val IdTracks = 0x1654AE6BL
  private val IdTrackEntry = 0xAEL
  private val IdTrackType = 0x83L
  private val IdCodecID = 0x86L
  private val IdVideo = 0xE0L
  private val IdPixelWidth = 0xB0L
  private val IdPixelHeight = 0xBAL

  /** Matroska/WebM header walk: DocType from the EBML head picks the
    * container name; Segment → Info yields TimestampScale (default
    * 1,000,000 ns/unit) and the optional float Duration (in timestamp
    * units → ms); Segment → Tracks yields track count, the first
    * video track's PixelWidth/PixelHeight and CodecID. Matroska
    * stores no frame count in its headers (it lives in the Cluster
    * data), so `nFrames` is honestly 0. A missing Segment or Info is
    * a parse failure; a zero TimestampScale is degenerate.
    */
  def mkvInfo(bytes: Array[Byte]): Option[VideoMeta] = {
    if (!isEbml(bytes)) return None
    val end = bytes.length.toLong
    // EBML head is itself element 0x1A45DFA3 at offset 0
    val head = findEbml(bytes, 0L, end, 0x1A45DFA3L)
    val docType = head.flatMap { case (s, e) =>
      findEbml(bytes, s, e, IdDocType).map { case (ds, de) =>
        ebmlString(bytes, ds, de)
      }
    }.getOrElse("matroska")
    val container = if (docType == "webm") "webm" else "mkv"
    val seg = findEbml(bytes, 0L, end, IdSegment).getOrElse(return None)
    val info = findEbml(bytes, seg._1, seg._2, IdInfo).getOrElse(return None)
    val tsScale = findEbml(bytes, info._1, info._2, IdTimestampScale)
      .map { case (s, e) => ebmlUint(bytes, s, e) }.getOrElse(1000000L)
    if (tsScale <= 0) return None
    val durationMs = findEbml(bytes, info._1, info._2, IdDuration)
      .flatMap { case (s, e) => ebmlFloat(bytes, s, e) }
      .map(d => (d * tsScale / 1e6).toLong).getOrElse(0L)
    var nTracks = 0
    var width = -1
    var height = -1
    var codec = ""
    findEbml(bytes, seg._1, seg._2, IdTracks).foreach { case (ts, te) =>
      walkEbml(bytes, ts, te) { (id, s, e) =>
        if (id == IdTrackEntry) {
          nTracks += 1
          val isVideo = findEbml(bytes, s, e, IdTrackType)
            .exists { case (vs, ve) => ebmlUint(bytes, vs, ve) == 1L }
          if (isVideo && width < 0) {
            findEbml(bytes, s, e, IdCodecID).foreach { case (cs, ce) =>
              codec = ebmlString(bytes, cs, ce)
            }
            findEbml(bytes, s, e, IdVideo).foreach { case (ps, pe) =>
              findEbml(bytes, ps, pe, IdPixelWidth).foreach { case (ws, we) =>
                width = ebmlUint(bytes, ws, we).toInt
              }
              findEbml(bytes, ps, pe, IdPixelHeight).foreach { case (hs, he) =>
                height = ebmlUint(bytes, hs, he).toInt
              }
            }
          }
        }
      }
    }
    Some(VideoMeta(container, width, height, durationMs, nTracks, 0L, codec))
  }

  /** Unified probe: dispatch on container signature — MP4 family,
    * RIFF AVI, or EBML (Matroska/WebM). One entry point for the
    * multimodal metadata path.
    */
  def meta(bytes: Array[Byte]): Option[VideoMeta] =
    if (isAvi(bytes)) aviInfo(bytes)
    else if (isEbml(bytes)) mkvInfo(bytes)
    else if (isMp4(bytes)) mp4Info(bytes)
    else None

  /** Failure diagnosis, same contract as [[ImageProbe.diagnose]] /
    * [[AudioProbe.diagnoseMeta]]: stable strings a pipeline can group
    * dead-letters by.
    */
  def diagnose(bytes: Array[Byte]): String =
    if (bytes == null || bytes.isEmpty) "file is empty"
    else if (isAvi(bytes))
      if (aviInfo(bytes).isDefined) "ok" else "avi header missing or truncated"
    else if (isEbml(bytes))
      if (mkvInfo(bytes).isDefined) "ok" else "ebml segment info missing or truncated"
    else if (isMp4(bytes))
      if (mp4Info(bytes).isDefined) "ok" else "mp4 movie header missing or truncated"
    else "not a recognized video container"
}
