package graft.engine.validate

/** Audio metadata probe: a RIFF/WAVE chunk walker recovering channels,
  * sample rate, bits-per-sample and frame count from the container
  * header WITHOUT decoding samples — the audio analogue of
  * [[ImageProbe]]'s header-only image read. Pure JVM byte parsing (no
  * codec dependency), so unlike compressed formats this modality CAN
  * decode for real in this environment; wired behind
  * [[graft.multimodal.MediaDecoder.decode]] for `kind="audio"`.
  *
  * Parser stance (crawl data lies): the outer RIFF size field is
  * ignored — chunks are walked against the actual byte length; chunk
  * sizes are read as UNSIGNED 32-bit; chunks are padded to even
  * offsets per spec; unknown chunks (`LIST`, `fact`, `bext`, ...) are
  * skipped, so metadata-bearing WAVs parse the same as canonical
  * 44-byte-header ones; a declared `data` size that overruns the
  * actual payload is clamped to the bytes present (truncated download
  * ≠ unreadable). Any format tag is accepted — frame count needs only
  * a sane block align — but degenerate fmt values (zero channels/rate/
  * align) are a parse failure, not a divide-by-zero.
  */
object AudioProbe {

  /** Header facts of one WAVE payload. `nFrames` counts sample frames
    * (all channels advance together): `data bytes / blockAlign`.
    */
  final case class WavInfo(channels: Int, sampleRateHz: Int,
                           bitsPerSample: Int, nFrames: Long) {
    def durationMs: Long =
      if (sampleRateHz <= 0) 0L else nFrames * 1000L / sampleRateHz
  }

  private def u16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  private def u32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  private def tag(b: Array[Byte], off: Int): String =
    new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

  private def isRiffWave(b: Array[Byte]): Boolean =
    b != null && b.length >= 12 && tag(b, 0) == "RIFF" && tag(b, 8) == "WAVE"

  def info(bytes: Array[Byte]): Option[WavInfo] = {
    if (!isRiffWave(bytes)) return None
    // offsets tracked as Long: a hostile chunk size near 0xFFFFFFFF
    // must end the walk by exceeding the length, NEVER wrap/clamp back
    // into Int range (an Int offset clamped to MaxValue makes
    // `off + 8` overflow negative and re-enter the loop out of bounds)
    var off = 12L
    var fmt: Option[(Int, Int, Int, Int)] = None // channels, rate, align, bits
    var dataBytes = -1L
    while (off + 8 <= bytes.length && (fmt.isEmpty || dataBytes < 0)) {
      val o = off.toInt // safe: off + 8 <= length <= Int.MaxValue
      val id = tag(bytes, o)
      val declared = u32(bytes, o + 4)
      val start = o + 8
      val avail = math.min(declared, (bytes.length - start).toLong)
      if (id == "fmt " && fmt.isEmpty && avail >= 16) {
        val channels = u16(bytes, start + 2)
        val rate = u32(bytes, start + 4)
        val align = u16(bytes, start + 12)
        val bits = u16(bytes, start + 14)
        if (channels >= 1 && rate >= 1 && rate <= Int.MaxValue && align >= 1)
          fmt = Some((channels, rate.toInt, align, bits))
      } else if (id == "data" && dataBytes < 0) {
        dataBytes = avail
      }
      // next chunk: declared size padded to even — Long arithmetic,
      // monotonically increasing, so a lying size just fails the
      // loop bound
      off += 8L + declared + (declared & 1L)
    }
    fmt.collect { case (channels, rate, align, bits) if dataBytes >= 0 =>
      WavInfo(channels, rate, bits, dataBytes / align)
    }
  }

  /** Failure diagnosis, same contract as [[ImageProbe.diagnose]]:
    * stable strings a pipeline can group dead-letters by.
    */
  def diagnose(bytes: Array[Byte]): String =
    if (bytes == null || bytes.isEmpty) "file is empty"
    else if (!isRiffWave(bytes)) "not a RIFF/WAVE container"
    else info(bytes) match {
      case Some(_) => "ok"
      case None =>
        // distinguish the two walk failures for triage (same Long-
        // offset rule as info: a lying size ends the walk, no wrap)
        var off = 12L
        var sawFmt = false
        while (off + 8 <= bytes.length && !sawFmt) {
          val o = off.toInt
          if (tag(bytes, o) == "fmt ") sawFmt = true
          else {
            val declared = u32(bytes, o + 4)
            off += 8L + declared + (declared & 1L)
          }
        }
        if (sawFmt) "wave data chunk missing or fmt truncated"
        else "wave fmt chunk missing"
    }

  // ------------------------------------------------------------------
  // Compressed-container HEADER probes (no sample decoding): FLAC
  // STREAMINFO (xiph format spec) and MPEG audio frame headers (the
  // published ISO 11172-3 / 13818-3 header layout). Same stance as the
  // WAVE walker: bounds-checked byte parsing, hostile sizes end the
  // walk, degenerate field values are a parse failure.
  // ------------------------------------------------------------------

  /** Unified audio header facts across codecs. `bitsPerSample` is 0
    * where the codec doesn't fix it in the header (MP3);
    * `nSamples` counts inter-channel sample frames — exact from
    * STREAMINFO for FLAC, frame-walk × samples-per-frame for MP3
    * (exact for well-formed CBR/VBR streams), data/align for WAV.
    */
  final case class AudioMeta(codec: String, channels: Int,
                             sampleRateHz: Int, bitsPerSample: Int,
                             nSamples: Long)

  /** Ogg Vorbis/Opus INVENTORY (the HEIF posture: the entropy coders
    * — Vorbis floor/residue, Opus SILK/CELT — stay recorded decode
    * skips, but the web's two dominant lossy-audio classes must at
    * least inventory). Codec/channels/rate come from the BOS page's
    * identification header (Vorbis I §4.2.2; RFC 7845 §5.1);
    * `nSamples` from the LAST page's granule position — PCM sample
    * frames for Vorbis, 48 kHz samples minus pre-skip for Opus
    * (granules are absolute per the mappings, so the tail page alone
    * dates the stream). The tail page is found by a backwards magic
    * scan, serial-matched AND CRC-verified — payload bytes that
    * merely contain `OggS` cannot fake a granule. None for
    * non-Ogg / other codecs (Ogg-FLAC has its own full decode path,
    * [[graft.multimodal.OggFlac]]).
    */
  def oggInfo(bytes: Array[Byte]): Option[AudioMeta] = {
    if (bytes == null || bytes.length < 28) return None
    if (!(bytes(0) == 'O' && bytes(1) == 'g' && bytes(2) == 'g' &&
      bytes(3) == 'S' && bytes(4) == 0)) return None
    def u16le(o: Int) = (bytes(o) & 0xFF) | ((bytes(o + 1) & 0xFF) << 8)
    def u32le(o: Int): Long =
      (bytes(o) & 0xFFL) | ((bytes(o + 1) & 0xFFL) << 8) |
        ((bytes(o + 2) & 0xFFL) << 16) | ((bytes(o + 3) & 0xFFL) << 24)
    def u64le(o: Int): Long = u32le(o) | (u32le(o + 4) << 32)
    val nseg = bytes(26) & 0xFF
    if (27 + nseg > bytes.length) return None
    // first packet: lacing values until one < 255
    var plen = 0
    var i = 0
    var open = true
    while (i < nseg && open) {
      val l = bytes(27 + i) & 0xFF
      plen += l
      if (l < 255) open = false
      i += 1
    }
    val p = 27 + nseg
    if (open || p + plen > bytes.length) return None
    val serial = u32le(14)
    def str(o: Int, s: String): Boolean =
      o + s.length <= bytes.length &&
        s.indices.forall(k => bytes(o + k) == s.charAt(k).toByte)
    // last page of THIS stream: backwards magic scan, serial + CRC
    // verified so payload `OggS` collisions cannot fake a granule
    def lastGranule: Option[Long] = {
      var j = bytes.length - 28
      while (j >= 0) {
        if (bytes(j) == 'O' && str(j, "OggS") && bytes(j + 4) == 0 &&
          u32le(j + 14) == serial && j + 27 <= bytes.length) {
          val ns = bytes(j + 26) & 0xFF
          if (j + 27 + ns <= bytes.length) {
            var bodyLen = 0
            var k = 0
            while (k < ns) { bodyLen += bytes(j + 27 + k) & 0xFF; k += 1 }
            val end = j + 27 + ns + bodyLen
            if (end <= bytes.length) {
              val declared = u32le(j + 22)
              val computed = graft.multimodal.OggFlac
                .crc32Ogg(bytes, j, end, j + 22, j + 26)
              if (computed == declared) return Some(u64le(j + 6))
            }
          }
        }
        j -= 1
      }
      None
    }
    if (plen >= 30 && bytes(p) == 1 && str(p + 1, "vorbis")) {
      val channels = bytes(p + 11) & 0xFF
      val rate = u32le(p + 12)
      if (channels < 1 || rate < 1 || rate > Int.MaxValue) return None
      Some(AudioMeta("vorbis", channels, rate.toInt, 0,
        math.max(0L, lastGranule.getOrElse(0L))))
    } else if (plen >= 19 && str(p, "OpusHead")) {
      val channels = bytes(p + 9) & 0xFF
      if (channels < 1) return None
      val preSkip = u16le(p + 10)
      // Opus always decodes at 48 kHz; granules count 48 kHz samples
      Some(AudioMeta("opus", channels, 48000, 0,
        math.max(0L, lastGranule.getOrElse(0L) - preSkip)))
    } else None
  }

  /** M4A (audio-in-MP4 — the podcast class) inventory off the
    * ISO-BMFF metadata boxes ([[VideoProbe]]'s hostility-hardened
    * walk): the FIRST `soun` track's audio sample entry gives codec
    * (`mp4a`/`alac`), channel count and the 16.16 sample rate;
    * `nSamples` converts the track's `mdhd` duration from media
    * timescale to sample frames (for audio the timescale
    * conventionally IS the rate, making the conversion exact). AAC/
    * ALAC entropy decode is a recorded skip — inventory is what the
    * curation stages consume. None for video-only or non-MP4.
    */
  def m4aInfo(bytes: Array[Byte]): Option[AudioMeta] = {
    import VideoProbe.{findBox, isMp4, mvhd, u16be, u32be, walkBoxes}
    if (!isMp4(bytes)) return None
    val end = bytes.length.toLong
    val (ms0, me0) = findBox(bytes, 0L, end, "moov").getOrElse(return None)
    var out: Option[AudioMeta] = None
    walkBoxes(bytes, ms0, me0) { (t, s, e) =>
      if (t == "trak" && out.isEmpty) {
        val mdia = findBox(bytes, s, e, "mdia")
        val isAudio = mdia.flatMap { case (hs0, he0) =>
          findBox(bytes, hs0, he0, "hdlr").flatMap { case (hs, he) =>
            VideoProbe.hdlr(bytes, hs, he)
          }
        }.contains("soun")
        if (isAudio) {
          for {
            (mdS, mdE) <- mdia
            (fs, fe)   <- findBox(bytes, mdS, mdE, "minf")
            (ss, se)   <- findBox(bytes, fs, fe, "stbl")
            (ds, de)   <- findBox(bytes, ss, se, "stsd")
            // stsd payload: fullbox(4) + entry count(4); the entry's
            // AudioSampleEntry fields sit at fixed offsets from its
            // start (ISO 14496-12 §12.2.3)
            if de - ds >= 44 && u32be(bytes, ds.toInt + 4) >= 1
          } {
            val entry = ds.toInt + 8
            val codec = VideoProbe.tag(bytes, entry + 4)
            val channels = u16be(bytes, entry + 24)
            val rate = (u32be(bytes, entry + 32) >> 16).toInt
            // mdhd shares mvhd's (timescale, duration) field layout
            val dur = findBox(bytes, mdS, mdE, "mdhd")
              .flatMap { case (hs, he) => mvhd(bytes, hs, he) }
            if (channels >= 1 && channels <= 64 && rate > 0) {
              val nSamples = dur match {
                case Some((ts, d)) if ts > 0 =>
                  if (ts == rate) d else d * rate / ts
                case _ => 0L
              }
              out = Some(AudioMeta(codec, channels, rate, 0, nSamples))
            }
          }
        }
      }
    }
    out
  }

  private def isFlac(b: Array[Byte]): Boolean =
    b != null && b.length >= 4 && b(0) == 'f' && b(1) == 'L' &&
      b(2) == 'a' && b(3) == 'C'

  /** FLAC: walk metadata blocks to STREAMINFO (type 0, 34 bytes),
    * unpack the 20-bit rate / 3-bit channels / 5-bit bps / 36-bit
    * total-samples field group.
    */
  def flacInfo(bytes: Array[Byte]): Option[AudioMeta] = {
    if (!isFlac(bytes)) return None
    var off = 4L
    var last = false
    while (!last && off + 4 <= bytes.length) {
      val o = off.toInt
      val hdr = bytes(o) & 0xff
      last = (hdr & 0x80) != 0
      val btype = hdr & 0x7f
      val blen = ((bytes(o + 1) & 0xffL) << 16) |
        ((bytes(o + 2) & 0xffL) << 8) | (bytes(o + 3) & 0xffL)
      if (btype == 0) {
        if (o + 4 + 34 > bytes.length || blen < 34) return None // truncated
        val s = o + 4
        val rate = ((bytes(s + 10) & 0xff) << 12) |
          ((bytes(s + 11) & 0xff) << 4) | ((bytes(s + 12) & 0xff) >>> 4)
        val channels = ((bytes(s + 12) >>> 1) & 0x7) + 1
        val bps = (((bytes(s + 12) & 1) << 4) |
          ((bytes(s + 13) & 0xff) >>> 4)) + 1
        val nSamples = ((bytes(s + 13) & 0xfL) << 32) |
          ((bytes(s + 14) & 0xffL) << 24) | ((bytes(s + 15) & 0xffL) << 16) |
          ((bytes(s + 16) & 0xffL) << 8) | (bytes(s + 17) & 0xffL)
        return if (rate >= 1) Some(AudioMeta("flac", channels, rate, bps,
          nSamples))
        else None
      }
      off += 4L + blen
    }
    None // no STREAMINFO before the last-block flag / EOF
  }

  // MPEG sample-rate table by version bits (0=2.5, 2=v2, 3=v1) × index
  private val mpegRates = Map(
    3 -> Array(44100, 48000, 32000),
    2 -> Array(22050, 24000, 16000),
    0 -> Array(11025, 12000, 8000))

  // bitrate tables in kbps, index 1..14 (0 = free, 15 = invalid)
  private val br1L1 = Array(0, 32, 64, 96, 128, 160, 192, 224, 256, 288,
    320, 352, 384, 416, 448)
  private val br1L2 = Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 160,
    192, 224, 256, 320, 384)
  private val br1L3 = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128,
    160, 192, 224, 256, 320)
  private val br2L1 = Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 144,
    160, 176, 192, 224, 256)
  private val br2L23 = Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96,
    112, 128, 144, 160)

  /** One parsed MPEG frame header at `off`: (frameBytes,
    * samplesPerFrame, sampleRate, channels, kbps, version, crc), or
    * None if not a valid header. `version` is the raw 2-bit field
    * (3 = MPEG-1), `crc` whether a 16-bit CRC follows the header
    * (protection bit 0).
    */
  private final case class Mp3FrameHeader(
      frameBytes: Int, samplesPerFrame: Int, sampleRate: Int,
      channels: Int, kbps: Int, version: Int, crc: Boolean)

  private def mp3Frame(b: Array[Byte], off: Int): Option[Mp3FrameHeader] = {
    if (off + 4 > b.length) return None
    if ((b(off) & 0xff) != 0xff || (b(off + 1) & 0xe0) != 0xe0) return None
    val version = (b(off + 1) >>> 3) & 0x3 // 0=2.5, 1=reserved, 2=v2, 3=v1
    val layer = (b(off + 1) >>> 1) & 0x3 // 0=reserved, 1=III, 2=II, 3=I
    if (version == 1 || layer == 0) return None
    val brIdx = (b(off + 2) >>> 4) & 0xf
    val srIdx = (b(off + 2) >>> 2) & 0x3
    if (brIdx == 0 || brIdx == 15 || srIdx == 3) return None // free/invalid
    val padding = (b(off + 2) >>> 1) & 0x1
    val channels = if (((b(off + 3) >>> 6) & 0x3) == 3) 1 else 2
    val rate = mpegRates(version)(srIdx)
    val v1 = version == 3
    val kbps = (v1, layer) match {
      case (true, 3) => br1L1(brIdx)
      case (true, 2) => br1L2(brIdx)
      case (true, 1) => br1L3(brIdx)
      case (false, 3) => br2L1(brIdx)
      case (false, _) => br2L23(brIdx)
    }
    val bitrate = kbps * 1000
    val (frameLen, samples) = layer match {
      case 3 => ((12 * bitrate / rate + padding) * 4, 384) // Layer I
      case 2 => (144 * bitrate / rate + padding, 1152) // Layer II
      case _ => // Layer III: 1152 samples v1, 576 v2/v2.5
        if (v1) (144 * bitrate / rate + padding, 1152)
        else (72 * bitrate / rate + padding, 576)
    }
    if (frameLen < 4) None
    else Some(Mp3FrameHeader(frameLen, samples, rate, channels, kbps,
      version, (b(off + 1) & 0x1) == 0))
  }

  /** MP3: skip an ID3v2 tag if present (syncsafe size), resync to the
    * first valid frame header within the probe window, then WALK the
    * frames (VBR-safe) accumulating samples. Parameters come from the
    * first frame; the walk stops at the first non-frame byte (tag
    * padding, truncation), which just ends the count.
    */
  /** ID3v2 skip + confirmed-sync resync, shared by [[mp3Info]] and
    * [[mp3Inventory]] (ONE copy of the policy): tolerate leading junk
    * within a bounded window, like real players do — but demand the
    * sync CONFIRM: the next header at off+frameLen must also parse
    * with the same rate. A lone 4-byte pattern matches random binary
    * at ~2e-4 per offset — over a 4096-byte window roughly half of
    * junk blobs would otherwise probe as "valid mp3"; two consecutive
    * headers square that away. A frame whose declared length overruns
    * EOF counts only at the stream head (a truncated download starts
    * with its header; a stray mid-junk sync does not get the
    * truncation waiver). Returns the first frame's offset.
    */
  private def findFirstMp3Frame(bytes: Array[Byte]): Option[Int] = {
    if (bytes == null || bytes.length < 4) return None
    var start = 0
    if (bytes.length >= 10 && bytes(0) == 'I' && bytes(1) == 'D' &&
      bytes(2) == '3') {
      val size = ((bytes(6) & 0x7f) << 21) | ((bytes(7) & 0x7f) << 14) |
        ((bytes(8) & 0x7f) << 7) | (bytes(9) & 0x7f)
      start = 10 + size
      if (start >= bytes.length) return None
    }
    def syncsAt(o: Int): Boolean = mp3Frame(bytes, o) match {
      case Some(h) =>
        if (o + h.frameBytes < bytes.length)
          mp3Frame(bytes, o + h.frameBytes).exists(_.sampleRate == h.sampleRate)
        else o == start
      case None => false
    }
    val window = math.min(bytes.length - 4, start + 4096)
    var o = start
    while (o <= window) {
      if (syncsAt(o)) return Some(o)
      o += 1
    }
    None
  }

  def mp3Info(bytes: Array[Byte]): Option[AudioMeta] = {
    val first = findFirstMp3Frame(bytes).getOrElse(return None)
    val h0 = mp3Frame(bytes, first).get
    var off = first
    var samples = 0L
    var ok = true
    while (ok) {
      mp3Frame(bytes, off) match {
        case Some(h) if h.sampleRate == h0.sampleRate =>
          samples += h.samplesPerFrame
          off += h.frameBytes
        case _ => ok = false
      }
    }
    Some(AudioMeta("mp3", h0.channels, h0.sampleRate, 0, samples))
  }

  /** Full MP3 stream inventory — the frame-level facts a corpus
    * curator needs (duration for budget/caps, CBR/VBR shape, encoder
    * metadata consistency) that the one-frame [[mp3Info]] probe does
    * not carry. Pure header arithmetic per ISO 11172-3 / 13818-3 plus
    * the two de-facto VBR headers the ecosystem standardized on:
    *
    *  - `Xing`/`Info` (the LAME/Xing convention): in the FIRST
    *    frame, after the side info (MPEG-1: 17 bytes mono / 32
    *    stereo; MPEG-2/2.5: 9/17 — plus the 2-byte CRC when the
    *    protection bit is set), a tag + flag word + optional
    *    big-endian frame/byte counts. The header frame carries no
    *    audio, so it is EXCLUDED from the audio frame/sample counts;
    *  - `VBRI` (Fraunhofer): at a fixed 32-byte offset after the
    *    first frame's header, version/delay/quality + byte and frame
    *    counts.
    *
    * `vbr` is observed (bitrate varies across walked frames), not
    * inferred from the tag name — an `Info`-tagged CBR file and an
    * untagged VBR file both report truthfully. `avgBitrateKbps` is
    * audio bytes × 8 / audio duration, exact for CBR.
    *
    * This is deliberately an INVENTORY, not a decoder: full Layer III
    * sample reconstruction needs the spec's large literal tables
    * (34 Huffman code tables, the 512-tap synthesis window) which
    * cannot be verified offline — see COVERAGE.md for the documented
    * skip (the KenLM-binary posture).
    */
  final case class Mp3Inventory(
      channels: Int, sampleRateHz: Int,
      nFrames: Long, nSamples: Long, durationMs: Long,
      vbr: Boolean, avgBitrateKbps: Double,
      vbrHeader: Option[String],
      declaredFrames: Option[Long], declaredBytes: Option[Long])

  def mp3Inventory(bytes: Array[Byte]): Option[Mp3Inventory] = {
    val first = findFirstMp3Frame(bytes).getOrElse(return None)
    val h0 = mp3Frame(bytes, first).get

    def u32be(off: Int): Long =
      if (off + 4 > bytes.length) -1L
      else ((bytes(off) & 0xffL) << 24) | ((bytes(off + 1) & 0xffL) << 16) |
        ((bytes(off + 2) & 0xffL) << 8) | (bytes(off + 3) & 0xffL)
    def tagAt(off: Int, t: String): Boolean =
      off + t.length <= bytes.length &&
        t.indices.forall(i => bytes(off + i) == t.charAt(i))

    // Xing/Info location: header (4) + CRC (2 if protected) + side info
    val sideInfo =
      if (h0.version == 3) { if (h0.channels == 1) 17 else 32 }
      else { if (h0.channels == 1) 9 else 17 }
    val xingOff = first + 4 + (if (h0.crc) 2 else 0) + sideInfo
    val vbriOff = first + 4 + 32
    var vbrHeader: Option[String] = None
    var declFrames: Option[Long] = None
    var declBytes: Option[Long] = None
    if (tagAt(xingOff, "Xing") || tagAt(xingOff, "Info")) {
      vbrHeader = Some(if (tagAt(xingOff, "Xing")) "xing" else "info")
      val flags = u32be(xingOff + 4)
      var p = xingOff + 8
      if ((flags & 0x1) != 0) { declFrames = Some(u32be(p)).filter(_ >= 0); p += 4 }
      if ((flags & 0x2) != 0) { declBytes = Some(u32be(p)).filter(_ >= 0); p += 4 }
    } else if (tagAt(vbriOff, "VBRI")) {
      vbrHeader = Some("vbri")
      declBytes = Some(u32be(vbriOff + 10)).filter(_ >= 0)
      declFrames = Some(u32be(vbriOff + 14)).filter(_ >= 0)
    }

    var off = first
    var nFrames = 0L
    var nSamples = 0L
    var audioBytes = 0L
    var vbr = false
    var firstAudioKbps = -1
    var ok = true
    var idx = 0
    while (ok) {
      mp3Frame(bytes, off) match {
        case Some(h) if h.sampleRate == h0.sampleRate =>
          // the VBR header frame is metadata, not audio (and often a
          // different bitrate than the audio — it must not trip `vbr`)
          if (!(idx == 0 && vbrHeader.isDefined)) {
            nFrames += 1
            nSamples += h.samplesPerFrame
            audioBytes += h.frameBytes
            if (firstAudioKbps < 0) firstAudioKbps = h.kbps
            else if (h.kbps != firstAudioKbps) vbr = true
          }
          off += h.frameBytes
          idx += 1
        case _ => ok = false
      }
    }
    if (nFrames == 0) return None
    val durationMs = nSamples * 1000L / h0.sampleRate
    val avgKbps =
      if (durationMs == 0) 0.0
      else audioBytes * 8.0 / (nSamples.toDouble / h0.sampleRate) / 1000.0
    Some(Mp3Inventory(h0.channels, h0.sampleRate, nFrames, nSamples,
      durationMs, vbr, avgKbps, vbrHeader, declFrames, declBytes))
  }

  /** Unified probe: dispatch on container signature — WAV, FLAC, MP3
    * (with or without ID3v2). One entry point for the multimodal
    * metadata path.
    */
  private def isOgg(b: Array[Byte]): Boolean =
    b != null && b.length >= 4 && b(0) == 'O' && b(1) == 'g' &&
      b(2) == 'g' && b(3) == 'S'

  /** Ogg-FLAC header probe: the mapping's BOS packet (first packet of
    * the first page, `0x7F 'FLAC' …` + the native `fLaC` magic +
    * STREAMINFO) re-parses through [[flacInfo]] — header facts only,
    * no CRC verification, no page reassembly (the full decode path is
    * [[graft.multimodal.OggFlac]]). None on non-FLAC Ogg (Vorbis,
    * Opus) — honest unknown, never a guess.
    */
  def oggFlacInfo(bytes: Array[Byte]): Option[AudioMeta] = {
    if (!isOgg(bytes) || bytes.length < 28) return None
    val nSegs = bytes(26) & 0xff
    val bodyStart = 27 + nSegs
    if (nSegs < 1 || bodyStart + 9 > bytes.length) return None
    // the BOS signature packet is alone on its page per the mapping —
    // its first lacing value bounds it; a lace shorter than the
    // mapping prefix cannot carry a parseable packet (and must not
    // slice past its own bound)
    val firstLace = bytes(27) & 0xff
    if (firstLace < 9) return None
    val end = math.min(bytes.length.toLong, bodyStart.toLong + firstLace).toInt
    if ((bytes(bodyStart) & 0xff) != 0x7f || bytes(bodyStart + 1) != 'F' ||
        bytes(bodyStart + 2) != 'L' || bytes(bodyStart + 3) != 'A' ||
        bytes(bodyStart + 4) != 'C') return None
    flacInfo(java.util.Arrays.copyOfRange(bytes, bodyStart + 9, end))
      .map(_.copy(codec = "ogg-flac"))
  }

  // ---- bare AAC (ADTS framing, ISO 13818-7 §6.2) ------------------

  // sampling_frequency_index → Hz (indices 0–12; 13/14 reserved)
  private val adtsRates = Array(96000, 88200, 64000, 48000, 44100,
    32000, 24000, 22050, 16000, 12000, 11025, 8000, 7350)

  /** One ADTS frame header at `off`: (frameBytes, samples, rateHz,
    * channels, profile). The 12-bit syncword 0xFFF plus layer 00
    * keeps this disjoint from MPEG-audio frames (layer ≠ 0 there).
    * channel_configuration 0 (PCE-carried layout) reports 0 channels
    * rather than guessing.
    */
  private def adtsFrame(b: Array[Byte],
                        off: Int): Option[(Int, Int, Int, Int, Int)] = {
    if (off + 7 > b.length) return None
    if ((b(off) & 0xff) != 0xff || (b(off + 1) & 0xf6) != 0xf0)
      return None // syncword 0xFFF + layer must be 00
    val profile = (b(off + 2) >>> 6) & 0x3
    val srIdx = (b(off + 2) >>> 2) & 0xf
    if (srIdx >= adtsRates.length) return None
    val channels = (((b(off + 2) & 0x1) << 2) |
      ((b(off + 3) >>> 6) & 0x3))
    val frameLen = (((b(off + 3) & 0x3) << 11) |
      ((b(off + 4) & 0xff) << 3) | ((b(off + 5) >>> 5) & 0x7))
    val crc = (b(off + 1) & 0x1) == 0
    val headerLen = if (crc) 9 else 7
    if (frameLen < headerLen) return None
    val blocks = (b(off + 6) & 0x3) + 1 // raw_data_blocks + 1
    Some((frameLen, 1024 * blocks, adtsRates(srIdx), channels, profile))
  }

  /** Bare `.aac` streams (ADTS-framed, the podcast/transcode sibling
    * of the MP3 walk): resync within a bounded window with the same
    * two-consecutive-headers confirm as [[findFirstMp3Frame]], then
    * walk frames accumulating samples (1024 per raw data block).
    * Inventory only — AAC entropy decode stays a recorded skip (the
    * MP3-tables posture, COVERAGE.md).
    */
  def adtsInfo(bytes: Array[Byte]): Option[AudioMeta] = {
    if (bytes == null || bytes.length < 7) return None
    def syncsAt(o: Int): Boolean = adtsFrame(bytes, o) match {
      case Some((len, _, rate, _, _)) =>
        if (o + len + 7 <= bytes.length)
          adtsFrame(bytes, o + len).exists(_._3 == rate)
        else o == 0 // a truncated download still starts with its header
      case None => false
    }
    val window = math.min(bytes.length - 7, 4096)
    var first = -1
    var o = 0
    while (o <= window && first < 0) {
      if (syncsAt(o)) first = o
      o += 1
    }
    if (first < 0) return None
    val h0 = adtsFrame(bytes, first).get
    var off = first
    var samples = 0L
    var ok = true
    while (ok) {
      adtsFrame(bytes, off) match {
        case Some((len, s, rate, _, _)) if rate == h0._3 =>
          samples += s
          off += len
        case _ => ok = false
      }
    }
    Some(AudioMeta("aac-adts", h0._4, h0._3, 0, samples))
  }

  // ---- text tags (Vorbis comments + ID3, one face) ----------------

  /** Parse a Vorbis-comment payload (Vorbis I §5, also FLAC block 4
    * and RFC 7845 OpusTags): vendor string, then length-prefixed
    * `KEY=value` UTF-8 pairs. Caps: ≤256 comments, ≤64 KiB each.
    */
  private def vorbisComments(b: Array[Byte], off0: Int,
                             end: Int): Option[Seq[(String, String)]] = {
    def u32le(o: Int): Long =
      if (o + 4 > end) -1L
      else (b(o) & 0xFFL) | ((b(o + 1) & 0xFFL) << 8) |
        ((b(o + 2) & 0xFFL) << 16) | ((b(o + 3) & 0xFFL) << 24)
    var o = off0
    val vlen = u32le(o)
    if (vlen < 0 || vlen > (64 << 10) || o + 4 + vlen > end) return None
    o += 4 + vlen.toInt
    val count = u32le(o)
    if (count < 0 || count > 256) return None
    o += 4
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var i = 0L
    while (i < count) {
      val clen = u32le(o)
      if (clen < 0 || clen > (64 << 10) || o + 4 + clen > end) return None
      val s = new String(b, o + 4, clen.toInt,
        java.nio.charset.StandardCharsets.UTF_8)
      val eq = s.indexOf('=')
      if (eq > 0)
        out += ((s.substring(0, eq).toUpperCase(java.util.Locale.ROOT),
          s.substring(eq + 1)))
      o += 4 + clen.toInt
      i += 1
    }
    Some(out.toSeq)
  }

  /** FLAC metadata-block walk to VORBIS_COMMENT (type 4). */
  private def flacTags(b: Array[Byte]): Option[Seq[(String, String)]] = {
    if (!isFlac(b)) return None
    var o = 4
    var last = false
    var guard = 0
    while (!last && o + 4 <= b.length && guard < 128) {
      guard += 1
      val hdr = b(o) & 0xFF
      last = (hdr & 0x80) != 0
      val tpe = hdr & 0x7F
      val len = ((b(o + 1) & 0xFF) << 16) | ((b(o + 2) & 0xFF) << 8) |
        (b(o + 3) & 0xFF)
      if (o + 4 + len > b.length) return None
      if (tpe == 4) return vorbisComments(b, o + 4, o + 4 + len)
      o += 4 + len
    }
    None
  }

  /** First packets of the BOS logical stream, assembled across pages
    * (lacing values concatenate; < 255 closes a packet). Bounded.
    */
  private def oggPackets(b: Array[Byte], maxPackets: Int)
  : Seq[Array[Byte]] = {
    def u32le(o: Int): Long =
      (b(o) & 0xFFL) | ((b(o + 1) & 0xFFL) << 8) |
        ((b(o + 2) & 0xFFL) << 16) | ((b(o + 3) & 0xFFL) << 24)
    if (b.length < 28) return Seq.empty
    val serial = u32le(14)
    val packets = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    val cur = new java.io.ByteArrayOutputStream()
    var o = 0
    var pages = 0
    while (o + 27 <= b.length && packets.length < maxPackets &&
      pages < 64) {
      if (!(b(o) == 'O' && b(o + 1) == 'g' && b(o + 2) == 'g' &&
        b(o + 3) == 'S' && b(o + 4) == 0)) return packets.toSeq
      pages += 1
      val ns = b(o + 26) & 0xFF
      if (o + 27 + ns > b.length) return packets.toSeq
      val pageSerial = u32le(o + 14)
      var body = o + 27 + ns
      var i = 0
      while (i < ns) {
        val l = b(o + 27 + i) & 0xFF
        if (body + l > b.length) return packets.toSeq
        if (pageSerial == serial && cur.size + l <= (1 << 20)) {
          cur.write(b, body, l)
          if (l < 255 && packets.length < maxPackets) {
            packets += cur.toByteArray
            cur.reset()
          }
        }
        body += l
        i += 1
      }
      o = body
    }
    packets.toSeq
  }

  /** Unified text tags across the audio containers — the curation
    * face that treats ID3v2 (MP3), Vorbis comments (Ogg Vorbis/Opus,
    * native FLAC, Ogg-FLAC) as ONE keyspace: uppercase keys, sorted.
    * ID3 frame ids map to their Vorbis names (TIT2→TITLE,
    * TPE1→ARTIST, TALB→ALBUM, TDRC/TYER→DATE); other ID3 text frames
    * keep their frame id. None when no tag structure exists.
    */
  def tags(bytes: Array[Byte]): Option[Seq[(String, String)]] = {
    if (bytes == null || bytes.length < 8) return None
    val raw: Option[Seq[(String, String)]] =
      if (isFlac(bytes)) flacTags(bytes)
      else if (isOgg(bytes)) {
        val ps = oggPackets(bytes, 3)
        if (ps.isEmpty) None
        else {
          val head = ps.head
          def str(p: Array[Byte], o: Int, s: String): Boolean =
            o + s.length <= p.length &&
              s.indices.forall(k => p(o + k) == s.charAt(k).toByte)
          if (str(head, 0, "\u0001vorbis"))
            ps.lift(1).filter(p => str(p, 0, "\u0003vorbis"))
              .flatMap(p => vorbisComments(p, 7, p.length))
          else if (str(head, 0, "OpusHead"))
            ps.lift(1).filter(p => str(p, 0, "OpusTags"))
              .flatMap(p => vorbisComments(p, 8, p.length))
          else if (head.length >= 5 && (head(0) & 0xFF) == 0x7F &&
            str(head, 1, "FLAC"))
            // Ogg-FLAC: later packets are FLAC metadata blocks
            ps.drop(1).flatMap { p =>
              if (p.length >= 4 && (p(0) & 0x7F) == 4) {
                val len = ((p(1) & 0xFF) << 16) | ((p(2) & 0xFF) << 8) |
                  (p(3) & 0xFF)
                if (4 + len <= p.length)
                  vorbisComments(p, 4, 4 + len).toSeq.flatten
                else Seq.empty
              } else Seq.empty
            } match {
              case s if s.nonEmpty => Some(s)
              case _               => None
            }
          else None
        }
      } else Id3.frames(bytes).map { fs =>
        val names = Map("TIT2" -> "TITLE", "TPE1" -> "ARTIST",
          "TALB" -> "ALBUM", "TDRC" -> "DATE", "TYER" -> "DATE",
          "TT2" -> "TITLE", "TP1" -> "ARTIST", "TAL" -> "ALBUM")
        fs.toSeq.map { case (k, v) => (names.getOrElse(k, k), v) }
      }
    raw.map(_.sortBy(t => (t._1, t._2)))
  }

  def meta(bytes: Array[Byte]): Option[AudioMeta] =
    if (isRiffWave(bytes))
      info(bytes).map(w =>
        AudioMeta("wav", w.channels, w.sampleRateHz, w.bitsPerSample,
          w.nFrames))
    else if (isFlac(bytes)) flacInfo(bytes)
    else if (isOgg(bytes)) oggFlacInfo(bytes)
    else mp3Info(bytes).orElse(adtsInfo(bytes))

  /** [[diagnose]] over all four containers. */
  def diagnoseMeta(bytes: Array[Byte]): String =
    if (bytes == null || bytes.isEmpty) "file is empty"
    else if (isRiffWave(bytes)) diagnose(bytes)
    else if (isFlac(bytes))
      if (flacInfo(bytes).isDefined) "ok" else "flac streaminfo missing or truncated"
    else if (isOgg(bytes))
      if (oggFlacInfo(bytes).isDefined) "ok"
      else "ogg container without a FLAC mapping (or truncated)"
    else if (mp3Info(bytes).isDefined || adtsInfo(bytes).isDefined) "ok"
    else "no audio container or frame sync found"
}
