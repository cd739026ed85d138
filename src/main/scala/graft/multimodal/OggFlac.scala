package graft.multimodal

/** Ogg-encapsulated FLAC (`.oga`/`.ogg`) — the container unwrap that
  * lets [[AudioFingerprint]] fingerprint Ogg-FLAC payloads with the
  * SAME [[FlacDecode]] frames a native `.flac` carries (both per
  * public xiph specifications: RFC 3533 for the Ogg page layer, the
  * FLAC-to-Ogg mapping for the packet layout). The unwrap is exact —
  * an Ogg re-containerization of a FLAC stream decodes to identical
  * samples, so it hashes IDENTICALLY to its WAV and its native FLAC.
  *
  * Page layer (RFC 3533): 27-byte header (`OggS`, version 0, type
  * flags, granule, serial, sequence, CRC, segment count), a lacing
  * table, then the body. Packets reassemble by lacing values (255 =
  * packet continues, < 255 ends it; a packet may span pages via the
  * `continued` flag). The page CRC — CRC-32, polynomial 0x04C11DB7,
  * unreflected, zero init/xorout, computed with the CRC field zeroed
  * — is VERIFIED per page; a corrupt or truncated page fails loud
  * with its offset (the [[FlacDecode]] stance: silently wrong samples
  * are the one unforgivable decoder behavior).
  *
  * Mapping layer: the FLAC stream's BOS packet is `0x7F 'FLAC'
  * major minor nheaders(u16be)` followed by the native `fLaC` magic
  * and the STREAMINFO block; `nheaders` further header packets
  * (VorbisComment etc.) follow, then one complete native FLAC frame
  * per audio packet. Reconstruction is therefore pure splicing: the
  * BOS tail (STREAMINFO forced to last-metadata), then the audio
  * packets verbatim — [[FlacDecode]] then verifies every frame CRC
  * as usual. Pages of OTHER serials (Ogg multiplexes streams; a
  * skeleton or Vorbis track may ride along) are skipped; the FLAC
  * stream is the one whose BOS packet carries the mapping signature.
  */
object OggFlac {

  def isOgg(b: Array[Byte]): Boolean =
    b != null && b.length >= 4 && b(0) == 'O' && b(1) == 'g' &&
      b(2) == 'g' && b(3) == 'S'

  // CRC-32, polynomial 0x04C11DB7, no reflection, init 0, xorout 0 —
  // the Ogg page checksum (RFC 3533 appendix A).
  private[graft] def crc32Ogg(b: Array[Byte], from: Int, until: Int,
                       zeroFrom: Int, zeroUntil: Int): Long = {
    var crc = 0L
    var i = from
    while (i < until) {
      val byte = if (i >= zeroFrom && i < zeroUntil) 0 else b(i) & 0xff
      crc ^= byte.toLong << 24
      var k = 0
      while (k < 8) {
        crc = if ((crc & 0x80000000L) != 0) ((crc << 1) ^ 0x04C11DB7L) & 0xffffffffL
        else (crc << 1) & 0xffffffffL
        k += 1
      }
      i += 1
    }
    crc
  }

  private def le32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  private def isFlacBos(p: Array[Byte]): Boolean =
    p.length >= 9 && (p(0) & 0xff) == 0x7f && p(1) == 'F' &&
      p(2) == 'L' && p(3) == 'A' && p(4) == 'C'

  /** The native FLAC stream spliced out of an Ogg-FLAC container:
    * `fLaC` + STREAMINFO (forced last-metadata — the skipped header
    * packets carried the rest) + the audio frame packets verbatim.
    * None when the bytes are not Ogg or no FLAC stream is mapped
    * (e.g. pure Ogg Vorbis); a structurally broken container (bad
    * page CRC, bad magic mid-stream, truncation, malformed BOS
    * packet) fails LOUD with the page offset.
    */
  def toNativeFlac(bytes: Array[Byte]): Option[Array[Byte]] = {
    if (!isOgg(bytes)) return None
    var pos = 0
    var serial: Option[Long] = None
    val packetBuf = new java.io.ByteArrayOutputStream()
    val packets = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
    while (pos < bytes.length) {
      require(pos + 27 <= bytes.length, s"Ogg page truncated at $pos")
      require(bytes(pos) == 'O' && bytes(pos + 1) == 'g' &&
        bytes(pos + 2) == 'g' && bytes(pos + 3) == 'S',
        s"Ogg capture pattern missing at $pos")
      require(bytes(pos + 4) == 0, s"unknown Ogg version at $pos")
      val htype = bytes(pos + 5) & 0xff
      val pageSerial = le32(bytes, pos + 14)
      val nSegs = bytes(pos + 26) & 0xff
      val bodyStart = pos + 27 + nSegs
      require(bodyStart <= bytes.length, s"Ogg lacing table truncated at $pos")
      var bodyLen = 0
      var s = 0
      while (s < nSegs) { bodyLen += bytes(pos + 27 + s) & 0xff; s += 1 }
      require(bodyStart + bodyLen <= bytes.length,
        s"Ogg page body truncated at $pos")
      val pageEnd = bodyStart + bodyLen
      val stated = le32(bytes, pos + 22)
      val computed = crc32Ogg(bytes, pos, pageEnd, pos + 22, pos + 26)
      require(stated == computed,
        s"Ogg page CRC mismatch at $pos: computed $computed stated $stated")
      val isBos = (htype & 0x02) != 0
      // lock onto the FLAC stream at its BOS page (the mapping puts
      // the signature packet alone on it, never continued)
      if (serial.isEmpty && isBos && nSegs >= 1) {
        val firstLace = bytes(pos + 27) & 0xff
        if (firstLace >= 9 && isFlacBos(
            java.util.Arrays.copyOfRange(bytes, bodyStart, bodyStart + 9)))
          serial = Some(pageSerial)
      }
      if (serial.contains(pageSerial)) {
        val continued = (htype & 0x01) != 0
        require(continued == (packetBuf.size() > 0),
          s"Ogg packet continuity broken at page $pos")
        var off = bodyStart
        s = 0
        while (s < nSegs) {
          val lace = bytes(pos + 27 + s) & 0xff
          packetBuf.write(bytes, off, lace)
          off += lace
          if (lace < 255) {
            packets += packetBuf.toByteArray
            packetBuf.reset()
          }
          s += 1
        }
      }
      pos = pageEnd
    }
    require(packetBuf.size() == 0,
      "Ogg stream ends mid-packet (no terminating lacing value)")
    // a well-formed Ogg of some other codec (Vorbis, Opus, …) is not
    // ours and not broken — the NULL-for-undecodable contract applies
    if (serial.isEmpty) return None
    val bos = packets.head
    // 0x7F FLAC major minor nheaders(2, BE) fLaC STREAMINFO(4+34)
    require(bos.length >= 9 + 4 + 4 + 34,
      s"Ogg-FLAC BOS packet too short: ${bos.length} bytes")
    require((bos(5) & 0xff) == 1,
      s"unsupported Ogg-FLAC mapping major version ${bos(5) & 0xff}")
    val nHeaders = ((bos(7) & 0xff) << 8) | (bos(8) & 0xff)
    val native = java.util.Arrays.copyOfRange(bos, 9, bos.length)
    require(FlacDecode.isFlac(native),
      "Ogg-FLAC BOS packet does not carry the fLaC magic")
    require((native(4) & 0x7f) == 0,
      "Ogg-FLAC BOS packet's first metadata block is not STREAMINFO")
    // the header packets we skip carried the remaining metadata —
    // STREAMINFO becomes the last (and only) block of the splice
    native(4) = (native(4) | 0x80).toByte
    // nheaders == 0 means UNKNOWN per the mapping spec (not "none"):
    // skip by shape instead — header packets lead with a metadata
    // block header byte; audio frames lead with the 0xFF of the
    // 14-bit frame sync
    val audio =
      if (nHeaders > 0) packets.drop(1 + nHeaders)
      else packets.drop(1)
        .dropWhile(p => p.isEmpty || (p(0) & 0xff) != 0xff)
    val out = new java.io.ByteArrayOutputStream(
      native.length + audio.map(_.length).sum)
    out.write(native)
    audio.foreach(out.write)
    Some(out.toByteArray)
  }

  /** Decoded audio from an Ogg-FLAC payload — [[toNativeFlac]] then
    * [[FlacDecode.decode]] (every frame CRC verified). None when not
    * Ogg or not a FLAC mapping; broken streams fail loud.
    */
  def decode(bytes: Array[Byte]): Option[FlacDecode.FlacAudio] =
    toNativeFlac(bytes).flatMap(FlacDecode.decode)
}
