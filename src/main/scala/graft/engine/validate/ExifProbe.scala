package graft.engine.validate

/** EXIF metadata probe: a pure-JVM JPEG-marker + TIFF-IFD walker
  * recovering orientation, camera make/model, timestamps and declared
  * pixel dimensions from the APP1 segment WITHOUT any image decode —
  * the metadata a multimodal pipeline filters and dedupes on (rotate
  * before hashing, drop screenshot farms by Make, bucket by capture
  * time). Same family as [[AudioProbe]]/the video box walk; the TIFF
  * container format is a public standard (TIFF 6.0 + EXIF 2.3).
  *
  * Parser stance (crawl images lie): every read is bounds-checked
  * against the actual byte length; a truncated or hostile offset ends
  * that field, never throws; unknown tags and types are skipped. Both
  * byte orders (`II` little-endian, `MM` big-endian) are handled, and
  * raw TIFF input (no JPEG wrapper) parses too.
  */
object ExifProbe {

  final case class ExifInfo(
      orientation: Option[Int],
      make: Option[String],
      model: Option[String],
      dateTime: Option[String],
      dateTimeOriginal: Option[String],
      pixelX: Option[Long],
      pixelY: Option[Long]) {
    def isEmpty: Boolean =
      orientation.isEmpty && make.isEmpty && model.isEmpty &&
        dateTime.isEmpty && dateTimeOriginal.isEmpty &&
        pixelX.isEmpty && pixelY.isEmpty
  }

  /** EXIF facts of a JPEG (APP1 walk) or bare TIFF. None when the
    * input carries no parseable EXIF block at all.
    */
  def info(bytes: Array[Byte]): Option[ExifInfo] = {
    if (bytes == null || bytes.length < 8) return None
    tiffStart(bytes).flatMap { t => parseTiff(bytes, t) }
  }

  /** GPS coordinates from the GPS IFD (tag 0x8825): decimal degrees,
    * south/west negative, altitude in metres (negative below sea
    * level per GPSAltitudeRef). The #1 image-PII class — phone photos
    * embed capture location invisibly; a curation pipeline must be
    * able to at least count it ([[gps]]) and strip it
    * ([[stripGps]]) — the c13-for-images.
    */
  final case class GpsInfo(lat: Double, lon: Double, alt: Option[Double])

  /** Parse the GPS IFD. None when absent or malformed (crawl stance:
    * a lying offset ends the read, never throws).
    */
  def gps(bytes: Array[Byte]): Option[GpsInfo] = {
    if (bytes == null || bytes.length < 8) return None
    tiffStart(bytes).flatMap { t => parseGps(bytes, t) }
  }

  /** TIFF-header offset inside a PNG's `eXIf` chunk data. */
  private def pngExifStart(b: Array[Byte]): Option[Int] =
    pngChunkRange(b).map(_._1)

  /** The PNG `eXIf` chunk: `(dataStart, dataLen, chunkTypeOffset)` —
    * the type offset feeds the post-strip CRC rewrite (PNG chunks are
    * CRC32-guarded over type+data, so in-place zeroing must re-seal).
    */
  private def pngChunkRange(b: Array[Byte]): Option[(Int, Int, Int)] = {
    var o = 8
    var guard = 0
    while (o + 12 <= b.length && guard < 4096) {
      guard += 1
      val len = ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
        ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
      if (len < 0 || len > Int.MaxValue - 12 ||
        o + 12 + len > b.length) return None
      if (b(o + 4) == 'e' && b(o + 5) == 'X' && b(o + 6) == 'I' &&
        b(o + 7) == 'f')
        return Some((o + 8, len.toInt, o + 4))
      if (b(o + 4) == 'I' && b(o + 5) == 'E' && b(o + 6) == 'N' &&
        b(o + 7) == 'D') return None
      o += 12 + len.toInt
    }
    None
  }

  /** TIFF-header offset inside a WebP's `EXIF` chunk: RIFF chunk walk
    * (fourcc + LE size, even-padded); some writers lead the data with
    * the JPEG-style `Exif` + two NULs prefix — skip it when present.
    */
  private def webpExifStart(b: Array[Byte]): Option[Int] = {
    var o = 12
    var guard = 0
    while (o + 8 <= b.length && guard < 4096) {
      guard += 1
      val size = (b(o + 4) & 0xffL) | ((b(o + 5) & 0xffL) << 8) |
        ((b(o + 6) & 0xffL) << 16) | ((b(o + 7) & 0xffL) << 24)
      if (size < 0 || size > Int.MaxValue - 8 ||
        o + 8 + size > b.length) return None
      if (b(o) == 'E' && b(o + 1) == 'X' && b(o + 2) == 'I' &&
        b(o + 3) == 'F') {
        val d = o + 8
        val hasPrefix = size >= 6 && b(d) == 'E' && b(d + 1) == 'x' &&
          b(d + 2) == 'i' && b(d + 3) == 'f' && b(d + 4) == 0 &&
          b(d + 5) == 0
        return Some(if (hasPrefix) d + 6 else d)
      }
      o += 8 + size.toInt + (size.toInt & 1) // chunks are even-padded
    }
    None
  }

  // GPS IFD tags (EXIF 2.3 §4.6.6)
  private val TagGpsIfd = 0x8825
  private val TagGpsLatRef = 0x0001
  private val TagGpsLat = 0x0002
  private val TagGpsLonRef = 0x0003
  private val TagGpsLon = 0x0004
  private val TagGpsAltRef = 0x0005
  private val TagGpsAlt = 0x0006

  private def parseGps(b: Array[Byte], t: Int): Option[GpsInfo] = {
    val w = new TiffWalk(b, t)
    if (!w.valid) return None
    val ifd0 = w.readIfd(w.ifd0Off)
    val gpsOff = w.shortOrLong(ifd0.get(TagGpsIfd)).getOrElse(return None)
    val g = w.readIfd(gpsOff)
    def coord(refTag: Int, valTag: Int, neg: String): Option[Double] =
      for {
        r <- w.ascii(g.get(refTag)).map(_.toUpperCase)
        dms <- w.rationals(g.get(valTag), 3)
        d = dms(0) + dms(1) / 60.0 + dms(2) / 3600.0
        signed = if (r.startsWith(neg)) -d else d
        if !signed.isNaN && math.abs(signed) <= (if (neg == "S") 90 else 180)
      } yield signed
    val lat = coord(TagGpsLatRef, TagGpsLat, "S")
    val lon = coord(TagGpsLonRef, TagGpsLon, "W")
    if (lat.isEmpty || lon.isEmpty) return None
    val below = w.byteVal(g.get(TagGpsAltRef)).contains(1)
    val alt = w.rationals(g.get(TagGpsAlt), 1).map(_.head)
      .filterNot(_.isNaN).map(a => if (below) -a else a)
    Some(GpsInfo(lat.get, lon.get, alt))
  }

  /** Redact location: remove the GPS IFD — both the IFD0 pointer
    * entry (0x8825) and the IFD's own bytes, including every
    * pointed-to rational — while leaving EVERY other byte in place
    * (orientation, timestamps, and the entropy-coded pixels are
    * untouched, so the oriented dHash of the stripped twin is
    * identical). Offsets elsewhere stay valid because nothing moves
    * outside IFD0's own entry table. Returns the input unchanged
    * (same reference) when no parseable GPS IFD exists.
    */
  def stripGps(bytes: Array[Byte]): Array[Byte] = {
    if (bytes == null || bytes.length < 8) return bytes
    val t = tiffStart(bytes).getOrElse(return bytes)
    val w = new TiffWalk(bytes, t)
    if (!w.valid) return bytes
    val ifdStart = (t + w.ifd0Off).toInt
    if (ifdStart + 2 > bytes.length) return bytes
    val n0 = w.u16(ifdStart)
    if (n0 <= 0 || ifdStart + 2 + 12 * n0 + 4 > bytes.length) return bytes
    var entry = -1
    var gpsOff = -1L
    var i = 0
    while (i < n0 && entry < 0) {
      val e = ifdStart + 2 + 12 * i
      if (w.u16(e) == TagGpsIfd) {
        entry = e
        gpsOff = w.u16(e + 2) match {
          case 3 => w.u16(e + 8).toLong
          case 4 => w.u32(e + 8)
          case _ => -1L
        }
      }
      i += 1
    }
    if (entry < 0 || gpsOff <= 0) return bytes
    val out = bytes.clone()
    // zero the GPS IFD region and every value block it points to
    val gs = t + gpsOff
    if (gs + 2 <= out.length && gs <= Int.MaxValue) {
      val gsi = gs.toInt
      val gn = w.u16(gsi)
      if (gn >= 0 && gsi + 2 + 12 * gn + 4 <= out.length) {
        var k = 0
        while (k < gn) {
          val ge = gsi + 2 + 12 * k
          val typ = w.u16(ge + 2); val cnt = w.u32(ge + 4)
          val sz = typ match {
            case 1 | 2 | 6 | 7 => 1L; case 3 | 8 => 2L
            case 4 | 9 | 11 => 4L; case 5 | 10 | 12 => 8L; case _ => 0L
          }
          val total = sz * cnt
          if (total > 4) {
            val voff = w.u32(ge + 8)
            if (voff > 0 && t + voff + total <= out.length &&
              t + voff <= Int.MaxValue)
              java.util.Arrays.fill(out, (t + voff).toInt,
                (t + voff + total).toInt, 0.toByte)
          }
          k += 1
        }
        java.util.Arrays.fill(out, gsi, gsi + 2 + 12 * gn + 4, 0.toByte)
      }
    }
    // drop the 0x8825 entry: shift the remaining entries + the
    // next-IFD pointer up one slot, zero the freed tail, decrement
    // the count (pointed-to values elsewhere keep absolute offsets)
    val tableEnd = ifdStart + 2 + 12 * n0 + 4
    System.arraycopy(out, entry + 12, out, entry, tableEnd - (entry + 12))
    java.util.Arrays.fill(out, tableEnd - 12, tableEnd, 0.toByte)
    w.writeU16(out, ifdStart, n0 - 1)
    // PNG carrier: the eXIf chunk's CRC32 (over type + data) guarded
    // the bytes we just edited — re-seal it so the stripped file
    // stays a valid PNG to every checker
    if (out.length >= 8 && (out(0) & 0xff) == 0x89 && out(1) == 'P' &&
      out(2) == 'N' && out(3) == 'G')
      pngChunkRange(out).foreach { case (dataStart, dataLen, typeOff) =>
        val crc = new java.util.zip.CRC32()
        crc.update(out, typeOff, 4 + dataLen)
        val v = crc.getValue
        val at = dataStart + dataLen
        if (at + 4 <= out.length) {
          out(at) = ((v >> 24) & 0xff).toByte
          out(at + 1) = ((v >> 16) & 0xff).toByte
          out(at + 2) = ((v >> 8) & 0xff).toByte
          out(at + 3) = (v & 0xff).toByte
        }
      }
    out
  }

  /** Shared bounds-checked TIFF primitives for the GPS walk — same
    * stance as [[parseTiff]]'s local helpers (negative on any
    * out-of-bounds read).
    */
  private final class TiffWalk(b: Array[Byte], t: Int) {
    val little: Boolean =
      t + 8 <= b.length && (b(t) & 0xff) == 'I' && (b(t + 1) & 0xff) == 'I'
    private val big: Boolean =
      t + 8 <= b.length && (b(t) & 0xff) == 'M' && (b(t + 1) & 0xff) == 'M'
    val valid: Boolean = (little || big) && u16(t + 2) == 42 && ifd0Off > 0
    def ifd0Off: Long = u32(t + 4)

    def u16(i: Int): Int =
      if (i < t || i + 2 > b.length) -1
      else if (little) (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
      else ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
    def u32(i: Int): Long =
      if (i < t || i + 4 > b.length) -1L
      else if (little)
        (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
          ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
      else
        ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
          ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
    def writeU16(out: Array[Byte], i: Int, v: Int): Unit =
      if (little) { out(i) = (v & 0xff).toByte; out(i + 1) = (v >> 8).toByte }
      else { out(i) = (v >> 8).toByte; out(i + 1) = (v & 0xff).toByte }

    def readIfd(off: Long): Map[Int, (Int, Long, Int)] = {
      val start = t + off
      if (off <= 0 || start + 2 > b.length || start > Int.MaxValue)
        return Map.empty
      val n = u16(start.toInt)
      if (n < 0) return Map.empty
      (0 until n).flatMap { k =>
        val e = start.toInt + 2 + 12 * k
        if (e + 12 > b.length) None
        else {
          val tag = u16(e); val typ = u16(e + 2); val cnt = u32(e + 4)
          if (tag < 0 || typ < 0 || cnt < 0) None
          else Some(tag -> ((typ, cnt, e + 8)))
        }
      }.toMap
    }

    private def typeSize(typ: Int): Int = typ match {
      case 1 | 2 | 6 | 7 => 1; case 3 | 8 => 2
      case 4 | 9 | 11 => 4; case 5 | 10 | 12 => 8; case _ => 0
    }

    private def valueAt(typ: Int, cnt: Long, field: Int): Option[Int] = {
      val total = typeSize(typ) * cnt
      if (total <= 0) None
      else if (total <= 4) Some(field)
      else {
        val off = u32(field)
        if (off <= 0 || t + off + total > b.length || t + off > Int.MaxValue)
          None
        else Some((t + off).toInt)
      }
    }

    def shortOrLong(entry: Option[(Int, Long, Int)]): Option[Long] =
      entry.flatMap { case (typ, cnt, field) =>
        if (cnt < 1) None
        else valueAt(typ, cnt, field).flatMap { v =>
          typ match {
            case 3 => val x = u16(v); if (x < 0) None else Some(x.toLong)
            case 4 => val x = u32(v); if (x < 0) None else Some(x)
            case _ => None
          }
        }
      }

    def ascii(entry: Option[(Int, Long, Int)]): Option[String] =
      entry.flatMap { case (typ, cnt, field) =>
        if (typ != 2 || cnt < 1) None
        else valueAt(typ, cnt, field).map { v =>
          val end = math.min(v + cnt, b.length.toLong).toInt
          var stop = v
          while (stop < end && b(stop) != 0) stop += 1
          new String(b, v, stop - v,
            java.nio.charset.StandardCharsets.US_ASCII).trim
        }.filter(_.nonEmpty)
      }

    def byteVal(entry: Option[(Int, Long, Int)]): Option[Int] =
      entry.flatMap { case (typ, cnt, field) =>
        if (typ != 1 || cnt < 1) None
        else valueAt(typ, cnt, field).map(v => b(v) & 0xff)
      }

    /** `n` unsigned RATIONALs (type 5) as doubles; None on any
      * malformed pair (zero denominator → NaN filtered by callers).
      */
    def rationals(entry: Option[(Int, Long, Int)],
                  n: Int): Option[Seq[Double]] =
      entry.flatMap { case (typ, cnt, field) =>
        if (typ != 5 || cnt < n) None
        else valueAt(typ, cnt, field).flatMap { v =>
          val vals = (0 until n).map { i =>
            val num = u32(v + i * 8); val den = u32(v + i * 8 + 4)
            if (num < 0 || den <= 0) Double.NaN else num.toDouble / den
          }
          if (vals.exists(_.isNaN)) None else Some(vals)
        }
      }
  }

  /** Locate the TIFF header: directly at 0 for bare TIFF, else inside
    * the first JPEG APP1 segment whose payload begins "Exif" followed by two NUL (0x00 0x00) bytes.
    */
  private def tiffStart(b: Array[Byte]): Option[Int] = {
    def u8(i: Int) = b(i) & 0xff
    if (b.length >= 4 &&
        ((u8(0) == 'I' && u8(1) == 'I' && u8(2) == 42 && u8(3) == 0) ||
          (u8(0) == 'M' && u8(1) == 'M' && u8(2) == 0 && u8(3) == 42)))
      return Some(0)
    // HEIC/AVIF: the Exif rides as a meta-box ITEM (iinf type `Exif`
    // + iloc extent) — resolve through the Heif walk so the phone
    // format's orientation/GPS surfaces (and stripGps's in-place
    // zeroing works untouched: item offsets never move)
    if (Heif.isHeif(b)) return Heif.exifTiffOffset(b)
    // PNG eXIf chunk (PNG 1.2 extension, standardized 2017): chunk
    // data IS the TIFF block. In-place stripping must then re-CRC the
    // chunk — see [[pngChunkRange]] / the stripGps tail.
    if (b.length >= 8 && (u8(0) == 0x89 && u8(1) == 'P' && u8(2) == 'N' &&
      u8(3) == 'G')) return pngExifStart(b)
    // WebP EXIF chunk (RIFF fourcc "EXIF"): data is the TIFF block,
    // some writers lead with the JPEG-style "Exif  "
    if (b.length >= 16 && u8(0) == 'R' && u8(1) == 'I' && u8(2) == 'F' &&
      u8(3) == 'F' && u8(8) == 'W' && u8(9) == 'E' && u8(10) == 'B' &&
      u8(11) == 'P') return webpExifStart(b)
    if (b.length < 4 || u8(0) != 0xff || u8(1) != 0xd8) return None // not JPEG
    var p = 2
    while (p + 4 <= b.length) {
      if (u8(p) != 0xff) return None // marker desync: stop, no EXIF
      val marker = u8(p + 1)
      if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd7)) {
        p += 2 // standalone markers carry no length
      } else if (marker == 0xda || marker == 0xd9) {
        return None // entropy-coded data / EOI: EXIF must precede
      } else {
        val len = (u8(p + 2) << 8) | u8(p + 3) // includes the 2 length bytes
        if (len < 2 || p + 2 + len > b.length) return None
        if (marker == 0xe1 && len >= 8 &&
            b(p + 4) == 'E' && b(p + 5) == 'x' && b(p + 6) == 'i' &&
            b(p + 7) == 'f' && b(p + 8) == 0 && b(p + 9) == 0)
          return Some(p + 10)
        p += 2 + len
      }
    }
    None
  }

  // tag ids (EXIF 2.3 §4.6)
  private val TagMake = 0x010f
  private val TagModel = 0x0110
  private val TagOrientation = 0x0112
  private val TagDateTime = 0x0132
  private val TagExifIfd = 0x8769
  private val TagDateTimeOriginal = 0x9003
  private val TagPixelX = 0xa002
  private val TagPixelY = 0xa003

  private def parseTiff(b: Array[Byte], t: Int): Option[ExifInfo] = {
    if (t + 8 > b.length) return None
    val little = (b(t) & 0xff) == 'I' && (b(t + 1) & 0xff) == 'I'
    val big = (b(t) & 0xff) == 'M' && (b(t + 1) & 0xff) == 'M'
    if (!little && !big) return None
    def u16(i: Int): Int =
      if (i < t || i + 2 > b.length) -1
      else if (little) (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
      else ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
    def u32(i: Int): Long =
      if (i < t || i + 4 > b.length) -1L
      else if (little)
        (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
          ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
      else
        ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
          ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
    if (u16(t + 2) != 42) return None
    val ifd0 = u32(t + 4)
    if (ifd0 < 0) return None

    // one IFD pass: harvest wanted tags into a map
    def readIfd(off: Long): Map[Int, (Int, Long, Int)] = {
      // tag -> (type, count, valueFieldOffset)
      val start = t + off
      if (off <= 0 || start + 2 > b.length || start > Int.MaxValue)
        return Map.empty
      val n = u16(start.toInt)
      if (n < 0) return Map.empty
      (0 until n).flatMap { k =>
        val e = start.toInt + 2 + 12 * k
        if (e + 12 > b.length) None
        else {
          val tag = u16(e); val typ = u16(e + 2); val cnt = u32(e + 4)
          if (tag < 0 || typ < 0 || cnt < 0) None
          else Some(tag -> ((typ, cnt, e + 8)))
        }
      }.toMap
    }

    def typeSize(typ: Int): Int = typ match {
      case 1 | 2 | 6 | 7 => 1; case 3 | 8 => 2
      case 4 | 9 | 11 => 4; case 5 | 10 | 12 => 8; case _ => 0
    }

    /** Offset of a value's bytes: inline when total size ≤ 4, else
      * pointed-to (relative to the TIFF header).
      */
    def valueAt(typ: Int, cnt: Long, field: Int): Option[Int] = {
      val total = typeSize(typ) * cnt
      if (total <= 0) None
      else if (total <= 4) Some(field)
      else {
        val off = u32(field)
        if (off <= 0 || t + off + total > b.length ||
          t + off > Int.MaxValue) None
        else Some((t + off).toInt)
      }
    }

    def shortOrLong(entry: Option[(Int, Long, Int)]): Option[Long] =
      entry.flatMap { case (typ, cnt, field) =>
        if (cnt < 1) None
        else valueAt(typ, cnt, field).flatMap { v =>
          typ match {
            case 3 => val x = u16(v); if (x < 0) None else Some(x.toLong)
            case 4 => val x = u32(v); if (x < 0) None else Some(x)
            case _ => None
          }
        }
      }

    def ascii(entry: Option[(Int, Long, Int)]): Option[String] =
      entry.flatMap { case (typ, cnt, field) =>
        if (typ != 2 || cnt < 1) None
        else valueAt(typ, cnt, field).map { v =>
          val end = math.min(v + cnt, b.length.toLong).toInt
          var stop = v
          while (stop < end && b(stop) != 0) stop += 1
          new String(b, v, stop - v,
            java.nio.charset.StandardCharsets.US_ASCII).trim
        }.filter(_.nonEmpty)
      }

    val ifd = readIfd(ifd0)
    val sub = shortOrLong(ifd.get(TagExifIfd))
      .map(readIfd).getOrElse(Map.empty)
    val infoV = ExifInfo(
      orientation = shortOrLong(ifd.get(TagOrientation))
        .map(_.toInt).filter(o => o >= 1 && o <= 8),
      make = ascii(ifd.get(TagMake)),
      model = ascii(ifd.get(TagModel)),
      dateTime = ascii(ifd.get(TagDateTime)),
      dateTimeOriginal = ascii(sub.get(TagDateTimeOriginal)),
      pixelX = shortOrLong(sub.get(TagPixelX)),
      pixelY = shortOrLong(sub.get(TagPixelY)))
    if (infoV.isEmpty) None else Some(infoV)
  }
}
