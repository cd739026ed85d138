package graft.engine.validate

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** ID3v2 tag reader (the public id3.org specs, v2.2–v2.4) — the
  * declared metadata an audio corpus wants next to the signal-level
  * inventory [[AudioProbe.mp3Inventory]] already computes: title
  * (TIT2/TT2), artist (TPE1/TP1), album (TALB/TAL), date
  * (TDRC/TYER/TYE).
  *
  * The verifiable subset: the 10-byte header (`ID3`, version,
  * syncsafe size), optional extended header skipped by its declared
  * size, then frames — v2.3 frames carry 4-char ids + 32-bit sizes,
  * v2.4 the same with SYNCSAFE sizes, v2.2 3-char ids + 24-bit
  * sizes. Text frames lead with an encoding byte (0 Latin-1,
  * 1 UTF-16 w/ BOM, 2 UTF-16BE, 3 UTF-8) and may NUL-terminate.
  * Every read is bounds-checked; a malformed frame ends the walk
  * with the frames read so far (padding looks exactly like that).
  */
object Id3 {

  final case class Tags(title: Option[String], artist: Option[String],
                        album: Option[String], date: Option[String])

  private def syncsafe(b: Array[Byte], off: Int): Int =
    ((b(off) & 0x7f) << 21) | ((b(off + 1) & 0x7f) << 14) |
      ((b(off + 2) & 0x7f) << 7) | (b(off + 3) & 0x7f)

  private def u32be(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xFFL) << 24) | ((b(off + 1) & 0xFFL) << 16) |
      ((b(off + 2) & 0xFFL) << 8) | (b(off + 3) & 0xFFL)

  private def decodeText(b: Array[Byte], from: Int, to: Int): String = {
    if (to <= from) return ""
    val enc = b(from) & 0xFF
    val s = enc match {
      case 0 => new String(b, from + 1, to - from - 1,
        StandardCharsets.ISO_8859_1)
      case 1 => new String(b, from + 1, to - from - 1,
        StandardCharsets.UTF_16) // BOM-led per spec
      case 2 => new String(b, from + 1, to - from - 1,
        StandardCharsets.UTF_16BE)
      case 3 => new String(b, from + 1, to - from - 1,
        StandardCharsets.UTF_8)
      case _ => return ""
    }
    val cut = s.indexOf('\u0000')
    (if (cut >= 0) s.substring(0, cut) else s).trim
  }

  /** All text frames keyed by frame id; None when no ID3v2 tag. */
  def frames(bytes: Array[Byte]): Option[Map[String, String]] = {
    if (bytes == null || bytes.length < 10) return None
    if (!(bytes(0) == 'I' && bytes(1) == 'D' && bytes(2) == '3')) return None
    val major = bytes(3) & 0xFF
    if (major < 2 || major > 4) return None
    val flags = bytes(5) & 0xFF
    val tagEnd = math.min(bytes.length, 10 + syncsafe(bytes, 6))
    var pos = 10
    // extended header (v2.3: size EXCLUDES itself is 4-byte non-ss;
    // v2.4: syncsafe INCLUDING itself) — skip either interpretation
    if ((flags & 0x40) != 0 && pos + 4 <= tagEnd) {
      val ext =
        if (major == 4) syncsafe(bytes, pos)
        else u32be(bytes, pos).toInt + 4
      pos += math.max(4, ext)
    }
    val out = Map.newBuilder[String, String]
    val idLen = if (major == 2) 3 else 4
    val hdrLen = if (major == 2) 6 else 10
    var guard = 0
    while (pos + hdrLen <= tagEnd && guard < 1024) {
      guard += 1
      // padding: a NUL where a frame id should be ends the walk
      if (bytes(pos) == 0) return Some(out.result())
      val id = new String(bytes, pos, idLen, StandardCharsets.ISO_8859_1)
      if (!id.forall(c => (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9')))
        return Some(out.result())
      val size: Long = major match {
        case 2 => ((bytes(pos + 3) & 0xFFL) << 16) |
          ((bytes(pos + 4) & 0xFFL) << 8) | (bytes(pos + 5) & 0xFFL)
        case 3 => u32be(bytes, pos + 4)
        case _ => syncsafe(bytes, pos + 4).toLong
      }
      val bodyStart = pos + hdrLen
      if (size < 0 || bodyStart + size > tagEnd)
        return Some(out.result())
      if (id.startsWith("T") && size >= 1)
        out += id -> decodeText(bytes, bodyStart, (bodyStart + size).toInt)
      pos = (bodyStart + size).toInt
    }
    Some(out.result())
  }

  /** The four corpus-relevant tags, version-normalized. */
  def tags(bytes: Array[Byte]): Option[Tags] =
    frames(bytes).map { f =>
      def pick(keys: String*): Option[String] =
        keys.iterator.flatMap(f.get).map(_.trim).find(_.nonEmpty)
      Tags(
        title = pick("TIT2", "TT2"),
        artist = pick("TPE1", "TP1"),
        album = pick("TALB", "TAL"),
        date = pick("TDRC", "TYER", "TYE"))
    }

  private val titleUdf = udf { (bytes: Array[Byte]) =>
    tags(bytes).flatMap(_.title)
  }
  private val tagsUdf = udf { (bytes: Array[Byte]) =>
    tags(bytes).map(t => (t.title.orNull, t.artist.orNull,
      t.album.orNull, t.date.orNull))
  }

  /** Declared audio title; NULL when untagged. */
  def titleCol(bytesCol: Column): Column = titleUdf(bytesCol)

  /** `struct<_1 title, _2 artist, _3 album, _4 date>`; NULL when
    * untagged.
    */
  def tagsCol(bytesCol: Column): Column = tagsUdf(bytesCol)
}
