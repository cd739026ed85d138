package graft.engine.validate

import org.scalatest.funsuite.AnyFunSuite

/** ID3v2 reader vs an INDEPENDENT hand-authored tag writer (forward
  * from id3.org — syncsafe sizes, per-version frame headers).
  */
class Id3Spec extends AnyFunSuite {

  private def syncsafe(v: Int): Array[Byte] =
    Array(((v >> 21) & 0x7f).toByte, ((v >> 14) & 0x7f).toByte,
      ((v >> 7) & 0x7f).toByte, (v & 0x7f).toByte)

  private def u32be(v: Int): Array[Byte] =
    Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)

  /** One v2.3/v2.4 text frame; body = encoding byte + text bytes. */
  private def frame(major: Int, id: String, enc: Int,
                    text: Array[Byte]): Array[Byte] = {
    val body = enc.toByte +: text
    id.getBytes("ISO-8859-1") ++
      (if (major == 4) syncsafe(body.length) else u32be(body.length)) ++
      Array[Byte](0, 0) ++ body
  }

  private def tag(major: Int, frames: Array[Byte],
                  padding: Int = 16): Array[Byte] = {
    val size = frames.length + padding
    "ID3".getBytes ++ Array(major.toByte, 0.toByte, 0.toByte) ++
      syncsafe(size) ++ frames ++ new Array[Byte](padding)
  }

  test("v2.3 Latin-1 and UTF-16 frames decode; padding stops the walk") {
    val t = tag(3,
      frame(3, "TIT2", 0, "Night Drive".getBytes("ISO-8859-1")) ++
        frame(3, "TPE1", 1,
          "Μουσική".getBytes("UTF-16")) ++
        frame(3, "TALB", 0, "Album X\u0000garbage".getBytes("ISO-8859-1")) ++
        frame(3, "TYER", 0, "1999".getBytes("ISO-8859-1")))
    val got = Id3.tags(t).get
    assert(got.title.contains("Night Drive"))
    assert(got.artist.contains("Μουσική"))
    assert(got.album.contains("Album X")) // NUL cuts
    assert(got.date.contains("1999"))
  }

  test("v2.4 syncsafe frame sizes and UTF-8 decode") {
    val t = tag(4,
      frame(4, "TIT2", 3, "καλημέρα τίτλος".getBytes("UTF-8")) ++
        frame(4, "TDRC", 3, "2024-06-01".getBytes("UTF-8")))
    val got = Id3.tags(t).get
    assert(got.title.contains("καλημέρα τίτλος"))
    assert(got.date.contains("2024-06-01"))
  }

  test("v2.2 three-char ids with 24-bit sizes") {
    def frame22(id: String, text: String): Array[Byte] = {
      val body = 0.toByte +: text.getBytes("ISO-8859-1")
      id.getBytes("ISO-8859-1") ++
        Array(0.toByte, (body.length >> 8).toByte, body.length.toByte) ++
        body
    }
    val t = tag(2, frame22("TT2", "Old Title") ++ frame22("TP1", "Old Band"))
    val got = Id3.tags(t).get
    assert(got.title.contains("Old Title"))
    assert(got.artist.contains("Old Band"))
  }

  test("the title rides ahead of real MP3 frames; untagged audio is None") {
    // the m29-style fixture shape: tag + audio payload bytes after it
    val audio = Array.fill[Byte](64)(0x55)
    val t = tag(3, frame(3, "TIT2", 0, "Tagged Song".getBytes)) ++ audio
    assert(Id3.tags(t).get.title.contains("Tagged Song"))
    assert(Id3.tags(audio).isEmpty)
    assert(Id3.tags(null).isEmpty)
    assert(Id3.tags(Array.emptyByteArray).isEmpty)
  }

  test("lying sizes and junk ids end the walk with frames so far") {
    // a frame claiming to overrun the tag: earlier frames survive
    val good = frame(3, "TIT2", 0, "Kept".getBytes)
    val lying = "TPE1".getBytes ++ u32be(1 << 20) ++
      Array[Byte](0, 0, 0)
    val t = tag(3, good ++ lying)
    assert(Id3.tags(t).get.title.contains("Kept"))
    // junk where an id should be
    val junkId = frame(3, "TIT2", 0, "Still kept".getBytes) ++
      Array[Byte]('x', '!', 0x02, 0x03)
    assert(Id3.tags(tag(3, junkId)).get.title.contains("Still kept"))
  }
}
