package graft.queries

/** From-spec 7z container writer (the 7zFormat.txt structures
  * hand-encoded) — the INDEPENDENT side of the SevenZ gate: the
  * engine reads 7z with commons-compress, so the fixture must not
  * (the inverse of the usual house pattern, where the fixture writer
  * is the library and the reader is from-spec). Layout: one folder
  * per file, each folder a single Copy (0x00) or LZMA2 (0x21) coder
  * — LZMA2 payloads come from org.tukaani.xz (a THIRD
  * implementation, not commons-compress). No encryption, no solid
  * blocks, no empty streams: exactly the structures the gate needs,
  * nothing speculative.
  */
object SevenZFixture {

  /** Build a 7z archive of `(name, bytes)` regular files. */
  def sevenZ(files: Seq[(String, Array[Byte])],
             lzma2: Boolean = false): Array[Byte] = {
    require(files.nonEmpty && files.forall(_._2.nonEmpty),
      "fixture writer: non-empty files only (no kEmptyStream support)")
    val packed: Seq[Array[Byte]] =
      if (!lzma2) files.map(_._2)
      else files.map { case (_, data) =>
        val opt = new org.tukaani.xz.LZMA2Options()
        opt.setDictSize(64 << 10)
        val bos = new java.io.ByteArrayOutputStream()
        val ls = opt.getOutputStream(
          new org.tukaani.xz.FinishableWrapperOutputStream(bos))
        ls.write(data); ls.finish()
        bos.toByteArray
      }

    // ---- header (property-coded, 7z variable-length numbers) ------
    val h = new scala.collection.mutable.ArrayBuffer[Byte]()
    def u8(v: Int): Unit = h += v.toByte
    def num(v: Long): Unit = {
      var k = 0
      while (k < 8 && v >= (1L << (7 * k + 7))) k += 1
      if (k == 8) {
        u8(0xFF)
        (0 until 8).foreach(i => u8(((v >> (8 * i)) & 0xff).toInt))
      } else {
        var first = 0
        (0 until k).foreach(i => first |= (0x80 >> i))
        first |= (v >> (8 * k)).toInt
        u8(first)
        (0 until k).foreach(i => u8(((v >> (8 * i)) & 0xff).toInt))
      }
    }
    u8(0x01) // kHeader
    u8(0x04) // kMainStreamsInfo
    // PackInfo
    u8(0x06)          // kPackInfo
    num(0)            // PackPos
    num(files.length) // NumPackStreams
    u8(0x09)          // kSize
    packed.foreach(p => num(p.length.toLong))
    u8(0x00)          // kEnd (PackInfo)
    // UnpackInfo
    u8(0x07)          // kUnpackInfo
    u8(0x0B)          // kFolder
    num(files.length) // NumFolders
    u8(0x00)          // External = 0 (folders inline)
    files.foreach { _ =>
      num(1)          // NumCoders in this folder
      if (!lzma2) {
        u8(0x01)      // flags: id size 1, simple, no attributes
        u8(0x00)      // Copy codec id
      } else {
        u8(0x21)      // flags: id size 1 | 0x20 (attributes follow)
        u8(0x21)      // LZMA2 codec id
        num(1)        // properties size
        u8(0x08)      // dict prop: (2|0) << (8/2 + 11) = 64 KiB
      }
      // single simple coder: no bind pairs, no packed-stream indices
    }
    u8(0x0C)          // kCodersUnpackSize
    files.foreach { case (_, data) => num(data.length.toLong) }
    u8(0x00)          // kEnd (UnpackInfo; no folder CRCs)
    // SubStreamsInfo: one substream per folder (the default counts,
    // stated explicitly — commons-compress's hardening pass requires
    // the section) with per-substream CRC32 digests like real writers
    u8(0x08)          // kSubStreamsInfo
    u8(0x0A)          // kCRC
    u8(0x01)          // AllAreDefined
    files.foreach { case (_, data) =>
      val c = new java.util.zip.CRC32(); c.update(data)
      (0 until 4).foreach(i =>
        u8(((c.getValue >> (8 * i)) & 0xff).toInt))
    }
    u8(0x00)          // kEnd (SubStreamsInfo)
    u8(0x00)          // kEnd (StreamsInfo)
    // FilesInfo
    u8(0x05)          // kFilesInfo
    num(files.length) // NumFiles
    u8(0x11)          // kName
    val nameBytes = files.flatMap { case (n, _) =>
      n.getBytes(java.nio.charset.StandardCharsets.UTF_16LE).toSeq ++
        Seq[Byte](0, 0)
    }
    num(1L + nameBytes.length) // property size: external byte + names
    u8(0x00)                   // external = 0
    nameBytes.foreach(h += _)
    u8(0x00)          // kEnd (FilesInfo properties)
    u8(0x00)          // kEnd (Header)
    val header = h.toArray

    // ---- signature header + packed streams + header ---------------
    val packTotal = packed.map(_.length.toLong).sum
    val out = new scala.collection.mutable.ArrayBuffer[Byte]()
    def o8(v: Int): Unit = out += v.toByte
    def le32(v: Long): Unit =
      (0 until 4).foreach(i => o8(((v >> (8 * i)) & 0xff).toInt))
    def le64(v: Long): Unit =
      (0 until 8).foreach(i => o8(((v >> (8 * i)) & 0xff).toInt))
    def crc32(b: Array[Byte]): Long = {
      val c = new java.util.zip.CRC32(); c.update(b); c.getValue
    }
    o8('7'); o8('z'); o8(0xBC); o8(0xAF); o8(0x27); o8(0x1C)
    o8(0x00); o8(0x04) // version 0.4
    val start = new scala.collection.mutable.ArrayBuffer[Byte]()
    def s8(v: Int): Unit = start += v.toByte
    def sle64(v: Long): Unit =
      (0 until 8).foreach(i => s8(((v >> (8 * i)) & 0xff).toInt))
    sle64(packTotal)           // NextHeaderOffset (after sig header)
    sle64(header.length.toLong) // NextHeaderSize
    (0 until 4).foreach(i =>
      s8(((crc32(header) >> (8 * i)) & 0xff).toInt))
    le32(crc32(start.toArray)) // StartHeaderCRC
    start.foreach(out += _)
    packed.foreach(_.foreach(out += _))
    header.foreach(out += _)
    out.toArray
  }
}
