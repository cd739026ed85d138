package graft.engine.read

/** Magic-dispatch stream decompression shared by the archive and
  * document layers — gzip `1F 8B`, zstd `28 B5 2F FD` (RFC 8878),
  * bzip2 `BZh1-9`, xz `FD 37 7A 58 5A 00`, LZ4 frame `04 22 4D 18`,
  * framed snappy `FF 06 00 00 sNaPpY`
  * — each output-capped (bomb guard). A torn stream keeps whatever
  * decompressed cleanly (the crawl posture); a stream whose very
  * construction fails (bzip2 decodes its first block eagerly) yields
  * empty, so the caller can fall back — a text file that merely
  * STARTS with `BZh9` must not vanish. Codecs: `java.util.zip`,
  * zstd-jni, commons-compress and org.tukaani.xz, all on Spark's own
  * classpath.
  */
private[read] object Compressed {

  /** Framed-snappy stream identifier: `FF 06 00 00 sNaPpY`. */
  private def isSnappyFramed(b: Array[Byte]): Boolean =
    b.length >= 10 && (b(0) & 0xFF) == 0xFF && b(1) == 0x06 &&
      b(2) == 0 && b(3) == 0 && b(4) == 's' && b(5) == 'N' &&
      b(6) == 'a' && b(7) == 'P' && b(8) == 'p' && b(9) == 'Y'

  /** Leading bytes carry a known compression magic. */
  def isCompressed(bytes: Array[Byte]): Boolean = {
    if (bytes == null || bytes.length < 6) return false
    val b0 = bytes(0) & 0xFF; val b1 = bytes(1) & 0xFF
    val b2 = bytes(2) & 0xFF; val b3 = bytes(3) & 0xFF
    (b0 == 0x1F && b1 == 0x8B) ||
      (b0 == 0x28 && b1 == 0xB5 && b2 == 0x2F && b3 == 0xFD) ||
      (b0 == 'B' && b1 == 'Z' && b2 == 'h' && b3 >= '1' && b3 <= '9') ||
      (b0 == 0xFD && b1 == 0x37 && b2 == 0x7A && b3 == 0x58 &&
        (bytes(4) & 0xFF) == 0x5A && bytes(5) == 0) ||
      (b0 == 0x04 && b1 == 0x22 && b2 == 0x4D && b3 == 0x18) ||
      isSnappyFramed(bytes)
  }

  /** Decompress when a magic leads; otherwise the bytes unchanged.
    * Never throws: construction failures return empty, torn streams
    * return the bytes present.
    */
  def maybeDecompressed(bytes: Array[Byte], cap: Long): Array[Byte] = {
    if (!isCompressed(bytes)) return bytes
    val b0 = bytes(0) & 0xFF; val b1 = bytes(1) & 0xFF
    // constructors can ALSO throw on a torn leading block — a torn
    // stream must fail the row, not the task, so construction rides
    // the same guard
    val in: java.io.InputStream =
      try {
        if (b0 == 0x1F && b1 == 0x8B)
          new java.util.zip.GZIPInputStream(
            new java.io.ByteArrayInputStream(bytes))
        else if (b0 == 0x28 && b1 == 0xB5)
          new com.github.luben.zstd.ZstdInputStream(
            new java.io.ByteArrayInputStream(bytes))
        else if (b0 == 'B')
          new org.apache.commons.compress.compressors.bzip2
            .BZip2CompressorInputStream(
              new java.io.ByteArrayInputStream(bytes))
        else if (b0 == 0xFD)
          // 128 MiB memlimit (KiB units): a 100-byte hostile header
          // can declare a huge LZMA2 dictionary, and many concurrent
          // row kernels per executor multiply the allocation. The cap
          // must still admit every standard preset: `xz -9` writes a
          // 64 MiB dictionary and the decoder charges dictSize plus
          // ~100 KiB of state, so a 64 MiB cap rejected exactly the
          // -9 output it was meant to read. 128 MiB clears all
          // standard presets while keeping the hostile-header guard.
          new org.tukaani.xz.XZInputStream(
            new java.io.ByteArrayInputStream(bytes), 128 << 10)
        else if (b0 == 0x04)
          new org.apache.commons.compress.compressors.lz4
            .FramedLZ4CompressorInputStream(
              new java.io.ByteArrayInputStream(bytes))
        else
          // framed snappy (RC datasets and Hadoop-adjacent tooling
          // ship .sz blobs; snappy-java is on Spark's own classpath)
          new org.xerial.snappy.SnappyFramedInputStream(
            new java.io.ByteArrayInputStream(bytes), true)
      } catch { case _: Exception => return Array.emptyByteArray }
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](64 << 10)
    try {
      var r = in.read(buf)
      while (r >= 0 && out.size < cap) {
        out.write(buf, 0, math.min(r.toLong, cap - out.size).toInt)
        r = in.read(buf)
      }
    } catch { case _: Exception => () } // torn stream: bytes present win
    finally in.close()
    out.toByteArray
  }
}
