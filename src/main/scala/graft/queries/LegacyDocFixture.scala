package graft.queries

/** INDEPENDENT spec-side CFB + Word-97 binary writer (the
  * EpubFixture/DocxFixture discipline): a version-3 compound file
  * written forward from MS-CFB (512-byte sectors, header DIFAT, FAT,
  * miniFAT + mini stream for sub-cutoff streams, 128-byte directory
  * entries), and a WordDocument/Table stream pair written forward
  * from MS-DOC (FIB, Clx/Pcdt/PlcPcd piece table, compressed and
  * UTF-16 pieces) — no code shared with [[graft.engine.read.Ole2]] or
  * [[graft.engine.read.Doc]].
  */
object LegacyDocFixture {

  private val SectorSize = 512
  private val MiniSector = 64
  private val MiniCutoff = 4096
  private val EndOfChain = 0xFFFFFFFEL
  private val FreeSect = 0xFFFFFFFFL
  private val FatSect = 0xFFFFFFFDL
  private val NoStream = 0xFFFFFFFFL

  private def putU16(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xFF).toByte; b(off + 1) = ((v >> 8) & 0xFF).toByte
  }
  private def putU32(b: Array[Byte], off: Int, v: Long): Unit = {
    b(off) = (v & 0xFF).toByte
    b(off + 1) = ((v >> 8) & 0xFF).toByte
    b(off + 2) = ((v >> 16) & 0xFF).toByte
    b(off + 3) = ((v >> 24) & 0xFF).toByte
  }

  private def ceilDiv(a: Int, b: Int): Int = (a + b - 1) / b

  /** A version-3 CFB containing the given streams (all under root). */
  def cfb(streams: Seq[(String, Array[Byte])]): Array[Byte] =
    cfbNested(streams, Seq.empty)

  /** A version-3 CFB with one level of sub-storages — the embedded-
    * OLE-object shape (an ObjectPool-style storage carrying its own
    * WordDocument). Root-level streams first, then each storage with
    * its nested streams; sibling/child pointers scope them properly.
    */
  def cfbNested(rootStreams: Seq[(String, Array[Byte])],
                storages: Seq[(String, Seq[(String, Array[Byte])])]): Array[Byte] = {
    // directory layout: 0 = root, then root streams, then per storage
    // its entry followed by its nested streams. Payload streams are
    // tracked by directory index (names may repeat across storages).
    final case class Slot(idx: Int, name: String, typ: Int, data: Array[Byte])
    val slots = scala.collection.mutable.ArrayBuffer.empty[Slot]
    var nextIdx = 1
    rootStreams.foreach { case (n, d) =>
      slots += Slot(nextIdx, n, 2, d); nextIdx += 1
    }
    val storageSpans = storages.map { case (sName, nested) =>
      val sIdx = nextIdx; nextIdx += 1
      slots += Slot(sIdx, sName, 1, Array.emptyByteArray)
      val childIdxs = nested.map { case (n, d) =>
        val i = nextIdx; nextIdx += 1
        slots += Slot(i, n, 2, d); i
      }
      (sIdx, childIdxs)
    }
    val payload = slots.filter(_.typ == 2)
    val minis = payload.filter(_.data.length < MiniCutoff)
    val bigs = payload.filter(_.data.length >= MiniCutoff)

    // mini stream container: minis back-to-back on 64-byte boundaries
    val miniSectorsPer = minis.map(s => math.max(1, ceilDiv(s.data.length, MiniSector)))
    val totalMiniSectors = miniSectorsPer.sum
    val miniContainer = new Array[Byte](totalMiniSectors * MiniSector)
    val miniStart = scala.collection.mutable.Map.empty[Int, Int]
    var mOff = 0
    minis.zip(miniSectorsPer).foreach { case (s, nsec) =>
      miniStart(s.idx) = mOff / MiniSector
      System.arraycopy(s.data, 0, miniContainer, mOff, s.data.length)
      mOff += nsec * MiniSector
    }

    val nDirEntries = nextIdx
    val dirSectors = math.max(1, ceilDiv(nDirEntries * 128, SectorSize))
    val miniFatSectors =
      if (totalMiniSectors == 0) 0 else ceilDiv(totalMiniSectors * 4, SectorSize)
    val miniContainerSectors = ceilDiv(miniContainer.length, SectorSize)
    val bigSectorsPer = bigs.map(s => ceilDiv(s.data.length, SectorSize))
    val nonFat = dirSectors + miniFatSectors + miniContainerSectors + bigSectorsPer.sum
    // FAT covers every sector including the FAT sectors themselves
    var fatSectors = 1
    while (fatSectors * (SectorSize / 4) < nonFat + fatSectors) fatSectors += 1
    val totalSectors = nonFat + fatSectors

    // sector id assignment, in layout order
    val firstDir = 0
    val firstMiniFat = dirSectors
    val firstMiniContainer = firstMiniFat + miniFatSectors
    val firstBig = firstMiniContainer + miniContainerSectors
    val bigStart = scala.collection.mutable.Map.empty[Int, Int]
    var cursor = firstBig
    bigs.zip(bigSectorsPer).foreach { case (s, nsec) =>
      bigStart(s.idx) = cursor; cursor += nsec
    }
    val firstFat = cursor

    // FAT
    val fat = Array.fill(fatSectors * (SectorSize / 4))(FreeSect)
    def chainRange(start: Int, n: Int): Unit = {
      var i = 0
      while (i < n) {
        fat(start + i) = if (i == n - 1) EndOfChain else (start + i + 1).toLong
        i += 1
      }
    }
    chainRange(firstDir, dirSectors)
    if (miniFatSectors > 0) chainRange(firstMiniFat, miniFatSectors)
    if (miniContainerSectors > 0) chainRange(firstMiniContainer, miniContainerSectors)
    bigs.zip(bigSectorsPer).foreach { case (s, nsec) =>
      chainRange(bigStart(s.idx), nsec)
    }
    (0 until fatSectors).foreach(i => fat(firstFat + i) = FatSect)

    // miniFAT: chains over mini-sector indices
    val miniFat = Array.fill(math.max(1, miniFatSectors) * (SectorSize / 4))(FreeSect)
    minis.zip(miniSectorsPer).foreach { case (s, nsec) =>
      val st = miniStart(s.idx)
      var i = 0
      while (i < nsec) {
        miniFat(st + i) = if (i == nsec - 1) EndOfChain else (st + i + 1).toLong
        i += 1
      }
    }

    // directory
    val dir = new Array[Byte](dirSectors * SectorSize)
    def writeEntry(idx: Int, name: String, typ: Int, left: Long, right: Long,
                   child: Long, start: Long, size: Long): Unit = {
      val off = idx * 128
      val utf = name.getBytes(java.nio.charset.StandardCharsets.UTF_16LE)
      System.arraycopy(utf, 0, dir, off, math.min(utf.length, 62))
      putU16(dir, off + 64, utf.length + 2)
      dir(off + 66) = typ.toByte
      dir(off + 67) = 1 // black
      putU32(dir, off + 68, left)
      putU32(dir, off + 72, right)
      putU32(dir, off + 76, child)
      putU32(dir, off + 116, start)
      putU32(dir, off + 120, size & 0xFFFFFFFFL)
      putU32(dir, off + 124, (size >> 32) & 0xFFFFFFFFL)
    }
    writeEntry(0, "Root Entry", 5, NoStream, NoStream,
      if (nDirEntries > 1) 1L else NoStream,
      if (miniContainerSectors > 0) firstMiniContainer.toLong else EndOfChain,
      miniContainer.length.toLong)
    // root-level sibling chain: root streams then storage entries,
    // each pointing right to the next; nested chains per storage
    val rootLevel: Seq[Int] =
      (1 to rootStreams.length) ++ storageSpans.map(_._1)
    def rightOf(seq: Seq[Int], idx: Int): Long = {
      val at = seq.indexOf(idx)
      if (at >= 0 && at + 1 < seq.length) seq(at + 1).toLong else NoStream
    }
    val childOf: Map[Int, Long] = storageSpans.map { case (sIdx, kids) =>
      sIdx -> (if (kids.nonEmpty) kids.head.toLong else NoStream)
    }.toMap
    val nestedRight: Map[Int, Long] = storageSpans.flatMap { case (_, kids) =>
      kids.zipWithIndex.map { case (k, i) =>
        k -> (if (i + 1 < kids.length) kids(i + 1).toLong else NoStream)
      }
    }.toMap
    slots.foreach { s =>
      val right =
        if (rootLevel.contains(s.idx)) rightOf(rootLevel, s.idx)
        else nestedRight.getOrElse(s.idx, NoStream)
      val child = childOf.getOrElse(s.idx, NoStream)
      val start: Long =
        if (s.typ != 2) 0L
        else if (s.data.length < MiniCutoff) miniStart(s.idx).toLong
        else bigStart(s.idx).toLong
      writeEntry(s.idx, s.name, s.typ, NoStream, right, child, start,
        if (s.typ == 2) s.data.length.toLong else 0L)
    }

    // assemble
    val out = new Array[Byte]((totalSectors + 1) * SectorSize)
    // header
    System.arraycopy(Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1)
      .map(_.toByte), 0, out, 0, 8)
    putU16(out, 24, 0x003E) // minor
    putU16(out, 26, 0x0003) // major v3
    putU16(out, 28, 0xFFFE) // little endian
    putU16(out, 30, 9) // sector shift
    putU16(out, 32, 6) // mini shift
    putU32(out, 44, fatSectors.toLong)
    putU32(out, 48, firstDir.toLong)
    putU32(out, 56, MiniCutoff.toLong)
    putU32(out, 60, if (miniFatSectors > 0) firstMiniFat.toLong else EndOfChain)
    putU32(out, 64, miniFatSectors.toLong)
    putU32(out, 68, EndOfChain) // no DIFAT sectors
    putU32(out, 72, 0L)
    (0 until 109).foreach { i =>
      putU32(out, 76 + i * 4,
        if (i < fatSectors) (firstFat + i).toLong else FreeSect)
    }
    def blit(sectorId: Int, data: Array[Byte]): Unit =
      System.arraycopy(data, 0, out, (sectorId + 1) * SectorSize,
        math.min(data.length, out.length - (sectorId + 1) * SectorSize))
    blit(firstDir, dir)
    if (miniFatSectors > 0) {
      val mf = new Array[Byte](miniFatSectors * SectorSize)
      miniFat.take(miniFatSectors * (SectorSize / 4)).zipWithIndex
        .foreach { case (v, i) => putU32(mf, i * 4, v) }
      blit(firstMiniFat, mf)
    }
    if (miniContainerSectors > 0) blit(firstMiniContainer, miniContainer)
    bigs.foreach(s => blit(bigStart(s.idx), s.data))
    val fatBytes = new Array[Byte](fatSectors * SectorSize)
    fat.zipWithIndex.foreach { case (v, i) => putU32(fatBytes, i * 4, v) }
    blit(firstFat, fatBytes)
    out
  }

  /** One text piece for the Word fixture: compressed (cp1252 bytes)
    * or UTF-16LE, flagged per the PCD fcCompressed bit.
    */
  final case class Piece(text: String, compressed: Boolean)

  /** A Word-97 binary: WordDocument (FIB + text) and 0Table (Clx).
    *
    * `prcPrefix` leads the Clx with a property modifier the reader
    * must skip; `encrypted` sets fEncrypted; `oneTable` sets
    * fWhichTblStm (and names the stream 1Table); `padWordTo` grows
    * the WordDocument past the mini cutoff to land it in FAT sectors.
    */
  def doc(pieces: Seq[Piece],
          encrypted: Boolean = false,
          oneTable: Boolean = false,
          prcPrefix: Boolean = false,
          padWordTo: Int = 8192): Array[Byte] = {
    val textBase = 0x800
    // lay out piece bytes in the WordDocument data region
    var off = textBase
    val placed = pieces.map { p =>
      val data =
        if (p.compressed) p.text.getBytes(java.nio.charset.Charset.forName("windows-1252"))
        else p.text.getBytes(java.nio.charset.StandardCharsets.UTF_16LE)
      if (!p.compressed && off % 2 != 0) off += 1
      val fcRaw: Long =
        if (p.compressed) (off.toLong * 2) | 0x40000000L
        else off.toLong
      val r = (p, data, off, fcRaw)
      off += data.length
      r
    }
    val ccpText = pieces.map(_.text.length).sum
    val word = new Array[Byte](math.max(padWordTo, off))
    putU16(word, 0, 0xA5EC) // wIdent
    putU16(word, 2, 0x00C1) // nFib (Word 97)
    var flags = 0
    if (encrypted) flags |= 0x0100
    if (oneTable) flags |= 0x0200
    putU16(word, 0x0A, flags)
    putU16(word, 0x20, 0x000E) // csw
    putU16(word, 0x3E, 0x0016) // cslw
    putU32(word, 0x4C, ccpText.toLong) // FibRgLw97.ccpText
    putU16(word, 0x98, 0x005D) // cbRgFcLcb (Word 97: 93 pairs)
    placed.foreach { case (_, data, o, _) =>
      System.arraycopy(data, 0, word, o, data.length)
    }

    // table stream: [Prc?] Pcdt(0x02, lcb, PlcPcd)
    val n = pieces.length
    val plcLen = (n + 1) * 4 + n * 8
    val prc: Array[Byte] =
      if (prcPrefix) Array[Byte](0x01, 0x02, 0x00, 0x00, 0x00) // cb=2 grpprl
      else Array.emptyByteArray
    val clx = new Array[Byte](prc.length + 5 + plcLen)
    System.arraycopy(prc, 0, clx, 0, prc.length)
    var t = prc.length
    clx(t) = 0x02
    putU32(clx, t + 1, plcLen.toLong)
    t += 5
    var cp = 0L
    pieces.zipWithIndex.foreach { case (p, i) =>
      putU32(clx, t + i * 4, cp); cp += p.text.length
    }
    putU32(clx, t + n * 4, cp)
    placed.zipWithIndex.foreach { case ((_, _, _, fcRaw), i) =>
      val pcdOff = t + (n + 1) * 4 + i * 8
      putU16(clx, pcdOff, 0) // flags
      putU32(clx, pcdOff + 2, fcRaw)
      putU16(clx, pcdOff + 6, 0) // prm
    }
    // Clx rides at the FRONT of the table stream
    putU32(word, 0x1A2, 0L) // fcClx
    putU32(word, 0x1A6, clx.length.toLong) // lcbClx

    val tableName = if (oneTable) "1Table" else "0Table"
    cfb(Seq("WordDocument" -> word, tableName -> clx))
  }

  /** An OLEPS `SummaryInformation` property-set stream written
    * forward from MS-OLEPS (independent of [[graft.engine.read.Oleps]]):
    * header + one section with the code-page property (VT_I2) and a
    * PIDSI_TITLE string (VT_LPSTR in the code page, or VT_LPWSTR).
    */
  def summaryInfo(title: String, wide: Boolean = false,
                  codepage: Int = 1252,
                  author: Option[String] = None,
                  createdIso: Option[String] = None): Array[Byte] = {
    val titleBytes =
      if (wide) title.getBytes(java.nio.charset.StandardCharsets.UTF_16LE)
      else title.getBytes(java.nio.charset.Charset.forName("windows-" + codepage))
    val titleProp = new java.io.ByteArrayOutputStream()
    def w32(o: java.io.ByteArrayOutputStream, v: Long): Unit = {
      o.write((v & 0xFF).toInt); o.write(((v >> 8) & 0xFF).toInt)
      o.write(((v >> 16) & 0xFF).toInt); o.write(((v >> 24) & 0xFF).toInt)
    }
    if (wide) {
      w32(titleProp, 31L) // VT_LPWSTR
      w32(titleProp, title.length + 1L) // char count incl. NUL
      titleProp.write(titleBytes, 0, titleBytes.length)
      titleProp.write(0); titleProp.write(0)
    } else {
      w32(titleProp, 30L) // VT_LPSTR
      w32(titleProp, titleBytes.length + 1L) // byte count incl. NUL
      titleProp.write(titleBytes, 0, titleBytes.length)
      titleProp.write(0)
    }
    val cpProp = new java.io.ByteArrayOutputStream()
    w32(cpProp, 2L) // VT_I2
    cpProp.write(codepage & 0xFF); cpProp.write((codepage >> 8) & 0xFF)
    cpProp.write(0); cpProp.write(0) // padded to 4

    val authorProp = new java.io.ByteArrayOutputStream()
    author.foreach { a =>
      val ab = a.getBytes(java.nio.charset.Charset.forName("windows-" + codepage))
      w32(authorProp, 30L) // VT_LPSTR
      w32(authorProp, ab.length + 1L)
      authorProp.write(ab, 0, ab.length)
      authorProp.write(0)
    }
    val createdProp = new java.io.ByteArrayOutputStream()
    createdIso.foreach { iso =>
      val ticks = (java.time.Instant.parse(iso).toEpochMilli +
        11644473600000L) * 10000L
      w32(createdProp, 64L) // VT_FILETIME
      w32(createdProp, ticks & 0xFFFFFFFFL)
      w32(createdProp, (ticks >>> 32) & 0xFFFFFFFFL)
    }
    val nProps = 2 + (if (author.isDefined) 1 else 0) +
      (if (createdIso.isDefined) 1 else 0)
    val secHeader = 8 + nProps * 8 // size+count, (id, offset) pairs
    val cpOff = secHeader
    val titleOff = cpOff + cpProp.size()
    val authorOff = titleOff + titleProp.size()
    val createdOff = authorOff + authorProp.size()
    val section = new java.io.ByteArrayOutputStream()
    w32(section, (secHeader + cpProp.size() + titleProp.size() +
      authorProp.size() + createdProp.size()).toLong)
    w32(section, nProps.toLong)
    w32(section, 1L); w32(section, cpOff.toLong) // PID_CODEPAGE
    w32(section, 2L); w32(section, titleOff.toLong) // PIDSI_TITLE
    if (author.isDefined) {
      w32(section, 4L); w32(section, authorOff.toLong) // PIDSI_AUTHOR
    }
    if (createdIso.isDefined) {
      w32(section, 12L); w32(section, createdOff.toLong) // PIDSI_CREATE_DTM
    }
    section.write(cpProp.toByteArray, 0, cpProp.size())
    section.write(titleProp.toByteArray, 0, titleProp.size())
    section.write(authorProp.toByteArray, 0, authorProp.size())
    section.write(createdProp.toByteArray, 0, createdProp.size())

    val out = new java.io.ByteArrayOutputStream()
    out.write(0xFE); out.write(0xFF) // byte order mark, LE "FFFE"
    out.write(0); out.write(0) // version
    w32(out, 0x00020006L) // system id (typical win32 value)
    (0 until 16).foreach(_ => out.write(0)) // CLSID
    w32(out, 1L) // one property set
    // FMTID F29F85E0-4FF9-1068-AB91-08002B27B3D9 (SummaryInformation)
    Array(0xE0, 0x85, 0x9F, 0xF2, 0xF9, 0x4F, 0x68, 0x10,
      0xAB, 0x91, 0x08, 0x00, 0x2B, 0x27, 0xB3, 0xD9)
      .foreach(out.write)
    w32(out, 48L) // section offset
    out.write(section.toByteArray, 0, section.size())
    out.toByteArray
  }
}
