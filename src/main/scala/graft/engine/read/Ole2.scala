package graft.engine.read

/** OLE2 / CFB (Compound File Binary, the public MS-CFB spec) container
  * walk — the on-disk format of legacy Office documents (.doc/.xls/
  * .ppt) and of ENCRYPTED OOXML (an encrypted .docx is a CFB holding
  * `EncryptionInfo`/`EncryptedPackage`, which is why [[Docx]] sees it
  * fail the ZIP magic). Everything here is offline-verifiable: the
  * header layout, FAT/DIFAT/miniFAT chains and 128-byte directory
  * entries come straight from the spec.
  *
  * The walk reads the DIFAT (109 header slots + chained DIFAT
  * sectors), materializes the FAT, then reads the directory chain and
  * every stream entry — small streams (< the 4096-byte cutoff)
  * through the miniFAT inside the root entry's mini stream, large
  * ones through the FAT. Directory entries are enumerated LINEARLY
  * (every allocated 128-byte slot) so torn or lying sibling pointers
  * never LOSE a stream (the crawl posture), while the red-black
  * sibling/child tree — when it holds up — scopes names: root-storage
  * streams keep bare names, nested-storage streams get
  * "Storage/Name" paths, and unreachable orphans fall back to bare
  * names.
  *
  * Bomb/hostility caps: total decompressed bytes bounded, every chain
  * walk bounded by the sector count (a FAT cycle terminates instead
  * of spinning), malformed sector IDs end the chain. None when the
  * magic is absent or the header geometry is unusable.
  */
object Ole2 {

  val Magic: Array[Byte] =
    Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1).map(_.toByte)

  val DefaultMaxTotalBytes: Long = 256L << 20

  final case class Entry(name: String, size: Long, bytes: Array[Byte])

  /** True when the payload leads with the CFB magic. */
  def isCfb(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 8 &&
      java.util.Arrays.equals(bytes.slice(0, 8), Magic)

  private val EndOfChain = 0xFFFFFFFEL
  private val FreeSect = 0xFFFFFFFFL
  private val MaxRegSect = 0xFFFFFFFAL

  private def u16(b: Array[Byte], off: Int): Int =
    if (off + 2 > b.length) -1
    else (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8)

  private def u32(b: Array[Byte], off: Int): Long =
    if (off + 4 > b.length) -1L
    else ((b(off) & 0xFFL) | ((b(off + 1) & 0xFFL) << 8) |
      ((b(off + 2) & 0xFFL) << 16) | ((b(off + 3) & 0xFFL) << 24))

  private def u64(b: Array[Byte], off: Int): Long =
    if (off + 8 > b.length) -1L
    else u32(b, off) | (u32(b, off + 4) << 32)

  /** All named streams: ROOT-storage streams keyed by bare name,
    * streams nested inside sub-storages keyed by "Storage/Name" path
    * (so an embedded object's WordDocument never collides with the
    * host's), torn-tree orphans by bare name (first occurrence wins
    * on duplicates). None when not CFB or the geometry is broken.
    */
  def streams(bytes: Array[Byte],
              maxTotal: Long = DefaultMaxTotalBytes): Option[Map[String, Array[Byte]]] = {
    if (!isCfb(bytes) || bytes.length < 512) return None
    val sectorShift = u16(bytes, 30)
    if (sectorShift != 9 && sectorShift != 12) return None
    val sectorSize = 1 << sectorShift
    val miniShift = u16(bytes, 32)
    if (miniShift != 6) return None
    val miniCutoff = u32(bytes, 56)
    val firstDirSect = u32(bytes, 48)
    val firstMiniFatSect = u32(bytes, 60)
    val firstDifatSect = u32(bytes, 68)
    val nSectors = math.max(0, (bytes.length - sectorSize) / sectorSize)
    if (nSectors == 0) return None

    def sector(id: Long): Option[Array[Byte]] = {
      if (id < 0 || id > MaxRegSect || id >= nSectors) return None
      val off = (id.toInt + 1) * sectorSize
      if (off + sectorSize > bytes.length)
        Some(java.util.Arrays.copyOfRange(bytes, off, bytes.length))
      else Some(java.util.Arrays.copyOfRange(bytes, off, off + sectorSize))
    }

    // DIFAT → FAT sector ids
    val fatSectIds = scala.collection.mutable.ArrayBuffer.empty[Long]
    var k = 76
    while (k < 512 && fatSectIds.length < 109) {
      val v = u32(bytes, k)
      if (v <= MaxRegSect) fatSectIds += v
      k += 4
    }
    var difat = firstDifatSect
    var difatSteps = 0
    while (difat <= MaxRegSect && difatSteps <= nSectors) {
      sector(difat) match {
        case Some(d) =>
          // all but the trailing next-DIFAT pointer are FAT sector ids
          var j = 0
          while (j < sectorSize - 4 && j + 4 <= d.length) {
            val v = u32(d, j)
            if (v <= MaxRegSect) fatSectIds += v
            j += 4
          }
          difat = u32(d, sectorSize - 4)
        case None => difat = EndOfChain
      }
      difatSteps += 1
    }

    // FAT: uint32 per sector
    val fat = scala.collection.mutable.ArrayBuffer.empty[Long]
    fatSectIds.foreach { id =>
      sector(id).foreach { d =>
        var j = 0
        while (j + 4 <= d.length) { fat += u32(d, j); j += 4 }
      }
    }
    if (fat.isEmpty) return None

    def chain(start: Long): Seq[Long] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[Long]
      var cur = start
      while (cur <= MaxRegSect && cur < fat.length && out.length <= nSectors) {
        out += cur
        cur = fat(cur.toInt)
      }
      out.toSeq
    }

    def readChain(start: Long, size: Long): Array[Byte] = {
      val cap = math.min(size, maxTotal)
      val out = new java.io.ByteArrayOutputStream()
      chain(start).iterator.takeWhile(_ => out.size < cap).foreach { id =>
        sector(id).foreach { d =>
          val want = math.min(d.length.toLong, cap - out.size).toInt
          if (want > 0) out.write(d, 0, want)
        }
      }
      out.toByteArray
    }

    // directory entries, linearly across the directory chain; slot
    // index IS the stream id the sibling/child pointers reference
    final case class Dir(name: String, typ: Int, startSect: Long, size: Long,
                         left: Long, right: Long, child: Long)
    val dirBytes = readChain(firstDirSect, maxTotal)
    val nSlots = dirBytes.length / 128
    val slots = new Array[Dir](nSlots)
    var slot = 0
    while (slot < nSlots) {
      val off = slot * 128
      val nameLen = u16(dirBytes, off + 64)
      val typ = dirBytes(off + 66) & 0xFF
      if (typ != 0 && nameLen >= 2 && nameLen <= 64) {
        val name = new String(dirBytes, off, nameLen - 2,
          java.nio.charset.StandardCharsets.UTF_16LE)
        val start = u32(dirBytes, off + 116)
        val rawSize = u64(dirBytes, off + 120)
        // v3 writers leave garbage in the high half — mask it
        val size = if (sectorShift == 9) rawSize & 0xFFFFFFFFL else rawSize
        slots(slot) = Dir(name, typ, start, size,
          u32(dirBytes, off + 68), u32(dirBytes, off + 72),
          u32(dirBytes, off + 76))
      }
      slot += 1
    }
    val entries = slots.filter(_ != null).toSeq
    val root = entries.find(_.typ == 5) match {
      case Some(r) => r
      case None    => return None
    }

    // Storage-aware naming: streams in the ROOT storage keep their
    // bare names; streams nested inside sub-storages (embedded OLE
    // objects — ObjectPool and friends) get "Storage/Name" paths, so
    // an embedded WordDocument can never shadow or pose as the host
    // document's. The red-black sibling/child pointers drive the
    // scoping; entries the tree never reaches (torn or lying pointers,
    // common in the wild) fall back to their bare name — the linear
    // recovery posture, unchanged.
    val pathOf = new Array[String](nSlots)
    val visited = new Array[Boolean](nSlots)
    def walkScope(from: Long, prefix: String): Unit = {
      // iterative DFS over left/right siblings + storage children,
      // bounded by the visited set (a pointer cycle terminates)
      val stack = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
      stack += ((from, prefix))
      while (stack.nonEmpty) {
        val (id, pfx) = stack.remove(stack.length - 1)
        if (id >= 0 && id < nSlots && id <= MaxRegSect &&
          slots(id.toInt) != null && !visited(id.toInt)) {
          val i = id.toInt
          visited(i) = true
          val e = slots(i)
          stack += ((e.left, pfx))
          stack += ((e.right, pfx))
          if (e.typ == 2) pathOf(i) = pfx + e.name
          else if (e.typ == 1) stack += ((e.child, pfx + e.name + "/"))
        }
      }
    }
    walkScope(root.child, "")

    // mini stream machinery (root's stream holds the mini sectors)
    lazy val miniContainer = readChain(root.startSect, root.size)
    lazy val miniFat: IndexedSeq[Long] = {
      val raw = readChain(firstMiniFatSect, maxTotal)
      (0 until raw.length / 4).map(i => u32(raw, i * 4))
    }
    def readMini(start: Long, size: Long): Array[Byte] = {
      val cap = math.min(size, maxTotal)
      val out = new java.io.ByteArrayOutputStream()
      var cur = start
      var steps = 0
      val maxSteps = miniContainer.length / 64 + 1
      while (cur <= MaxRegSect && cur < miniFat.length && out.size < cap &&
        steps <= maxSteps) {
        val o = cur.toInt * 64
        if (o < miniContainer.length) {
          val want = math.min(math.min(64, miniContainer.length - o).toLong,
            cap - out.size).toInt
          if (want > 0) out.write(miniContainer, o, want)
        }
        cur = miniFat(cur.toInt)
        steps += 1
      }
      out.toByteArray
    }

    var total = 0L
    val out = Map.newBuilder[String, Array[Byte]]
    val seen = scala.collection.mutable.Set.empty[String]
    var i = 0
    while (i < nSlots) {
      val e = slots(i)
      if (e != null && e.typ == 2) {
        val key = if (pathOf(i) != null) pathOf(i) else e.name
        if (!seen.contains(key)) {
          seen += key
          val data =
            if (e.size < miniCutoff) readMini(e.startSect, e.size)
            else readChain(e.startSect, e.size)
          total += data.length
          if (total > maxTotal) return None
          out += key -> data
        }
      }
      i += 1
    }
    Some(out.result())
  }

  /** Container classification for inventory: what KIND of legacy
    * payload this CFB is, from the stream names alone (no payload
    * decode). None when not CFB.
    */
  def classify(bytes: Array[Byte]): Option[String] =
    streams(bytes).map(classifyFrom)

  /** The classification over an ALREADY-parsed container. */
  private[read] def classifyFrom(m: Map[String, Array[Byte]]): String =
    if (m.contains("EncryptionInfo") || m.contains("EncryptedPackage"))
      "encrypted-ooxml"
    else if (m.contains("WordDocument")) "doc"
    else if (m.contains("Workbook") || m.contains("Book")) "xls"
    else if (m.contains("PowerPoint Document")) "ppt"
    else "cfb"
}
