package graft.engine.read

/** Shape inventory for data-file blobs in a crawl (the r16 magic
  * classification upgraded to facts a curator can act on):
  *
  *  - SQLite: table names + row counts via a from-spec b-tree walk
  *    (file format is documented at sqlite.org/fileformat2; fixtures
  *    come from python3's stdlib sqlite3 — an independent writer)
  *  - npy: dtype / shape / order from the one-line header dict
  *    (the NumPy .npy format spec, NEP-1)
  *  - HDF5: superblock version (the full object-header graph stays a
  *    recorded skip — COVERAGE.md)
  *  - Avro object container: exact record count from the block
  *    headers (each block declares its record count, so counting
  *    skips codec decode entirely; triangulated against the
  *    org.apache.avro writer on Spark's own classpath) + the record
  *    fields from the embedded schema
  *  - parquet: row count + top-level columns via parquet-mr's footer
  *    read over an in-memory InputFile (Spark's own classpath)
  *  - ORC: `numberOfRows` + root-struct columns from a from-spec
  *    PostScript/footer protobuf walk (chunk de-framing,
  *    none/zlib/snappy/zstd codecs)
  *  - Arrow IPC file: record count + schema fields via arrow-vector
  *
  * Crawl posture throughout: every read is bounds-checked; hostile
  * or truncated structures end the walk with None, never a throw.
  */
object DataFiles {

  private val MaxPages = 1 << 20 // 1M pages ≈ 4 GB at default size
  private val MaxTables = 4096

  // ---- SQLite ------------------------------------------------------

  /** Table names → row counts from a SQLite main file: parse the
    * `sqlite_schema` table on page 1, then count leaf cells in each
    * table's b-tree. `WITHOUT ROWID` tables live in index-leaf pages
    * and count the same way. Schema rows with overflow payloads (a
    * kilobytes-long CREATE statement) are skipped individually.
    * Results sorted by name. None when not SQLite or the header lies.
    */
  def sqliteTables(b: Array[Byte]): Option[Seq[(String, Long)]] = {
    if (b == null || b.length < 512) return None
    if (!(0 until 15).forall(i =>
      b(i) == "SQLite format 3".charAt(i).toByte) || b(15) != 0)
      return None
    def u16(o: Int): Int =
      if (o + 2 > b.length) -1
      else ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
    def u32(o: Int): Long =
      if (o + 4 > b.length) -1L
      else ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
        ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
    val pageSize = u16(16) match {
      case 1 => 65536
      case v if v >= 512 && (v & (v - 1)) == 0 => v
      case _ => return None
    }
    val nPages = math.min(u32(28), b.length.toLong / pageSize)
    if (nPages <= 0 || nPages > MaxPages) return None

    // varint: 1–9 bytes, big-endian 7-bit groups, 9th byte all 8 bits
    def varint(o: Int): (Long, Int) = {
      var v = 0L; var i = 0
      while (i < 8) {
        if (o + i >= b.length) return (-1L, 0)
        val x = b(o + i) & 0xff
        v = (v << 7) | (x & 0x7f)
        if ((x & 0x80) == 0) return (v, i + 1)
        i += 1
      }
      if (o + 8 >= b.length) (-1L, 0)
      else (((v << 8) | (b(o + 8) & 0xffL)), 9)
    }

    def pageStart(p: Long): Int = ((p - 1) * pageSize).toInt
    // page 1 carries the 100-byte file header before its b-tree page
    def btreeOff(p: Long): Int = pageStart(p) + (if (p == 1) 100 else 0)

    /** Count rows in the table rooted at `page`: leaf pages (table
      * 0x0D or index 0x0A for WITHOUT ROWID) contribute their cell
      * count; interior pages (0x05 / 0x02) recurse into children and
      * the rightmost pointer.
      */
    def countRows(page: Long, depth: Int,
                  seen: java.util.HashSet[Long]): Long = {
      if (page < 1 || page > nPages || depth > 32 || !seen.add(page))
        return 0L
      val o = btreeOff(page)
      val tpe = if (o < b.length) b(o) & 0xff else -1
      tpe match {
        case 0x0D | 0x0A => math.max(u16(o + 3), 0).toLong
        case 0x05 | 0x02 =>
          val n = u16(o + 3)
          if (n < 0) return 0L
          var total = countRows(u32(o + 8), depth + 1, seen)
          var i = 0
          while (i < n && i < 32768) {
            val cp = u16(o + 12 + 2 * i)
            if (cp > 0) {
              val child = u32(pageStart(page) + cp)
              total += countRows(child, depth + 1, seen)
            }
            i += 1
          }
          total
        case _ => 0L
      }
    }

    /** Parse one sqlite_schema leaf cell at absolute offset `co` on
      * page `page`: record columns (type, name, tbl_name, rootpage,
      * sql) — returns (name, rootpage) for type='table'.
      */
    def schemaCell(page: Long, cp: Int): Option[(String, Long)] = {
      val co = pageStart(page) + cp
      val (payloadLen, l1) = varint(co)
      if (payloadLen < 0) return None
      val (_, l2) = varint(co + l1) // rowid
      val rec = co + l1 + l2
      // usable payload without overflow: refuse cells that spill
      val usable = pageSize - 35 // spec: leaf max local is U-35
      if (payloadLen > usable) return None
      if (rec + payloadLen > b.length) return None
      val (hdrLen, h1) = varint(rec)
      if (hdrLen < h1 || rec + hdrLen > b.length) return None
      // serial types
      var ho = rec + h1
      val types = scala.collection.mutable.ArrayBuffer.empty[Long]
      while (ho < rec + hdrLen && types.length < 16) {
        val (t, n) = varint(ho)
        if (t < 0 || n == 0) return None
        types += t; ho += n
      }
      if (types.length < 4) return None
      def sizeOf(t: Long): Long = t match {
        case 0 | 8 | 9 => 0; case 1 => 1; case 2 => 2; case 3 => 3
        case 4 => 4; case 5 => 6; case 6 | 7 => 8
        case t if t >= 12 && t % 2 == 0 => (t - 12) / 2
        case t if t >= 13 => (t - 13) / 2
        case _ => -1
      }
      var vo = (rec + hdrLen).toLong
      def textAt(idx: Int): Option[String] = {
        var p = vo; var i = 0
        while (i < idx) {
          val s = sizeOf(types(i)); if (s < 0) return None; p += s; i += 1
        }
        val s = sizeOf(types(idx))
        if (s < 0 || types(idx) < 13 || types(idx) % 2 == 0 ||
          p + s > b.length) None
        else Some(new String(b, p.toInt, s.toInt,
          java.nio.charset.StandardCharsets.UTF_8))
      }
      def intAt(idx: Int): Option[Long] = {
        var p = vo; var i = 0
        while (i < idx) {
          val s = sizeOf(types(i)); if (s < 0) return None; p += s; i += 1
        }
        val t = types(idx)
        val s = sizeOf(t)
        if (s < 0 || t > 6 || p + s > b.length) return None
        t match {
          case 8 => Some(0L)
          case 9 => Some(1L)
          case 0 => None
          case _ =>
            var v: Long = b(p.toInt).toLong // first byte sign-extends
            var k = 1
            while (k < s) { v = (v << 8) | (b(p.toInt + k) & 0xffL); k += 1 }
            Some(v)
        }
      }
      for {
        tpe <- textAt(0)
        if tpe == "table"
        name <- textAt(1)
        root <- intAt(3)
      } yield (name, root)
    }

    /** Walk the sqlite_schema b-tree from page 1 collecting tables. */
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    def walkSchema(page: Long, depth: Int,
                   seen: java.util.HashSet[Long]): Unit = {
      if (page < 1 || page > nPages || depth > 32 || !seen.add(page) ||
        out.length >= MaxTables) return
      val o = btreeOff(page)
      val tpe = if (o < b.length) b(o) & 0xff else -1
      val n = u16(o + 3)
      if (n < 0) return
      tpe match {
        case 0x0D =>
          var i = 0
          while (i < n && i < 32768 && out.length < MaxTables) {
            val cp = u16(o + 8 + 2 * i)
            if (cp > 0) schemaCell(page, cp).foreach { case (name, root) =>
              out += name -> root
            }
            i += 1
          }
        case 0x05 =>
          walkSchema(u32(o + 8), depth + 1, seen)
          var i = 0
          while (i < n && i < 32768) {
            val cp = u16(o + 12 + 2 * i)
            if (cp > 0) walkSchema(u32(pageStart(page) + cp), depth + 1, seen)
            i += 1
          }
        case _ => ()
      }
    }
    try {
      walkSchema(1, 0, new java.util.HashSet[Long]())
      Some(out.toSeq.map { case (name, root) =>
        name -> countRows(root, 0, new java.util.HashSet[Long]())
      }.sortBy(_._1))
    } catch { case _: Exception => None }
  }

  // ---- npy ---------------------------------------------------------

  final case class NpyInfo(dtype: String, shape: Seq[Long],
                           fortranOrder: Boolean)

  /** Parse the .npy header: magic, version, header length, then the
    * Python dict literal `{'descr': …, 'fortran_order': …,
    * 'shape': (…)}`. The dict is parsed structurally (quoted string +
    * tuple of ints), not eval'd.
    */
  def npyInfo(b: Array[Byte]): Option[NpyInfo] = {
    if (b == null || b.length < 10) return None
    if ((b(0) & 0xff) != 0x93 || b(1) != 'N' || b(2) != 'U' ||
      b(3) != 'M' || b(4) != 'P' || b(5) != 'Y') return None
    val major = b(6) & 0xff
    val (hdrLen, hdrStart) =
      if (major == 1) (((b(8) & 0xff) | ((b(9) & 0xff) << 8)).toLong, 10)
      else if (major >= 2 && b.length >= 12)
        (((b(8) & 0xffL) | ((b(9) & 0xffL) << 8) |
          ((b(10) & 0xffL) << 16) | ((b(11) & 0xffL) << 24)), 12)
      else return None
    if (hdrLen <= 0 || hdrLen > (1 << 20) ||
      hdrStart + hdrLen > b.length) return None
    val hdr = new String(b, hdrStart, hdrLen.toInt,
      java.nio.charset.StandardCharsets.ISO_8859_1)
    val descr = "'descr'\\s*:\\s*'([^']*)'".r
      .findFirstMatchIn(hdr).map(_.group(1)).getOrElse(return None)
    val fortran = "'fortran_order'\\s*:\\s*(True|False)".r
      .findFirstMatchIn(hdr).map(_.group(1) == "True")
      .getOrElse(return None)
    val shapeStr = "'shape'\\s*:\\s*\\(([^)]*)\\)".r
      .findFirstMatchIn(hdr).map(_.group(1)).getOrElse(return None)
    val dims = shapeStr.split(",").map(_.trim).filter(_.nonEmpty)
    val shape =
      try dims.toSeq.map(_.toLong)
      catch { case _: NumberFormatException => return None }
    if (shape.exists(_ < 0)) return None
    Some(NpyInfo(descr, shape, fortran))
  }

  // ---- HDF5 --------------------------------------------------------

  /** HDF5 superblock version (the byte after the 8-byte signature).
    * Deeper structure stays a recorded skip.
    */
  def hdf5SuperblockVersion(b: Array[Byte]): Option[Int] = {
    if (b == null || b.length < 9) return None
    if ((b(0) & 0xff) != 0x89 || b(1) != 'H' || b(2) != 'D' ||
      b(3) != 'F' || b(4) != '\r' || b(5) != '\n' ||
      (b(6) & 0xff) != 0x1a || b(7) != '\n') return None
    val v = b(8) & 0xff
    if (v <= 3) Some(v) else None
  }

  // ---- Avro object container --------------------------------------

  /** Exact record count from an Avro object container: skip the
    * header (magic, metadata map, 16-byte sync marker), then each
    * block declares `(recordCount, byteSize)` as zig-zag varints —
    * sum the counts, skipping the (possibly compressed) data without
    * decoding it. None on structural violations.
    */
  def avroRecordCount(b: Array[Byte]): Option[Long] = {
    if (b == null || b.length < 32) return None
    if (!(b(0) == 'O' && b(1) == 'b' && b(2) == 'j' && b(3) == 1))
      return None
    // zig-zag varint (Avro long)
    def zz(o: Int): (Long, Int) = {
      var v = 0L; var i = 0
      while (i < 10) {
        if (o + i >= b.length) return (Long.MinValue, 0)
        val x = b(o + i) & 0xff
        v |= (x & 0x7fL) << (7 * i)
        if ((x & 0x80) == 0) {
          return (((v >>> 1) ^ -(v & 1)), i + 1)
        }
        i += 1
      }
      (Long.MinValue, 0)
    }
    var o = 4
    // metadata map: blocks of (count, entries...) until count 0;
    // a NEGATIVE count is followed by a byte size (spec)
    var guard = 0
    var done = false
    while (!done && guard < (1 << 16)) {
      guard += 1
      val (n0, l0) = zz(o)
      if (n0 == Long.MinValue) return None
      o += l0
      if (n0 == 0) done = true
      else {
        val n = math.abs(n0)
        if (n0 < 0) { val (_, ls) = zz(o); o += ls } // block byte size
        var i = 0L
        while (i < n) {
          val (klen, lk) = zz(o)
          if (klen < 0 || klen > b.length || lk == 0) return None
          o += lk + klen.toInt
          if (o > b.length) return None
          val (vlen, lv) = zz(o)
          if (vlen < 0 || vlen > b.length || lv == 0) return None
          o += lv + vlen.toInt
          if (o > b.length) return None
          i += 1
        }
      }
    }
    o += 16 // sync marker
    if (o > b.length) return None
    var total = 0L
    while (o < b.length) {
      val (cnt, lc) = zz(o)
      if (cnt == Long.MinValue || cnt < 0) return None
      o += lc
      val (sz, ls) = zz(o)
      if (sz < 0 || sz > b.length || ls == 0) return None
      o += ls + sz.toInt + 16 // data + sync marker
      if (o > b.length) return None
      total += cnt
    }
    Some(total)
  }

  // ---- parquet -----------------------------------------------------

  /** In-memory [[org.apache.parquet.io.InputFile]]: parquet-mr (on
    * Spark's own classpath — the ImageIO precedent) reads the footer
    * without any filesystem, so a parquet BLOB in a crawl column
    * inventories its row count from metadata alone (no page decode).
    */
  private final class BytesInputFile(b: Array[Byte])
      extends org.apache.parquet.io.InputFile {
    override def getLength: Long = b.length.toLong
    override def newStream(): org.apache.parquet.io.SeekableInputStream = {
      val bis = new java.io.ByteArrayInputStream(b)
      new org.apache.parquet.io.DelegatingSeekableInputStream(bis) {
        private var pos = 0L
        override def getPos: Long = pos
        override def seek(newPos: Long): Unit = {
          bis.reset()
          var skipped = 0L
          while (skipped < newPos) {
            val s = bis.skip(newPos - skipped)
            if (s <= 0) return
            skipped += s
          }
          pos = newPos
        }
        override def read(): Int = {
          val r = super.read(); if (r >= 0) pos += 1; r
        }
        override def read(buf: Array[Byte], off: Int, len: Int): Int = {
          val r = bis.read(buf, off, len); if (r > 0) pos += r; r
        }
      }
    }
  }

  /** Exact parquet row count from the footer's row-group metadata. */
  def parquetRowCount(b: Array[Byte]): Option[Long] = {
    if (b == null || b.length < 12) return None
    if (!(b(0) == 'P' && b(1) == 'A' && b(2) == 'R' && b(3) == '1'))
      return None
    try {
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(
        new BytesInputFile(b))
      try Some(r.getRecordCount) finally r.close()
    } catch { case _: Exception | _: NoClassDefFoundError => None }
  }

  /** Top-level parquet columns `(name, primitiveTypeName | "group")`
    * from the footer schema.
    */
  def parquetColumns(b: Array[Byte]): Option[Seq[(String, String)]] = {
    if (b == null || b.length < 12) return None
    if (!(b(0) == 'P' && b(1) == 'A' && b(2) == 'R' && b(3) == '1'))
      return None
    try {
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(
        new BytesInputFile(b))
      try {
        val schema = r.getFileMetaData.getSchema
        Some(schema.getFields.toArray.toSeq.collect {
          case f: org.apache.parquet.schema.Type =>
            val t =
              if (f.isPrimitive) f.asPrimitiveType()
                .getPrimitiveTypeName.name.toLowerCase(java.util.Locale.ROOT)
              else "group"
            (f.getName, t)
        })
      } finally r.close()
    } catch { case _: Exception | _: NoClassDefFoundError => None }
  }

  // ---- ORC ---------------------------------------------------------

  /** Exact ORC row count from the file footer's `numberOfRows`
    * (protobuf field 6), read from-spec: the last byte gives the
    * PostScript length; the PostScript (uncompressed protobuf)
    * declares the footer's compressed length and codec; the footer
    * section de-chunks (3-byte little-endian headers, raw
    * deflate/snappy/zstd/none blocks) and the varint walk pulls the
    * one field. Stripe data is never touched.
    */
  def orcRowCount(b: Array[Byte]): Option[Long] =
    orcFooter(b).flatMap(f => fields(f).flatMap(_.get(6)))
      .filter(_ >= 0)

  /** First-scalar protobuf field map (varint fields only; length-
    * delimited fields are skipped) — the PostScript/Footer walk.
    */
  private def fields(buf: Array[Byte]): Option[Map[Int, Long]] = {
    var o = 0
    var out = Map.empty[Int, Long]
    def varint(): Long = {
      var v = 0L; var sh = 0
      while (o < buf.length) {
        val x = buf(o) & 0xff; o += 1
        v |= (x & 0x7fL) << sh
        if ((x & 0x80) == 0) return v
        sh += 7
        if (sh > 63) return -1L
      }
      -1L
    }
    while (o < buf.length) {
      val key = varint()
      if (key < 0) return Some(out)
      val field = (key >> 3).toInt
      val wire = (key & 7).toInt
      wire match {
        case 0 =>
          val v = varint(); if (v < 0) return Some(out)
          if (!out.contains(field)) out += field -> v
        case 2 =>
          val len = varint()
          if (len < 0 || o + len > buf.length) return Some(out)
          o += len.toInt
        case 5 => o += 4
        case 1 => o += 8
        case _ => return Some(out)
      }
    }
    Some(out)
  }

  /** The decompressed ORC file footer (PostScript-declared length and
    * codec, chunk de-framing) — shared by the row count and the
    * column inventory.
    */
  private def orcFooter(b: Array[Byte]): Option[Array[Byte]] = {
    if (b == null || b.length < 16) return None
    if (!(b(0) == 'O' && b(1) == 'R' && b(2) == 'C')) return None
    val n = b.length
    val psLen = b(n - 1) & 0xff
    if (psLen <= 0 || psLen > 256 || n - 1 - psLen < 3) return None
    val ps = java.util.Arrays.copyOfRange(b, n - 1 - psLen, n - 1)
    val psf = fields(ps).getOrElse(return None)
    val footerLen = psf.getOrElse(1, -1L)
    val codec = psf.getOrElse(2, 0L).toInt
    if (footerLen <= 0 || footerLen > (n - 1 - psLen)) return None
    val fStart = (n - 1 - psLen - footerLen).toInt
    val fComp = java.util.Arrays.copyOfRange(b, fStart,
      fStart + footerLen.toInt)
    val footer: Array[Byte] =
      if (codec == 0) fComp
      else {
        // chunked: 3-byte LE header = (len << 1) | isOriginal
        val out = new java.io.ByteArrayOutputStream()
        var o = 0
        try {
          while (o + 3 <= fComp.length) {
            val hdr = (fComp(o) & 0xff) | ((fComp(o + 1) & 0xff) << 8) |
              ((fComp(o + 2) & 0xff) << 16)
            val orig = (hdr & 1) == 1
            val clen = hdr >>> 1
            o += 3
            if (clen <= 0 || o + clen > fComp.length) return None
            val chunk = java.util.Arrays.copyOfRange(fComp, o, o + clen)
            o += clen
            if (orig) out.write(chunk)
            else codec match {
              case 1 => // zlib = raw deflate
                val inf = new java.util.zip.Inflater(true)
                inf.setInput(chunk)
                val buf = new Array[Byte](16 << 10)
                while (!inf.finished() && !inf.needsInput()) {
                  val k = inf.inflate(buf)
                  if (k <= 0 && !inf.finished()) return None
                  out.write(buf, 0, k)
                }
                inf.end()
              case 2 => out.write(org.xerial.snappy.Snappy.uncompress(chunk))
              case 5 =>
                out.write(com.github.luben.zstd.Zstd.decompress(chunk,
                  16 << 20))
              case _ => return None // LZO/LZ4/unknown: recorded skip
            }
            if (out.size() > (16 << 20)) return None
          }
        } catch { case _: Exception => return None }
        out.toByteArray
      }
    Some(footer)
  }

  /** All records of a protobuf message: `(fieldNo, Left(varint) |
    * Right(bytes))` — the general sibling of the first-scalar map
    * used for the row count; bounded, never throws.
    */
  private def pbRecords(buf: Array[Byte])
  : Seq[(Int, Either[Long, Array[Byte]])] = {
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Int, Either[Long, Array[Byte]])]
    var o = 0
    def varint(): Long = {
      var v = 0L; var sh = 0
      while (o < buf.length) {
        val x = buf(o) & 0xff; o += 1
        v |= (x & 0x7fL) << sh
        if ((x & 0x80) == 0) return v
        sh += 7
        if (sh > 63) return -1L
      }
      -1L
    }
    var guard = 0
    while (o < buf.length && guard < (1 << 16)) {
      guard += 1
      val key = varint()
      if (key < 0) return out.toSeq
      val field = (key >> 3).toInt
      (key & 7).toInt match {
        case 0 =>
          val v = varint(); if (v < 0) return out.toSeq
          out += field -> Left(v)
        case 2 =>
          val len = varint()
          if (len < 0 || len > buf.length || o + len > buf.length)
            return out.toSeq
          out += field -> Right(
            java.util.Arrays.copyOfRange(buf, o, o + len.toInt))
          o += len.toInt
        case 5 => o += 4
        case 1 => o += 8
        case _ => return out.toSeq
      }
    }
    out.toSeq
  }

  private val OrcKinds = Array("boolean", "byte", "short", "int",
    "long", "float", "double", "string", "date", "timestamp", "binary",
    "decimal", "varchar", "char", "list", "map", "struct", "union",
    "timestamp_instant")

  /** Top-level ORC columns from the footer's Type list (protobuf
    * field 4): the root struct's fieldNames (field 3) paired with
    * each subtype's kind (field 1; subtypes field 2, packed or
    * repeated).
    */
  def orcColumns(b: Array[Byte]): Option[Seq[(String, String)]] =
    orcFooter(b).flatMap { footer =>
      val types = pbRecords(footer).collect {
        case (4, Right(msg)) => pbRecords(msg)
      }
      if (types.isEmpty) return None
      val root = types.head
      val kindOf: Int => String = i =>
        if (i < 0 || i >= types.length) "?"
        else types(i).collectFirst { case (1, Left(k))
          if k >= 0 && k < OrcKinds.length => OrcKinds(k.toInt)
        }.getOrElse("?")
      val names = root.collect { case (3, Right(s)) =>
        new String(s, java.nio.charset.StandardCharsets.UTF_8)
      }
      val subtypes: Seq[Int] = {
        val packed = root.collect { case (2, Right(p)) => p }
        if (packed.nonEmpty)
          packed.flatMap { p =>
            val vals = scala.collection.mutable.ArrayBuffer.empty[Int]
            var o = 0
            var v = 0L; var sh = 0
            while (o < p.length) {
              val x = p(o) & 0xff; o += 1
              v |= (x & 0x7fL) << sh; sh += 7
              if ((x & 0x80) == 0) { vals += v.toInt; v = 0L; sh = 0 }
            }
            vals.toSeq
          }
        else root.collect { case (2, Left(v)) => v.toInt }
      }
      if (names.isEmpty || names.length != subtypes.length) None
      else Some(names.zip(subtypes.map(kindOf)))
    }

  // ---- Arrow IPC file ---------------------------------------------

  /** Exact Arrow IPC-file record count via arrow-vector (Spark's own
    * classpath): sum of record-batch row counts from the footer
    * blocks — batches load metadata-first, no value buffers retained.
    */
  def arrowRecordCount(b: Array[Byte]): Option[Long] = {
    if (b == null || b.length < 12) return None
    if (!(b(0) == 'A' && b(1) == 'R' && b(2) == 'R' && b(3) == 'O' &&
      b(4) == 'W' && b(5) == '1')) return None
    var alloc: org.apache.arrow.memory.RootAllocator = null
    var reader: org.apache.arrow.vector.ipc.ArrowFileReader = null
    try {
      alloc = new org.apache.arrow.memory.RootAllocator(64L << 20)
      reader = new org.apache.arrow.vector.ipc.ArrowFileReader(
        new org.apache.arrow.vector.ipc.SeekableReadChannel(
          new org.apache.arrow.vector.util
            .ByteArrayReadableSeekableByteChannel(b)), alloc)
      var total = 0L
      while (reader.loadNextBatch())
        total += reader.getVectorSchemaRoot.getRowCount
      Some(total)
    } catch {
      case _: Exception | _: NoClassDefFoundError => None
    } finally {
      if (reader != null) { try reader.close() catch { case _: Exception => () } }
      if (alloc != null) { try alloc.close() catch { case _: Exception => () } }
    }
  }

  /** Top-level Avro record fields from the container's embedded
    * schema (`avro.schema` header metadata, read via the avro library
    * on Spark's classpath).
    */
  def avroColumns(b: Array[Byte]): Option[Seq[(String, String)]] = {
    if (b == null || b.length < 32) return None
    if (!(b(0) == 'O' && b(1) == 'b' && b(2) == 'j' && b(3) == 1))
      return None
    var in: org.apache.avro.file.DataFileStream[AnyRef] = null
    try {
      in = new org.apache.avro.file.DataFileStream(
        new java.io.ByteArrayInputStream(b),
        new org.apache.avro.generic.GenericDatumReader[AnyRef]())
      val schema = in.getSchema
      if (schema.getType != org.apache.avro.Schema.Type.RECORD) None
      else Some(schema.getFields.toArray.toSeq.collect {
        case f: org.apache.avro.Schema.Field =>
          (f.name(), f.schema().getType.getName
            .toLowerCase(java.util.Locale.ROOT))
      })
    } catch { case _: Exception | _: NoClassDefFoundError => None }
    finally {
      if (in != null) { try in.close() catch { case _: Exception => () } }
    }
  }

  /** Arrow IPC-file schema fields `(name, typeId)`. */
  def arrowColumns(b: Array[Byte]): Option[Seq[(String, String)]] = {
    if (b == null || b.length < 12) return None
    if (!(b(0) == 'A' && b(1) == 'R' && b(2) == 'R' && b(3) == 'O' &&
      b(4) == 'W' && b(5) == '1')) return None
    var alloc: org.apache.arrow.memory.RootAllocator = null
    var reader: org.apache.arrow.vector.ipc.ArrowFileReader = null
    try {
      alloc = new org.apache.arrow.memory.RootAllocator(64L << 20)
      reader = new org.apache.arrow.vector.ipc.ArrowFileReader(
        new org.apache.arrow.vector.ipc.SeekableReadChannel(
          new org.apache.arrow.vector.util
            .ByteArrayReadableSeekableByteChannel(b)), alloc)
      val schema = reader.getVectorSchemaRoot.getSchema
      Some(schema.getFields.toArray.toSeq.collect {
        case f: org.apache.arrow.vector.types.pojo.Field =>
          (f.getName, f.getType.getTypeID.name()
            .toLowerCase(java.util.Locale.ROOT))
      })
    } catch {
      case _: Exception | _: NoClassDefFoundError => None
    } finally {
      if (reader != null) { try reader.close() catch { case _: Exception => () } }
      if (alloc != null) { try alloc.close() catch { case _: Exception => () } }
    }
  }

  private def colsSuffix(cols: Option[Seq[(String, String)]]): String =
    cols.filter(_.nonEmpty).map(cs =>
      " cols=" + cs.take(64).map { case (n, t) => s"$n:$t" }
        .mkString(",")).getOrElse("")

  /** One-line inventory detail per data-file format (the m42/m84
    * surface): stable, sorted, human- and oracle-readable. Row/record
    * counts never decode data; column lists come from the embedded
    * schemas (capped at 64).
    */
  def inventory(bytes: Array[Byte]): Option[String] = {
    if (bytes == null || bytes.length < 8) return None
    sqliteTables(bytes).map { ts =>
      "tables=" + ts.map { case (n, c) => s"$n:$c" }.mkString(",")
    }.orElse(npyInfo(bytes).map { n =>
      s"dtype=${n.dtype} shape=${n.shape.mkString("x")}" +
        s" fortran=${n.fortranOrder}"
    }).orElse(hdf5SuperblockVersion(bytes).map(v => s"superblock=v$v"))
      .orElse(avroRecordCount(bytes).map(c =>
        s"records=$c" + colsSuffix(avroColumns(bytes))))
      .orElse(parquetRowCount(bytes).map(c =>
        s"records=$c" + colsSuffix(parquetColumns(bytes))))
      .orElse(orcRowCount(bytes).map(c =>
        s"records=$c" + colsSuffix(orcColumns(bytes))))
      .orElse(arrowRecordCount(bytes).map(c =>
        s"records=$c" + colsSuffix(arrowColumns(bytes))))
  }
}
