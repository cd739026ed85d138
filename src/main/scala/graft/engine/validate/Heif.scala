package graft.engine.validate

/** HEIF-family still-image probe (ISO/IEC 23008-12 over the 14496-12
  * box grammar — HEIC from phones, AVIF from the modern web: the two
  * dominant image classes ImageIO cannot see at all). Dimensions and
  * format come from the METADATA boxes, the `ImageProbe` discipline:
  * `ftyp` brands name the family, `meta/pitm` names the primary item,
  * `meta/iprp/ipma` associates it with its `ispe` (image spatial
  * extents) property inside `iprp/ipco` — resolving the PRIMARY
  * item's extents, not the first `ispe` in the file, because a phone
  * HEIC leads with its thumbnail's (or a grid tile's) extents.
  *
  * PIXEL decode is a recorded skip (COVERAGE.md): the payloads are
  * HEVC / AV1 intra frames — entropy coders with no pure-JVM decoder
  * and no independently-checkable offline fixture writer (the
  * MP3-tables argument). Inventory (format, dimensions) is what the
  * caps/stats curation stages need.
  *
  * Reuses [[VideoProbe]]'s hostility-hardened box walk (lying sizes
  * clamp and end the walk; truncation never throws).
  */
object Heif {

  import VideoProbe.{findBox, tag, u16be, u32be, walkBoxes}

  final case class Meta(format: String, width: Int, height: Int)

  /** Brands that mark a HEIF-family STILL image (sequence brands
    * `avis`/`hevs`/`msf1` ride along: their primary item still
    * probes). AVIF brands map to "avif", HEVC-coded ones to "heic",
    * the bare structural brand to "heif".
    */
  private val AvifBrands = Set("avif", "avis")
  private val HeicBrands = Set("heic", "heix", "heim", "heis",
    "hevc", "hevx", "hevm", "hevs")
  private val HeifBrands = AvifBrands ++ HeicBrands ++ Set("mif1", "msf1")

  /** The payload opens with an `ftyp` whose major or compatible
    * brands include a HEIF-family member.
    */
  def isHeif(bytes: Array[Byte]): Boolean = brands(bytes).nonEmpty

  /** ftyp brand list (major first, then compatibles), intersected
    * with the HEIF family; empty when not a HEIF ftyp.
    */
  private def brands(b: Array[Byte]): Seq[String] = {
    if (b == null || b.length < 16 || tag(b, 4) != "ftyp")
      return Seq.empty
    val size = u32be(b, 0)
    if (size < 16 || size > b.length) return Seq.empty
    // major brand at 8, minor version at 12, compatibles from 16
    val out = scala.collection.mutable.ArrayBuffer(tag(b, 8))
    var off = 16
    while (off + 4 <= size) {
      out += tag(b, off)
      off += 4
    }
    val hits = out.filter(HeifBrands.contains)
    hits.toSeq
  }

  /** Absolute offset of the TIFF header inside the container's Exif
    * item (ISO 23008-12 §A.2.1: `iinf` names an item of type `Exif`,
    * `iloc` locates its extent, and the payload leads with a u32
    * `exif_tiff_header_offset`). This is how a phone HEIC carries
    * orientation and GPS — [[ExifProbe]] resolves it through here, so
    * the image-PII inventory/redaction story covers the dominant
    * phone format, not just JPEG. None when no parseable Exif item
    * exists (construction methods other than file-offset refuse).
    */
  def exifTiffOffset(bytes: Array[Byte]): Option[Int] = {
    if (!isHeif(bytes)) return None
    try {
      val (ms0, me) = findBox(bytes, 0, bytes.length.toLong, "meta")
        .getOrElse(return None)
      if (me - ms0 < 4) return None
      val ms = ms0 + 4
      // iinf → the Exif item's ID
      val exifId: Long = findBox(bytes, ms, me, "iinf").flatMap {
        case (s, e) =>
          if (e - s < 6) None
          else {
            val version = bytes(s.toInt) & 0xFF
            val off = if (version == 0) s + 6 else s + 8
            var found: Option[Long] = None
            walkBoxes(bytes, off, e) { (t, ps, pe) =>
              if (t == "infe" && found.isEmpty && pe - ps >= 12) {
                val ver = bytes(ps.toInt) & 0xFF
                if (ver == 2 && tag(bytes, ps.toInt + 8) == "Exif")
                  found = Some(u16be(bytes, ps.toInt + 4).toLong)
                else if (ver == 3 && pe - ps >= 14 &&
                  tag(bytes, ps.toInt + 10) == "Exif")
                  found = Some(u32be(bytes, ps.toInt + 4))
              }
            }
            found
          }
      }.getOrElse(return None)
      // iloc → that item's first extent (file-offset construction)
      val (ils, ile) = findBox(bytes, ms, me, "iloc")
        .getOrElse(return None)
      if (ile - ils < 8) return None
      val ver = bytes(ils.toInt) & 0xFF
      var off = ils + 4
      def u8(): Int = {
        if (off + 1 > ile) return -1
        val v = bytes(off.toInt) & 0xFF; off += 1; v
      }
      def u16(): Int = {
        if (off + 2 > ile) return -1
        val v = u16be(bytes, off.toInt); off += 2; v
      }
      def u32(): Long = {
        if (off + 4 > ile) return -1L
        val v = u32be(bytes, off.toInt); off += 4; v
      }
      def readN(n: Int): Long = n match {
        case 0 => 0L
        case 4 => u32()
        case 8 => val hi = u32(); val lo = u32()
          if (hi < 0 || lo < 0) -1L else (hi << 32) | lo
        case _ => -1L
      }
      val b1 = u8(); val b2 = u8()
      if (b1 < 0 || b2 < 0) return None
      val offsetSize = b1 >> 4
      val lengthSize = b1 & 0xF
      val baseOffsetSize = b2 >> 4
      val indexSize = if (ver >= 1) b2 & 0xF else 0
      val count = if (ver < 2) u16().toLong else u32()
      if (count < 0 || count > 4096) return None
      var i = 0L
      while (i < count) {
        val itemId = if (ver < 2) u16().toLong else u32()
        val method = if (ver >= 1) { val m = u16(); m & 0xF } else 0
        val dri = u16()
        if (itemId < 0 || dri < 0) return None
        val baseOffset = readN(baseOffsetSize)
        val extents = u16()
        if (baseOffset < 0 || extents < 0 || extents > 256) return None
        var e0: Long = -1
        var j = 0
        while (j < extents) {
          if (indexSize > 0) readN(indexSize)
          val eo = readN(offsetSize)
          val el = readN(lengthSize)
          if (eo < 0 || el < 0) return None
          if (j == 0) e0 = baseOffset + eo
          j += 1
        }
        if (itemId == exifId) {
          if (method != 0 || e0 < 0) return None
          if (e0 + 8 > bytes.length || e0 > Int.MaxValue) return None
          val tiffOff = u32be(bytes, e0.toInt)
          val abs = e0 + 4 + tiffOff
          if (tiffOff < 0 || abs + 8 > bytes.length ||
            abs > Int.MaxValue) return None
          return Some(abs.toInt)
        }
        i += 1
      }
      None
    } catch { case _: Exception => None }
  }

  /** Format + the PRIMARY item's spatial extents; None when the
    * payload is not HEIF or its metadata cannot be walked.
    */
  def meta(bytes: Array[Byte]): Option[Meta] = {
    val bs = brands(bytes)
    if (bs.isEmpty) return None
    val format =
      if (bs.exists(AvifBrands.contains)) "avif"
      else if (bs.exists(HeicBrands.contains)) "heic"
      else "heif"
    try {
      // `meta` is a FULL box: 4 bytes version/flags lead its payload
      val (ms0, me) = findBox(bytes, 0, bytes.length.toLong, "meta")
        .getOrElse(return None)
      if (me - ms0 < 4) return None
      val ms = ms0 + 4
      // primary item: pitm fullbox, u16 item_ID (v0) / u32 (v1)
      val primary: Option[Long] = findBox(bytes, ms, me, "pitm").flatMap {
        case (s, e) =>
          if (e - s < 6) None
          else if (bytes(s.toInt) == 0 && e - s >= 6)
            Some(u16be(bytes, s.toInt + 4).toLong)
          else if (e - s >= 8) Some(u32be(bytes, s.toInt + 4))
          else None
      }
      val (iprpS, iprpE) = findBox(bytes, ms, me, "iprp")
        .getOrElse(return None)
      // ipco children IN ORDER: ipma property indices are 1-based
      // positions in this list
      val props = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long)]
      findBox(bytes, iprpS, iprpE, "ipco").foreach { case (s, e) =>
        walkBoxes(bytes, s, e)((t, ps, pe) => props += ((t, ps, pe)))
      }
      def ispeAt(idx: Int): Option[(Int, Int)] =
        if (idx < 1 || idx > props.length) None
        else props(idx - 1) match {
          case ("ispe", s, e) if e - s >= 12 =>
            val w = u32be(bytes, s.toInt + 4)
            val h = u32be(bytes, s.toInt + 8)
            if (w > 0 && h > 0 && w <= Int.MaxValue && h <= Int.MaxValue)
              Some((w.toInt, h.toInt))
            else None
          case _ => None
        }
      // ipma: item -> property indices (fullbox; flags bit 0 widens
      // each association to 15 bits)
      val assoc = scala.collection.mutable.Map.empty[Long, Seq[Int]]
      findBox(bytes, iprpS, iprpE, "ipma").foreach { case (s0, e) =>
        if (e - s0 >= 8) {
          val version = bytes(s0.toInt) & 0xFF
          val wide = (bytes(s0.toInt + 3) & 1) == 1
          val n = u32be(bytes, s0.toInt + 4)
          var off = s0 + 8
          var i = 0L
          while (i < n && off < e) {
            val itemId =
              if (version < 1) {
                if (off + 2 > e) return None
                val v = u16be(bytes, off.toInt).toLong; off += 2; v
              } else {
                if (off + 4 > e) return None
                val v = u32be(bytes, off.toInt); off += 4; v
              }
            if (off + 1 > e) return None
            val cnt = bytes(off.toInt) & 0xFF
            off += 1
            val idxs = scala.collection.mutable.ArrayBuffer.empty[Int]
            var j = 0
            while (j < cnt) {
              if (wide) {
                if (off + 2 > e) return None
                idxs += (u16be(bytes, off.toInt) & 0x7FFF); off += 2
              } else {
                if (off + 1 > e) return None
                idxs += (bytes(off.toInt) & 0x7F); off += 1
              }
              j += 1
            }
            assoc(itemId) = idxs.toSeq
            i += 1
          }
        }
      }
      // the primary item's own ispe; when the writer skipped pitm or
      // ipma, fall back to the LARGEST extents declared (main image
      // beats its thumbnail)
      val fromPrimary = for {
        p    <- primary
        idxs <- assoc.get(p)
        wh   <- idxs.iterator.flatMap(ispeAt).take(1)
          .toSeq.headOption
      } yield wh
      val wh = fromPrimary.orElse {
        val all = props.indices.flatMap(i => ispeAt(i + 1))
        if (all.isEmpty) None
        else Some(all.maxBy { case (w, h) => w.toLong * h })
      }
      wh.map { case (w, h) => Meta(format, w, h) }
    } catch { case _: Exception => None }
  }
}
