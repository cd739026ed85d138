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
