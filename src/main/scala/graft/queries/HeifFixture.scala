package graft.queries

/** INDEPENDENT HEIF-family container writer (ISO 14496-12 box
  * grammar + 23008-12 item properties, transcribed from the specs
  * separately from `graft.engine.validate.Heif` — the TiffFixture
  * discipline: the probe verifies against this writer, never against
  * itself). Only the metadata boxes a still-image probe reads are
  * written; `mdat` carries opaque stand-in payload (the pixel coders
  * are recorded skips).
  */
object HeifFixture {

  private def be16(v: Int): Array[Byte] =
    Array(((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
  private def be32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
      ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
  private def fourcc(s: String): Array[Byte] = s.getBytes("US-ASCII")

  def box(typ: String, payload: Array[Byte]*): Array[Byte] = {
    val body = payload.flatten.toArray
    be32(body.length + 8L) ++ fourcc(typ) ++ body
  }

  def fullBox(typ: String, version: Int, flags: Int,
              payload: Array[Byte]*): Array[Byte] =
    box(typ, Array(version.toByte, ((flags >> 16) & 0xFF).toByte,
      ((flags >> 8) & 0xFF).toByte, (flags & 0xFF).toByte),
      payload.flatten.toArray)

  def ftyp(major: String, compat: Seq[String]): Array[Byte] =
    box("ftyp", fourcc(major), be32(0), compat.flatMap(fourcc).toArray)

  /** ImageSpatialExtentsProperty (23008-12 §6.5.3). */
  def ispe(w: Long, h: Long): Array[Byte] =
    fullBox("ispe", 0, 0, be32(w), be32(h))

  /** An opaque codec-config stand-in so property indices skip over
    * non-ispe boxes, as real files make them.
    */
  def codecConfig(typ: String): Array[Byte] =
    box(typ, Array[Byte](1, 2, 3, 4))

  def pitm(id: Int): Array[Byte] = fullBox("pitm", 0, 0, be16(id))

  private def hdlr: Array[Byte] =
    fullBox("hdlr", 0, 0, be32(0), fourcc("pict"),
      be32(0), be32(0), be32(0), Array[Byte](0))

  /** ItemPropertyAssociation (§6.5.1): entries are
    * (item_ID, 1-based ipco property indices); `wide` sets flags
    * bit 0 (15-bit indices).
    */
  def ipma(entries: Seq[(Int, Seq[Int])],
           wide: Boolean = false): Array[Byte] = {
    val body = be32(entries.length.toLong) ++ entries.flatMap {
      case (id, idxs) =>
        be16(id) ++ Array(idxs.length.toByte) ++ idxs.flatMap(i =>
          if (wide) be16(i & 0x7FFF).toSeq else Seq((i & 0x7F).toByte))
    }
    fullBox("ipma", 0, if (wide) 1 else 0, body)
  }

  /** A complete still-image container: ftyp + meta(hdlr, pitm?,
    * iprp(ipco(props), ipma)) + mdat.
    */
  def heif(major: String, compat: Seq[String], primary: Option[Int],
           props: Seq[Array[Byte]], assoc: Seq[(Int, Seq[Int])],
           wide: Boolean = false): Array[Byte] = {
    val iprp = box("iprp",
      box("ipco", props.flatten.toArray),
      ipma(assoc, wide))
    val metaKids = Seq(hdlr) ++ primary.map(pitm).toSeq ++ Seq(iprp)
    ftyp(major, compat) ++
      fullBox("meta", 0, 0, metaKids.flatten.toArray) ++
      box("mdat", Array[Byte](9, 9, 9, 9))
  }

  /** [[heif]] plus an `Exif` ITEM (23008-12 §A.2.1): `iinf` names it,
    * `iloc` (v0, file-offset construction) points at the payload in
    * `mdat`, and the payload leads with the u32
    * `exif_tiff_header_offset` over `exifPrefix ++ tiff`. Two-pass
    * build: box sizes are offset-independent, so the second pass
    * patches the real extent offset in.
    */
  def heifWithExif(major: String, compat: Seq[String],
                   primary: Option[Int], props: Seq[Array[Byte]],
                   assoc: Seq[(Int, Seq[Int])], tiff: Array[Byte],
                   exifPrefix: Array[Byte] =
                     "Exif".getBytes("US-ASCII") ++ Array[Byte](0, 0),
                   exifItemId: Int = 7): Array[Byte] = {
    val payload = be32(exifPrefix.length.toLong) ++ exifPrefix ++ tiff
    def metaOf(extentOff: Long): Array[Byte] = {
      val iinf = fullBox("iinf", 0, 0, be16(1),
        fullBox("infe", 2, 0, be16(exifItemId), be16(0),
          fourcc("Exif"), Array[Byte](0)))
      val iloc = fullBox("iloc", 0, 0,
        Array[Byte](0x44.toByte, 0x00), // offset/length 4B, base 0B
        be16(1),                        // item_count
        be16(exifItemId), be16(0),      // item_ID, data_ref_index
        be16(1),                        // extent_count
        be32(extentOff), be32(payload.length.toLong))
      val iprp = box("iprp",
        box("ipco", props.flatten.toArray),
        ipma(assoc))
      val kids = Seq(hdlr) ++ primary.map(pitm).toSeq ++
        Seq(iinf, iloc, iprp)
      fullBox("meta", 0, 0, kids.flatten.toArray)
    }
    val ft = ftyp(major, compat)
    val metaLen = metaOf(0).length
    val extentOff = ft.length + metaLen + 8L // into mdat's payload
    ft ++ metaOf(extentOff) ++ box("mdat", payload, Array[Byte](9, 9))
  }
}
