package graft.engine.validate

import java.io.ByteArrayInputStream

import javax.imageio.ImageIO

/** Image dimension probe (SURVEY.md §2.1 S8): ImageIO readers expose
  * width/height from the header WITHOUT a full pixel decode — the same
  * trick as the reference's PIL `img.size` on an unloaded image
  * (`image_validator.py:187-225`). Runs inside executors over
  * binaryFile content; never decodes pixel data.
  */
object ImageProbe {
  graft.multimodal.ImageIoDefaults.ensure() // memory-backed ImageIO streams

  def dimensions(bytes: Array[Byte]): Option[(Int, Int)] = {
    if (bytes == null || bytes.isEmpty) return None
    // WebP first, by magic: ImageIO has no WebP reader at all, and the
    // container probe is a fixed ~30-byte header read
    if (graft.multimodal.WebP.isWebP(bytes))
      return graft.multimodal.WebP.probe(bytes).map(m => (m.width, m.height))
    // HEIC/AVIF likewise: ImageIO has no HEIF reader; the primary
    // item's extents come from the meta-box walk ([[Heif]] — pixel
    // decode is a recorded skip, dimensions/format inventory is not)
    if (Heif.isHeif(bytes))
      return Heif.meta(bytes).map(m => (m.width, m.height))
    // ICO/CUR favicons: largest directory member (PNG members read
    // their own IHDR); SVG: declared pixel size / viewBox fallback
    if (graft.multimodal.Ico.isIco(bytes))
      return graft.multimodal.Ico.dimensions(bytes)
    if (SvgProbe.isSvg(bytes))
      return SvgProbe.dimensions(bytes)
    val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
    try {
      val readers = ImageIO.getImageReaders(iis)
      if (!readers.hasNext) None
      else {
        val reader = readers.next()
        try {
          reader.setInput(iis, true, true)
          Some((reader.getWidth(0), reader.getHeight(0)))
        } catch {
          case _: Exception => None
        } finally reader.dispose()
      }
    } catch {
      case _: Exception => None
    } finally iis.close()
  }

  /** Animated-image inventory: `("gif", frames)` from the JDK
    * reader's own frame count, `("apng", frames)` from the PNG
    * `acTL` chunk (the JDK decodes only an APNG's default image, so
    * detection is what keeps an animated meme from inventorying as a
    * still). None when the payload is not a container that can
    * animate; a plain PNG (no `acTL`) is None, a single-frame GIF is
    * `("gif", 1)` — the caller's `frames > 1` is the animation test.
    */
  def animation(bytes: Array[Byte]): Option[(String, Int)] = {
    if (bytes == null || bytes.length < 16) return None
    // animated WebP: VP8X ANIM flag; frames = ANMF chunk count (the
    // container walk the WebP probe already owns)
    if (graft.multimodal.WebP.isWebP(bytes)) {
      return graft.multimodal.WebP.probe(bytes)
        .filter(_.animated)
        .map { _ =>
          val n = try graft.multimodal.WebP.chunks(bytes)
            .count(_._1 == "ANMF")
          catch { case _: Exception => 0 }
          ("webp", math.max(n, 1))
        }
    }
    // GIF87a / GIF89a
    if (bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F' &&
      bytes(3) == '8' && (bytes(4) == '7' || bytes(4) == '9') &&
      bytes(5) == 'a') {
      val iis = ImageIO.createImageInputStream(
        new ByteArrayInputStream(bytes))
      try {
        val readers = ImageIO.getImageReaders(iis)
        if (!readers.hasNext) return None
        val r = readers.next()
        try {
          r.setInput(iis, false, true)
          val n = r.getNumImages(true)
          return if (n >= 1) Some(("gif", n)) else None
        } catch { case _: Exception => return None }
        finally r.dispose()
      } finally iis.close()
    }
    // APNG: PNG signature, acTL chunk before IDAT (its num_frames is
    // authoritative per the spec)
    if ((bytes(0) & 0xFF) == 0x89 && bytes(1) == 'P' && bytes(2) == 'N' &&
      bytes(3) == 'G') {
      var off = 8
      while (off + 8 <= bytes.length) {
        val len = ((bytes(off) & 0xFF) << 24) |
          ((bytes(off + 1) & 0xFF) << 16) |
          ((bytes(off + 2) & 0xFF) << 8) | (bytes(off + 3) & 0xFF)
        if (len < 0 || off + 12L + len > bytes.length) return None
        val typ = new String(bytes, off + 4, 4,
          java.nio.charset.StandardCharsets.US_ASCII)
        if (typ == "acTL" && len >= 8) {
          val n = ((bytes(off + 8) & 0xFF) << 24) |
            ((bytes(off + 9) & 0xFF) << 16) |
            ((bytes(off + 10) & 0xFF) << 8) | (bytes(off + 11) & 0xFF)
          return if (n > 0) Some(("apng", n)) else None
        }
        if (typ == "IDAT" || typ == "IEND") return None
        off += 12 + len
      }
      return None
    }
    None
  }

  /** Failure diagnosis matching the reference's classes: empty file /
    * not an image / decode failure (`image_validator.py:187-225`).
    */
  def diagnose(bytes: Array[Byte]): String =
    if (bytes == null || bytes.isEmpty) "file is empty"
    else if (graft.multimodal.WebP.isWebP(bytes)) "image header could not be decoded"
    else if (Heif.isHeif(bytes)) "image header could not be decoded"
    else if (graft.multimodal.Ico.isIco(bytes)) "image header could not be decoded"
    else if (SvgProbe.isSvg(bytes)) "image header could not be decoded"
    else {
      val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
      try {
        if (!ImageIO.getImageReaders(iis).hasNext) "not a recognized image format"
        else "image header could not be decoded"
      } finally iis.close()
    }
}
