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
