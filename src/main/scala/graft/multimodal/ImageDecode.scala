package graft.multimodal

import java.io.ByteArrayInputStream

import javax.imageio.ImageIO
import javax.imageio.stream.MemoryCacheImageInputStream

/** The ONE image-decode entry for every pixel consumer in the engine
  * ([[ImageHash]], [[ImageStats]], [[MediaPipeline]]): JDK ImageIO for
  * the formats it really decodes (PNG/JPEG/GIF/BMP, and TIFF via the
  * JDK's bundled plugin — both byte orders; uncompressed, PackBits
  * and LZW), the pure-JVM
  * [[WebP]]/[[Vp8l]] path for lossless WebP — so a WebP re-encode of
  * an indexed JPEG hashes, stats and dedups exactly like its twin
  * instead of sailing through as "undecodable". One shared front door
  * keeps the format surface consistent: a format added here reaches
  * every hash, stat and curation gate at once.
  */
object ImageDecode {
  ImageIoDefaults.ensure() // memory-backed ImageIO streams in this JVM

  /** Decode to a BufferedImage; None when no decoder handles the
    * payload (the house NULL-for-undecodable stance). WebP payloads
    * route by magic — never through ImageIO, which has no WebP reader
    * and would spin through reader discovery per row for nothing.
    */
  def decode(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] = {
    if (bytes == null || bytes.isEmpty) return None
    if (WebP.isWebP(bytes)) return WebP.decodeToBufferedImage(bytes)
    // ICO/CUR favicons likewise by magic: the largest member re-wraps
    // into a BMP (or routes as a bare PNG) for the readers below
    if (Ico.isIco(bytes)) return Ico.decode(bytes)
    // memory-backed stream: ImageIO.read(InputStream) would otherwise
    // spool every payload through a temp FILE (its default disk cache)
    // inside this per-row hot path — pure wasted I/O on bytes already
    // in memory
    val img =
      try ImageIO.read(
        new MemoryCacheImageInputStream(new ByteArrayInputStream(bytes)))
      catch { case _: Exception => null }
    if (img != null) return Some(img)
    // CCITT TIFF fallback: the JDK's TIFFFaxDecompressor throws
    // AIOOBE on some valid small G3/RLE strips (observed on its own
    // writer's output). The from-spec house decoder catches exactly
    // the bilevel fax class; everything else stays None.
    if (bytes.length >= 4 &&
      ((bytes(0) == 'I' && bytes(1) == 'I') ||
        (bytes(0) == 'M' && bytes(1) == 'M')))
      return Ccitt.decodeTiffImage(bytes)
    None
  }
}
