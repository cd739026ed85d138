package graft.multimodal

/** WebP container (RIFF) walk, header probe and lossless decode entry
  * — the web's second-most-common image format, which JDK ImageIO
  * cannot read at all: without this, every `.webp` is "undecodable"
  * and a WebP re-encode of an indexed JPEG sails straight through
  * image dedup.
  *
  * Implemented from the public container spec (RFC 9649 §2): a RIFF
  * header (`RIFF` + u32le size + `WEBP`) followed by fourcc chunks,
  * each `fourcc + u32le size + payload` padded to even length. Three
  * image layouts exist:
  *
  *  - `VP8 ` — lossy VP8 key frame. Dimensions come from the frame
  *    header (3-byte frame tag, the 0x9D012A start code, then 14-bit
  *    width/height); full sample decode is a DOCUMENTED SKIP
  *    (COVERAGE.md): the VP8 coefficient token tables are large
  *    literal spec tables with no payload CRC tripwire — the MP3
  *    Layer III argument verbatim. Probe yes, pixels no.
  *  - `VP8L` — lossless, fully decoded here via [[Vp8l]].
  *  - `VP8X` — extended container: feature flags + 24-bit canvas
  *    dims, then optional `ICCP`/`ANIM`/`ALPH`/image chunks. A still
  *    VP8X-wrapped `VP8L` decodes; animations probe (canvas dims,
  *    `animated = true`) but do not decode — frame composition is a
  *    video problem, and [[VideoFrameHash]]'s bring-your-own-frames
  *    face is the designed integration point.
  *
  * Scale shape: the probe reads a fixed ~30-byte prefix per payload
  * (same bill as [[graft.engine.validate.ImageProbe]]); decode is the
  * one-pass [[Vp8l]] kernel. No Spark types here — callers wire
  * columns via [[ImageDecode]] / ImageProbe.
  */
object WebP {

  /** Header-probe result: `format` is `VP8`/`VP8L`/`VP8X`; dimensions
    * are the frame dims (VP8/VP8L) or canvas dims (VP8X); `lossless`
    * = the pixel data is VP8L; `animated` = ANIM flag set (VP8X).
    */
  final case class Meta(format: String, width: Int, height: Int,
                        alpha: Boolean, animated: Boolean,
                        lossless: Boolean)

  private def u32le(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | (b(off + 1) & 0xffL) << 8 |
      (b(off + 2) & 0xffL) << 16 | (b(off + 3) & 0xffL) << 24

  private def u24le(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | (b(off + 1) & 0xff) << 8 | (b(off + 2) & 0xff) << 16

  private def fourcc(b: Array[Byte], off: Int): String =
    new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** True when the payload leads with the RIFF/WEBP magic. */
  def isWebP(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 12 &&
      fourcc(bytes, 0) == "RIFF" && fourcc(bytes, 8) == "WEBP"

  /** Walk the chunks, yielding `(fourcc, payloadOffset, payloadLen)`.
    * Stops at the first malformed chunk (truncated header or a size
    * overrunning the buffer) — bytes before the tear still probe.
    */
  private[graft] def chunks(bytes: Array[Byte]): Iterator[(String, Int, Int)] =
    new Iterator[(String, Int, Int)] {
      private var off = 12
      def hasNext: Boolean =
        off + 8 <= bytes.length && {
          val size = u32le(bytes, off + 4)
          size <= Int.MaxValue && off + 8 + size <= bytes.length
        }
      def next(): (String, Int, Int) = {
        val size = u32le(bytes, off + 4).toInt
        val t = (fourcc(bytes, off), off + 8, size)
        off += 8 + size + (size & 1) // chunks pad to even length
        t
      }
    }

  /** Header probe — dimensions and features WITHOUT pixel decode
    * (the ImageProbe discipline). None when not a WebP or the image
    * chunk header is malformed.
    */
  def probe(bytes: Array[Byte]): Option[Meta] = {
    if (!isWebP(bytes)) return None
    try {
      chunks(bytes).collectFirst(Function.unlift {
        case ("VP8 ", off, len) => probeVp8(bytes, off, len)
        case ("VP8L", off, len) => probeVp8l(bytes, off, len)
        case ("VP8X", off, len) => probeVp8x(bytes, off, len)
        case _ => None
      })
    } catch { case _: Exception => None }
  }

  /** Lossy VP8 frame header (the VP8 spec, RFC 6386 §9.1): 3-byte
    * frame tag — bit 0 = key frame flag, INVERTED (0 = key frame) —
    * then for key frames the 0x9D 0x01 0x2A start code and two
    * 16-bit LE fields: 14 bits of size + 2 bits of upscale hint each.
    */
  private def probeVp8(b: Array[Byte], off: Int, len: Int): Option[Meta] = {
    if (len < 10) return None
    val tag = (b(off) & 0xff) | (b(off + 1) & 0xff) << 8 |
      (b(off + 2) & 0xff) << 16
    val keyFrame = (tag & 1) == 0
    if (!keyFrame) return None // a stream must start with a key frame
    if ((b(off + 3) & 0xff) != 0x9d || (b(off + 4) & 0xff) != 0x01 ||
      (b(off + 5) & 0xff) != 0x2a) return None
    val w = ((b(off + 6) & 0xff) | (b(off + 7) & 0xff) << 8) & 0x3fff
    val h = ((b(off + 8) & 0xff) | (b(off + 9) & 0xff) << 8) & 0x3fff
    if (w < 1 || h < 1) None
    else Some(Meta("VP8", w, h, alpha = false, animated = false,
      lossless = false))
  }

  /** VP8L header: 0x2F signature, then LSB-first 14-bit width-1 /
    * height-1, alpha hint, 3-bit version (must be 0).
    */
  private def probeVp8l(b: Array[Byte], off: Int, len: Int): Option[Meta] = {
    if (len < 5 || (b(off) & 0xff) != 0x2f) return None
    val bits = u32le(b, off + 1)
    val w = (bits & 0x3fff).toInt + 1
    val h = ((bits >> 14) & 0x3fff).toInt + 1
    val alpha = ((bits >> 28) & 1) == 1
    val version = ((bits >> 29) & 7).toInt
    if (version != 0) None
    else Some(Meta("VP8L", w, h, alpha, animated = false, lossless = true))
  }

  /** VP8X extended header: 1 flag byte (MSB-first: 2 reserved, ICC,
    * alpha, EXIF, XMP, animation, reserved), 3 reserved bytes, then
    * 24-bit LE canvas width-1 / height-1.
    */
  private def probeVp8x(b: Array[Byte], off: Int, len: Int): Option[Meta] = {
    if (len < 10) return None
    val flags = b(off) & 0xff
    val alpha = ((flags >> 4) & 1) == 1
    val animated = ((flags >> 1) & 1) == 1
    val w = u24le(b, off + 4) + 1
    val h = u24le(b, off + 7) + 1
    // lossless iff a VP8L image chunk is present (still images only)
    val lossless = chunks(b).exists(_._1 == "VP8L")
    Some(Meta("VP8X", w, h, alpha, animated, lossless))
  }

  /** Decode the pixel data: still lossless WebP (bare `VP8L` or a
    * non-animated VP8X wrapping one) → ARGB image. Lossy `VP8 `
    * and animations return None (documented skips — see the object
    * doc); so does any malformed stream.
    */
  def decode(bytes: Array[Byte],
             maxPixels: Int = Vp8l.DefaultMaxPixels): Option[Vp8l.Image] = {
    if (!isWebP(bytes)) return None
    try {
      val animated = chunks(bytes).exists(_._1 == "ANIM")
      if (animated) return None
      chunks(bytes).collectFirst { case ("VP8L", off, len) =>
        java.util.Arrays.copyOfRange(bytes, off, off + len)
      }.flatMap(Vp8l.decode(_, maxPixels))
    } catch { case _: Exception => None }
  }

  /** Decode to a BufferedImage (TYPE_INT_ARGB) for the ImageIO-shaped
    * call sites ([[ImageDecode]]).
    */
  def decodeToBufferedImage(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] =
    decode(bytes).map { img =>
      val bi = new java.awt.image.BufferedImage(
        img.width, img.height, java.awt.image.BufferedImage.TYPE_INT_ARGB)
      bi.setRGB(0, 0, img.width, img.height, img.argb, 0, img.width)
      bi
    }
}
