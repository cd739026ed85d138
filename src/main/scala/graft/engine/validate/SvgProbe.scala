package graft.engine.validate

/** SVG dimension/format inventory — the web's vector image class,
  * invisible to every raster reader. Declared `width`/`height`
  * attributes in pixel (or unitless) terms win; a `viewBox` is the
  * fallback (its w/h ARE the CSS pixel size when width/height are
  * absent, per the SVG spec's intrinsic-size rules). Relative or
  * non-pixel units (`%`, `em`, `pt`, …) refuse rather than guess a
  * DPI. RASTERIZATION is a recorded skip (COVERAGE.md): an SVG
  * renderer is a browser engine, not a kernel — inventory is what
  * the caps/stats curation stages consume.
  */
object SvgProbe {

  /** The payload is an SVG document: optional BOM/whitespace, then
    * any mix of XML decl / comments / doctype, then `<svg`.
    */
  def isSvg(bytes: Array[Byte]): Boolean = svgTagStart(bytes) >= 0

  /** Offset of `<svg` after the prolog; -1 when not an SVG. Byte-level
    * (no full decode): the prolog grammar is ASCII in every real SVG.
    */
  private def svgTagStart(b: Array[Byte]): Int = {
    if (b == null || b.length < 5) return -1
    var i = 0
    // UTF-8 BOM
    if (b.length >= 3 && (b(0) & 0xFF) == 0xEF && (b(1) & 0xFF) == 0xBB &&
      (b(2) & 0xFF) == 0xBF) i = 3
    val cap = math.min(b.length, 4096) // the prolog of a real file
    var guard = 0
    while (i < cap && guard < 64) {
      guard += 1
      while (i < cap && (b(i) == ' ' || b(i) == '\t' || b(i) == '\n' ||
        b(i) == '\r')) i += 1
      if (i + 4 <= cap && b(i) == '<') {
        if (b(i + 1) == 's' && b(i + 2) == 'v' && b(i + 3) == 'g' &&
          (i + 4 == b.length || b(i + 4) == ' ' || b(i + 4) == '\t' ||
            b(i + 4) == '\n' || b(i + 4) == '\r' || b(i + 4) == '>' ||
            b(i + 4) == '/'))
          return i
        // skip <?...?>, <!--...-->, <!DOCTYPE...>
        if (b(i + 1) == '?' || b(i + 1) == '!') {
          if (i + 4 <= cap && b(i + 1) == '!' && b(i + 2) == '-' &&
            b(i + 3) == '-') {
            var j = i + 4
            while (j + 3 <= cap && !(b(j) == '-' && b(j + 1) == '-' &&
              b(j + 2) == '>')) j += 1
            if (j + 3 > cap) return -1
            i = j + 3
          } else {
            var j = i + 2
            while (j < cap && b(j) != '>') j += 1
            if (j >= cap) return -1
            i = j + 1
          }
        } else return -1 // some other root element
      } else return -1
    }
    -1
  }

  private val WidthAttr =
    """width\s*=\s*["']\s*([0-9]+(?:\.[0-9]+)?)\s*(px)?\s*["']""".r
  private val HeightAttr =
    """height\s*=\s*["']\s*([0-9]+(?:\.[0-9]+)?)\s*(px)?\s*["']""".r
  private val ViewBox =
    ("""viewBox\s*=\s*["']\s*[-0-9.]+[\s,]+[-0-9.]+[\s,]+""" +
      """([0-9]+(?:\.[0-9]+)?)[\s,]+([0-9]+(?:\.[0-9]+)?)\s*["']""").r

  /** Declared pixel dimensions of the root element; None when the
    * payload is no SVG or declares only relative/non-pixel sizes.
    */
  def dimensions(bytes: Array[Byte]): Option[(Int, Int)] = {
    val start = svgTagStart(bytes)
    if (start < 0) return None
    // the root START TAG only: attributes end at the first '>'
    val end0 = {
      var j = start
      val cap = math.min(bytes.length, start + 4096)
      while (j < cap && bytes(j) != '>') j += 1
      j
    }
    val tag = new String(bytes, start, end0 - start,
      java.nio.charset.StandardCharsets.ISO_8859_1)
    def round(s: String): Int = math.round(s.toDouble).toInt
    val w = WidthAttr.findFirstMatchIn(tag).map(m => round(m.group(1)))
    val h = HeightAttr.findFirstMatchIn(tag).map(m => round(m.group(1)))
    (w, h) match {
      case (Some(ww), Some(hh)) if ww > 0 && hh > 0 => Some((ww, hh))
      case _ =>
        ViewBox.findFirstMatchIn(tag).flatMap { m =>
          val ww = round(m.group(1)); val hh = round(m.group(2))
          if (ww > 0 && hh > 0) Some((ww, hh)) else None
        }
    }
  }
}
