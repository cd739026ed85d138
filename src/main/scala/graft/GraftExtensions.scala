package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Add, ArrayFilter, ArrayJoin, ArrayMax, ArrayPosition, ArrayTransform, Cast, Coalesce, CreateArray, ElementAt, EqualTo, Expression, ExpressionInfo, GreaterThan, GreaterThanOrEqual, If, LambdaFunction, Length, Literal, NamedLambdaVariable, RegExpReplace, StringReplace, StringSplit, StringTrim}
import org.apache.spark.sql.types.{ArrayType, IntegerType, LongType, StringType}

import graft.functions.{BoundedTopK, CardCount, CardRedact, CosineSimilarity, DotProduct, HeavyHitters, LabelHashBucket, ZOrder2}

/** SQL-surface registration of the engine's custom Catalyst expressions
  * via SparkSessionExtensions — the idiomatic plug point
  * (`spark.sql.extensions=graft.GraftExtensions`), so `spark.sql`
  * users get the same functions as the Column API:
  *
  *   label_hash_bucket(label[, buckets]) → int   (privacy bucketing)
  *   cosine_sim(vecA, vecB)              → double
  *   dot_product(vecA, vecB)             → double
  *   bounded_top_k(key, value, k)        → array  (size-capped top-k agg)
  *   normalize_text(text)                → string (Unicode pre-dedup fold)
  *   card_count(text)                    → int    (Luhn-valid card numbers)
  *   redact_cards(text)                  → string (Luhn-valid cards → [CARD])
  *   dedup_lines(text)                   → string (C4 within-doc line rule)
  *   html_to_text(html)                  → string (markup → visible text)
  *   markdown_to_text(md)                → string (markdown → plain text)
  *   split_sentences(text)               → array  (rule-based sentences)
  *   image_dhash(bytes) / image_phash(bytes) → bigint (perceptual hashes)
  *   audio_fingerprint(wavBytes)         → bigint (spectral band hash)
  *   video_signature(aviBytes)           → array<bigint> (frame dHashes)
  *   pdf_text(bytes)                     → string (PDF page text)
  *   docx_text(bytes)                    → string (DOCX body text)
  *   odt_text(bytes)                     → string (ODT body text)
  *   rtf_text(bytes)                     → string (RTF body text)
  *   doc_text(bytes)                     → string (legacy .doc body text)
  *   ppt_text(bytes)                     → string (legacy .ppt deck text)
  *   xls_text(bytes)                     → string (legacy .xls cell text)
  *   document_format(bytes)              → string (format by payload magic)
  *   document_text(bytes)                → string (auto-routed body text)
  *   latex_to_text(src)                  → string (detexed plain text)
  *   wikitext_to_text(src)               → string (dewikified plain text)
  *
  * Also injectable programmatically:
  * `SparkSession.builder.withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.labelHashBucket)
    ext.injectFunction(GraftExtensions.cosineSim)
    ext.injectFunction(GraftExtensions.dotProduct)
    ext.injectFunction(GraftExtensions.zorder2)
    ext.injectFunction(GraftExtensions.boundedTopK)
    ext.injectFunction(GraftExtensions.normalizeText)
    ext.injectFunction(GraftExtensions.cardCount)
    ext.injectFunction(GraftExtensions.redactCards)
    ext.injectFunction(GraftExtensions.dedupLines)
    ext.injectFunction(GraftExtensions.htmlToText)
    ext.injectFunction(GraftExtensions.markdownToText)
    ext.injectFunction(GraftExtensions.dominantScript)
    ext.injectFunction(GraftExtensions.splitSentences)
    ext.injectFunction(GraftExtensions.heavyHitters)
    ext.injectFunction(GraftExtensions.kllQuantiles)
    ext.injectFunction(GraftExtensions.kmvSketch)
    ext.injectFunction(GraftExtensions.kmvMerge)
    ext.injectFunction(GraftExtensions.kmvEstimate)
    ext.injectFunction(GraftExtensions.kmvUnionEstimate)
    ext.injectFunction(GraftExtensions.kmvIntersectEstimate)
    ext.injectFunction(GraftExtensions.kmvDiffEstimate)
    ext.injectFunction(GraftExtensions.countMinMerge)
    ext.injectFunction(GraftExtensions.countMinEstimate)
    ext.injectFunction(GraftExtensions.imageDhash)
    ext.injectFunction(GraftExtensions.imageOrientedDhash)
    ext.injectFunction(GraftExtensions.imagePageDhashes)
    ext.injectFunction(GraftExtensions.imagePhash)
    ext.injectFunction(GraftExtensions.exifGps)
    ext.injectFunction(GraftExtensions.exifStripGps)
    ext.injectFunction(GraftExtensions.audioFingerprint)
    ext.injectFunction(GraftExtensions.videoSignature)
    ext.injectFunction(GraftExtensions.pdfText)
    ext.injectFunction(GraftExtensions.docxText)
    ext.injectFunction(GraftExtensions.odtText)
    ext.injectFunction(GraftExtensions.rtfText)
    ext.injectFunction(GraftExtensions.docText)
    ext.injectFunction(GraftExtensions.pptText)
    ext.injectFunction(GraftExtensions.xlsText)
    ext.injectFunction(GraftExtensions.xlsxText)
    ext.injectFunction(GraftExtensions.xlsbText)
    ext.injectFunction(GraftExtensions.ipynbText)
    ext.injectFunction(GraftExtensions.pdfImageDhashes)
    ext.injectFunction(GraftExtensions.documentLinks)
    ext.injectFunction(GraftExtensions.pptxText)
    ext.injectFunction(GraftExtensions.emlText)
    ext.injectFunction(GraftExtensions.odsText)
    ext.injectFunction(GraftExtensions.odpText)
    ext.injectFunction(GraftExtensions.documentFormat)
    ext.injectFunction(GraftExtensions.documentText)
    ext.injectFunction(GraftExtensions.documentTitle)
    ext.injectFunction(GraftExtensions.documentAuthor)
    ext.injectFunction(GraftExtensions.documentDate)
    ext.injectFunction(GraftExtensions.latexToText)
    ext.injectFunction(GraftExtensions.wikitextToText)
  }
}

object GraftExtensions {

  private def info(className: String, name: String, usage: String) =
    new ExpressionInfo(className, null, name, usage, "")

  val labelHashBucket: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("label_hash_bucket"),
    info(classOf[LabelHashBucket].getName, "label_hash_bucket",
      "label_hash_bucket(label[, buckets]) - privacy bucket: unsigned " +
        "sha256-first-8-bytes mod buckets (default 64); -1 for missing."),
    (args: Seq[Expression]) => args match {
      // any input type: stringify first (the Python str(v) analogue)
      case Seq(child) => LabelHashBucket(Cast(child, StringType), 64)
      case Seq(child, Literal(b: Int, _)) =>
        // Analysis-time guard: 0 would throw per-row deep in codegen
        // (remainderUnsigned by zero) and a negative count silently
        // returns garbage that collides with the -1 missing sentinel.
        if (b <= 0) throw new IllegalArgumentException(
          s"label_hash_bucket: buckets must be positive, got $b")
        LabelHashBucket(Cast(child, StringType), b)
      case _ => throw new IllegalArgumentException(
        "label_hash_bucket expects (label) or (label, intLiteral)")
    })

  val cosineSim: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("cosine_sim"),
    info(classOf[CosineSimilarity].getName, "cosine_sim",
      "cosine_sim(a, b) - cosine similarity of two float arrays."),
    (args: Seq[Expression]) => args match {
      case Seq(a, b) => CosineSimilarity(a, b)
      case _ => throw new IllegalArgumentException("cosine_sim expects 2 arguments")
    })

  val dotProduct: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("dot_product"),
    info(classOf[DotProduct].getName, "dot_product",
      "dot_product(a, b) - dot product of two float arrays."),
    (args: Seq[Expression]) => args match {
      case Seq(a, b) => DotProduct(a, b)
      case _ => throw new IllegalArgumentException("dot_product expects 2 arguments")
    })

  val zorder2: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("zorder2"),
    info(classOf[ZOrder2].getName, "zorder2",
      "zorder2(a, b) - 64-bit Morton (Z-order) code of two int columns; " +
        "sort by it to cluster files on both dimensions at once."),
    (args: Seq[Expression]) => args match {
      case Seq(a, b) => ZOrder2(a, b)
      case _ => throw new IllegalArgumentException("zorder2 expects 2 arguments")
    })

  /** `bounded_top_k(key, value, k)` — the size-capped top-k aggregate
    * ([[BoundedTopK]]): the analyzer wraps the returned
    * AggregateFunction in an AggregateExpression itself, so the builder
    * hands back the bare function (same contract as Spark's built-in
    * aggregate registrations). `k` must be an int literal — it sizes
    * the aggregation buffer at plan time.
    */
  val boundedTopK: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("bounded_top_k"),
    info(classOf[BoundedTopK].getName, "bounded_top_k",
      "bounded_top_k(key, value, k) - aggregate: the values of the k " +
        "rows with the smallest keys, as an array sorted by key " +
        "ascending; the aggregation buffer never holds more than k " +
        "elements. Pass a unique tie-breaker in the key for determinism."),
    (args: Seq[Expression]) => args match {
      case Seq(key, value, Literal(k: Int, _)) =>
        // Analysis-time guard, mirroring labelHashBucket: a non-positive
        // k would otherwise throw from the require deep in planning.
        if (k <= 0) throw new IllegalArgumentException(
          s"bounded_top_k: k must be positive, got $k")
        BoundedTopK(key, value, k)
      case _ => throw new IllegalArgumentException(
        "bounded_top_k expects (key, value, intLiteral)")
    })

  /** `normalize_text(text)` — the Unicode pre-dedup fold
    * ([[graft.ops.TextAnalysis.normalizeText]]) on the SQL surface.
    * Not a custom expression class: the builder assembles the SAME
    * ordered fold table ([[graft.ops.TextAnalysis.normalizeFold]]) from
    * built-in catalyst `RegExpReplace`/`StringTrim` nodes, so SQL and
    * Column callers run the identical codegen'd plan.
    */
  val normalizeText: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("normalize_text"),
    info(classOf[RegExpReplace].getName, "normalize_text",
      "normalize_text(text) - Unicode pre-dedup fold: curly quotes/" +
        "dashes/ellipsis to ASCII, Unicode spaces to space, zero-width " +
        "chars removed, whitespace runs collapsed, ends trimmed."),
    (args: Seq[Expression]) => args match {
      case Seq(t) =>
        StringTrim(graft.ops.TextAnalysis.normalizeFold.foldLeft(t) {
          case (acc, (pat, rep)) =>
            RegExpReplace(acc, Literal(pat), Literal(rep))
        })
      case _ => throw new IllegalArgumentException(
        "normalize_text expects exactly 1 argument")
    })

  /** `card_count(text)` / `redact_cards(text)` — Luhn-validated
    * payment-card detection ([[graft.functions.CardNumberUtil]]) on
    * the SQL surface. A `Cast` on the child mirrors labelHashBucket:
    * any input stringifies first.
    */
  private def unaryBinary(name: String, usage: String, clazz: Class[_],
                          build: Expression => Expression)
  : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier(name),
    info(clazz.getName, name, usage),
    (args: Seq[Expression]) => args match {
      case Seq(b) => build(b)
      case _ => throw new IllegalArgumentException(
        s"$name expects exactly 1 argument")
    })

  val imageDhash: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    unaryBinary("image_dhash",
      "image_dhash(bytes) - 64-bit perceptual difference hash of an " +
        "encoded image (PNG/JPEG/GIF/BMP/lossless WebP); NULL when " +
        "undecodable.",
      classOf[graft.functions.ImageDhash], graft.functions.ImageDhash(_))

  val imageOrientedDhash: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    unaryBinary("image_dhash_oriented",
      "image_dhash_oriented(bytes) - image_dhash after undoing the " +
        "declared EXIF orientation (tag 274): a rotated-with-a-tag " +
        "photo hashes like its upright re-encode; NULL when " +
        "undecodable.",
      classOf[graft.functions.ImageOrientedDhash],
      graft.functions.ImageOrientedDhash(_))

  val imagePageDhashes: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    unaryBinary("image_page_dhashes",
      "image_page_dhashes(bytes) - per-page 64-bit dHashes of a " +
        "multi-image container (multi-page TIFF, animated GIF); one " +
        "hash for single images; empty array when nothing decodes. " +
        "Pairs with pdf_image_dhashes for page-level dedup.",
      classOf[graft.functions.ImagePageDhashes],
      graft.functions.ImagePageDhashes(_))

  val exifGps: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    unaryBinary("exif_gps",
      "exif_gps(bytes) - EXIF GPS capture coordinates as " +
        "struct(lat, lon, alt): decimal degrees, south/west " +
        "negative, altitude metres (NULL when unrecorded); NULL when " +
        "the image carries no parseable GPS IFD. The image-PII " +
        "inventory face.",
      classOf[graft.functions.ExifGps], graft.functions.ExifGps(_))

  val exifStripGps: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    unaryBinary("exif_strip_gps",
      "exif_strip_gps(bytes) - the same image bytes with the EXIF " +
        "GPS IFD removed and its values zeroed; orientation, " +
        "timestamps and pixels untouched (the stripped twin's " +
        "oriented dHash is identical). Pass-through when no GPS " +
        "block exists.",
      classOf[graft.functions.ExifStripGps],
      graft.functions.ExifStripGps(_))

  val pdfText: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    unaryBinary("pdf_text",
      "pdf_text(bytes) - extracted PDF page text (pages joined by " +
        "form feed); NULL for encrypted or undecodable documents.",
      classOf[graft.functions.PdfTextExtract],
      graft.functions.PdfTextExtract(_))

  val docxText: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    unaryBinary("docx_text",
      "docx_text(bytes) - DOCX body paragraphs joined by newline; " +
        "NULL when not a readable OPC document.",
      classOf[graft.functions.DocxTextExtract],
      graft.functions.DocxTextExtract(_))

  val odtText: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    unaryBinary("odt_text",
      "odt_text(bytes) - OpenDocument Text body paragraphs joined by " +
        "newline; NULL when not a readable ODF text package.",
      classOf[graft.functions.OdtTextExtract],
      graft.functions.OdtTextExtract(_))

  val rtfText: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    unaryBinary("rtf_text",
      "rtf_text(bytes) - RTF body paragraphs joined by newline; NULL " +
        "when the payload does not open with the RTF magic.",
      classOf[graft.functions.RtfTextExtract],
      graft.functions.RtfTextExtract(_))

  val docText: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    unaryBinary("doc_text",
      "doc_text(bytes) - legacy Word-binary (.doc) body paragraphs " +
        "joined by newline; NULL when not a readable unencrypted " +
        "Word compound file.",
      classOf[graft.functions.DocTextExtract],
      graft.functions.DocTextExtract(_))

  val pptText: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    unaryBinary("ppt_text",
      "ppt_text(bytes) - legacy PowerPoint (.ppt) deck text (slides " +
        "and notes) joined by newline; NULL when not a readable " +
        "unencrypted PowerPoint compound file.",
      classOf[graft.functions.PptTextExtract],
      graft.functions.PptTextExtract(_))

  val xlsText: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    unaryBinary("xls_text",
      "xls_text(bytes) - legacy Excel (.xls) referenced cell text " +
        "joined by newline; NULL when not a readable unencrypted " +
        "Excel compound file.",
      classOf[graft.functions.XlsTextExtract],
      graft.functions.XlsTextExtract(_))

  val odsText: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    unaryBinary("ods_text",
      "ods_text(bytes) - OpenDocument Spreadsheet cell text joined " +
        "by newline; NULL when not a readable ODF spreadsheet.",
      classOf[graft.functions.OdsTextExtract],
      graft.functions.OdsTextExtract(_))

  val odpText: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    unaryBinary("odp_text",
      "odp_text(bytes) - OpenDocument Presentation slide + notes " +
        "text joined by newline; NULL when not a readable ODF " +
        "presentation.",
      classOf[graft.functions.OdpTextExtract],
      graft.functions.OdpTextExtract(_))

  val xlsxText: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    unaryBinary("xlsx_text",
      "xlsx_text(bytes) - modern Excel (.xlsx) string-cell text " +
        "(shared/inline/formula strings) joined by newline; NULL " +
        "when not a readable OPC workbook.",
      classOf[graft.functions.XlsxTextExtract],
      graft.functions.XlsxTextExtract(_))

  val xlsbText: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    unaryBinary("xlsb_text",
      "xlsb_text(bytes) - binary Excel (.xlsb) string-cell text " +
        "(shared/inline/formula strings) joined by newline; NULL " +
        "when not a readable binary workbook package.",
      classOf[graft.functions.XlsbTextExtract],
      graft.functions.XlsbTextExtract(_))

  val documentLinks: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    unaryBinary("document_links",
      "document_links(bytes) - the document layer's outbound " +
        "hyperlinks (PDF /URI annotations, OPC external hyperlink " +
        "rels, ODF anchors, EPUB absolute anchors) as crawl-frontier " +
        "material; empty array when the format has no link concept.",
      classOf[graft.functions.DocumentLinks],
      graft.functions.DocumentLinks(_))

  val pdfImageDhashes: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    unaryBinary("pdf_image_dhashes",
      "pdf_image_dhashes(bytes) - 64-bit dHash of every embedded " +
        "image XObject in a PDF (page order then name order); empty " +
        "array when the document carries none or is not a readable " +
        "PDF. Pairs with image_dhash for cross-format dedup.",
      classOf[graft.functions.PdfImageDhashes],
      graft.functions.PdfImageDhashes(_))

  val pptxText: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    unaryBinary("pptx_text",
      "pptx_text(bytes) - modern PowerPoint (.pptx) slide + notes " +
        "text in presentation order joined by newline; NULL when not " +
        "a readable OPC deck.",
      classOf[graft.functions.PptxTextExtract],
      graft.functions.PptxTextExtract(_))

  val emlText: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    unaryBinary("eml_text",
      "eml_text(bytes) - RFC 5322 + MIME message body text " +
        "(alternative picks plain, html through the htmlToText " +
        "cascade, parts joined by form feed); NULL when not a " +
        "message.",
      classOf[graft.functions.EmlTextExtract],
      graft.functions.EmlTextExtract(_))

  val documentFormat: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    unaryBinary("document_format",
      "document_format(bytes) - detected document format (pdf/docx/" +
        "xlsx/pptx/odt/epub/rtf/doc/xls/ppt/html/txt/eml/" +
        "encrypted-ooxml/zip/cfb) from the payload magic; NULL when " +
        "unrecognized.",
      classOf[graft.functions.DocumentFormat],
      graft.functions.DocumentFormat(_))

  val documentTitle: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    unaryBinary("document_title",
      "document_title(bytes) - the document's DECLARED title " +
        "(OLEPS / OPC / ODF / PDF Info / EPUB OPF / RTF info / " +
        "html <title> / mail Subject / latex \\title); NULL when " +
        "absent or unrecognized.",
      classOf[graft.functions.DocumentTitle],
      graft.functions.DocumentTitle(_))

  val documentAuthor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    unaryBinary("document_author",
      "document_author(bytes) - the document's DECLARED author " +
        "(OLEPS / OPC / ODF dc:creator / PDF Info / EPUB OPF / RTF " +
        "info / html meta author / mail From / latex \\author); NULL " +
        "when absent or unrecognized.",
      classOf[graft.functions.DocumentAuthor],
      graft.functions.DocumentAuthor(_))

  val documentDate: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    unaryBinary("document_date",
      "document_date(bytes) - the document's DECLARED creation date " +
        "(OLEPS VT_FILETIME / PDF D: / RTF creatim normalized to " +
        "ISO-8601; OPC dcterms:created / ODF creation-date / EPUB " +
        "dc:date / mail Date / html article:published_time / latex " +
        "\\date as declared); NULL when absent.",
      classOf[graft.functions.DocumentDate],
      graft.functions.DocumentDate(_))

  val documentText: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    unaryBinary("document_text",
      "document_text(bytes) - body text with the extractor " +
        "auto-routed from the payload magic; NULL when unrecognized " +
        "or undecodable.",
      classOf[graft.functions.DocumentText],
      graft.functions.DocumentText(_))

  val latexToText: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("latex_to_text"),
    info(classOf[graft.functions.LatexToText].getName, "latex_to_text",
      "latex_to_text(src) - plain text of a LaTeX source: comments/" +
        "math/markup commands drop, argument groups stay transparent, " +
        "verbatim copies raw, accents compose; NULL propagates."),
    (args: Seq[Expression]) => args match {
      case Seq(t) => graft.functions.LatexToText(t)
      case _ => throw new IllegalArgumentException(
        "latex_to_text expects exactly 1 argument")
    })

  val ipynbText: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    unaryBinary("ipynb_text",
      "ipynb_text(bytes) - a Jupyter notebook's authored cell text " +
        "(markdown/raw/code sources, outputs drop); NULL when not a " +
        "parseable notebook.",
      classOf[graft.functions.IpynbTextExtract],
      graft.functions.IpynbTextExtract(_))

  val wikitextToText: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("wikitext_to_text"),
    info(classOf[graft.functions.WikitextToText].getName, "wikitext_to_text",
      "wikitext_to_text(src) - plain text of MediaWiki markup: " +
        "templates/tables/refs/comments drop at any nesting depth, " +
        "links keep their labels, headings and lists read as text; " +
        "NULL propagates."),
    (args: Seq[Expression]) => args match {
      case Seq(t) => graft.functions.WikitextToText(t)
      case _ => throw new IllegalArgumentException(
        "wikitext_to_text expects exactly 1 argument")
    })

  val imagePhash: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    unaryBinary("image_phash",
      "image_phash(bytes) - 64-bit DCT perceptual hash of an encoded " +
        "image; NULL when undecodable.",
      classOf[graft.functions.ImagePhash], graft.functions.ImagePhash(_))

  val audioFingerprint: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    unaryBinary("audio_fingerprint",
      "audio_fingerprint(wavBytes) - 64-bit spectral band-energy hash " +
        "of a PCM WAV clip; NULL when undecodable or too short.",
      classOf[graft.functions.AudioFingerprintHash],
      graft.functions.AudioFingerprintHash(_))

  val videoSignature: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    unaryBinary("video_signature",
      "video_signature(aviBytes) - frame-sampled perceptual hash " +
        "signature (array<bigint>) of an MJPEG AVI; NULL when no " +
        "sampled frame decodes.",
      classOf[graft.functions.VideoSignature],
      graft.functions.VideoSignature(_))

  val cardCount: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("card_count"),
    info(classOf[CardCount].getName, "card_count",
      "card_count(text) - number of Luhn-valid payment-card numbers " +
        "(13-19 digits, space/hyphen separators, ISO/IEC 7812 checksum)."),
    (args: Seq[Expression]) => args match {
      case Seq(t) => CardCount(Cast(t, StringType))
      case _ => throw new IllegalArgumentException(
        "card_count expects exactly 1 argument")
    })

  val redactCards: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("redact_cards"),
    info(classOf[CardRedact].getName, "redact_cards",
      "redact_cards(text) - text with Luhn-valid payment-card numbers " +
        "replaced by [CARD]; checksum-failing digit runs untouched."),
    (args: Seq[Expression]) => args match {
      case Seq(t) => CardRedact(Cast(t, StringType))
      case _ => throw new IllegalArgumentException(
        "redact_cards expects exactly 1 argument")
    })

  /** `dedup_lines(text)` — the C4 within-document line rule
    * ([[graft.ops.TextAnalysis.dedupLines]]) on the SQL surface.
    *
    * The tree is built from catalyst nodes with PRE-BOUND
    * `NamedLambdaVariable`s (shim-round-tripping the Column
    * composition does not work here: a builder-returned
    * ColumnNodeExpression never re-enters function resolution, and a
    * lambda cannot ride through it). Every node is constructed
    * type-exact — `ResolveLambdaVariables` skips resolved trees, so a
    * type mismatch would surface as an analysis error, never a silent
    * re-bind; body variables are the same instances as the lambda
    * arguments, which is what `functionsForEval` matches by exprId.
    * Shape identical to the Column API (single-element transform wrap
    * binding the split array once); GraftExtensionsSpec pins the two
    * surfaces equal row-for-row.
    */
  val dedupLines: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("dedup_lines"),
    info(classOf[ArrayTransform].getName, "dedup_lines",
      "dedup_lines(text) - drop lines that already appeared earlier in " +
        "the same document (C4 page rule), first occurrences kept in " +
        "order; NULL stays NULL."),
    (args: Seq[Expression]) => args match {
      case Seq(t0) =>
        val t = Cast(t0, StringType)
        val ls = StringSplit(t, Literal("\n"), Literal(-1))
        val a = NamedLambdaVariable("a", ArrayType(StringType), nullable = true)
        val x = NamedLambdaVariable("x", StringType, nullable = true)
        val i = NamedLambdaVariable("i", IntegerType, nullable = false)
        val firstAt = EqualTo(ArrayPosition(a, x),
          Cast(Add(i, Literal(1)), LongType))
        val kept = ArrayFilter(a, LambdaFunction(firstAt, Seq(x, i)))
        val joined = ArrayJoin(kept, Literal("\n"), None)
        ElementAt(
          ArrayTransform(CreateArray(Seq(ls)), LambdaFunction(joined, Seq(a))),
          Literal(1))
      case _ => throw new IllegalArgumentException(
        "dedup_lines expects exactly 1 argument")
    })

  /** `split_sentences(text)` — the rule-based sentence segmenter on
    * the SQL surface, built from the SAME step table as the Column API
    * ([[graft.ops.TextAnalysis.sentenceSteps]]): the boundary cascade
    * folds into `RegExpReplace`/`StringReplace` nodes, then split on
    * the U+0001 sentinel, per-element trim, drop empties — identical
    * output to `TextAnalysis.splitSentences`, row for row.
    */
  val splitSentences: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("split_sentences"),
    info(classOf[ArrayFilter].getName, "split_sentences",
      "split_sentences(text) - sentences of the text in order " +
        "(abbreviation/initial/decimal-aware boundaries, newlines " +
        "always split); NULL-safe (NULL -> empty array)."),
    (args: Seq[Expression]) => args match {
      case Seq(t0) =>
        val marked = graft.ops.TextAnalysis.sentenceSteps
          .foldLeft[Expression](
            Coalesce(Seq(Cast(t0, StringType), Literal("")))) {
            case (acc, (true, pat, rep)) =>
              RegExpReplace(acc, Literal(pat), Literal(rep))
            case (acc, (false, from, to)) =>
              StringReplace(acc, Literal(from), Literal(to))
          }
        val parts = StringSplit(marked, Literal("\u0001"), Literal(-1))
        val x = NamedLambdaVariable("x", StringType, nullable = true)
        val trimmed = ArrayTransform(parts,
          LambdaFunction(StringTrim(x), Seq(x)))
        val y = NamedLambdaVariable("y", StringType, nullable = true)
        ArrayFilter(trimmed,
          LambdaFunction(GreaterThan(Length(y), Literal(0)), Seq(y)))
      case _ => throw new IllegalArgumentException(
        "split_sentences expects exactly 1 argument")
    })

  /** `html_to_text(html)` / `markdown_to_text(md)` — the extraction
    * cascades on the SQL surface. The builders fold the SAME step
    * tables as the Column API
    * ([[graft.ops.TextAnalysis.htmlSteps]]/[[graft.ops.TextAnalysis.markdownSteps]])
    * into raw catalyst `RegExpReplace`/`StringReplace` nodes — the
    * normalize_text approach: one table, two surfaces, identical
    * codegen'd plan. (A registry builder CANNOT round-trip Column-built
    * trees through the shim: their unresolved function nodes never
    * re-enter analysis and die at codegen.)
    */
  private def cascadeFn(name: String, doc: String,
                        steps: Seq[(Boolean, String, String)])
  : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier(name),
    info(classOf[RegExpReplace].getName, name, doc),
    (args: Seq[Expression]) => args match {
      case Seq(t) =>
        steps.foldLeft[Expression](
          Coalesce(Seq(Cast(t, StringType), Literal("")))) {
          case (acc, (true, pat, rep)) =>
            RegExpReplace(acc, Literal(pat), Literal(rep))
          case (acc, (false, from, to)) =>
            StringReplace(acc, Literal(from), Literal(to))
        }
      case _ => throw new IllegalArgumentException(
        s"$name expects exactly 1 argument")
    })

  val htmlToText: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    cascadeFn("html_to_text",
      "html_to_text(html) - visible text of an HTML document: script/" +
        "style/comment blocks dropped, block tags to newlines, entities " +
        "decoded, whitespace normalized.",
      graft.ops.TextAnalysis.htmlSteps)

  /** `dominant_script(text)` — Unicode-script routing on the SQL
    * surface, built from the SAME range table as the Column API
    * ([[graft.ops.TextAnalysis.scriptRanges]]): one
    * `Length(RegExpReplace(…))` per script, array argmax (first index
    * of the max = first-script-wins ties, matching the Column API),
    * `'unknown'` when no script shows a single code point. The argmax
    * is positional, NOT an If/GreaterThan fold — the fold re-embeds
    * every earlier count in each step and the expression tree grows
    * exponentially in |scripts| (the t24 lesson).
    */
  val dominantScript: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("dominant_script"),
    info(classOf[RegExpReplace].getName, "dominant_script",
      "dominant_script(text) - dominant Unicode script of the text " +
        "(latin/cyrillic/greek/arabic/hebrew/devanagari/thai/hangul/" +
        "kana/han), or 'unknown'."),
    (args: Seq[Expression]) => args match {
      case Seq(t) =>
        val base: Expression =
          Coalesce(Seq(Cast(t, StringType), Literal("")))
        val counts = graft.ops.TextAnalysis.scriptRanges.map {
          case (n, r) =>
            n -> (Length(RegExpReplace(base, Literal(s"[^$r]"),
              Literal(""))): Expression)
        }
        val arr: Expression = CreateArray(counts.map(_._2))
        val names: Expression = CreateArray(counts.map(c => Literal(c._1)))
        val best: Expression = ArrayMax(arr)
        If(GreaterThanOrEqual(best, Literal(1)),
          ElementAt(names, Cast(ArrayPosition(arr, best), IntegerType)),
          Literal("unknown"))
      case _ => throw new IllegalArgumentException(
        "dominant_script expects exactly 1 argument")
    })

  val markdownToText: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    cascadeFn("markdown_to_text",
      "markdown_to_text(md) - plain text of a markdown document: " +
        "formatting syntax stripped, prose and fenced code content kept.",
      graft.ops.TextAnalysis.markdownSteps)

  /** `heavy_hitters(item, capacity)` — the mergeable Misra–Gries
    * frequency sketch ([[HeavyHitters]]). Like bounded_top_k, the
    * analyzer wraps the bare AggregateFunction itself; capacity must
    * be an int literal — it sizes the aggregation buffer at plan time.
    */
  val heavyHitters: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("heavy_hitters"),
    info(classOf[HeavyHitters].getName, "heavy_hitters",
      "heavy_hitters(item, capacity) - aggregate: Misra-Gries frequency " +
        "summary as (item, count, max_err) structs sorted by count desc; " +
        "count <= true frequency <= count + max_err, every item with " +
        "frequency > N/(capacity+1) guaranteed present, buffer bounded " +
        "by capacity at every stage."),
    (args: Seq[Expression]) => args match {
      case Seq(item, Literal(cap: Int, _)) =>
        if (cap <= 0) throw new IllegalArgumentException(
          s"heavy_hitters: capacity must be positive, got $cap")
        HeavyHitters(item, cap)
      case _ => throw new IllegalArgumentException(
        "heavy_hitters expects (item, intLiteral)")
    })

  /** `kll_quantiles(value, k, phis)` — the mergeable KLL quantile
    * sketch ([[graft.functions.KllQuantiles]]). `k` must be an int
    * literal (it sizes the buffer at plan time) and `phis` a foldable
    * double/decimal array — `array(0.5D, 0.9D)`.
    */
  val kllQuantiles: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("kll_quantiles"),
    info(classOf[graft.functions.KllQuantiles].getName, "kll_quantiles",
      "kll_quantiles(value, k, phis) - aggregate: KLL quantile sketch " +
        "over doubles as (phi, quantile) structs; O(k) state at every " +
        "stage, exact in the no-compaction regime (n <= k)."),
    (args: Seq[Expression]) => args match {
      case Seq(v, Literal(k: Int, _), phisExpr) if phisExpr.foldable =>
        val ps = phisExpr.eval() match {
          case ad: org.apache.spark.sql.catalyst.util.ArrayData =>
            val et = phisExpr.dataType
              .asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType
            ad.toObjectArray(et).toSeq.map {
              case d: java.lang.Double => d.doubleValue()
              case dec: org.apache.spark.sql.types.Decimal => dec.toDouble
              case f: java.lang.Float => f.doubleValue()
              case other => throw new IllegalArgumentException(
                s"kll_quantiles: phi of unsupported type $other")
            }
          case other => throw new IllegalArgumentException(
            s"kll_quantiles: phis must be an array literal, got $other")
        }
        graft.functions.KllQuantiles(v, k, ps)
      case _ => throw new IllegalArgumentException(
        "kll_quantiles expects (value, intLiteral, foldable double array)")
    })

  /** KMV theta-sketch surface ([[graft.functions.KmvAgg]] family):
    * `kmv_sketch(value, k)` builds (NULL-skipping xxhash64),
    * `kmv_merge(sk)` unions, `kmv_estimate(sk)` counts, and
    * `kmv_{union,intersect,diff}_estimate(a, b)` are the set
    * operations HLL cannot express.
    */
  val kmvSketch: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("kmv_sketch"),
    info(classOf[graft.functions.KmvAgg].getName, "kmv_sketch",
      "kmv_sketch(value, k) - aggregate: k-minimum-values theta sketch " +
        "of the value's distinct set (xxhash64, NULLs skipped); exact " +
        "while distinct <= k, merge-order invariant."),
    (args: Seq[Expression]) => args match {
      case Seq(v, Literal(k: Int, _)) =>
        import org.apache.spark.sql.catalyst.expressions.{CaseWhen, IsNotNull, XxHash64}
        graft.functions.KmvAgg(
          CaseWhen(Seq((IsNotNull(v), XxHash64(Seq(v), 42L)))), k)
      case _ => throw new IllegalArgumentException(
        "kmv_sketch expects (value, intLiteral)")
    })

  val kmvMerge: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("kmv_merge"),
    info(classOf[graft.functions.KmvMerge].getName, "kmv_merge",
      "kmv_merge(sketch) - aggregate: union of serialized KMV sketches " +
        "(mixed k adopts the smallest)."),
    (args: Seq[Expression]) => args match {
      case Seq(sk) => graft.functions.KmvMerge(sk)
      case _ => throw new IllegalArgumentException(
        "kmv_merge expects exactly 1 argument")
    })

  val kmvEstimate: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("kmv_estimate"),
    info(classOf[graft.functions.KmvEstimate].getName, "kmv_estimate",
      "kmv_estimate(sketch) - distinct-count estimate of a KMV sketch; " +
        "exact in the unsaturated regime."),
    (args: Seq[Expression]) => args match {
      case Seq(sk) => graft.functions.KmvEstimate(sk)
      case _ => throw new IllegalArgumentException(
        "kmv_estimate expects exactly 1 argument")
    })

  private def kmvSetOp(op: String)
  : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier(s"kmv_${op}_estimate"),
    info(classOf[graft.functions.KmvSetEstimate].getName,
      s"kmv_${op}_estimate",
      s"kmv_${op}_estimate(a, b) - $op estimate between two KMV " +
        "sketches under theta = min(thetaA, thetaB); exact when both " +
        "are unsaturated."),
    (args: Seq[Expression]) => args match {
      case Seq(a, b) => graft.functions.KmvSetEstimate(a, b, op)
      case _ => throw new IllegalArgumentException(
        s"kmv_${op}_estimate expects exactly 2 arguments")
    })

  val kmvUnionEstimate = kmvSetOp("union")
  val kmvIntersectEstimate = kmvSetOp("intersect")
  val kmvDiffEstimate = kmvSetOp("diff")

  /** `count_min_merge(sketch)` / `count_min_estimate(sketch, item)` —
    * the union and point-query halves of the count–min surface
    * ([[graft.functions.CountMinMerge]] / [[CountMinEstimate]]); the
    * sketch build itself is Spark's built-in `count_min_sketch`.
    */
  val countMinMerge: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("count_min_merge"),
    info(classOf[graft.functions.CountMinMerge].getName, "count_min_merge",
      "count_min_merge(sketch) - aggregate: union of serialized " +
        "count-min sketches built with one (eps, confidence, seed)."),
    (args: Seq[Expression]) => args match {
      case Seq(sk) => graft.functions.CountMinMerge(sk)
      case _ => throw new IllegalArgumentException(
        "count_min_merge expects exactly 1 argument")
    })

  val countMinEstimate: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("count_min_estimate"),
    info(classOf[graft.functions.CountMinEstimate].getName, "count_min_estimate",
      "count_min_estimate(sketch, item) - upper-bound frequency of item " +
        "from a serialized count-min sketch; exact when no collision."),
    (args: Seq[Expression]) => args match {
      case Seq(sk, item) => graft.functions.CountMinEstimate(sk, item)
      case _ => throw new IllegalArgumentException(
        "count_min_estimate expects exactly 2 arguments")
    })

  /** Register on an existing session (tests / REPL). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    Seq(labelHashBucket, cosineSim, dotProduct, zorder2, boundedTopK,
      normalizeText, cardCount, redactCards, dedupLines,
      htmlToText, markdownToText, dominantScript, splitSentences,
      heavyHitters,
      kllQuantiles, kmvSketch, kmvMerge, kmvEstimate, kmvUnionEstimate,
      kmvIntersectEstimate, kmvDiffEstimate,
      countMinMerge, countMinEstimate,
      imageDhash, imageOrientedDhash, imagePageDhashes, imagePhash,
      exifGps, exifStripGps,
      audioFingerprint, videoSignature,
      pdfText, docxText, odtText, rtfText, docText, pptText, xlsText,
      xlsxText, xlsbText, pptxText, emlText, odsText, odpText,
      ipynbText, pdfImageDhashes, documentLinks,
      documentFormat, documentText, documentTitle, documentAuthor,
      documentDate,
      latexToText, wikitextToText).foreach {
      case (id, inf, builder) =>
        registry.registerFunction(id, inf, builder)
    }
  }
}
