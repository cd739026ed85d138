package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** SQL-surface faces of the perceptual media hashes
  * ([[graft.multimodal.ImageHash]], [[graft.multimodal
  * .AudioFingerprint]], [[graft.multimodal.VideoFrameHash]]) — eval
  * expressions over BINARY payloads so `spark.sql` users can
  * fingerprint media columns with the exact kernels the Column API
  * uses. CodegenFallback is the right trade here: the per-row cost IS
  * the media decode (ImageIO / PCM+FFT / frame JPEG decodes), against
  * which codegen dispatch is noise. NULL in, or undecodable bytes →
  * NULL out (the kernels' Option contract).
  */
abstract class MediaHashExpression extends UnaryExpression
    with CodegenFallback {
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName: argument must be BINARY, got ${child.dataType}")

  protected def kernel(bytes: Array[Byte]): Any

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null else kernel(v.asInstanceOf[Array[Byte]])
  }
}

/** `latex_to_text(src)` → string — [[graft.ops.Latex.extractText]]:
  * detexed plain text. A kernel expression, not a catalyst cascade:
  * TeX comments/math/environments/balanced groups need the stateful
  * tokenizer; CodegenFallback is the right trade (the per-row cost is
  * the parse). NULL propagates.
  */
case class LatexToText(child: Expression) extends UnaryExpression
    with CodegenFallback {
  override def prettyName: String = "latex_to_text"
  override def nullable: Boolean = true
  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName: argument must be STRING, got ${child.dataType}")

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else UTF8String.fromString(
      graft.ops.Latex.extractText(v.asInstanceOf[UTF8String].toString).text)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `ipynb_text(bytes)` → string —
  * [[graft.engine.read.Ipynb.extractText]]: a Jupyter notebook's
  * AUTHORED cell text (markdown/raw/code sources; outputs drop);
  * NULL when not a parseable notebook.
  */
case class IpynbTextExtract(child: Expression) extends MediaHashExpression {
  override def prettyName: String = "ipynb_text"
  override def dataType: DataType = StringType
  override protected def kernel(bytes: Array[Byte]): Any =
    graft.engine.read.Ipynb.extractText(bytes)
      .map(t => UTF8String.fromString(t.text)).orNull
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `wikitext_to_text(src)` → string —
  * [[graft.ops.Wikitext.extractText]]: MediaWiki markup → plain text.
  * Same shape as [[LatexToText]] — nested templates/links need the
  * stateful tokenizer. NULL propagates.
  */
case class WikitextToText(child: Expression) extends UnaryExpression
    with CodegenFallback {
  override def prettyName: String = "wikitext_to_text"
  override def nullable: Boolean = true
  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName: argument must be STRING, got ${child.dataType}")

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else UTF8String.fromString(
      graft.ops.Wikitext.extractText(v.asInstanceOf[UTF8String].toString).text)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `image_dhash(bytes)` → bigint — [[graft.multimodal.ImageHash.dhash64]]. */
case class ImageDhash(child: Expression) extends MediaHashExpression {
  override def prettyName: String = "image_dhash"
  override def dataType: DataType = LongType
  override protected def kernel(bytes: Array[Byte]): Any =
    graft.multimodal.ImageHash.dhash64(bytes).map(java.lang.Long.valueOf).orNull
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `image_dhash_oriented(bytes)` → bigint —
  * [[graft.multimodal.ImageHash.orientedDhash64]]: dHash after
  * undoing the declared EXIF orientation, so a rotated-with-a-tag
  * phone photo dedups against its upright re-encode.
  */
case class ImageOrientedDhash(child: Expression) extends MediaHashExpression {
  override def prettyName: String = "image_dhash_oriented"
  override def dataType: DataType = LongType
  override protected def kernel(bytes: Array[Byte]): Any =
    graft.multimodal.ImageHash.orientedDhash64(bytes)
      .map(java.lang.Long.valueOf).orNull
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `image_page_dhashes(bytes)` → array<bigint> —
  * [[graft.multimodal.ImageHash.pageDhashes64]]: per-page dHashes of
  * a multi-image container (multi-page TIFF, animated GIF); one hash
  * for single-image payloads; empty array when nothing decodes.
  * Pairs with `pdf_image_dhashes` for page-level scanned-document
  * dedup across containers.
  */
case class ImagePageDhashes(child: Expression) extends MediaHashExpression {
  override def prettyName: String = "image_page_dhashes"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def kernel(bytes: Array[Byte]): Any =
    new GenericArrayData(
      graft.multimodal.ImageHash.pageDhashes64(bytes).toArray)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `exif_gps(bytes)` → struct(lat, lon, alt) —
  * [[graft.engine.validate.ExifProbe.gps]]: capture coordinates from
  * the EXIF GPS IFD in decimal degrees (south/west negative, altitude
  * metres, NULL alt when absent); NULL when the image carries no
  * parseable GPS block. The image-PII inventory face: phone photos
  * embed location invisibly, and a curation pipeline counts it here
  * before deciding to [[ExifStripGps]] it.
  */
case class ExifGps(child: Expression) extends MediaHashExpression {
  override def prettyName: String = "exif_gps"
  override def dataType: DataType = StructType(Seq(
    StructField("lat", DoubleType, nullable = false),
    StructField("lon", DoubleType, nullable = false),
    StructField("alt", DoubleType, nullable = true)))
  override protected def kernel(bytes: Array[Byte]): Any =
    graft.engine.validate.ExifProbe.gps(bytes) match {
      case Some(g) => InternalRow(g.lat, g.lon,
        g.alt.map(java.lang.Double.valueOf).orNull)
      case None => null
    }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `exif_strip_gps(bytes)` → binary —
  * [[graft.engine.validate.ExifProbe.stripGps]]: the same image with
  * the GPS IFD removed and its value bytes zeroed; every other byte
  * (orientation, timestamps, entropy-coded pixels) stays put, so the
  * stripped twin's oriented dHash is identical. Bytes pass through
  * unchanged when no GPS block exists.
  */
case class ExifStripGps(child: Expression) extends MediaHashExpression {
  override def prettyName: String = "exif_strip_gps"
  override def dataType: DataType = BinaryType
  override protected def kernel(bytes: Array[Byte]): Any =
    graft.engine.validate.ExifProbe.stripGps(bytes)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `image_phash(bytes)` → bigint — [[graft.multimodal.ImageHash.phash64]]. */
case class ImagePhash(child: Expression) extends MediaHashExpression {
  override def prettyName: String = "image_phash"
  override def dataType: DataType = LongType
  override protected def kernel(bytes: Array[Byte]): Any =
    graft.multimodal.ImageHash.phash64(bytes).map(java.lang.Long.valueOf).orNull
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `audio_fingerprint(wavBytes)` → bigint —
  * [[graft.multimodal.AudioFingerprint.spectralHash64]].
  */
case class AudioFingerprintHash(child: Expression) extends MediaHashExpression {
  override def prettyName: String = "audio_fingerprint"
  override def dataType: DataType = LongType
  override protected def kernel(bytes: Array[Byte]): Any =
    graft.multimodal.AudioFingerprint.spectralHash64(bytes)
      .map(java.lang.Long.valueOf).orNull
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `pdf_text(bytes)` → string — [[graft.engine.read.Pdf.extractText]]:
  * all page text (pages joined by form feed); NULL for encrypted or
  * undecodable documents. The per-row cost is the document parse —
  * the same CodegenFallback trade as the media hashes.
  */
case class PdfTextExtract(child: Expression) extends MediaHashExpression {
  override def prettyName: String = "pdf_text"
  override def dataType: DataType = StringType
  override protected def kernel(bytes: Array[Byte]): Any =
    graft.engine.read.Pdf.extractText(bytes)
      .map(t => UTF8String.fromString(t.text)).orNull
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `docx_text(bytes)` → string — [[graft.engine.read.Docx.extractText]]:
  * body paragraphs joined by newline; NULL when not a readable OPC
  * document.
  */
case class DocxTextExtract(child: Expression) extends MediaHashExpression {
  override def prettyName: String = "docx_text"
  override def dataType: DataType = StringType
  override protected def kernel(bytes: Array[Byte]): Any =
    graft.engine.read.Docx.extractText(bytes)
      .map(t => UTF8String.fromString(t.text)).orNull
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `odt_text(bytes)` → string — [[graft.engine.read.Odt.extractText]]:
  * OpenDocument Text body paragraphs joined by newline; NULL when not
  * a readable ODF text package.
  */
case class OdtTextExtract(child: Expression) extends MediaHashExpression {
  override def prettyName: String = "odt_text"
  override def dataType: DataType = StringType
  override protected def kernel(bytes: Array[Byte]): Any =
    graft.engine.read.Odt.extractText(bytes)
      .map(t => UTF8String.fromString(t.text)).orNull
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `rtf_text(bytes)` → string — [[graft.engine.read.Rtf.extractText]]:
  * RTF body paragraphs joined by newline; NULL when the payload does
  * not open with the RTF magic.
  */
case class RtfTextExtract(child: Expression) extends MediaHashExpression {
  override def prettyName: String = "rtf_text"
  override def dataType: DataType = StringType
  override protected def kernel(bytes: Array[Byte]): Any =
    graft.engine.read.Rtf.extractText(bytes)
      .map(t => UTF8String.fromString(t.text)).orNull
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `doc_text(bytes)` → string — [[graft.engine.read.Doc.extractText]]:
  * legacy Word-binary body paragraphs joined by newline; NULL when not
  * a readable (unencrypted) Word CFB.
  */
case class DocTextExtract(child: Expression) extends MediaHashExpression {
  override def prettyName: String = "doc_text"
  override def dataType: DataType = StringType
  override protected def kernel(bytes: Array[Byte]): Any =
    graft.engine.read.Doc.extractText(bytes)
      .map(t => UTF8String.fromString(t.text)).orNull
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `ppt_text(bytes)` → string — [[graft.engine.read.Ppt.extractText]]:
  * legacy PowerPoint deck text (slides + notes) joined by newline;
  * NULL when not a readable (unencrypted) PowerPoint CFB.
  */
case class PptTextExtract(child: Expression) extends MediaHashExpression {
  override def prettyName: String = "ppt_text"
  override def dataType: DataType = StringType
  override protected def kernel(bytes: Array[Byte]): Any =
    graft.engine.read.Ppt.extractText(bytes)
      .map(t => UTF8String.fromString(t.text)).orNull
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `xls_text(bytes)` → string — [[graft.engine.read.Xls.extractText]]:
  * legacy Excel referenced cell text joined by newline; NULL when not
  * a readable (unencrypted) Excel CFB.
  */
case class XlsTextExtract(child: Expression) extends MediaHashExpression {
  override def prettyName: String = "xls_text"
  override def dataType: DataType = StringType
  override protected def kernel(bytes: Array[Byte]): Any =
    graft.engine.read.Xls.extractText(bytes)
      .map(t => UTF8String.fromString(t.text)).orNull
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `document_format(bytes)` → string —
  * [[graft.engine.read.DocumentProbe.probe]]: the detected document
  * format (pdf/docx/odt/epub/rtf/doc/xls/ppt/encrypted-ooxml/zip/
  * cfb); NULL when unrecognized.
  */
case class DocumentFormat(child: Expression) extends MediaHashExpression {
  override def prettyName: String = "document_format"
  override def dataType: DataType = StringType
  override protected def kernel(bytes: Array[Byte]): Any =
    graft.engine.read.DocumentProbe.probe(bytes)
      .map(m => UTF8String.fromString(m.format)).orNull
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `ods_text(bytes)` → string —
  * [[graft.engine.read.Ods.extractText]]: OpenDocument Spreadsheet
  * cell text joined by newline; NULL when not a readable ODF
  * spreadsheet package.
  */
case class OdsTextExtract(child: Expression) extends MediaHashExpression {
  override def prettyName: String = "ods_text"
  override def dataType: DataType = StringType
  override protected def kernel(bytes: Array[Byte]): Any =
    graft.engine.read.Ods.extractText(bytes)
      .map(t => UTF8String.fromString(t.text)).orNull
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `odp_text(bytes)` → string —
  * [[graft.engine.read.Odp.extractText]]: OpenDocument Presentation
  * slide + notes text joined by newline; NULL when not a readable
  * ODF presentation package.
  */
case class OdpTextExtract(child: Expression) extends MediaHashExpression {
  override def prettyName: String = "odp_text"
  override def dataType: DataType = StringType
  override protected def kernel(bytes: Array[Byte]): Any =
    graft.engine.read.Odp.extractText(bytes)
      .map(t => UTF8String.fromString(t.text)).orNull
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `xlsx_text(bytes)` → string —
  * [[graft.engine.read.Xlsx.extractText]]: SpreadsheetML string-cell
  * text (shared/inline/formula strings) joined by newline; NULL when
  * not a readable OPC workbook.
  */
case class XlsxTextExtract(child: Expression) extends MediaHashExpression {
  override def prettyName: String = "xlsx_text"
  override def dataType: DataType = StringType
  override protected def kernel(bytes: Array[Byte]): Any =
    graft.engine.read.Xlsx.extractText(bytes)
      .map(t => UTF8String.fromString(t.text)).orNull
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `xlsb_text(bytes)` → string —
  * [[graft.engine.read.Xlsb.extractText]]: the BINARY workbook's
  * string cells (shared/inline/formula) in workbook order joined by
  * newline; NULL when not a readable .xlsb package.
  */
case class XlsbTextExtract(child: Expression) extends MediaHashExpression {
  override def prettyName: String = "xlsb_text"
  override def dataType: DataType = StringType
  override protected def kernel(bytes: Array[Byte]): Any =
    graft.engine.read.Xlsb.extractText(bytes)
      .map(t => UTF8String.fromString(t.text)).orNull
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `pdf_image_dhashes(bytes)` → array<bigint> — the 64-bit dHash of
  * every embedded image XObject ([[graft.engine.read.Pdf.images]],
  * page order then name order, through the one
  * [[graft.multimodal.ImageDecode]] front door), so a scanned PDF's
  * pages dedup in SQL against bare TIFF/PNG/JPEG rows' `image_dhash`.
  * Images the decoder refuses drop from the array; empty array when
  * the document carries none or is not a readable PDF.
  */
case class PdfImageDhashes(child: Expression) extends MediaHashExpression {
  override def prettyName: String = "pdf_image_dhashes"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def kernel(bytes: Array[Byte]): Any = {
    val hs = graft.engine.read.Pdf.images(bytes).flatMap(i =>
      graft.multimodal.ImageHash.dhash64(i.bytes))
    new GenericArrayData(hs.toArray)
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `document_links(bytes)` → array<string> —
  * [[graft.engine.read.DocumentProbe.links]]: the document layer's
  * outbound hyperlinks (PDF /URI annotations, OPC external hyperlink
  * rels, ODF anchors, EPUB absolute anchors), crawl-frontier
  * material; empty array when the format has no link concept.
  */
case class DocumentLinks(child: Expression) extends MediaHashExpression {
  override def prettyName: String = "document_links"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override protected def kernel(bytes: Array[Byte]): Any =
    new GenericArrayData(
      graft.engine.read.DocumentProbe.links(bytes)
        .map(UTF8String.fromString).toArray[Any])
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `pptx_text(bytes)` → string —
  * [[graft.engine.read.Pptx.extractText]]: PresentationML slide +
  * notes paragraphs in presentation order joined by newline; NULL
  * when not a readable OPC deck.
  */
case class PptxTextExtract(child: Expression) extends MediaHashExpression {
  override def prettyName: String = "pptx_text"
  override def dataType: DataType = StringType
  override protected def kernel(bytes: Array[Byte]): Any =
    graft.engine.read.Pptx.extractText(bytes)
      .map(t => UTF8String.fromString(t.text)).orNull
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `eml_text(bytes)` → string —
  * [[graft.engine.read.Mail.parseEml]]: RFC 5322 + MIME message body
  * text (alternative → plain preferred, html through the htmlToText
  * cascade; parts joined by form feed); NULL when not a message.
  */
case class EmlTextExtract(child: Expression) extends MediaHashExpression {
  override def prettyName: String = "eml_text"
  override def dataType: DataType = StringType
  override protected def kernel(bytes: Array[Byte]): Any =
    graft.engine.read.Mail.parseEml(bytes)
      .map(e => UTF8String.fromString(e.text)).orNull
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `document_title(bytes)` → string —
  * [[graft.engine.read.DocumentProbe.title]]: the document's DECLARED
  * title wherever its format carries one (OLEPS, OPC/ODF dc:title,
  * PDF Info, EPUB OPF, RTF info group, html <title>, mail Subject,
  * latex \title); NULL when absent or unrecognized.
  */
case class DocumentTitle(child: Expression) extends MediaHashExpression {
  override def prettyName: String = "document_title"
  override def dataType: DataType = StringType
  override protected def kernel(bytes: Array[Byte]): Any =
    graft.engine.read.DocumentProbe.title(bytes)
      .map(UTF8String.fromString).orNull
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `document_author(bytes)` → string —
  * [[graft.engine.read.DocumentProbe.author]]: the document's
  * DECLARED author wherever its format carries one (OLEPS
  * PIDSI_AUTHOR, OPC/ODF dc:creator, PDF Info /Author, EPUB OPF
  * creator, RTF info group, html meta author, mail From, latex
  * \author); NULL when absent or unrecognized.
  */
case class DocumentAuthor(child: Expression) extends MediaHashExpression {
  override def prettyName: String = "document_author"
  override def dataType: DataType = StringType
  override protected def kernel(bytes: Array[Byte]): Any =
    graft.engine.read.DocumentProbe.author(bytes)
      .map(UTF8String.fromString).orNull
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `document_date(bytes)` → string —
  * [[graft.engine.read.DocumentProbe.date]]: the document's DECLARED
  * creation date (binary forms — OLEPS VT_FILETIME, PDF D:, RTF
  * creatim — normalized to ISO-8601; text declarations as declared);
  * NULL when absent or unrecognized.
  */
case class DocumentDate(child: Expression) extends MediaHashExpression {
  override def prettyName: String = "document_date"
  override def dataType: DataType = StringType
  override protected def kernel(bytes: Array[Byte]): Any =
    graft.engine.read.DocumentProbe.date(bytes)
      .map(UTF8String.fromString).orNull
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `document_text(bytes)` → string —
  * [[graft.engine.read.DocumentProbe.extractText]]: body text with
  * the extractor AUTO-ROUTED from the payload magic; NULL when
  * unrecognized, out of decode scope, or encrypted.
  */
case class DocumentText(child: Expression) extends MediaHashExpression {
  override def prettyName: String = "document_text"
  override def dataType: DataType = StringType
  override protected def kernel(bytes: Array[Byte]): Any =
    graft.engine.read.DocumentProbe.extractText(bytes)
      .map(UTF8String.fromString).orNull
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `video_signature(aviBytes)` → array<bigint> —
  * [[graft.multimodal.VideoFrameHash.frameHashes]] at the default
  * frame budget; NULL when the payload is not a frame-bearing AVI or
  * no sampled frame decodes.
  */
case class VideoSignature(child: Expression) extends MediaHashExpression {
  override def prettyName: String = "video_signature"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def kernel(bytes: Array[Byte]): Any =
    graft.multimodal.VideoFrameHash.frameHashes(bytes)
      .filter(_.nonEmpty)
      .map(hs => new GenericArrayData(hs.toArray))
      .orNull
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
