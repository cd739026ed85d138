package graft.engine.read

import java.nio.charset.{Charset, StandardCharsets}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Email (RFC 5322 + MIME) text extraction and the MBOX archive
  * source — mailing-list archives are a major public corpus
  * (kernel/Apache/Usenet mbox dumps), and the whole stack is
  * offline-verifiable: header folding/unfolding (RFC 5322 §2.2.3),
  * RFC 2047 encoded-words in headers (`=?charset?B/Q?...?=`), MIME
  * multipart trees (RFC 2046) with boundary delimiters, and the two
  * content-transfer-encodings (quoted-printable RFC 2045 §6.7,
  * base64 §6.8 via the JDK's MIME decoder).
  *
  * Body-text policy (the corpus stance): `multipart/alternative`
  * picks ONE part — `text/plain` preferred, else `text/html` through
  * the engine's own [[graft.ops.TextAnalysis.htmlToTextKernel]]
  * cascade (no second HTML extractor to keep consistent); other
  * multiparts (`mixed`, `related`, `digest`) concatenate their
  * readable parts in order, joined by form feed (the Pdf/Epub page
  * convention); non-text leaves (attachments, images) and
  * `message/rfc822` forwards are skipped. A text-less message
  * extracts as an empty string, never an error.
  *
  * The MBOX reader is Spark-first, the [[WikiDump]] shape: records
  * split on the `"\nFrom "` envelope separator by Hadoop's
  * TextInputFormat — so one multi-GB archive parallelizes across the
  * cluster — then a per-record kernel parses each message;
  * `>From `-quoted body lines unquote per mboxrd. The same
  * [[WikiDump.DefaultMaxRecordBytes]]-style cap bounds a hostile
  * single message.
  *
  * None when the payload has no parseable header block at all.
  */
object Mail {

  final case class Email(from: String, to: String, subject: String,
                         date: String, messageId: String,
                         nParts: Int, text: String)

  /** A non-text MIME leaf: the attached payload with its declared
    * name (Content-Disposition `filename`, else Content-Type `name`,
    * else empty) and media type, transfer-decoded to bytes.
    */
  final case class Attachment(name: String, mediaType: String,
                              bytes: Array[Byte])

  val DefaultMaxRecordBytes: Int = 64 << 20

  // ------------------------------------------------------------------
  //  header machinery
  // ------------------------------------------------------------------

  /** Split a raw message into (headers, body) at the first empty
    * line; headers are UNFOLDED (continuation lines join with one
    * space). None when the head has no `Name: value` lines at all.
    */
  private def splitMessage(raw: String): Option[(Seq[(String, String)], String)] = {
    if (raw == null || raw.isEmpty) return None
    val sep = "\r\n\r\n|\n\n".r.findFirstMatchIn(raw)
    val (head, body) = sep match {
      case Some(m) => (raw.substring(0, m.start), raw.substring(m.end))
      case None    => (raw, "")
    }
    val hdrs = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    head.split("\r?\n").foreach { ln =>
      if (ln.nonEmpty && (ln.charAt(0) == ' ' || ln.charAt(0) == '\t')) {
        if (hdrs.nonEmpty) {
          val (k, v) = hdrs.last
          hdrs(hdrs.length - 1) = (k, v + " " + ln.trim)
        }
      } else {
        val c = ln.indexOf(':')
        if (c > 0 && !ln.substring(0, c).exists(ch => ch <= ' '))
          hdrs += ((ln.substring(0, c).trim, ln.substring(c + 1).trim))
      }
    }
    if (hdrs.isEmpty) None else Some((hdrs.toSeq, body))
  }

  private def header(hdrs: Seq[(String, String)], name: String): Option[String] =
    hdrs.collectFirst { case (k, v) if k.equalsIgnoreCase(name) => v }

  private def charsetOf(name: String): Option[Charset] =
    try Some(Charset.forName(name.trim
      .stripPrefix("\"").stripSuffix("\"")))
    catch { case _: Exception => None }

  private val EncodedWordRe =
    """=\?([^?]+)\?([bBqQ])\?([^?]*)\?=""".r

  /** RFC 2047 encoded-words in header values; adjacent encoded words
    * join without the intervening whitespace (§6.2).
    */
  private[read] def decodeHeader(v: String): String = {
    if (v == null || !v.contains("=?")) return v
    // drop whitespace BETWEEN two encoded words first
    val glued = """\?=\s+=\?""".r.replaceAllIn(v, "?==?")
    EncodedWordRe.replaceAllIn(glued, m => {
      val cs = charsetOf(m.group(1)).getOrElse(StandardCharsets.UTF_8)
      val decoded = m.group(2).toLowerCase match {
        case "b" =>
          try new String(java.util.Base64.getMimeDecoder.decode(m.group(3)), cs)
          catch { case _: Exception => m.group(3) }
        case _ => // Q: underscore is space, =XX is a byte
          val s = m.group(3)
          val out = new java.io.ByteArrayOutputStream()
          var i = 0
          while (i < s.length) {
            s.charAt(i) match {
              case '_' => out.write(' '); i += 1
              case '=' if i + 2 < s.length =>
                try { out.write(Integer.parseInt(s.substring(i + 1, i + 3), 16)); i += 3 }
                catch { case _: NumberFormatException => out.write('='); i += 1 }
              case c => out.write(c.toInt); i += 1
            }
          }
          new String(out.toByteArray, cs)
      }
      scala.util.matching.Regex.quoteReplacement(decoded)
    })
  }

  // ------------------------------------------------------------------
  //  MIME body machinery
  // ------------------------------------------------------------------

  /** `(mediatype, parameters)` from a Content-Type value. */
  private[read] def contentType(v: Option[String]): (String, Map[String, String]) = {
    val raw = v.getOrElse("text/plain").trim
    val parts = raw.split(";").toSeq
    val mt = parts.head.trim.toLowerCase
    val params = parts.tail.flatMap { p =>
      val eq = p.indexOf('=')
      if (eq <= 0) None
      else Some(p.substring(0, eq).trim.toLowerCase ->
        p.substring(eq + 1).trim.stripPrefix("\"").stripSuffix("\""))
    }.toMap
    (if (mt.isEmpty) "text/plain" else mt, params)
  }

  /** Quoted-printable decode (RFC 2045 §6.7): `=XX` bytes, `=` at
    * line end is a SOFT break (vanishes), malformed escapes pass
    * through literally (the tolerant crawl posture).
    */
  private[read] def decodeQp(s: String): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '=') {
        if (i + 1 < s.length && s.charAt(i + 1) == '\n') i += 2
        else if (i + 2 < s.length && s.charAt(i + 1) == '\r' &&
          s.charAt(i + 2) == '\n') i += 3
        else if (i + 2 < s.length) {
          try { out.write(Integer.parseInt(s.substring(i + 1, i + 3), 16)); i += 3 }
          catch { case _: NumberFormatException => out.write('='); i += 1 }
        } else { out.write('='); i += 1 }
      } else { out.write(c.toInt & 0xFF); i += 1 }
    }
    out.toByteArray
  }

  /** One leaf part's decoded BYTES per its transfer encoding. */
  private def decodeTransfer(body: String, encoding: Option[String]): Array[Byte] =
    encoding.map(_.trim.toLowerCase).getOrElse("7bit") match {
      case "base64" =>
        try java.util.Base64.getMimeDecoder.decode(
          body.filterNot(c => c == '\r' || c == '\n'))
        catch { case _: Exception => Array.emptyByteArray }
      case "quoted-printable" => decodeQp(body)
      case _ => body.getBytes(StandardCharsets.ISO_8859_1)
    }

  /** A parsed leaf: (mediatype, text). */
  private final case class Leaf(mediaType: String, text: String)

  /** Recursive MIME walk: leaves in document order, depth-bounded.
    * Text leaves assemble the body (unchanged since m50/m51 pinned
    * it); NON-text leaves collect into `atts` — the attached PDFs and
    * Office documents a crawl pipeline must route onward.
    */
  private def walkPart(hdrs: Seq[(String, String)], body: String,
                       depth: Int,
                       out: scala.collection.mutable.ArrayBuffer[Leaf],
                       atts: scala.collection.mutable.ArrayBuffer[Attachment]): Unit = {
    if (depth > 16) return
    val (mt, params) = contentType(header(hdrs, "Content-Type"))
    if (mt.startsWith("multipart/")) {
      val boundary = params.getOrElse("boundary", "")
      if (boundary.isEmpty) return
      val delim = "--" + boundary
      // split on delimiter lines; preamble (before the first) and
      // epilogue (after the closing --boundary--) drop per RFC 2046
      val chunks = body.split("\r?\n" + java.util.regex.Pattern.quote(delim) +
        "|\\A" + java.util.regex.Pattern.quote(delim))
      val inner = chunks.drop(1).takeWhile(c => !c.startsWith("--"))
        .map(_.replaceAll("\\A\r?\n", ""))
      if (mt == "multipart/alternative") {
        // ONE alternative: collect each, prefer plain, else html
        val alts = scala.collection.mutable.ArrayBuffer.empty[Leaf]
        inner.foreach { c =>
          splitMessage(ensureHeaderBlock(c)).foreach { case (h, b) =>
            walkPart(h, b, depth + 1, alts, atts)
          }
        }
        alts.find(_.mediaType == "text/plain")
          .orElse(alts.find(_.mediaType == "text/html"))
          .orElse(alts.headOption)
          .foreach(out += _)
      } else {
        inner.foreach { c =>
          splitMessage(ensureHeaderBlock(c)).foreach { case (h, b) =>
            walkPart(h, b, depth + 1, out, atts)
          }
        }
      }
    } else if (mt == "text/plain" || mt == "text/html") {
      val bytes = decodeTransfer(body, header(hdrs, "Content-Transfer-Encoding"))
      val cs = params.get("charset").flatMap(charsetOf)
        .getOrElse(StandardCharsets.UTF_8)
      val raw = new String(bytes, cs)
      val text =
        if (mt == "text/html") graft.ops.TextAnalysis.htmlToTextKernel(raw)
        else raw.replace("\r\n", "\n").trim
      out += Leaf(mt, text)
    } else {
      // a non-text leaf IS the attachment: transfer-decode and keep
      // (capped); name from Content-Disposition, else Content-Type
      val bytes = decodeTransfer(body, header(hdrs, "Content-Transfer-Encoding"))
      if (bytes.nonEmpty && bytes.length <= DefaultMaxRecordBytes &&
        atts.length < 1000) {
        val (_, dparams) = contentType(header(hdrs, "Content-Disposition"))
        val name = dparams.get("filename")
          .orElse(params.get("name")).getOrElse("")
        atts += Attachment(decodeHeader(name), mt, bytes)
      }
    }
  }

  /** A MIME part may legally have an EMPTY header block (body starts
    * immediately after the boundary line) — give splitMessage a
    * benign default so it still parses.
    */
  private def ensureHeaderBlock(chunk: String): String = {
    val firstLine = chunk.takeWhile(c => c != '\n').trim
    val looksHeader = firstLine.contains(':') &&
      !firstLine.substring(0, firstLine.indexOf(':')).exists(_ <= ' ')
    if (looksHeader) chunk
    else "Content-Type: text/plain\r\n\r\n" + chunk
  }

  // ------------------------------------------------------------------
  //  entry points
  // ------------------------------------------------------------------

  /** Parse one RFC 5322 message (EML bytes). */
  def parseEml(bytes: Array[Byte]): Option[Email] = {
    if (bytes == null || bytes.length == 0) return None
    // ISO-8859-1 maps bytes 1:1, so transfer-encoded payloads survive
    // to their own charset decode
    parseEmlString(new String(bytes, StandardCharsets.ISO_8859_1))
  }

  /** Parse one message given as a string (the MBOX kernel's input). */
  def parseEmlString(raw: String): Option[Email] = {
    val (hdrs, body) = splitMessage(raw) match {
      case Some(hb) => hb
      case None     => return None
    }
    // an RFC 5322 header block has at least one of the core fields;
    // random colon-bearing text does not
    val core = Seq("from", "to", "subject", "date", "message-id",
      "received", "return-path", "mime-version", "content-type")
    if (!hdrs.exists(h => core.contains(h._1.toLowerCase))) return None
    val leaves = scala.collection.mutable.ArrayBuffer.empty[Leaf]
    val atts = scala.collection.mutable.ArrayBuffer.empty[Attachment]
    walkPart(hdrs, body, 0, leaves, atts)
    val text = leaves.map(_.text).filter(_.nonEmpty).mkString("\f")
    Some(Email(
      from = decodeHeader(header(hdrs, "From").getOrElse("")),
      to = decodeHeader(header(hdrs, "To").getOrElse("")),
      subject = decodeHeader(header(hdrs, "Subject").getOrElse("")),
      date = header(hdrs, "Date").getOrElse(""),
      messageId = header(hdrs, "Message-ID").getOrElse(""),
      nParts = leaves.length,
      text = text))
  }

  /** One MBOX record chunk → message: strips the `From ` envelope
    * line, unquotes `>From ` body lines (mboxrd).
    */
  def parseMboxChunk(chunk: String): Option[Email] =
    mboxRaw(chunk).flatMap(parseEmlString)

  /** Envelope strip + mboxrd unquote shared by the message and
    * attachment kernels.
    */
  private def mboxRaw(chunk: String): Option[String] = {
    if (chunk == null) return None
    var c = chunk
    // the FIRST record still carries its full "From " envelope line;
    // later records had it consumed by the "\nFrom " separator except
    // for the remainder of the line
    if (c.startsWith("From ")) {
      val nl = c.indexOf('\n')
      c = if (nl < 0) "" else c.substring(nl + 1)
    } else {
      // split consumed "\nFrom "; the rest of the envelope line leads
      val nl = c.indexOf('\n')
      val firstLine = if (nl < 0) c else c.substring(0, nl)
      val looksEnvelope = !firstLine.contains(':')
      if (looksEnvelope) c = if (nl < 0) "" else c.substring(nl + 1)
    }
    // mboxrd unquoting: a body line ">>>From " loses ONE '>'
    Some(c.replaceAll("(?m)^>(>*From )", "$1"))
  }

  /** MBOX archive → one row per message: `(msg_id, from_addr,
    * to_addr, subject, date, n_parts, text)`. Spark-first: the
    * envelope separator is the record delimiter, so one archive file
    * splits across the cluster; the kernel does the rest.
    */
  def messages(spark: SparkSession, path: String,
               maxRecordBytes: Int = DefaultMaxRecordBytes): DataFrame = {
    import spark.implicits._
    val parse = udf { (chunk: String) => parseMboxChunk(chunk) }
    spark.read.option("lineSep", "\nFrom ")
      .option("mapreduce.input.linerecordreader.line.maxlength",
        maxRecordBytes.toString)
      .text(path)
      .select(parse(col("value")).as("m"))
      .filter(col("m").isNotNull)
      .select(
        col("m.messageId").as("msg_id"),
        col("m.from").as("from_addr"),
        col("m.to").as("to_addr"),
        col("m.subject").as("subject"),
        col("m.date").as("date"),
        col("m.nParts").as("n_parts"),
        col("m.text").as("text"))
  }

  /** Streaming twin of [[messages]]: new MBOX files landing in `dir`
    * stream through the same envelope split + kernel (the text file
    * stream source honors `lineSep`), so a live list archive feeds
    * the same downstream program as a batch read.
    */
  def stream(spark: SparkSession, dir: String,
             maxRecordBytes: Int = DefaultMaxRecordBytes,
             maxFilesPerTrigger: Int = 100): DataFrame = {
    val parse = udf { (chunk: String) => parseMboxChunk(chunk) }
    spark.readStream
      .option("lineSep", "\nFrom ")
      .option("mapreduce.input.linerecordreader.line.maxlength",
        maxRecordBytes.toString)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .text(dir)
      .select(parse(col("value")).as("m"))
      .filter(col("m").isNotNull)
      .select(
        col("m.messageId").as("msg_id"),
        col("m.from").as("from_addr"),
        col("m.to").as("to_addr"),
        col("m.subject").as("subject"),
        col("m.date").as("date"),
        col("m.nParts").as("n_parts"),
        col("m.text").as("text"))
  }

  private val textUdf = udf { (bytes: Array[Byte]) =>
    parseEml(bytes).map(_.text)
  }

  /** Message body text as a column; NULL when not a message. */
  def textCol(bytesCol: Column): Column = textUdf(bytesCol)

  // ------------------------------------------------------------------
  //  attachments
  // ------------------------------------------------------------------

  /** Every non-text MIME leaf of one message, transfer-decoded —
    * the attached PDFs/Office documents/images a crawl pipeline
    * routes onward through [[DocumentProbe]]. Empty when not a
    * message or nothing is attached.
    */
  def attachmentsOf(raw: String): Seq[Attachment] = {
    val (hdrs, body) = splitMessage(raw) match {
      case Some(hb) => hb
      case None     => return Seq.empty
    }
    val leaves = scala.collection.mutable.ArrayBuffer.empty[Leaf]
    val atts = scala.collection.mutable.ArrayBuffer.empty[Attachment]
    walkPart(hdrs, body, 0, leaves, atts)
    atts.toSeq
  }

  /** [[attachmentsOf]] over EML bytes. */
  def attachments(bytes: Array[Byte]): Seq[Attachment] = {
    if (bytes == null || bytes.length == 0) return Seq.empty
    attachmentsOf(new String(bytes, StandardCharsets.ISO_8859_1))
  }

  private val attachmentsUdf = udf { (bytes: Array[Byte]) =>
    attachments(bytes).map(a => (a.name, a.mediaType, a.bytes))
  }

  /** `array<struct<name, media_type, content>>` of the message's
    * attachments; empty array when none, for `explode` composition.
    */
  def attachmentsCol(bytesCol: Column): Column = attachmentsUdf(bytesCol)

  /** MBOX archive → one row per ATTACHMENT: `(msg_id, subject, name,
    * media_type, content)` — compose with [[DocumentProbe]] so the
    * PDF attached to a list message joins the same text layer as the
    * PDF crawled from the web. Same splittable envelope scan as
    * [[messages]] — but byte-exact: attachments may use 8bit/binary
    * Content-Transfer-Encoding, and `spark.read.text`'s UTF-8 decode
    * would corrupt those bytes with replacement characters before
    * the ISO-8859-1 round-trip could recover them. Hadoop's
    * `TextInputFormat` with a custom record delimiter hands back the
    * RAW record bytes (`Text.set` copies without validation), so
    * decoding them as ISO-8859-1 here is lossless for every
    * transfer encoding. One kernel per record, attachments explode
    * as rows, message text never ships here.
    */
  def attachmentRows(spark: SparkSession, path: String,
                     maxRecordBytes: Int = DefaultMaxRecordBytes): DataFrame = {
    val conf = new org.apache.hadoop.conf.Configuration(
      spark.sparkContext.hadoopConfiguration)
    conf.set("textinputformat.record.delimiter", "\nFrom ")
    conf.setInt("mapreduce.input.linerecordreader.line.maxlength",
      maxRecordBytes)
    val records = spark.sparkContext.newAPIHadoopFile(
      path,
      classOf[org.apache.hadoop.mapreduce.lib.input.TextInputFormat],
      classOf[org.apache.hadoop.io.LongWritable],
      classOf[org.apache.hadoop.io.Text],
      conf)
      .map { case (_, t) =>
        new String(t.getBytes, 0, t.getLength, StandardCharsets.ISO_8859_1)
      }
    val parse = udf { (chunk: String) =>
      mboxRaw(chunk).flatMap { raw =>
        parseEmlString(raw).map { m =>
          (m.messageId, m.subject,
            attachmentsOf(raw).map(a => (a.name, a.mediaType, a.bytes)))
        }
      }
    }
    import spark.implicits._
    records.toDF("value")
      .select(parse(col("value")).as("m"))
      .filter(col("m").isNotNull)
      .select(col("m._1").as("msg_id"), col("m._2").as("subject"),
        explode(col("m._3")).as("a"))
      .select(col("msg_id"), col("subject"),
        col("a._1").as("name"), col("a._2").as("media_type"),
        col("a._3").as("content"))
  }

  /** Streaming twin of [[attachmentRows]] (the Tar/Zip.stream
    * discipline): new MBOX files landing in `dir` explode their
    * attachments through the SAME MIME walk. Reads each file through
    * the `binaryFile` stream source — raw bytes, no UTF-8 decode on
    * the way in — then decodes ISO-8859-1 and splits the envelope
    * records in the kernel, so 8bit/binary transfer encodings are
    * byte-exact on this path too, matching the batch reader. The
    * trade vs the retired text-source twin: one mbox FILE no longer
    * splits across tasks (a streamed drop directory delivers
    * file-sized units, and maxFilesPerTrigger bounds the batch);
    * files beyond `maxRecordBytes` × 64 are refused whole rather
    * than truncated mid-record.
    */
  def attachmentStream(spark: SparkSession, dir: String,
                       maxRecordBytes: Int = DefaultMaxRecordBytes,
                       maxFilesPerTrigger: Int = 100): DataFrame = {
    val maxFileBytes = maxRecordBytes.toLong * 64
    val parse = udf { (content: Array[Byte]) =>
      val out: Seq[(String, String, Seq[(String, String, Array[Byte])])] =
        if (content == null || content.length > maxFileBytes) Seq.empty
        else {
          val whole = new String(content, StandardCharsets.ISO_8859_1)
          // Same record discipline as the batch TextInputFormat split:
          // the delimiter "\nFrom " is consumed; the first chunk keeps
          // its full envelope line and mboxRaw strips it.
          whole.split("\nFrom ", -1).iterator
            .filter(_.length <= maxRecordBytes)
            .flatMap { chunk =>
              mboxRaw(chunk).flatMap { raw =>
                parseEmlString(raw).map { m =>
                  (m.messageId, m.subject,
                    attachmentsOf(raw).map(a =>
                      (a.name, a.mediaType, a.bytes)).toSeq)
                }
              }
            }.toSeq
        }
      out
    }
    val binSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("path",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("modificationTime",
        org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("length",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("content",
        org.apache.spark.sql.types.BinaryType)))
    spark.readStream
      .format("binaryFile")
      .schema(binSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .load(dir)
      .select(explode(parse(col("content"))).as("m"))
      .select(col("m._1").as("msg_id"), col("m._2").as("subject"),
        explode(col("m._3")).as("a"))
      .select(col("msg_id"), col("subject"),
        col("a._1").as("name"), col("a._2").as("media_type"),
        col("a._3").as("content"))
  }
}
