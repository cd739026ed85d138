package graft.engine.read

class MailSpec extends graft.SparkSpec {

  private def eml(s: String): Array[Byte] =
    s.stripMargin.replace("\n", "\r\n").getBytes("ISO-8859-1")

  test("simple 7bit message: headers + body") {
    val m = Mail.parseEml(eml(
      """From: Alice <alice@example.org>
        |To: list@example.org
        |Subject: hello world
        |Date: Mon, 01 Apr 2024 10:00:00 +0000
        |Message-ID: <m1@example.org>
        |
        |This is the body.
        |Second line.""")).get
    assert(m.from == "Alice <alice@example.org>")
    assert(m.subject == "hello world")
    assert(m.messageId == "<m1@example.org>")
    assert(m.nParts == 1)
    assert(m.text == "This is the body.\nSecond line.")
  }

  test("folded headers unfold; RFC 2047 encoded-words decode (B and Q)") {
    val m = Mail.parseEml(eml(
      """From: =?UTF-8?B?Sm9zw6k=?= <jose@example.org>
        |Subject: =?ISO-8859-1?Q?caf=E9_menu?=
        | =?ISO-8859-1?Q?_update?=
        |To: a@b.c
        |
        |body""")).get
    assert(m.from == "José <jose@example.org>")
    assert(m.subject == "café menu update")
  }

  test("multipart/alternative prefers text/plain over html") {
    val m = Mail.parseEml(eml(
      """From: a@b.c
        |MIME-Version: 1.0
        |Content-Type: multipart/alternative; boundary="XY"
        |
        |preamble is ignored
        |--XY
        |Content-Type: text/plain; charset=utf-8
        |
        |plain version
        |--XY
        |Content-Type: text/html; charset=utf-8
        |
        |<html><body><p>html version</p></body></html>
        |--XY--
        |epilogue ignored""")).get
    assert(m.nParts == 1)
    assert(m.text == "plain version")
  }

  test("html-only alternative routes through the htmlToText cascade") {
    val m = Mail.parseEml(eml(
      """From: a@b.c
        |Content-Type: multipart/alternative; boundary=ZZ
        |
        |--ZZ
        |Content-Type: text/html
        |
        |<html><body><p>Hello &amp; welcome</p></body></html>
        |--ZZ--""")).get
    assert(m.text == "Hello & welcome")
  }

  test("quoted-printable and base64 transfer encodings decode") {
    val b64 = java.util.Base64.getMimeEncoder.encodeToString(
      "base64 body καλημέρα".getBytes("UTF-8"))
    val m = Mail.parseEml(eml(
      s"""From: a@b.c
         |Content-Type: multipart/mixed; boundary=MM
         |
         |--MM
         |Content-Type: text/plain; charset=iso-8859-1
         |Content-Transfer-Encoding: quoted-printable
         |
         |caf=E9 cr=
         |=E8me
         |--MM
         |Content-Type: text/plain; charset=utf-8
         |Content-Transfer-Encoding: base64
         |
         |$b64
         |--MM--""")).get
    assert(m.nParts == 2)
    assert(m.text == "café crème\fbase64 body καλημέρα")
  }

  test("nested multipart recurses; attachments skip") {
    val m = Mail.parseEml(eml(
      """From: a@b.c
        |Content-Type: multipart/mixed; boundary=OUT
        |
        |--OUT
        |Content-Type: multipart/alternative; boundary=IN
        |
        |--IN
        |Content-Type: text/plain
        |
        |inner plain
        |--IN--
        |--OUT
        |Content-Type: application/pdf; name="x.pdf"
        |Content-Transfer-Encoding: base64
        |
        |JVBERi0=
        |--OUT
        |Content-Type: text/plain
        |
        |tail part
        |--OUT--""")).get
    assert(m.nParts == 2)
    assert(m.text == "inner plain\ftail part")
  }

  test("attachments(): non-text leaves surface decoded; body text " +
    "is byte-identical to before") {
    val pdf = graft.queries.PdfFixture.simplePdf(Seq(
      "BT /F1 12 Tf (attached pdf body) Tj ET"))
    val b64 = java.util.Base64.getMimeEncoder(72,
      "\r\n".getBytes).encodeToString(pdf)
    val raw =
      s"""From: a@b.c
         |Content-Type: multipart/mixed; boundary=MM
         |
         |--MM
         |Content-Type: text/plain
         |
         |see attachment
         |--MM
         |Content-Type: application/pdf; name="report.pdf"
         |Content-Disposition: attachment; filename="q3 report.pdf"
         |Content-Transfer-Encoding: base64
         |
         |$b64
         |--MM
         |Content-Type: application/octet-stream
         |Content-Transfer-Encoding: base64
         |
         |AAECAw==
         |--MM--""".stripMargin
    val atts = Mail.attachments(eml(raw))
    assert(atts.length == 2)
    assert(atts(0).name == "q3 report.pdf") // disposition beats CT name
    assert(atts(0).mediaType == "application/pdf")
    assert(java.util.Arrays.equals(atts(0).bytes, pdf))
    // the attached PDF routes straight through the document layer
    assert(graft.engine.read.Pdf.extractText(atts(0).bytes)
      .map(_.text).contains("attached pdf body"))
    assert(atts(1).name == "" && atts(1).mediaType == "application/octet-stream")
    assert(atts(1).bytes.toSeq == Seq[Byte](0, 1, 2, 3))
    // text assembly is unchanged by the collection
    assert(Mail.parseEml(eml(raw)).get.text == "see attachment")
    // RFC 2047 encoded filenames decode
    val enc = Mail.attachments(eml(
      """From: a@b.c
        |Content-Type: multipart/mixed; boundary=X
        |
        |--X
        |Content-Type: image/png; name="=?UTF-8?B?Sm9zw6kucG5n?="
        |Content-Transfer-Encoding: base64
        |
        |iVBORw==
        |--X--""".stripMargin))
    assert(enc.head.name == "José.png")
    // no attachments / not a message: empty, never a throw
    assert(Mail.attachments(eml("From: a@b.c\n\njust text")).isEmpty)
    assert(Mail.attachments("junk".getBytes).isEmpty)
    assert(Mail.attachments(null).isEmpty)
  }

  test("attachmentRows(): an mbox explodes one row per attachment " +
    "into the document layer") {
    val docx = graft.queries.DocxFixture.docx(Seq(
      graft.queries.DocxFixture.para(
        graft.queries.DocxFixture.T("attached docx body"))))
    val b64 = java.util.Base64.getMimeEncoder(72,
      "\n".getBytes).encodeToString(docx)
    val mbox =
      "From alice Mon Apr  1 10:00:00 2024\n" +
        "From: alice@example.org\nSubject: with doc\nMessage-ID: <a1>\n" +
        "Content-Type: multipart/mixed; boundary=BB\n\n" +
        "--BB\nContent-Type: text/plain\n\ncover note\n" +
        "--BB\nContent-Type: application/vnd.openxmlformats-officedocument" +
        ".wordprocessingml.document; name=\"doc.docx\"\n" +
        "Content-Transfer-Encoding: base64\n\n" + b64 + "\n--BB--\n\n" +
        "From bob Tue Apr  2 11:00:00 2024\n" +
        "From: bob@example.org\nSubject: plain\nMessage-ID: <b2>\n\n" +
        "no attachments here.\n"
    val dir = java.nio.file.Files.createTempDirectory("graft_mbox_att")
    java.nio.file.Files.write(dir.resolve("list.mbox"),
      mbox.getBytes("UTF-8"))
    val rows = Mail.attachmentRows(spark, dir.toString).collect()
    assert(rows.length == 1)
    assert(rows(0).getAs[String]("msg_id") == "<a1>")
    assert(rows(0).getAs[String]("name") == "doc.docx")
    val content = rows(0).getAs[Array[Byte]]("content")
    assert(graft.engine.read.DocumentProbe.extractText(content)
      .contains("attached docx body"))
  }

  test("attachmentStream(): attachments stream with batch-identical " +
    "rows (base64 path)") {
    val docx = graft.queries.DocxFixture.docx(Seq(
      graft.queries.DocxFixture.para(
        graft.queries.DocxFixture.T("streamed attachment"))))
    val b64 = java.util.Base64.getMimeEncoder(72,
      "\n".getBytes).encodeToString(docx)
    val mbox =
      "From alice Mon Apr  1 10:00:00 2024\n" +
        "From: alice@example.org\nSubject: s\nMessage-ID: <s1>\n" +
        "Content-Type: multipart/mixed; boundary=SS\n\n" +
        "--SS\nContent-Type: text/plain\n\ncover\n" +
        "--SS\nContent-Type: application/octet-stream; name=\"d.docx\"\n" +
        "Content-Transfer-Encoding: base64\n\n" + b64 + "\n--SS--\n"
    val dir = java.nio.file.Files.createTempDirectory("graft_mbox_stream")
    java.nio.file.Files.write(dir.resolve("a.mbox"), mbox.getBytes("UTF-8"))
    val batch = Mail.attachmentRows(spark, dir.toString).collect()
      .map(r => (r.getString(0), r.getString(2),
        r.getAs[Array[Byte]](4).toSeq)).toSeq
    val q = Mail.attachmentStream(spark, dir.toString)
      .writeStream.format("memory").queryName("mail_att_stream")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val streamed = spark.sql(
      "SELECT msg_id, name, content FROM mail_att_stream ORDER BY name")
      .collect()
      .map(r => (r.getString(0), r.getString(1),
        r.getAs[Array[Byte]](2).toSeq)).toSeq
    assert(streamed == batch)
    assert(graft.engine.read.DocumentProbe
      .extractText(streamed.head._3.toArray)
      .contains("streamed attachment"))
  }

  test("attachmentStream(): 8bit transfer encoding is byte-exact " +
    "(binaryFile route, matches batch)") {
    // High bytes that UTF-8 decoding would smash to U+FFFD: the old
    // text-source twin corrupted these; the binaryFile route must not.
    val raw = Array.tabulate[Byte](64)(i => (0x80 + (i * 3) % 0x7f).toByte)
    val body = new String(raw, java.nio.charset.StandardCharsets.ISO_8859_1)
    val mbox =
      "From bob Mon Apr  1 11:00:00 2024\n" +
        "From: bob@example.org\nSubject: bin\nMessage-ID: <b1>\n" +
        "Content-Type: multipart/mixed; boundary=BB\n\n" +
        "--BB\nContent-Type: text/plain\n\ncover\n" +
        "--BB\nContent-Type: application/octet-stream; name=\"r.bin\"\n" +
        "Content-Transfer-Encoding: 8bit\n\n" + body + "\n--BB--\n"
    val dir = java.nio.file.Files.createTempDirectory("graft_mbox_8bit")
    java.nio.file.Files.write(dir.resolve("b.mbox"),
      mbox.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    val batch = Mail.attachmentRows(spark, dir.toString).collect()
    assert(batch.length == 1)
    assert(batch(0).getAs[Array[Byte]]("content").toSeq == raw.toSeq)
    val q = Mail.attachmentStream(spark, dir.toString)
      .writeStream.format("memory").queryName("mail_att_8bit")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val streamed = spark.sql(
      "SELECT content FROM mail_att_8bit").collect()
    assert(streamed.length == 1)
    assert(streamed(0).getAs[Array[Byte]]("content").toSeq == raw.toSeq)
  }

  test("attachmentRows(): 8bit/binary transfer encodings survive " +
    "byte-exactly (the scan is byte-exact, not UTF-8-decoded)") {
    // every byte value 0x00–0xFF, none of it valid UTF-8 as a whole —
    // a UTF-8 text scan would smash the high bytes to U+FFFD before
    // the ISO-8859-1 round-trip could recover them
    val payload = Array.tabulate[Byte](256)(_.toByte)
    val head =
      "From carol Wed Apr  3 09:00:00 2024\n" +
        "From: carol@example.org\nSubject: raw bytes\nMessage-ID: <c3>\n" +
        "Content-Type: multipart/mixed; boundary=ZZ\n\n" +
        "--ZZ\nContent-Type: text/plain\n\ncover\n" +
        "--ZZ\nContent-Type: application/octet-stream; name=\"blob.bin\"\n" +
        "Content-Transfer-Encoding: binary\n\n"
    val tail = "\n--ZZ--\n"
    val dir = java.nio.file.Files.createTempDirectory("graft_mbox_8bit")
    val out = new java.io.ByteArrayOutputStream()
    out.write(head.getBytes("ISO-8859-1"))
    out.write(payload)
    out.write(tail.getBytes("ISO-8859-1"))
    java.nio.file.Files.write(dir.resolve("raw.mbox"), out.toByteArray)
    val rows = Mail.attachmentRows(spark, dir.toString).collect()
    assert(rows.length == 1)
    assert(rows(0).getAs[String]("name") == "blob.bin")
    val content = rows(0).getAs[Array[Byte]]("content")
    assert(java.util.Arrays.equals(content, payload),
      s"binary attachment corrupted: got ${content.length} bytes")
  }

  test("mbox chunks: envelope strip, mboxrd unquote, junk is None") {
    val chunk = "From alice@example.org Mon Apr  1 10:00:00 2024\n" +
      "From: a@b.c\nSubject: s1\n\n>From the start, quoted.\nplain."
    val m = Mail.parseMboxChunk(chunk).get
    assert(m.subject == "s1")
    assert(m.text == "From the start, quoted.\nplain.")
    // a chunk as the lineSep split produces it (envelope tail leads)
    val later = "bob@example.org Tue Apr  2 10:00:00 2024\n" +
      "From: b@c.d\nSubject: s2\n\n>>From twice.\nbody two."
    val m2 = Mail.parseMboxChunk(later).get
    assert(m2.subject == "s2")
    assert(m2.text == ">From twice.\nbody two.")
    assert(Mail.parseMboxChunk("no headers here at all").isEmpty)
    assert(Mail.parseEml("not: a mail header block".getBytes).isEmpty)
    assert(Mail.parseEml(Array.emptyByteArray).isEmpty)
  }

  test("messages(): an mbox archive reads distributedly with intact fields") {
    val dir = java.nio.file.Files.createTempDirectory("graft_mbox")
    val mbox =
      "From alice Mon Apr  1 10:00:00 2024\n" +
        "From: alice@example.org\nTo: list@example.org\n" +
        "Subject: first\nMessage-ID: <a1>\n\nbody one.\n\n" +
        "From bob Tue Apr  2 11:00:00 2024\n" +
        "From: bob@example.org\nTo: list@example.org\n" +
        "Subject: second\nMessage-ID: <b2>\n\n" +
        ">From me, quoted line.\nbody two.\n"
    java.nio.file.Files.write(dir.resolve("list.mbox"),
      mbox.getBytes("UTF-8"))
    val rows = Mail.messages(spark, dir.toString)
      .orderBy("msg_id").collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[String]("msg_id") == "<a1>")
    assert(rows(0).getAs[String]("text") == "body one.")
    assert(rows(1).getAs[String]("subject") == "second")
    assert(rows(1).getAs[String]("text") ==
      "From me, quoted line.\nbody two.")
  }

  test("eml_text SQL function surfaces the kernel") {
    graft.GraftExtensions.register(spark)
    import spark.implicits._
    Seq(
      (1L, eml("""From: a@b.c
                 |Subject: sql
                 |
                 |sql body""")),
      (2L, Array[Byte](0, 1, 2))).toDF("id", "content")
      .createOrReplaceTempView("mails")
    val got = spark.sql(
      "SELECT id, eml_text(content) AS t FROM mails ORDER BY id").collect()
    assert(got(0).getString(1) == "sql body")
    assert(got(1).isNullAt(1))
  }

  test("stream(): mbox files stream with batch-identical rows") {
    val dir = java.nio.file.Files.createTempDirectory("graft_mbox_stream")
    val mbox =
      "From alice Mon Apr  1 10:00:00 2024\n" +
        "From: alice@example.org\nSubject: s1\nMessage-ID: <s1>\n\n" +
        "streamed body one.\n\n" +
        "From bob Tue Apr  2 11:00:00 2024\n" +
        "From: bob@example.org\nSubject: s2\nMessage-ID: <s2>\n\n" +
        ">From quoted.\nstreamed body two.\n"
    java.nio.file.Files.write(dir.resolve("live.mbox"),
      mbox.getBytes("UTF-8"))
    val batch = Mail.messages(spark, dir.toString)
      .orderBy("msg_id").collect()
      .map(r => (r.getString(0), r.getString(6))).toSeq
    val q = Mail.stream(spark, dir.toString)
      .writeStream.format("memory").queryName("mbox_stream")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val streamed = spark.sql(
      "SELECT msg_id, text FROM mbox_stream ORDER BY msg_id")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(streamed == batch)
    assert(streamed.map(_._2) ==
      Seq("streamed body one.", "From quoted.\nstreamed body two."))
  }
}
