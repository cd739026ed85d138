package graft

class GraftExtensionsSpec extends SparkSpec {

  test("SQL functions registered on an existing session") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT label_hash_bucket('en') AS b1,
        |       label_hash_bucket('de', 64) AS b2,
        |       label_hash_bucket(NULL) AS b3,
        |       label_hash_bucket(42) AS b4,
        |       round(cosine_sim(array(1.0f, 2.0f), array(1.0f, 2.0f)), 6) AS cs,
        |       dot_product(array(1.0f, 2.0f), array(3.0f, 4.0f)) AS dp""".stripMargin)
      .collect().head
    assert(r.getInt(0) == 14) // sha256('en')[:8] big-endian % 64
    assert(r.getInt(1) == 24)
    assert(r.getInt(2) == -1) // null sentinel
    assert(r.getInt(3) >= 0 && r.getInt(3) < 64) // int input stringified
    assert(r.getDouble(4) == 1.0)
    assert(r.getDouble(5) == 11.0)
  }

  test("exif_gps / exif_strip_gps reachable from SQL: coordinates " +
    "surface and the stripped twin reads NULL") {
    GraftExtensions.register(spark)
    import spark.implicits._
    // minimal EXIF TIFF with a GPS IFD: N 10°30'0" E 20°15'0"
    def le16(v: Int) = Array[Byte]((v & 0xff).toByte, (v >> 8).toByte)
    def le32(v: Int) = le16(v & 0xffff) ++ le16(v >>> 16)
    val tiff = "II".getBytes ++ le16(42) ++ le32(8) ++
      le16(1) ++ // IFD0: 1 entry
      le16(0x8825) ++ le16(4) ++ le32(1) ++ le32(26) ++ // GPS → 26
      le32(0) ++
      le16(4) ++ // GPS IFD @26: 4 entries → ends 26+2+48+4=80
      le16(1) ++ le16(2) ++ le32(2) ++ "N".getBytes ++ Array[Byte](0, 0, 0) ++
      le16(2) ++ le16(5) ++ le32(3) ++ le32(80) ++
      le16(3) ++ le16(2) ++ le32(2) ++ "E".getBytes ++ Array[Byte](0, 0, 0) ++
      le16(4) ++ le16(5) ++ le32(3) ++ le32(104) ++
      le32(0) ++
      le32(10) ++ le32(1) ++ le32(30) ++ le32(1) ++ le32(0) ++ le32(1) ++
      le32(20) ++ le32(1) ++ le32(15) ++ le32(1) ++ le32(0) ++ le32(1)
    Seq((1, tiff)).toDF("id", "img").createOrReplaceTempView("gps_imgs")
    val r = spark.sql(
      """SELECT round(exif_gps(img).lat, 6) AS lat,
        |       round(exif_gps(img).lon, 6) AS lon,
        |       exif_gps(img).alt IS NULL AS no_alt,
        |       exif_gps(exif_strip_gps(img)) IS NULL AS stripped
        |FROM gps_imgs""".stripMargin).collect().head
    assert(r.getDouble(0) == 10.5 && r.getDouble(1) == 20.25)
    assert(r.getBoolean(2) && r.getBoolean(3))
  }

  test("bounded_top_k reachable from SQL, caps per group, sorted by key") {
    GraftExtensions.register(spark)
    import spark.implicits._
    Seq(("a", 3L, "x3"), ("a", 1L, "x1"), ("a", 2L, "x2"), ("b", 9L, "y9"))
      .toDF("g", "k", "v").createOrReplaceTempView("btk_in")
    val rows = spark.sql(
      """SELECT g, bounded_top_k(k, v, 2) AS top
        |FROM btk_in GROUP BY g ORDER BY g""".stripMargin)
      .collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("a", "b"))
    assert(rows(0).getSeq[String](1) == Seq("x1", "x2"))
    assert(rows(1).getSeq[String](1) == Seq("y9"))
    // analysis-time guards
    intercept[Exception](spark.sql("SELECT bounded_top_k(1, 2, 0)").collect())
    intercept[Exception](spark.sql("SELECT bounded_top_k(1, 2)").collect())
  }

  test("normalize_text reachable from SQL, matches the Column API") {
    GraftExtensions.register(spark)
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val sql = spark.sql(
      "SELECT normalize_text('it’s “fine” — ok…  now') AS n")
      .collect().head.getString(0)
    assert(sql == "it's \"fine\" - ok... now")
    // SQL and Column surfaces produce identical results on real data.
    val docs = Seq("a b", "c​d", "  e\tf  ", "plain").toDF("t")
    docs.createOrReplaceTempView("nt_in")
    val viaSql = spark.sql("SELECT normalize_text(t) AS n FROM nt_in")
      .as[String].collect().toSeq
    val viaCol = docs.select(
      graft.ops.TextAnalysis.normalizeText(col("t")).as("n"))
      .as[String].collect().toSeq
    assert(viaSql == viaCol)
    intercept[Exception](spark.sql("SELECT normalize_text('a', 'b')").collect())
  }

  test("dedup_lines reachable from SQL, matches the Column API") {
    GraftExtensions.register(spark)
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // The composed HOF tree (split → indexed filter → rejoin) must
    // survive the Expression→Column→Expression round trip, lambda
    // included.
    val sql = spark.sql(
      "SELECT dedup_lines('a\nb\na\nc\nb') AS r").collect().head.getString(0)
    assert(sql == "a\nb\nc")
    val docs = Seq("x\nx\ny", "one", "", null).toDF("t")
    docs.createOrReplaceTempView("dl_in")
    val viaSql = spark.sql("SELECT dedup_lines(t) AS r FROM dl_in")
      .as[String].collect().toSeq
    val viaCol = docs.select(
      graft.ops.TextAnalysis.dedupLines(col("t")).as("r"))
      .as[String].collect().toSeq
    assert(viaSql == viaCol)
    assert(viaSql == Seq("x\ny", "one", "", null))
    intercept[Exception](spark.sql("SELECT dedup_lines('a', 'b')").collect())
  }

  test("html_to_text and markdown_to_text reachable from SQL, match the Column API") {
    GraftExtensions.register(spark)
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val html = "<p>one</p><script>x<y</script><p>5 &lt; 6</p>"
    val md = "# T\n- item [l](u) *e*\n```\ncode\n```"
    val docs = Seq((html, md)).toDF("h", "m")
    docs.createOrReplaceTempView("cx_in")
    val viaSql = spark.sql(
      "SELECT html_to_text(h) AS a, markdown_to_text(m) AS b FROM cx_in")
      .as[(String, String)].collect().head
    val viaCol = docs.select(
      graft.ops.TextAnalysis.htmlToText(col("h")).as("a"),
      graft.ops.TextAnalysis.markdownToText(col("m")).as("b"))
      .as[(String, String)].collect().head
    assert(viaSql == viaCol)
    assert(viaSql == (("one\n5 < 6", "T\nitem l e\ncode")))
    intercept[Exception](spark.sql("SELECT markdown_to_text('a','b')").collect())
  }

  test("dominant_script reachable from SQL, matches the Column API") {
    GraftExtensions.register(spark)
    import spark.implicits._
    val rows = Seq(("hello world"), ("\u4f60\u597d\u4e16\u754c"),
      ("12345"), (null.asInstanceOf[String])).toDF("t")
    rows.createOrReplaceTempView("ds_in")
    val viaSql = spark.sql("SELECT dominant_script(t) AS s FROM ds_in")
      .as[String].collect().toSeq
    val viaCol = rows.select(
      graft.ops.TextAnalysis.dominantScript(org.apache.spark.sql.functions.col("t")).as("s"))
      .as[String].collect().toSeq
    assert(viaSql == viaCol)
    assert(viaSql == Seq("latin", "han", "unknown", "unknown"))
    intercept[Exception](spark.sql("SELECT dominant_script('a','b')").collect())
  }

  test("split_sentences reachable from SQL, matches the Column API") {
    GraftExtensions.register(spark)
    import spark.implicits._
    val rows = Seq(
      "Dr. Smith met J. Doe at 3.14 after 5 p.m.! “Really?” Yes.",
      "one line\nno terminator",
      "", null.asInstanceOf[String]).toDF("t")
    rows.createOrReplaceTempView("ss_in")
    val viaSql = spark.sql("SELECT split_sentences(t) AS s FROM ss_in")
      .as[Seq[String]].collect().toSeq
    val viaCol = rows.select(
      graft.ops.TextAnalysis.splitSentences(
        org.apache.spark.sql.functions.col("t")).as("s"))
      .as[Seq[String]].collect().toSeq
    assert(viaSql == viaCol)
    assert(viaSql.head == Seq(
      "Dr. Smith met J. Doe at 3.14 after 5 p.m.!",
      "“Really?”", "Yes."))
    assert(viaSql(1) == Seq("one line", "no terminator"))
    assert(viaSql(2) == Seq.empty && viaSql(3) == Seq.empty)
    intercept[Exception](spark.sql("SELECT split_sentences('a','b')").collect())
  }

  test("kll_quantiles reachable from SQL, matches the Column API") {
    GraftExtensions.register(spark)
    import spark.implicits._
    val df = (1 to 100).map(_.toDouble).toDF("v")
    df.createOrReplaceTempView("kll_in")
    // decimal literals (plain SQL 0.5) and double literals both accepted
    val viaSql = spark.sql(
      "SELECT kll_quantiles(v, 256, array(0.5, 0.9D)) AS qs FROM kll_in")
      .selectExpr("qs[0].quantile", "qs[1].quantile")
      .as[(Double, Double)].head()
    val viaCol = df.agg(graft.functions.KllQuantiles.of(
        org.apache.spark.sql.functions.col("v"), 256, Seq(0.5, 0.9)).as("qs"))
      .selectExpr("qs[0].quantile", "qs[1].quantile")
      .as[(Double, Double)].head()
    assert(viaSql == viaCol)
    assert(viaSql == ((50.0, 90.0)))
    intercept[Exception](
      spark.sql("SELECT kll_quantiles(1.0D, 2, array(0.5))").collect())
  }

  test("kmv family reachable from SQL, NULL-skipping, exact set ops") {
    GraftExtensions.register(spark)
    import spark.implicits._
    Seq(Some(1L), None, Some(2L), Some(3L)).toDF("v")
      .createOrReplaceTempView("kmv_a")
    (2L to 5L).toDF("v").createOrReplaceTempView("kmv_b")
    val agg = spark.sql(
      """SELECT kmv_estimate(kmv_merge(sk)) AS nm FROM (
        |  SELECT kmv_sketch(v, 64) AS sk FROM kmv_a
        |  UNION ALL
        |  SELECT kmv_sketch(v, 64) FROM kmv_b)""".stripMargin)
      .as[Double].head()
    assert(agg == 5.0) // {1,2,3} ∪ {2,3,4,5}
    val row = spark.sql(
      """SELECT kmv_estimate(a.sk) AS na,
        |  kmv_intersect_estimate(a.sk, b.sk) AS ni,
        |  kmv_diff_estimate(a.sk, b.sk) AS nd
        |FROM (SELECT kmv_sketch(v, 64) AS sk FROM kmv_a) a
        |CROSS JOIN (SELECT kmv_sketch(v, 64) AS sk FROM kmv_b) b
        |""".stripMargin).as[(Double, Double, Double)].head()
    assert(row == ((3.0, 2.0, 1.0))) // NULL skipped; {2,3}; {1}
  }

  test("media hashes reachable from SQL, match the kernel APIs") {
    GraftExtensions.register(spark)
    import spark.implicits._
    // authored 9x8 gradient PNG: dHash -1L (every left<right bit set —
    // the m10 derivation); pHash compared against the kernel
    val img = {
      val bi = new java.awt.image.BufferedImage(
        9, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 8; x <- 0 until 9) {
        val g = 28 * x
        bi.setRGB(x, y, (g << 16) | (g << 8) | g)
      }
      val bos = new java.io.ByteArrayOutputStream()
      require(javax.imageio.ImageIO.write(bi, "png", bos), "no png writer")
      bos.toByteArray
    }
    Seq((1L, img), (2L, "not media".getBytes))
      .toDF("id", "content").createOrReplaceTempView("media_in")
    val rows = spark.sql(
      """SELECT id, image_dhash(content) AS dh, image_phash(content) AS ph,
        |       audio_fingerprint(content) AS af, video_signature(content) AS vs
        |FROM media_in ORDER BY id""".stripMargin).collect()
    assert(rows(0).getLong(1) == -1L)
    assert(rows(0).getLong(2) ==
      graft.multimodal.ImageHash.phash64(img).get)
    assert(rows(0).isNullAt(3) && rows(0).isNullAt(4)) // a PNG is not audio/video
    assert(rows(1).isNullAt(1) && rows(1).isNullAt(2) &&
      rows(1).isNullAt(3) && rows(1).isNullAt(4))
    // non-binary argument rejected at analysis
    intercept[Exception](spark.sql("SELECT image_dhash('text')").collect())
    // pdf_text: real document extracts, non-PDF bytes are NULL
    Seq((1L, graft.queries.PdfFixture.simplePdf(
        Seq("BT /F1 12 Tf (sql surface) Tj ET"))),
      (2L, "not a pdf".getBytes))
      .toDF("id", "content").createOrReplaceTempView("pdf_in")
    val pdfRows = spark.sql(
      "SELECT id, pdf_text(content) AS t FROM pdf_in ORDER BY id").collect()
    assert(pdfRows(0).getString(1) == "sql surface")
    assert(pdfRows(1).isNullAt(1))
    // docx_text: OPC body text, non-docx NULL
    Seq((1L, graft.queries.DocxFixture.docx(Seq(
        graft.queries.DocxFixture.para(graft.queries.DocxFixture.T("word body"))))),
      (2L, "nope".getBytes))
      .toDF("id", "content").createOrReplaceTempView("docx_in")
    val dx = spark.sql(
      "SELECT id, docx_text(content) AS t FROM docx_in ORDER BY id").collect()
    assert(dx(0).getString(1) == "word body")
    assert(dx(1).isNullAt(1))
  }

  test("describe function shows usage") {
    GraftExtensions.register(spark)
    val desc = spark.sql("DESCRIBE FUNCTION label_hash_bucket")
      .collect().map(_.getString(0)).mkString("\n")
    assert(desc.contains("privacy bucket"))
  }
}
