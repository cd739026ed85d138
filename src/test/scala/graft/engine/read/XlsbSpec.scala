package graft.engine.read

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.XlsbFixture

/** The binary workbook against the independent spec-side writer:
  * record framing, SST refs/inline/formula strings, workbook-order
  * sheets, rich-run skipping, torn parts, probe routing.
  */
class XlsbSpec extends AnyFunSuite {

  test("shared-string refs, inline and formula strings in order; " +
    "numbers and row headers skip") {
    val b = XlsbFixture.xlsb1(Seq(
      XlsbFixture.rowHdr(0),
      XlsbFixture.cellIsst(0, 0),
      XlsbFixture.cellReal(1, 42.5),
      XlsbFixture.cellSt(2, "inline text"),
      XlsbFixture.fmlaString(3, "formula result"),
      XlsbFixture.cellIsst(4, 1)),
      sharedStrings = Some(Seq(
        XlsbFixture.sstItem("alpha"),
        XlsbFixture.sstItem("beta"))))
    val t = Xlsb.extractText(b).get
    assert(t.nParagraphs == 4)
    assert(t.text == "alpha\ninline text\nformula result\nbeta")
  }

  test("rich SST items skip their runs by record size; duplicates " +
    "repeat; out-of-range refs drop") {
    val b = XlsbFixture.xlsb1(Seq(
      XlsbFixture.cellIsst(0, 0),
      XlsbFixture.cellIsst(1, 0),
      XlsbFixture.cellIsst(2, 99)),
      sharedStrings = Some(Seq(
        XlsbFixture.sstItem("rich string", richRuns = 2))))
    val t = Xlsb.extractText(b).get
    assert(t.text == "rich string\nrich string")
  }

  test("sheets read in WORKBOOK order via rels even with scrambled " +
    "member names") {
    val b = XlsbFixture.xlsb(Seq(
      ("rId2", "Second", Seq(XlsbFixture.cellSt(0, "from second"))),
      ("rId1", "First", Seq(XlsbFixture.cellSt(0, "from first")))),
      sharedStrings = None, scrambleNames = true)
    assert(Xlsb.extractText(b).get.text == "from second\nfrom first")
  }

  test("the probe routes xlsb by its .bin main part, with OPC title") {
    val b = XlsbFixture.xlsb(Seq(
      ("rId1", "S", Seq(XlsbFixture.cellSt(0, "xlsb body")))),
      sharedStrings = None, coreTitle = Some("Binary Book"))
    assert(DocumentProbe.probe(b).exists(_.format == "xlsb"))
    assert(DocumentProbe.extractText(b).contains("xlsb body"))
    assert(DocumentProbe.title(b).contains("Binary Book"))
    val inv = DocumentProbe.inventory(b)
    assert(inv.format.contains("xlsb") && inv.text.contains("xlsb body"))
  }

  test("xlsb_text SQL function surfaces the kernel") {
    val spark = graft.SparkSpec.session
    graft.GraftExtensions.register(spark)
    import spark.implicits._
    Seq(
      (1L, XlsbFixture.xlsb1(Seq(XlsbFixture.cellSt(0, "sql cell")),
        sharedStrings = None)),
      (2L, Array[Byte](0, 1, 2))).toDF("id", "content")
      .createOrReplaceTempView("xlsbs")
    val got = spark.sql(
      "SELECT id, xlsb_text(content) AS t FROM xlsbs ORDER BY id").collect()
    assert(got(0).getString(1) == "sql cell")
    assert(got(1).isNullAt(1))
  }

  test("torn parts and junk never throw: cells read so far survive") {
    val good = XlsbFixture.xlsb1(Seq(
      XlsbFixture.cellSt(0, "kept"),
      XlsbFixture.cellSt(1, "lost in the tear")),
      sharedStrings = None)
    // tear the sheet part mid-record
    val files = ZipRead.entries(good, Epub.DefaultMaxTotalBytes,
      Epub.DefaultMaxEntries).get
    val sheet = files("xl/worksheets/sheet1.bin")
    val torn = files.updated("xl/worksheets/sheet1.bin",
      java.util.Arrays.copyOfRange(sheet, 0, sheet.length - 5))
    val t = Xlsb.extractFrom(torn)
    assert(t.exists(_.text == "kept"))
    // junk part bytes: zero cells, never a throw
    val junk = files.updated("xl/worksheets/sheet1.bin",
      Array.fill[Byte](64)(0x7F))
    assert(Xlsb.extractFrom(junk).exists(_.nParagraphs == 0))
    assert(Xlsb.extractText("not a zip".getBytes).isEmpty)
    assert(Xlsb.extractText(null).isEmpty)
  }
}
