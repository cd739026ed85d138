package graft.engine.read

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.EpubFixture

/** EPUB reader against the independent OCF writer ([[EpubFixture]]):
  * the kernel (ZIP walk + spine ordering) directly, the text column
  * through the shared htmlToText cascade.
  */
class EpubSpec extends SparkSpec {
  import spark.implicits._

  test("chapters come back in SPINE order, not file order") {
    val bytes = EpubFixture.epub("Test Book", Seq(
      "ch1.xhtml" -> EpubFixture.xhtml("first chapter"),
      "ch2.xhtml" -> EpubFixture.xhtml("second chapter"),
      "ch3.xhtml" -> EpubFixture.xhtml("third chapter")),
      spineOrder = Seq(2, 0, 1))
    val b = Epub.book(bytes).get
    assert(b.title == "Test Book")
    assert(b.chapters.map(c =>
      if (c.contains("third")) 3 else if (c.contains("first")) 1 else 2)
      == Vector(3, 1, 2))
  }

  test("textCol: chapters through htmlToText, joined by form feed") {
    val bytes = EpubFixture.epub("B", Seq(
      "a.xhtml" -> EpubFixture.xhtml("one &amp; two", "three"),
      "b.xhtml" -> EpubFixture.xhtml("four <b>bold</b> five")))
    val got = Seq(Tuple1(bytes)).toDF("content")
      .select(Epub.textCol(col("content")).as("t"))
      .as[String].head()
    assert(got == "one & two\nthree\ffour bold five")
  }

  test("missing chapter files skip (torn posture); all missing is None") {
    val full = EpubFixture.epub("B", Seq(
      "a.xhtml" -> EpubFixture.xhtml("kept text"),
      "gone.xhtml" -> EpubFixture.xhtml("dropped")))
    // rebuild the zip WITHOUT the second chapter file
    val torn = EpubFixture.zip(Seq(
      "mimetype" -> "application/epub+zip".getBytes("UTF-8")) ++ {
      // reuse the container/opf of a 2-chapter book but ship only ch a
      val b = EpubFixture.epub("B", Seq(
        "a.xhtml" -> EpubFixture.xhtml("kept text"),
        "gone.xhtml" -> EpubFixture.xhtml("dropped")))
      // decode entries of the full book, drop the gone chapter
      val zin = new java.util.zip.ZipInputStream(
        new java.io.ByteArrayInputStream(b))
      val out = Seq.newBuilder[(String, Array[Byte])]
      var e = zin.getNextEntry
      while (e != null) {
        val buf = new java.io.ByteArrayOutputStream()
        val tmp = new Array[Byte](4096)
        var r = zin.read(tmp)
        while (r >= 0) { buf.write(tmp, 0, r); r = zin.read(tmp) }
        if (!e.getName.contains("gone") && e.getName != "mimetype")
          out += e.getName -> buf.toByteArray
        e = zin.getNextEntry
      }
      out.result()
    })
    assert(full != null)
    val book = Epub.book(torn).get
    assert(book.chapters.size == 1 && book.chapters.head.contains("kept"))
  }

  test("hostile and malformed inputs return None") {
    assert(Epub.book(null).isEmpty)
    assert(Epub.book(Array.empty[Byte]).isEmpty)
    assert(Epub.book("not a zip".getBytes).isEmpty)
    // a zip with no container.xml
    assert(Epub.book(EpubFixture.zip(Seq(
      "mimetype" -> "application/epub+zip".getBytes("UTF-8")))).isEmpty)
    // container names a missing OPF
    assert(Epub.book(EpubFixture.zip(Seq(
      "META-INF/container.xml" ->
        """<container><rootfiles><rootfile full-path="nope.opf"/>
          |</rootfiles></container>""".stripMargin.getBytes("UTF-8")))).isEmpty)
    // entry-count bomb: 20001 tiny entries
    val many = EpubFixture.zip(
      (0 to 10000).map(i => s"f$i" -> Array[Byte](1)))
    assert(Epub.book(many, maxEntries = 10000).isEmpty)
    // a DOCTYPE with an external entity is stripped, not fetched
    val xxe = EpubFixture.zip(Seq(
      "META-INF/container.xml" ->
        ("""<!DOCTYPE c [<!ENTITY x SYSTEM "file:///etc/passwd">]>""" +
          """<container><rootfiles>""" +
          """<rootfile full-path="OEBPS/content.opf"/>""" +
          """</rootfiles></container>""").getBytes("UTF-8")))
    assert(Epub.book(xxe).isEmpty) // missing OPF → None, no entity fetch
  }

  test("relative hrefs resolve against the OPF directory") {
    // OPF at OEBPS/content.opf, chapter href with a ../ hop
    val container =
      """<container><rootfiles>
        |<rootfile full-path="OEBPS/content.opf"/>
        |</rootfiles></container>""".stripMargin
    val opf =
      """<package><metadata><title>R</title></metadata>
        |<manifest><item id="c0" href="../text/ch.xhtml"/></manifest>
        |<spine><itemref idref="c0"/></spine></package>""".stripMargin
    val bytes = EpubFixture.zip(Seq(
      "META-INF/container.xml" -> container.getBytes("UTF-8"),
      "OEBPS/content.opf" -> opf.getBytes("UTF-8"),
      "text/ch.xhtml" -> EpubFixture.xhtml("relative ok").getBytes("UTF-8")))
    assert(Epub.book(bytes).exists(_.chapters.head.contains("relative ok")))
  }
}
