package graft.queries

import java.nio.charset.StandardCharsets.UTF_8

/** INDEPENDENT spec-side EPUB writer for gate fixtures (the m28/
  * PdfFixture discipline): the OCF ZIP is written by the JDK's own
  * `ZipOutputStream` (a third party to the reader's `ZipInputStream`
  * walk), the container/OPF XML forward from the public EPUB 3
  * structure — no code shared with [[graft.engine.read.Epub]].
  */
object EpubFixture {

  def zip(entries: Seq[(String, Array[Byte])]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(bos)
    entries.foreach { case (name, content) =>
      z.putNextEntry(new java.util.zip.ZipEntry(name))
      z.write(content)
      z.closeEntry()
    }
    z.close()
    bos.toByteArray
  }

  /** A minimal valid book: chapters as (filename, xhtml) under
    * `OEBPS/`, spine in the given order. `spineOrder` indexes into
    * `chapters` so a fixture can shuffle reading order vs file order.
    */
  def epub(title: String, chapters: Seq[(String, String)],
           spineOrder: Seq[Int] = Seq.empty): Array[Byte] = {
    val order = if (spineOrder.isEmpty) chapters.indices else spineOrder
    val container =
      """<?xml version="1.0"?>
        |<container version="1.0"
        |    xmlns="urn:oasis:names:tc:opendocument:xmlns:container">
        |  <rootfiles>
        |    <rootfile full-path="OEBPS/content.opf"
        |        media-type="application/oebps-package+xml"/>
        |  </rootfiles>
        |</container>""".stripMargin
    val manifest = chapters.zipWithIndex.map { case ((f, _), i) =>
      s"""<item id="c$i" href="$f" media-type="application/xhtml+xml"/>"""
    }.mkString("\n    ")
    val spine = order.map(i => s"""<itemref idref="c$i"/>""")
      .mkString("\n    ")
    val opf =
      s"""<?xml version="1.0"?>
         |<package xmlns="http://www.idpf.org/2007/opf" version="3.0"
         |    unique-identifier="uid">
         |  <metadata xmlns:dc="http://purl.org/dc/elements/1.1/">
         |    <dc:title>$title</dc:title>
         |    <dc:creator>epub author</dc:creator>
         |    <dc:date>2022-02-02</dc:date>
         |    <dc:identifier id="uid">fixture-book</dc:identifier>
         |  </metadata>
         |  <manifest>
         |    $manifest
         |  </manifest>
         |  <spine>
         |    $spine
         |  </spine>
         |</package>""".stripMargin
    zip(Seq(
      "mimetype" -> "application/epub+zip".getBytes(UTF_8),
      "META-INF/container.xml" -> container.getBytes(UTF_8),
      "OEBPS/content.opf" -> opf.getBytes(UTF_8)) ++
      chapters.map { case (f, x) => s"OEBPS/$f" -> x.getBytes(UTF_8) })
  }

  def xhtml(paragraphs: String*): String =
    "<html><head></head><body>" +
      paragraphs.map(p => s"<p>$p</p>").mkString + "</body></html>"
}
