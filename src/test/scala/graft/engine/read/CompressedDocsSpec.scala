package graft.engine.read

import org.scalatest.funsuite.AnyFunSuite

/** Compressed single documents through the probe: a crawl column's
  * `.txt.gz`/`.html.zst`/`.rtf.bz2`/`.eml.xz` blobs must route
  * exactly like their plain twins — inner format reported, text/
  * title/author/date extracted — while magic collisions, nesting
  * bombs and torn streams stay safe.
  */
class CompressedDocsSpec extends AnyFunSuite {

  private def gz(b: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(bos); g.write(b); g.close()
    bos.toByteArray
  }
  private def zst(b: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val z = new com.github.luben.zstd.ZstdOutputStream(bos)
    z.write(b); z.close(); bos.toByteArray
  }
  private def bz2(b: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val z = new org.apache.commons.compress.compressors.bzip2
      .BZip2CompressorOutputStream(bos)
    z.write(b); z.close(); bos.toByteArray
  }
  private def xz(b: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val x = new org.tukaani.xz.XZOutputStream(bos,
      new org.tukaani.xz.LZMA2Options())
    x.write(b); x.close(); bos.toByteArray
  }
  private def sz(b: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val s = new org.xerial.snappy.SnappyFramedOutputStream(bos)
    s.write(b); s.close(); bos.toByteArray
  }

  test("xz -9 preset (64 MiB declared dictionary) decodes: the " +
    "memlimit admits every standard preset") {
    // `xz -9` declares a 64 MiB LZMA2 dictionary; the decoder charges
    // dictSize + ~100 KiB, which a 64 MiB memlimit rejected (r16
    // regression: such blobs decoded to empty and routed as unknown
    // binary — silent corpus loss). The 128 MiB cap must admit it.
    val opts = new org.tukaani.xz.LZMA2Options(9)
    assert(opts.getDictSize == (64 << 20))
    val bos = new java.io.ByteArrayOutputStream()
    val x = new org.tukaani.xz.XZOutputStream(bos, opts)
    x.write("xz nine preset payload".getBytes("UTF-8")); x.close()
    val blob = bos.toByteArray
    assert(DocumentProbe.probe(blob).exists(_.format == "txt"))
    assert(DocumentProbe.extractText(blob)
      .contains("xz nine preset payload"))
  }

  test("each codec unwraps to the inner format, text and metadata") {
    val html = ("<html><head><title>Zipped Page</title></head>" +
      "<body><p>compressed body</p></body></html>").getBytes("UTF-8")
    val rtf = "{\\rtf1{\\info{\\title R}}rtf body\\par}".getBytes("ISO-8859-1")
    val eml = ("From: a@b.c\r\nTo: l@b.c\r\nSubject: S\r\n\r\nmail body")
      .getBytes("UTF-8")
    val txt = "plain compressed text".getBytes("UTF-8")

    assert(DocumentProbe.probe(gz(txt)).exists(_.format == "txt"))
    assert(DocumentProbe.extractText(gz(txt))
      .contains("plain compressed text"))
    assert(DocumentProbe.probe(zst(html)).exists(_.format == "html"))
    assert(DocumentProbe.title(zst(html)).contains("Zipped Page"))
    assert(DocumentProbe.probe(bz2(rtf)).exists(_.format == "rtf"))
    assert(DocumentProbe.extractText(bz2(rtf)).contains("rtf body"))
    assert(DocumentProbe.title(bz2(rtf)).contains("R"))
    assert(DocumentProbe.probe(xz(eml)).exists(_.format == "eml"))
    assert(DocumentProbe.author(xz(eml)).contains("a@b.c"))
    // framed snappy (r16): the .sz blob routes like its plain twin
    assert(DocumentProbe.probe(sz(txt)).exists(_.format == "txt"))
    assert(DocumentProbe.extractText(sz(html))
      .exists(_.contains("compressed body")))
    // inventory matches the single kernels through the wrap
    val inv = DocumentProbe.inventory(zst(html))
    assert(inv.format.contains("html") &&
      inv.title.contains("Zipped Page") &&
      inv.text.exists(_.contains("compressed body")))
  }

  test("double compression unwraps; a 4-layer nest refuses") {
    val txt = "nested text".getBytes("UTF-8")
    assert(DocumentProbe.extractText(gz(zst(txt))).contains("nested text"))
    assert(DocumentProbe.extractText(xz(bz2(gz(txt))))
      .contains("nested text"))
    val bomb = gz(gz(gz(gz(txt))))
    assert(DocumentProbe.probe(bomb).isEmpty)
    assert(DocumentProbe.extractText(bomb).isEmpty)
  }

  test("magic collisions and torn streams stay safe") {
    // a text file that merely STARTS with the bzip2 magic
    val fakeBz = "BZh9 is how every bzip2 file begins".getBytes("UTF-8")
    assert(DocumentProbe.probe(fakeBz).exists(_.format == "txt"))
    assert(DocumentProbe.extractText(fakeBz)
      .contains("BZh9 is how every bzip2 file begins"))
    // LAYERED collision: gzip of that same text — layer 1
    // decompresses fine, layer 2's bzip2 construction fails, and the
    // row must fall back to layer 1's output and route as txt
    // exactly like its uncompressed twin above
    assert(DocumentProbe.probe(gz(fakeBz)).exists(_.format == "txt"))
    assert(DocumentProbe.extractText(gz(fakeBz))
      .contains("BZh9 is how every bzip2 file begins"))
    val inv = DocumentProbe.inventory(gz(fakeBz))
    assert(inv.format.contains("txt") &&
      inv.text.exists(_.contains("BZh9 is how every bzip2 file begins")))
    // torn gzip of a long-enough payload keeps the bytes present
    val long = ("long enough body " * 50).getBytes("UTF-8")
    val whole = gz(long)
    val torn = java.util.Arrays.copyOfRange(whole, 0, whole.length / 2)
    DocumentProbe.probe(torn) // must not throw
    DocumentProbe.extractText(torn)
    // truncated to just the magic: never throws
    for (codec <- Seq(gz(long), zst(long), bz2(long), xz(long), sz(long));
         cut <- Seq(4, 6, 10)) {
      val t = java.util.Arrays.copyOfRange(codec, 0, cut)
      DocumentProbe.probe(t)
      DocumentProbe.inventory(t)
    }
  }
}
