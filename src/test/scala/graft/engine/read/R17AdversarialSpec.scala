package graft.engine.read

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.validate.{AudioProbe, ExifProbe, Heif}
import graft.multimodal.Ccitt

/** Adversarial pass over the round-17 surfaces (the R14/R16
  * discipline): every kernel added this round is driven with the
  * inputs an attacker or a corrupted crawl would supply. The
  * contract everywhere: bounded work, None/empty, never a throw,
  * never an output that silently lies.
  */
class R17AdversarialSpec extends AnyFunSuite {

  private val junks: Seq[Array[Byte]] = Seq(
    Array.emptyByteArray,
    Array[Byte](0),
    Array.fill[Byte](512)(0x41),
    Array.tabulate[Byte](4096)(i => (i * 31).toByte),
    Array.fill[Byte](64)(0xFF.toByte))

  test("every r17 kernel survives the junk battery") {
    junks.foreach { b =>
      Ccitt.decode(b, 64, 64, -1)
      Ccitt.decode(b, 64, 64, 0)
      Ccitt.decode(b, 64, 64, 4, encodedByteAlign = true)
      Ccitt.decodeTiffImage(b)
      SevenZ.entries(b)
      DataFiles.sqliteTables(b)
      DataFiles.npyInfo(b)
      DataFiles.hdf5SuperblockVersion(b)
      DataFiles.avroRecordCount(b)
      DataFiles.parquetRowCount(b)
      DataFiles.orcRowCount(b)
      DataFiles.arrowRecordCount(b)
      DataFiles.inventory(b)
      ExifProbe.gps(b)
      ExifProbe.stripGps(b)
      AudioProbe.adtsInfo(b)
      AudioProbe.tags(b)
      Heif.exifTiffOffset(b)
    }
  }

  test("CCITT: EOL floods, make-up-only streams and fill-bit walls " +
    "terminate bounded instead of spinning") {
    // 4 KB of zeros = an endless fill/EOL-prefix wall
    val zeros = Array.fill[Byte](4096)(0)
    assert(Ccitt.decode(zeros, 1728, 4, 0).isEmpty)
    assert(Ccitt.decode(zeros, 1728, 4, 4).isEmpty)
    assert(Ccitt.decode(zeros, 1728, 4, -1).isEmpty)
    // EOL flood: hundreds of EOLs, no line data — must refuse, not
    // emit blank lines forever
    val eolBits = new java.io.ByteArrayOutputStream()
    (0 until 512).foreach { _ => eolBits.write(0x00); eolBits.write(0x10) }
    assert(Ccitt.decode(eolBits.toByteArray, 64, 8, 0).isEmpty)
    // make-up codes with no terminating code: the run loop caps
    // (white 2560 make-up = 000000011111 repeated)
    val mk = new java.io.ByteArrayOutputStream()
    (0 until 256).foreach { _ => mk.write(0x01); mk.write(0xF0) }
    assert(Ccitt.decode(mk.toByteArray, 1 << 16, 1, 0).isEmpty)
    // declared raster at the pixel cap refuses before any allocation
    assert(Ccitt.decode(Array.fill[Byte](8)(0x55), 1 << 16, 1 << 20, -1)
      .isEmpty)
  }

  test("7z: lying declared sizes and header bombs refuse at the caps") {
    val good = graft.queries.SevenZFixture.sevenZ(Seq(
      "a" -> Array.fill[Byte](64)(0x42)))
    // flip a byte inside the property-coded header region: the
    // start-header CRC/structure catches it → None, no throw
    for (i <- (good.length - 40) until good.length) {
      val bad = good.clone(); bad(i) = (bad(i) ^ 0x5A).toByte
      SevenZ.entries(bad)
    }
    // a member over the member cap refuses the archive
    val big = graft.queries.SevenZFixture.sevenZ(Seq(
      "big" -> Array.fill[Byte](1024)(0x41)))
    assert(SevenZ.entries(big, maxMemberBytes = 512).isEmpty)
    // entry-count cap
    val many = graft.queries.SevenZFixture.sevenZ(
      (0 until 8).map(i => s"f$i" -> Array[Byte](1, 2, 3)))
    assert(SevenZ.entries(many, maxEntries = 4).isEmpty)
    assert(SevenZ.entries(many).exists(_.length == 8))
  }

  test("sqlite: self-referential and cyclic b-tree pages terminate " +
    "via the visited set; huge varints refuse") {
    // hand-build a 512-byte-page db whose schema leaf cell points a
    // table's rootpage back at page 1 (cycle) — count must terminate
    val db = {
      val b = new Array[Byte](1024)
      "SQLite format 3".getBytes("US-ASCII").copyToArray(b, 0)
      b(15) = 0
      b(16) = 0x02; b(17) = 0x00 // page size 512
      b(28) = 0; b(29) = 0; b(30) = 0; b(31) = 2 // 2 pages
      // page 1 b-tree header at 100: leaf table, 1 cell at offset 200
      b(100) = 0x0D
      b(103) = 0; b(104) = 1 // one cell
      b(108) = 0; b(109) = 200.toByte // cell pointer
      // cell at 200: payload len, rowid, record header
      // record: [type text5('table'), name text2('t'), tbl text2('t'),
      //          rootpage int(1)=1, sql null]
      val rec = Array[Byte](
        6, // header len (varint counts itself)
        (13 + 2 * 5).toByte, // 'table' text serial (13+2n)
        (13 + 2 * 1).toByte, // 't'
        (13 + 2 * 1).toByte, // 't'
        1, // rootpage int8
        0  // sql null
      ) ++ "tablett".getBytes("US-ASCII") ++ Array[Byte](1)
      b(200) = rec.length.toByte // payload length varint
      b(201) = 1 // rowid varint
      rec.copyToArray(b, 202)
      b
    }
    // rootpage 1 = the schema page itself: the seen-set stops the
    // recursion; the count is bounded, no stack overflow
    DataFiles.sqliteTables(db)
    // 9-byte varint with all continuation bits inside a cell
    val vb = db.clone()
    (200 until 209).foreach(i => vb(i) = 0xFF.toByte)
    DataFiles.sqliteTables(vb)
  }

  test("avro/orc/npy: negative counts, reserved codecs and huge " +
    "headers refuse") {
    // avro container with a NEGATIVE block record count
    val schema = new org.apache.avro.Schema.Parser().parse(
      """{"type":"record","name":"R","fields":[
        |{"name":"s","type":"string"}]}""".stripMargin)
    val w = new org.apache.avro.file.DataFileWriter(
      new org.apache.avro.generic.GenericDatumWriter[
        org.apache.avro.generic.GenericRecord](schema))
    val bos = new java.io.ByteArrayOutputStream()
    w.create(schema, bos)
    val r = new org.apache.avro.generic.GenericData.Record(schema)
    r.put("s", "x"); w.append(r); w.close()
    val avro = bos.toByteArray
    assert(DataFiles.avroRecordCount(avro).contains(1L))
    // zig-zag(-1) = 0x01: patch the first block's count byte
    // (directly after the 16-byte sync at the end of the header)
    val negAt = avro.length - 1 - 16 - 2 /* count+size for 1 tiny rec */
    val neg = avro.clone()
    neg(negAt + 1) = 0x01 // best-effort position; must not throw
    DataFiles.avroRecordCount(neg)
    // ORC postscript declaring LZO (codec 3) → recorded-skip None
    // (build: valid file, then patch the compression enum is fragile;
    // instead: a postscript-only fabrication)
    val orcLzo = "ORC".getBytes("US-ASCII") ++
      Array.fill[Byte](40)(0x00) ++
      Array[Byte](0x08, 0x04, 0x10, 0x03) ++ // footerLen=4, comp=3
      Array[Byte](4) // psLen
    assert(DataFiles.orcRowCount(orcLzo).isEmpty)
    // npy with a header length far beyond the buffer
    val npy = Array[Byte](0x93.toByte, 'N', 'U', 'M', 'P', 'Y', 1, 0,
      0xFF.toByte, 0xFF.toByte)
    assert(DataFiles.npyInfo(npy).isEmpty)
  }

  test("GPS strip: a GPS pointer aimed INTO IFD0 itself cannot make " +
    "the strip throw or change the buffer length") {
    // gpsExif-style TIFF but 0x8825 points at offset 8 (IFD0)
    def le16(v: Int) = Array[Byte]((v & 0xff).toByte, (v >> 8).toByte)
    def le32(v: Int) = le16(v & 0xffff) ++ le16(v >>> 16)
    val t = "II".getBytes ++ le16(42) ++ le32(8) ++
      le16(2) ++
      le16(0x0112) ++ le16(3) ++ le32(1) ++ le16(6) ++ le16(0) ++
      le16(0x8825) ++ le16(4) ++ le32(1) ++ le32(8) ++ // GPS → IFD0!
      le32(0)
    val out = ExifProbe.stripGps(t)
    assert(out.length == t.length) // bounded, no throw
    ExifProbe.gps(out); ExifProbe.info(out)
    // and one pointing past the end
    val far = t.clone()
    far(30) = 0xF0.toByte; far(31) = 0xFF.toByte
    ExifProbe.stripGps(far)
  }

  test("audio: ADTS frame declaring frameLen smaller than its header " +
    "refuses; a comment at the 256-count cap parses, 257 refuses") {
    // frameLen = 3 (< 7-byte header): adtsFrame must refuse
    val tiny = Array[Byte](0xFF.toByte, 0xF1.toByte,
      (1 << 6 | 4 << 2).toByte, 0x00, 0x00, 0x60, 0xFC.toByte) ++
      Array.fill[Byte](32)(0)
    assert(AudioProbe.adtsInfo(tiny).isEmpty)
    def le32(v: Long) = Array((v & 0xFF).toByte,
      ((v >> 8) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
      ((v >> 24) & 0xFF).toByte)
    def flacWith(n: Int): Array[Byte] = {
      val pairs = (0 until n).flatMap { i =>
        val c = s"K$i=v".getBytes("UTF-8")
        (le32(c.length.toLong) ++ c).toSeq
      }
      val cm = le32(1) ++ "v".getBytes ++ le32(n.toLong) ++ pairs
      "fLaC".getBytes("US-ASCII") ++
        Array(0x84.toByte, ((cm.length >> 16) & 0xff).toByte,
          ((cm.length >> 8) & 0xff).toByte, (cm.length & 0xff).toByte) ++
        cm
    }
    assert(AudioProbe.tags(flacWith(256)).exists(_.length == 256))
    assert(AudioProbe.tags(flacWith(257)).isEmpty)
  }
}
