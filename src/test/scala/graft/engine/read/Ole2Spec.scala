package graft.engine.read

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.LegacyDocFixture

class Ole2Spec extends AnyFunSuite {

  test("big streams round-trip through FAT chains") {
    val big = Array.tabulate[Byte](5000)(i => (i % 251).toByte)
    val c = LegacyDocFixture.cfb(Seq("BigStream" -> big))
    val got = Ole2.streams(c).get
    assert(got.keySet == Set("BigStream"))
    assert(java.util.Arrays.equals(got("BigStream"), big))
  }

  test("small streams round-trip through the miniFAT + mini stream") {
    val a = "tiny stream a".getBytes
    val b = Array.tabulate[Byte](200)(i => (i * 7 % 127).toByte)
    val c = LegacyDocFixture.cfb(Seq("A" -> a, "B" -> b))
    val got = Ole2.streams(c).get
    assert(java.util.Arrays.equals(got("A"), a))
    assert(java.util.Arrays.equals(got("B"), b))
  }

  test("mixed mini and big streams coexist") {
    val big = Array.fill[Byte](4096)(42)
    val small = "mini".getBytes
    val got = Ole2.streams(LegacyDocFixture.cfb(
      Seq("Big" -> big, "Small" -> small))).get
    assert(java.util.Arrays.equals(got("Big"), big))
    assert(java.util.Arrays.equals(got("Small"), small))
  }

  test("multi-sector directory (many streams) walks linearly") {
    val streams = (0 until 10).map(i => s"S$i" -> s"content $i".getBytes)
    val got = Ole2.streams(LegacyDocFixture.cfb(streams)).get
    assert(got.size == 10)
    (0 until 10).foreach { i =>
      assert(new String(got(s"S$i")) == s"content $i")
    }
  }

  test("classify names the legacy kind from stream names") {
    assert(Ole2.classify(LegacyDocFixture.cfb(
      Seq("WordDocument" -> Array[Byte](1), "0Table" -> Array[Byte](1))))
      .contains("doc"))
    assert(Ole2.classify(LegacyDocFixture.cfb(
      Seq("Workbook" -> Array[Byte](1)))).contains("xls"))
    assert(Ole2.classify(LegacyDocFixture.cfb(
      Seq("PowerPoint Document" -> Array[Byte](1)))).contains("ppt"))
    assert(Ole2.classify(LegacyDocFixture.cfb(
      Seq("EncryptionInfo" -> Array[Byte](1),
        "EncryptedPackage" -> Array[Byte](1)))).contains("encrypted-ooxml"))
    assert(Ole2.classify(LegacyDocFixture.cfb(
      Seq("Whatever" -> Array[Byte](1)))).contains("cfb"))
    assert(Ole2.classify("not cfb".getBytes).isEmpty)
  }

  test("hostile inputs return None instead of looping or throwing") {
    assert(Ole2.streams(null).isEmpty)
    assert(Ole2.streams(Array[Byte]()).isEmpty)
    assert(Ole2.streams("PK not cfb".getBytes).isEmpty)
    // magic but truncated header
    assert(Ole2.streams(Ole2.Magic ++ Array.fill[Byte](100)(0)).isEmpty)
    // a FAT cycle must terminate: corrupt the FAT so a chain points
    // at itself
    val good = LegacyDocFixture.cfb(Seq("S" -> Array.fill[Byte](5000)(1)))
    // find the FAT sector (last sector) and make entry 0 point to 0
    val corrupt = good.clone()
    // directory chain start = sector 0 per the fixture layout; make
    // FAT[dirStart] self-referential by scanning for a FAT sector.
    // Cheaper: just flip every 4-byte word in the last sector to 0.
    val lastOff = corrupt.length - 512
    (0 until 512 by 4).foreach { i =>
      corrupt(lastOff + i) = 0; corrupt(lastOff + i + 1) = 0
      corrupt(lastOff + i + 2) = 0; corrupt(lastOff + i + 3) = 0
    }
    // must return (possibly None or truncated) without hanging
    Ole2.streams(corrupt)
    succeed
  }

  test("nested-storage streams get storage-qualified paths; root keeps bare names") {
    val host = "deck bytes".getBytes
    val embedded = "embedded word text".getBytes
    val c = LegacyDocFixture.cfbNested(
      Seq("PowerPoint Document" -> host),
      Seq("ObjectPool" -> Seq("WordDocument" -> embedded)))
    val got = Ole2.streams(c).get
    assert(got.keySet == Set("PowerPoint Document", "ObjectPool/WordDocument"))
    assert(java.util.Arrays.equals(got("PowerPoint Document"), host))
    assert(java.util.Arrays.equals(got("ObjectPool/WordDocument"), embedded))
  }

  test("classification ignores an embedded object's WordDocument (host wins)") {
    // a .ppt carrying an embedded Word OLE object must classify ppt,
    // not doc - the pre-fix failure mode (flat map, doc-first check)
    val c = LegacyDocFixture.cfbNested(
      Seq("PowerPoint Document" -> "deck".getBytes),
      Seq("ObjectPool" -> Seq("WordDocument" -> "embedded".getBytes)))
    assert(Ole2.classify(c).contains("ppt"))
    // same for an .xls host
    val x = LegacyDocFixture.cfbNested(
      Seq("Workbook" -> "wb".getBytes),
      Seq("MBD0001" -> Seq("WordDocument" -> "embedded".getBytes)))
    assert(Ole2.classify(x).contains("xls"))
  }

  test("duplicate stream names across storages stay distinct") {
    val c = LegacyDocFixture.cfbNested(
      Seq("WordDocument" -> "host doc".getBytes),
      Seq("ObjectPool" -> Seq("WordDocument" -> "nested doc".getBytes)))
    val got = Ole2.streams(c).get
    assert(new String(got("WordDocument")) == "host doc")
    assert(new String(got("ObjectPool/WordDocument")) == "nested doc")
    assert(Ole2.classify(c).contains("doc"))
  }

  test("torn sibling tree falls back to bare-name recovery") {
    val c = LegacyDocFixture.cfb(Seq(
      "WordDocument" -> "body".getBytes, "1Table" -> "tbl".getBytes))
    // sever the tree: root entry lives at dir slot 0 (sector 0 =
    // file offset 512); its child pointer at +76 -> NOSTREAM
    val torn = c.clone()
    (0 until 4).foreach(i => torn(512 + 76 + i) = 0xFF.toByte)
    val got = Ole2.streams(torn).get
    assert(got.keySet == Set("WordDocument", "1Table"))
    assert(Ole2.classify(torn).contains("doc"))
  }
}
