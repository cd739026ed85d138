package graft.engine.validate

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.HeifFixture

/** HEIC/AVIF metadata probe vs the INDEPENDENT box writer. */
class HeifSpec extends AnyFunSuite {

  test("primary item's ispe wins over a leading thumbnail's (the " +
    "phone-HEIC shape)") {
    // ipco: [hvcC][thumb ispe 32x24][main ispe 640x480];
    // item 1 = main (props 1,3), item 2 = thumb (props 1,2)
    val b = HeifFixture.heif("heic", Seq("mif1", "heic"), Some(1),
      Seq(HeifFixture.codecConfig("hvcC"),
        HeifFixture.ispe(32, 24), HeifFixture.ispe(640, 480)),
      Seq(1 -> Seq(1, 3), 2 -> Seq(1, 2)))
    assert(Heif.isHeif(b))
    assert(Heif.meta(b).contains(Heif.Meta("heic", 640, 480)))
    assert(ImageProbe.dimensions(b).contains((640, 480)))
    // the naive first-ispe answer (32x24) would be wrong
  }

  test("brand mapping: avif, heic via compatibles, bare mif1") {
    val av = HeifFixture.heif("avif", Seq("avif", "mif1"), Some(1),
      Seq(HeifFixture.ispe(123, 77)), Seq(1 -> Seq(1)))
    assert(Heif.meta(av).contains(Heif.Meta("avif", 123, 77)))
    // major brand generic, HEVC brand only in compatibles
    val compat = HeifFixture.heif("mif1", Seq("mif1", "heix"), Some(1),
      Seq(HeifFixture.ispe(5, 6)), Seq(1 -> Seq(1)))
    assert(Heif.meta(compat).map(_.format).contains("heic"))
    val bare = HeifFixture.heif("mif1", Seq("mif1"), Some(1),
      Seq(HeifFixture.ispe(5, 6)), Seq(1 -> Seq(1)))
    assert(Heif.meta(bare).map(_.format).contains("heif"))
  }

  test("wide (15-bit) ipma indices parse; missing pitm falls back " +
    "to the largest extents") {
    val wide = HeifFixture.heif("avif", Seq("avif"), Some(1),
      Seq(HeifFixture.ispe(200, 100)), Seq(1 -> Seq(1)), wide = true)
    assert(Heif.meta(wide).contains(Heif.Meta("avif", 200, 100)))
    val noPitm = HeifFixture.heif("heic", Seq("heic"), None,
      Seq(HeifFixture.ispe(32, 24), HeifFixture.ispe(640, 480)),
      Seq(1 -> Seq(1)))
    assert(Heif.meta(noPitm).map(m => (m.width, m.height))
      .contains((640, 480)))
  }

  test("hostility: truncation at every prefix never throws; junk " +
    "and other formats refuse") {
    val b = HeifFixture.heif("heic", Seq("mif1", "heic"), Some(1),
      Seq(HeifFixture.codecConfig("hvcC"), HeifFixture.ispe(9, 8)),
      Seq(1 -> Seq(1, 2)))
    for (cut <- 0 to b.length) {
      val t = java.util.Arrays.copyOfRange(b, 0, cut)
      Heif.meta(t) // must not throw
      ImageProbe.dimensions(t)
    }
    assert(!Heif.isHeif("plain text".getBytes("US-ASCII")))
    assert(!Heif.isHeif(Array[Byte](0, 0, 0, 0)))
    assert(Heif.meta(null).isEmpty)
    // an mp4 ftyp (video brand) is NOT a heif
    val mp4 = HeifFixture.ftyp("isom", Seq("isom", "mp42"))
    assert(!Heif.isHeif(mp4 ++ Array[Byte](0, 0, 0, 8) ++
      "free".getBytes("US-ASCII")))
    // a heif whose meta box is absent probes the brand but no dims
    val noMeta = HeifFixture.ftyp("heic", Seq("heic")) ++
      HeifFixture.box("mdat", Array[Byte](1))
    assert(Heif.isHeif(noMeta) && Heif.meta(noMeta).isEmpty)
    assert(ImageProbe.dimensions(noMeta).isEmpty)
    assert(ImageProbe.diagnose(noMeta) == "image header could not be decoded")
  }
}
