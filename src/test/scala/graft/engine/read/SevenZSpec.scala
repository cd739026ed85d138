package graft.engine.read

import org.scalatest.funsuite.AnyFunSuite

/** 7z source contract: the commons-compress reader against the
  * FROM-SPEC fixture writer (`SevenZFixture` — 7zFormat.txt
  * structures hand-encoded; LZMA2 payloads from org.tukaani.xz, a
  * third implementation). Two independent implementations on every
  * assertion — the inverse of the usual house pattern.
  */
class SevenZSpec extends AnyFunSuite {

  private val files = Seq(
    "a.txt" -> "seven zip member alpha".getBytes("UTF-8"),
    "dir/b.bin" -> Array.tabulate[Byte](300)(i => (i * 7).toByte),
    "c.txt" -> ("repeated payload " * 40).getBytes("UTF-8"))

  test("copy-coded archive: member names, order and exact bytes") {
    val z = graft.queries.SevenZFixture.sevenZ(files)
    assert(SevenZ.isSevenZ(z))
    val got = SevenZ.entries(z).get
    assert(got.map(_._1) == files.map(_._1))
    got.zip(files).foreach { case ((_, gb), (_, eb)) =>
      assert(java.util.Arrays.equals(gb, eb))
    }
  }

  test("LZMA2-coded archive: same members decode byte-exactly " +
    "(compressed smaller than the repeated payload)") {
    val z = graft.queries.SevenZFixture.sevenZ(files, lzma2 = true)
    val plain = graft.queries.SevenZFixture.sevenZ(files)
    assert(z.length < plain.length) // the repeats actually compress
    val got = SevenZ.entries(z).get
    assert(got.map(_._1) == files.map(_._1))
    got.zip(files).foreach { case ((_, gb), (_, eb)) =>
      assert(java.util.Arrays.equals(gb, eb))
    }
  }

  test("hostility: every prefix refuses cleanly; caps hold; junk " +
    "with the magic refuses") {
    val z = graft.queries.SevenZFixture.sevenZ(files, lzma2 = true)
    (0 until z.length).foreach { n =>
      SevenZ.entries(z.take(n)) // no throw; strict prefix never decodes
    }
    assert(SevenZ.entries("not a seven zip".getBytes).isEmpty)
    val tornMagic = z.take(32) ++ Array.fill[Byte](16)(0x41)
    assert(SevenZ.entries(tornMagic).isEmpty)
    // member-size cap: the 300-byte member exceeds a 100-byte cap
    assert(SevenZ.entries(z, maxMemberBytes = 100).isEmpty)
    assert(SevenZ.entries(z, maxEntries = 2).isEmpty)
    assert(SevenZ.entries(null).isEmpty)
  }

  test("memberInventories routes a 7z like its tar/zip siblings; " +
    "nested 7z refuses at depth 1") {
    val inner = graft.queries.SevenZFixture.sevenZ(Seq(
      "t.txt" -> "text inside the seven zip".getBytes("UTF-8")))
    val rtf = "{\\rtf1 rtf member body\\par}".getBytes("ISO-8859-1")
    val z = graft.queries.SevenZFixture.sevenZ(Seq(
      "doc.rtf" -> rtf, "nested.7z" -> inner), lzma2 = true)
    val rows = DocumentProbe.memberInventories(z)
    assert(rows.map(_._1) == Seq(Some("doc.rtf"), Some("nested.7z")))
    assert(rows(0)._2.format.contains("rtf"))
    assert(rows(0)._2.text.exists(_.contains("rtf member body")))
    assert(rows(1)._2.format.contains("7z")) // depth-1 refusal
    assert(rows(1)._2.text.isEmpty)
  }

  test("members(): the archive glob explodes one row per member " +
    "with exact sizes") {
    val spark = graft.SparkSpec.session
    val dir = java.nio.file.Files.createTempDirectory("graft_7z")
    java.nio.file.Files.write(dir.resolve("x.7z"),
      graft.queries.SevenZFixture.sevenZ(files, lzma2 = true))
    val rows = SevenZ.members(spark, dir.toString + "/*.7z")
      .orderBy("member").collect()
    assert(rows.length == 3)
    assert(rows.map(_.getAs[String]("member")).toSeq ==
      files.map(_._1).sorted)
    val byName = rows.map(r => r.getAs[String]("member") ->
      r.getAs[Array[Byte]]("content")).toMap
    files.foreach { case (n, b) =>
      assert(java.util.Arrays.equals(byName(n), b))
    }
  }

  test("stream(): the drop-box twin delivers batch-identical rows") {
    val spark = graft.SparkSpec.session
    val dir = java.nio.file.Files.createTempDirectory("graft_7z_stream")
    java.nio.file.Files.write(dir.resolve("y.7z"),
      graft.queries.SevenZFixture.sevenZ(files))
    val q = SevenZ.stream(spark, dir.toString)
      .writeStream.format("memory").queryName("sevenz_stream")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val got = spark.sql(
      "SELECT member, size FROM sevenz_stream ORDER BY member")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == files.map { case (n, b) => (n, b.length.toLong) }
      .sortBy(_._1))
  }
}
