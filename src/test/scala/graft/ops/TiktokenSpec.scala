package graft.ops

class TiktokenSpec extends graft.SparkSpec {

  private def b64(s: String): String =
    java.util.Base64.getEncoder.encodeToString(s.getBytes("UTF-8"))

  // l o w ' ' e r singles, then merges exercising rank priority:
  // "low"(7) must beat " lo"(10) even though "lo"(6) fires first.
  private val vocabLines = Seq(
    s"${b64("l")} 0", s"${b64("o")} 1", s"${b64("w")} 2",
    s"${b64(" ")} 3", s"${b64("e")} 4", s"${b64("r")} 5",
    s"${b64("lo")} 6", s"${b64("low")} 7", s"${b64("er")} 8",
    s"${b64(" l")} 9", s"${b64(" lo")} 10", s"${b64("lower")} 11")

  private def entries: Seq[Tiktoken.Entry] =
    vocabLines.map { l =>
      val sp = l.split(" ")
      Tiktoken.Entry(java.util.Base64.getDecoder.decode(sp(0)), sp(1).toInt)
    }

  test("byte-pair merge by rank: lowest concatenation rank wins") {
    val enc = new Tiktoken.Encoder(entries)
    assert(enc.encodePiece("low").toSeq == Seq(7))
    // " lower": lo(6) fires, then low(7) beats " lo"(10), then er(8),
    // then lower(11); " lower" itself is not in the vocab
    assert(enc.encodePiece(" lower").toSeq == Seq(3, 11))
    assert(enc.encode("low lower").toSeq == Seq(7, 3, 11))
  }

  test("unknown single bytes emit -1, never vanish") {
    val enc = new Tiktoken.Encoder(entries)
    assert(enc.encodePiece("lo!").toSeq == Seq(6, -1))
    assert(enc.encode(null).isEmpty)
    assert(enc.encodePiece("").isEmpty)
  }

  test("load() reads base64+rank lines; comments and blanks tolerated") {
    val dir = java.nio.file.Files.createTempDirectory("graft_tiktoken")
    val f = dir.resolve("toy.tiktoken")
    java.nio.file.Files.write(f,
      ("# toy vocab\n\n" + vocabLines.mkString("\n") + "\n").getBytes("UTF-8"))
    val loaded = Tiktoken.load(spark, f.toString)
    assert(loaded.length == vocabLines.length)
    val enc = new Tiktoken.Encoder(loaded)
    assert(enc.encode("low lower").toSeq == Seq(7, 3, 11))
    // malformed data lines fail loud
    java.nio.file.Files.write(dir.resolve("bad.tiktoken"),
      "notbase64only\n".getBytes("UTF-8"))
    intercept[Exception] {
      Tiktoken.load(spark, dir.resolve("bad.tiktoken").toString)
    }
  }

  test("columns: ids and counts distribute") {
    import spark.implicits._
    val df = Seq((1L, "low lower"), (2L, "low"), (3L, null: String))
      .toDF("id", "text")
    val got = df.select($"id",
        Tiktoken.countCol($"text", entries).as("n"),
        org.apache.spark.sql.functions.concat_ws(",",
          Tiktoken.idsCol($"text", entries)).as("ids"))
      .orderBy("id").collect()
    assert(got(0).getInt(1) == 3 && got(0).getString(2) == "7,3,11")
    assert(got(1).getInt(1) == 1 && got(1).getString(2) == "7")
    assert(got(2).getInt(1) == 0 && got(2).getString(2) == "")
  }

  test("multi-byte UTF-8 text merges over raw bytes") {
    // é is 0xC3 0xA9: include the bytes and the fused pair
    val es = Seq(
      Tiktoken.Entry(Array(0xC3.toByte), 0),
      Tiktoken.Entry(Array(0xA9.toByte), 1),
      Tiktoken.Entry(Array(0xC3.toByte, 0xA9.toByte), 2))
    val enc = new Tiktoken.Encoder(es)
    assert(enc.encodePiece("é").toSeq == Seq(2))
  }
}
