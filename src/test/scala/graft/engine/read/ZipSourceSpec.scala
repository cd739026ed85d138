package graft.engine.read

/** The ZIP archive source's Spark faces (the kernel itself is the
  * shared [[ZipRead]] walk, gate-covered by m53/m57): batch explode
  * and its streaming twin must produce identical member rows.
  */
class ZipSourceSpec extends graft.SparkSpec {

  test("stream(): zip archives stream with batch-identical rows") {
    val dir = java.nio.file.Files.createTempDirectory("graft_zip_stream")
    java.nio.file.Files.write(dir.resolve("one.zip"),
      graft.queries.EpubFixture.zip(Seq(
        "a.txt" -> "zip streamed alpha".getBytes,
        "b/c.txt" -> "zip streamed beta".getBytes)))
    val batch = Zip.members(spark, dir.toString + "/*")
      .orderBy("member").collect()
      .map(r => (r.getAs[String]("member"),
        new String(r.getAs[Array[Byte]]("content")))).toSeq
    val q = Zip.stream(spark, dir.toString)
      .writeStream.format("memory").queryName("zip_stream")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val streamed = spark.sql(
      "SELECT member, content FROM zip_stream ORDER BY member")
      .collect()
      .map(r => (r.getString(0),
        new String(r.getAs[Array[Byte]](1)))).toSeq
    assert(streamed == batch)
    assert(streamed.map(_._2) ==
      Seq("zip streamed alpha", "zip streamed beta"))
  }
}
