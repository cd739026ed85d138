package graft.engine.read

import org.scalatest.funsuite.AnyFunSuite

/** Data-file shape inventory vs INDEPENDENT writers: python3's stdlib
  * sqlite3 for SQLite b-trees, numpy for .npy headers, and the
  * org.apache.avro writer (Spark's own classpath) for object
  * containers — the m63/m69 triangulation recipe applied to the
  * datasets-in-a-crawl class.
  */
class DataFilesSpec extends AnyFunSuite {

  private def py(script: String): Unit = {
    val p = new ProcessBuilder("python3", "-c", script)
      .redirectErrorStream(true).start()
    val out = new String(p.getInputStream.readAllBytes, "UTF-8")
    assert(p.waitFor() == 0, s"python3 failed:\n$out")
  }

  private def slurp(path: String): Array[Byte] =
    java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))

  test("sqlite: table names + row counts match what python3's " +
    "sqlite3 wrote (empty, small, multi-page, WITHOUT ROWID)") {
    val db = java.nio.file.Files.createTempDirectory("graft_sqlite")
      .resolve("t.db").toString
    py(
      s"""import sqlite3, os
         |c = sqlite3.connect(${"\"" + db + "\""})
         |c.execute("CREATE TABLE empty_t (a INTEGER, b TEXT)")
         |c.execute("CREATE TABLE small_t (a INTEGER, b TEXT)")
         |for i in range(3):
         |    c.execute("INSERT INTO small_t VALUES (?, ?)", (i, "row %d" % i))
         |c.execute("CREATE TABLE big_t (a INTEGER, b TEXT)")
         |for i in range(2000):
         |    c.execute("INSERT INTO big_t VALUES (?, ?)", (i, "x" * 40 + str(i)))
         |c.execute("CREATE TABLE wr_t (k TEXT PRIMARY KEY, v INTEGER) WITHOUT ROWID")
         |for i in range(5):
         |    c.execute("INSERT INTO wr_t VALUES (?, ?)", ("key%d" % i, i))
         |c.commit(); c.close()
         |""".stripMargin)
    val bytes = slurp(db)
    val got = DataFiles.sqliteTables(bytes)
    assert(got.isDefined, "sqlite walk returned None")
    assert(got.get == Seq("big_t" -> 2000L, "empty_t" -> 0L,
      "small_t" -> 3L, "wr_t" -> 5L))
    assert(DataFiles.inventory(bytes)
      .contains("tables=big_t:2000,empty_t:0,small_t:3,wr_t:5"))
  }

  test("sqlite hostility: every 512-byte-stepped prefix and header " +
    "lies walk cleanly to None or partial, never a throw") {
    val db = java.nio.file.Files.createTempDirectory("graft_sqlite2")
      .resolve("t.db").toString
    py(
      s"""import sqlite3
         |c = sqlite3.connect(${"\"" + db + "\""})
         |c.execute("CREATE TABLE t1 (a)")
         |c.execute("INSERT INTO t1 VALUES (42)")
         |c.commit(); c.close()
         |""".stripMargin)
    val bytes = slurp(db)
    assert(DataFiles.sqliteTables(bytes).get == Seq("t1" -> 1L))
    (0 to bytes.length by 97).foreach { n =>
      DataFiles.sqliteTables(bytes.take(n)) // no throw
    }
    // lying page size (not a power of two) refuses
    val badPs = bytes.clone(); badPs(16) = 0x03; badPs(17) = 0x00
    assert(DataFiles.sqliteTables(badPs).isEmpty)
    // lying page count clamps to the bytes present
    val badN = bytes.clone(); badN(28) = 0x7f.toByte
    DataFiles.sqliteTables(badN) // no throw
    assert(DataFiles.sqliteTables("junk".getBytes).isEmpty)
  }

  test("npy: dtype/shape/order match numpy's own writer; v2 headers " +
    "and 0-d arrays parse; junk refuses") {
    val dir = java.nio.file.Files.createTempDirectory("graft_npy")
    py(
      s"""import numpy as np
         |np.save("$dir/a.npy", np.zeros((3, 4), dtype="<f8"))
         |np.save("$dir/b.npy", np.asfortranarray(np.ones((5, 2, 7), dtype="<i4")))
         |np.save("$dir/c.npy", np.float32(2.5))
         |""".stripMargin)
    val a = DataFiles.npyInfo(slurp(s"$dir/a.npy")).get
    assert(a.dtype == "<f8" && a.shape == Seq(3L, 4L) && !a.fortranOrder)
    val b = DataFiles.npyInfo(slurp(s"$dir/b.npy")).get
    assert(b.dtype == "<i4" && b.shape == Seq(5L, 2L, 7L) && b.fortranOrder)
    val c = DataFiles.npyInfo(slurp(s"$dir/c.npy")).get
    assert(c.shape.isEmpty && c.dtype == "<f4")
    assert(DataFiles.inventory(slurp(s"$dir/a.npy"))
      .contains("dtype=<f8 shape=3x4 fortran=false"))
    // hand-authored v2 header (4-byte length field)
    val dict = "{'descr': '<u2', 'fortran_order': False, " +
      "'shape': (9,), }"
    val pad = dict + " " * ((64 - (dict.length + 12) % 64) % 64) + "\n"
    val v2 = Array[Byte](0x93.toByte, 'N', 'U', 'M', 'P', 'Y', 2, 0) ++
      Array[Byte]((pad.length & 0xff).toByte,
        ((pad.length >> 8) & 0xff).toByte, 0, 0) ++
      pad.getBytes("ISO-8859-1") ++ Array.fill[Byte](18)(0)
    val v2i = DataFiles.npyInfo(v2).get
    assert(v2i.dtype == "<u2" && v2i.shape == Seq(9L))
    // fuzz + junk
    val full = slurp(s"$dir/a.npy")
    (0 to full.length).foreach(n => DataFiles.npyInfo(full.take(n)))
    assert(DataFiles.npyInfo("junknotnumpy".getBytes).isEmpty)
  }

  test("hdf5: superblock version surfaces; wrong magic refuses") {
    val v0 = Array[Byte](0x89.toByte, 'H', 'D', 'F', '\r', '\n',
      0x1a, '\n', 0) ++ Array.fill[Byte](32)(0)
    assert(DataFiles.hdf5SuperblockVersion(v0).contains(0))
    assert(DataFiles.inventory(v0).contains("superblock=v0"))
    val v2 = v0.clone(); v2(8) = 2
    assert(DataFiles.hdf5SuperblockVersion(v2).contains(2))
    val bad = v0.clone(); bad(8) = 9 // beyond any defined version
    assert(DataFiles.hdf5SuperblockVersion(bad).isEmpty)
    assert(DataFiles.hdf5SuperblockVersion("noise".getBytes).isEmpty)
    (0 to v0.length).foreach(n => DataFiles.hdf5SuperblockVersion(v0.take(n)))
  }

  test("parquet: footer row count matches pyarrow's writer " +
    "(independent of parquet-mr); junk and prefixes refuse cleanly") {
    val dir = java.nio.file.Files.createTempDirectory("graft_pq")
    py(
      s"""import pyarrow as pa, pyarrow.parquet as pq
         |t = pa.table({"a": list(range(7)), "b": ["x%d" % i for i in range(7)]})
         |pq.write_table(t, "$dir/t7.parquet")
         |pq.write_table(pa.table({"a": []}).cast(pa.schema([("a", pa.int64())])), "$dir/t0.parquet")
         |""".stripMargin)
    val b7 = slurp(s"$dir/t7.parquet")
    assert(DataFiles.parquetRowCount(b7).contains(7L))
    assert(DataFiles.inventory(b7)
      .contains("records=7 cols=a:int64,b:binary"))
    assert(DataFiles.parquetRowCount(slurp(s"$dir/t0.parquet"))
      .contains(0L))
    (0 to b7.length by 13).foreach(n => DataFiles.parquetRowCount(b7.take(n)))
    assert(DataFiles.parquetRowCount("PAR1 but not parquet".getBytes).isEmpty)
  }

  test("orc: from-spec postscript+footer walk reads numberOfRows " +
    "under every pyarrow codec (none/zlib/snappy/zstd)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_orc")
    py(
      s"""import pyarrow as pa, pyarrow.orc as orc
         |t = pa.table({"a": list(range(123)), "b": ["row %d why" % i for i in range(123)]})
         |for c in ("uncompressed", "zlib", "snappy", "zstd"):
         |    orc.write_table(t, "$dir/%s.orc" % c, compression=c)
         |""".stripMargin)
    for (c <- Seq("uncompressed", "zlib", "snappy", "zstd")) {
      val b = slurp(s"$dir/$c.orc")
      assert(DataFiles.orcRowCount(b).contains(123L), s"codec $c")
      assert(DataFiles.inventory(b)
        .contains("records=123 cols=a:long,b:string"), s"codec $c")
    }
    val b = slurp(s"$dir/zlib.orc")
    (0 to b.length by 11).foreach(n => DataFiles.orcRowCount(b.take(n)))
    assert(DataFiles.orcRowCount("ORCHESTRAS play music".getBytes).isEmpty)
    // a lying postscript length walks to None, never a throw
    val lie = b.clone(); lie(lie.length - 1) = 0xff.toByte
    DataFiles.orcRowCount(lie)
  }

  test("arrow: IPC-file record count matches pyarrow across multiple " +
    "batches; torn files refuse") {
    val dir = java.nio.file.Files.createTempDirectory("graft_arrow")
    py(
      s"""import pyarrow as pa
         |schema = pa.schema([("a", pa.int64())])
         |with pa.ipc.new_file("$dir/m.arrow", schema) as w:
         |    for k in (3, 4, 5):
         |        w.write_batch(pa.record_batch({"a": list(range(k))}, schema=schema))
         |""".stripMargin)
    val b = slurp(s"$dir/m.arrow")
    assert(DataFiles.arrowRecordCount(b).contains(12L))
    assert(DataFiles.inventory(b).contains("records=12 cols=a:int"))
    (0 to b.length by 23).foreach(n => DataFiles.arrowRecordCount(b.take(n)))
    assert(DataFiles.arrowRecordCount(
      ("ARROW1" + "   torn").getBytes("ISO-8859-1")).isEmpty)
  }

  test("avro: record count from block headers matches the " +
    "org.apache.avro writer — multi-block, null and deflate codecs, " +
    "no data decode") {
    def container(codec: String, perBlock: Seq[Int]): Array[Byte] = {
      val schema = new org.apache.avro.Schema.Parser().parse(
        """{"type":"record","name":"R","fields":[
          |{"name":"s","type":"string"}]}""".stripMargin)
      val w = new org.apache.avro.file.DataFileWriter(
        new org.apache.avro.generic.GenericDatumWriter[
          org.apache.avro.generic.GenericRecord](schema))
      if (codec == "deflate")
        w.setCodec(org.apache.avro.file.CodecFactory.deflateCodec(6))
      val bos = new java.io.ByteArrayOutputStream()
      w.create(schema, bos)
      perBlock.zipWithIndex.foreach { case (n, bi) =>
        (0 until n).foreach { i =>
          val r = new org.apache.avro.generic.GenericData.Record(schema)
          r.put("s", s"block$bi row$i " + ("y" * 20))
          w.append(r)
        }
        w.sync() // force a block boundary
      }
      w.close()
      bos.toByteArray
    }
    val plain = container("null", Seq(3, 4, 2))
    assert(DataFiles.avroRecordCount(plain).contains(9L))
    assert(DataFiles.inventory(plain)
      .contains("records=9 cols=s:string"))
    val deflated = container("deflate", Seq(5, 1))
    assert(DataFiles.avroRecordCount(deflated).contains(6L))
    val empty = container("null", Seq.empty)
    assert(DataFiles.avroRecordCount(empty).contains(0L))
    (0 to plain.length).foreach(n => DataFiles.avroRecordCount(plain.take(n)))
    assert(DataFiles.avroRecordCount("Objx".getBytes).isEmpty)
  }
}
