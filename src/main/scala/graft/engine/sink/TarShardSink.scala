package graft.engine.sink

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** WebDataset-style tar shard export — the multimodal terminus of a
  * curation pipeline. A training sample is a group of files sharing a
  * key (`<key>.jpg`, `<key>.txt`, `<key>.json`, …) stored ADJACENTLY
  * inside plain POSIX tar shards (`shard-00000.tar`), the layout
  * webdataset/torchdata stream sequentially at wire speed (public
  * format; no library dependency — the ustar writer/reader below is
  * ~100 lines of fixed 512-byte block arithmetic).
  *
  *  - **Deterministic sharding + bytes.** shard = the engine-wide
  *    `splitBucket` sha256 rule (NULL ids → shard 0); within a shard
  *    samples are sorted by id, entries by the caller's order; headers
  *    pin mtime=0, uid=gid=0, mode=0644 — so a re-export of the same
  *    corpus produces byte-identical tars, and the manifest's sha256
  *    makes re-runs diffable (the [[ExportSink]] contract extended to
  *    whole-file bytes).
  *  - **Shard = unit of consumption.** One reducer per shard writes
  *    one tar via the Hadoop FS API (works on any DFS); empty shards
  *    still land as valid empty tars so a trainer can map shard →
  *    data-loader worker without existence checks.
  *  - **Manifest from READ-BACK.** Sample counts and shard sha256 are
  *    computed by re-reading the landed tars ([[read]] — the same
  *    parser a consumer uses), certifying what is on disk.
  *
  * 100-TB shape: one shuffle (repartition to shards) + one sequential
  * write per shard + one read-back pass; nothing collects to the
  * driver but the manifest rows. Size shards so a whole tar is a sane
  * stream unit (the WebDataset norm is 100 MB–1 GB); [[read]] loads
  * one shard per task via `binaryFile`, so shard size bounds task
  * memory.
  */
object TarShardSink {

  final case class TarShardStat(shard: Int, file: String, samples: Long,
                                files: Long, bytes: Long, sha256: String)

  final case class TarManifest(format: String, numShards: Int,
                               totalSamples: Long, extensions: Seq[String],
                               shards: Seq[TarShardStat])

  val ManifestFile = "_tar_manifest.json"

  // ---- ustar block writer -------------------------------------------

  private def octal(v: Long, width: Int): Array[Byte] = {
    val s = java.lang.Long.toOctalString(v)
    val padded = ("0" * (width - 1 - s.length)) + s
    require(padded.length == width - 1, s"value $v overflows $width-wide octal")
    (padded + " ").getBytes(StandardCharsets.US_ASCII)
  }

  /** One ustar header block. `name` must fit the 100-byte field —
    * sample keys are ids, so this fails loud instead of splitting into
    * the prefix field.
    */
  private[graft] def tarHeader(name: String, size: Long): Array[Byte] = {
    val nameBytes = name.getBytes(StandardCharsets.UTF_8)
    require(nameBytes.length <= 100,
      s"tar entry name exceeds 100 bytes: '$name'")
    require(size >= 0, s"negative entry size for '$name'")
    val h = new Array[Byte](512)
    System.arraycopy(nameBytes, 0, h, 0, nameBytes.length)
    System.arraycopy(octal(420L, 8), 0, h, 100, 8) // mode 0644
    System.arraycopy(octal(0L, 8), 0, h, 108, 8) // uid
    System.arraycopy(octal(0L, 8), 0, h, 116, 8) // gid
    System.arraycopy(octal(size, 12), 0, h, 124, 12)
    System.arraycopy(octal(0L, 12), 0, h, 136, 12) // mtime: deterministic
    java.util.Arrays.fill(h, 148, 156, ' '.toByte) // chksum as spaces
    h(156) = '0' // typeflag: regular file
    System.arraycopy(Array[Byte](0x75, 0x73, 0x74, 0x61, 0x72, 0, 0x30, 0x30),
      0, h, 257, 8)
    var sum = 0L
    var i = 0
    while (i < 512) { sum += h(i) & 0xff; i += 1 }
    val chk = java.lang.Long.toOctalString(sum)
    val chkPadded = ("0" * (6 - chk.length)) + chk
    System.arraycopy(chkPadded.getBytes(StandardCharsets.US_ASCII),
      0, h, 148, 6)
    h(154) = 0
    h(155) = ' '.toByte
    h
  }

  private def pad512(n: Long): Int = ((512 - (n % 512)) % 512).toInt

  /** Parse the files of one in-memory tar: `(name, content)` in
    * archive order. Stops at the end-of-archive zero block; a
    * truncated or lying header is an error (an export is trusted
    * bytes, unlike a crawl payload).
    */
  private[graft] def parseTar(bytes: Array[Byte]): Seq[(String, Array[Byte])] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Array[Byte])]
    var off = 0
    var done = false
    while (!done && off + 512 <= bytes.length) {
      if (bytes(off) == 0) { done = true } // end-of-archive block
      else {
        var nameEnd = off
        while (nameEnd < off + 100 && bytes(nameEnd) != 0) nameEnd += 1
        val name = new String(bytes, off, nameEnd - off, StandardCharsets.UTF_8)
        val sizeStr = new String(bytes, off + 124, 12, StandardCharsets.US_ASCII)
          .takeWhile(c => c != 0.toChar && c != ' ')
        val size = java.lang.Long.parseLong(sizeStr.trim, 8)
        require(off + 512 + size <= bytes.length,
          s"tar entry '$name' truncated: declares $size bytes past EOF")
        out += name -> java.util.Arrays.copyOfRange(bytes,
          off + 512, (off + 512 + size).toInt)
        off += 512 + size.toInt + pad512(size)
      }
    }
    out.toSeq
  }

  // ---- export -------------------------------------------------------

  private def shardFile(shard: Int): String = f"shard-$shard%05d.tar"

  /** Export samples as WebDataset tar shards under `path`.
    *
    * `entries` maps columns to file extensions in written order: a
    * BinaryType column writes raw bytes, a StringType column writes
    * UTF-8; a NULL value skips that file (a sample may lack a
    * modality). `idCol` is the sample key — stable content ids, not
    * `monotonically_increasing_id` — and becomes the in-tar file stem.
    */
  def export(df: DataFrame, path: String, idCol: String,
             entries: Seq[(String, String)], numShards: Int): TarManifest = {
    require(numShards >= 1, s"numShards must be >= 1, got $numShards")
    require(entries.nonEmpty, "need at least one (column, extension) entry")
    entries.foreach { case (c, e) =>
      require(df.columns.contains(c), s"missing entry column '$c'")
      require(e.nonEmpty && !e.contains('.') && !e.contains('/'),
        s"extension must be a bare suffix, got '$e'")
    }
    require(df.columns.contains(idCol), s"missing id column '$idCol'")
    require(entries.map(_._2).distinct.length == entries.length,
      s"duplicate extensions in ${entries.map(_._2)}")
    val spark = df.sparkSession
    val exts = entries.map(_._2)

    val bucket = graft.ops.Curation.splitBucket(col(idCol), numShards)
    val cols = col(idCol).cast("string").as("__key") +:
      entries.map { case (c, _) =>
        df.schema(c).dataType match {
          case org.apache.spark.sql.types.BinaryType => col(c)
          case _ => col(c).cast("string").cast("binary")
        }
      }
    val sharded = df
      .withColumn("__shard", when(bucket < 0, lit(0)).otherwise(bucket))
      .repartition(numShards, col("__shard"))
      .sortWithinPartitions(col("__shard"), col(idCol))
      .select(col("__shard") +: cols: _*)

    val hconf = new graft.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val base = new Path(path)
    val fs0 = base.getFileSystem(hconf.value)
    // raw tars only: no Hadoop .crc sidecars (an external tar consumer
    // reads this directory; the manifest's sha256 is the integrity
    // layer). No-op on filesystems without client-side checksums.
    fs0.setWriteChecksum(false)
    fs0.delete(base, true)
    fs0.mkdirs(base)

    sharded.foreachPartition { (it: Iterator[Row]) =>
      var current = -1
      var out: org.apache.hadoop.fs.FSDataOutputStream = null
      val fs = new Path(path).getFileSystem(hconf.value)
      fs.setWriteChecksum(false)
      def close(): Unit = if (out != null) {
        out.write(new Array[Byte](1024)) // end-of-archive: two zero blocks
        out.close(); out = null
      }
      it.foreach { row =>
        val shard = row.getInt(0)
        if (shard != current) { // rows are sorted: each shard is one run
          close()
          out = fs.create(new Path(path, shardFile(shard)), true)
          current = shard
        }
        val key = row.getString(1)
        var i = 0
        while (i < exts.length) {
          if (!row.isNullAt(2 + i)) {
            val content = row.getAs[Array[Byte]](2 + i)
            out.write(tarHeader(s"$key.${exts(i)}", content.length.toLong))
            out.write(content)
            out.write(new Array[Byte](pad512(content.length.toLong)))
          }
          i += 1
        }
      }
      close()
    }
    // empty shards still get a valid (empty) tar — dense shard files
    (0 until numShards).foreach { s =>
      val p = new Path(path, shardFile(s))
      if (!fs0.exists(p)) {
        val o = fs0.create(p, true)
        o.write(new Array[Byte](1024))
        o.close()
      }
    }

    val manifest = computeManifest(spark, path, numShards, exts)
    writeManifest(spark, path, manifest)
    manifest
  }

  /** Read landed shards back as one row per in-tar file:
    * `(shard, key, ext, content)`. One shard per task via `binaryFile`
    * — shard size bounds task memory, the WebDataset streaming shape.
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(s"$path/shard-*.tar")
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (p, bytes) =>
        val shard = p.split('/').last.stripPrefix("shard-")
          .stripSuffix(".tar").toInt
        parseTar(bytes).map { case (name, content) =>
          val dot = name.lastIndexOf('.')
          (shard, name.substring(0, dot), name.substring(dot + 1), content)
        }
      }
      .toDF("shard", "key", "ext", "content")
  }

  private def computeManifest(spark: SparkSession, path: String,
                              numShards: Int, exts: Seq[String]): TarManifest = {
    import spark.implicits._
    // drop any cached file listing — an integrity sweep must see the
    // bytes as they are NOW, not the sizes/mtimes Spark memoized when
    // the export landed (a tampered file would otherwise read as an
    // IO error instead of a content diff)
    spark.catalog.refreshByPath(path)
    val stats = spark.read.format("binaryFile").load(s"$path/shard-*.tar")
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .map { case (p, bytes) =>
        val file = p.split('/').last
        val shard = file.stripPrefix("shard-").stripSuffix(".tar").toInt
        val parsed = parseTar(bytes)
        val samples = parsed.map(e => e._1.substring(0,
          e._1.lastIndexOf('.'))).distinct.length.toLong
        val digest = java.security.MessageDigest.getInstance("SHA-256")
          .digest(bytes)
        (shard, file, samples, parsed.length.toLong, bytes.length.toLong,
          digest.map("%02x".format(_)).mkString)
      }.collect().sortBy(_._1)
      .map(t => TarShardStat(t._1, t._2, t._3, t._4, t._5, t._6)).toSeq
    TarManifest("wds-tar", numShards, stats.map(_.samples).sum, exts, stats)
  }

  /** Re-read the landed shards and diff against the stored manifest —
    * `Right(manifest)` when every shard's sample count AND sha256
    * match, `Left(problems)` otherwise.
    */
  def verifyExport(spark: SparkSession, path: String): Either[List[String], TarManifest] = {
    val stored = readManifest(spark, path)
    val current = computeManifest(spark, path, stored.numShards,
      stored.extensions)
    val problems = scala.collection.mutable.ListBuffer.empty[String]
    if (current.totalSamples != stored.totalSamples)
      problems += s"total samples ${current.totalSamples} != manifest ${stored.totalSamples}"
    val cur = current.shards.map(s => s.shard -> s).toMap
    stored.shards.foreach { s =>
      cur.get(s.shard) match {
        case None => problems += s"shard ${s.shard}: tar file missing"
        case Some(c) =>
          if (c.samples != s.samples)
            problems += s"shard ${s.shard}: samples ${c.samples} != manifest ${s.samples}"
          else if (c.sha256 != s.sha256)
            problems += s"shard ${s.shard}: sha256 mismatch (content changed)"
      }
    }
    if (problems.isEmpty) Right(stored) else Left(problems.toList)
  }

  def readManifest(spark: SparkSession, path: String): TarManifest = {
    import org.json4s._
    import org.json4s.jackson.Serialization
    implicit val fmts: Formats = Serialization.formats(NoTypeHints)
    val p = new Path(path, ManifestFile)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p), s"no $ManifestFile under $path")
    val in = fs.open(p)
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    Serialization.read[TarManifest](text)
  }

  private def writeManifest(spark: SparkSession, path: String,
                            m: TarManifest): Unit = {
    import org.json4s._
    import org.json4s.jackson.Serialization
    implicit val fmts: Formats = Serialization.formats(NoTypeHints)
    val p = new Path(path, ManifestFile)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(Serialization.write(m).getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }
}
