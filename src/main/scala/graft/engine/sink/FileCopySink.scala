package graft.engine.sink

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileUtil, Path}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.util.LongAccumulator

import graft.util.SerializableConfiguration

/** Sidecar file-copy sink (SURVEY.md §2.10 K2, `file_transfer.py`):
  * copy `SRC/<sub>/<file>` → `DEST/<file>` per record, with
  *
  *  - extension appended only when absent (`_has_extension`,
  *    `file_transfer.py:65-89`);
  *  - retry 3× exponential backoff on IO errors (`:40-48`);
  *  - overwrite-remove-first (`:51-62`);
  *  - ATOMIC multi-file groups: image+xml / image+mask are pre-checked
  *    for existence together BEFORE either is copied
  *    (`:341-370`, `:393-426`) — a missing sidecar fails the record
  *    with zero partial copies;
  *  - per-record failure → `file_transfer_failure` channel, record
  *    dropped before the DB (`base.py:780-830`).
  *
  * Runs in `foreachPartition`: Hadoop FileSystem handles PVC-local and
  * object-store paths alike; copy parallelism = partition count.
  */
object FileCopySink {

  /** One source directory of an atomic copy group, with the mapping
    * from the record's resolved filename to this directory's file name
    * (e.g. OD annotations: `a.jpg` → `a.xml`; semseg masks:
    * `a.jpg` → `a_mask.png`). `fallbackExts` lists extra extensions to
    * probe when the primary name is absent (the reference's mask
    * lookup walks `.png/.jpg/.jpeg` before failing,
    * `file_transfer.py:271-282`).
    */
  final case class SidecarSource(dir: String,
                                 rename: String => String = identity,
                                 fallbackExts: Seq[String] = Nil)
      extends Serializable {
    /** Candidate file names in probe order: the primary rename, then
      * the same stem under each fallback extension.
      */
    def candidates(name: String): Seq[String] = {
      val primary = rename(name)
      primary +: fallbackExts.map(e =>
        primary.replaceAll("\\.[A-Za-z0-9]+$", "") + s".$e")
    }
  }

  final case class CopySpec(sources: Seq[SidecarSource], destDir: String,
                            maxRetries: Int = 3)

  object CopySpec {
    def single(dir: String, destDir: String): CopySpec =
      CopySpec(Seq(SidecarSource(dir)), destDir)
    /** OD: image + same-stem .xml annotation, atomic. */
    def imageXml(imagesDir: String, xmlDir: String, destDir: String): CopySpec =
      CopySpec(Seq(SidecarSource(imagesDir),
        SidecarSource(xmlDir, n => n.replaceAll("\\.[A-Za-z0-9]+$", "") + ".xml")),
        destDir)
    /** Semseg: image + `<stem>_mask.<ext>` sidecar, atomic. A mask
      * directory may mix extensions — the probe order matches the
      * reference's `.png/.jpg/.jpeg` walk (`file_transfer.py:271-282`);
      * pass a one-element list to pin a single extension.
      */
    def imageMask(imagesDir: String, masksDir: String, destDir: String,
                  maskExts: Seq[String] = Seq("png", "jpg", "jpeg")): CopySpec = {
      require(maskExts.nonEmpty, "imageMask needs at least one mask extension")
      CopySpec(Seq(SidecarSource(imagesDir),
        SidecarSource(masksDir,
          n => n.replaceAll("\\.[A-Za-z0-9]+$", "") + s"_mask.${maskExts.head}",
          maskExts.tail)),
        destDir)
    }
  }

  /** Resolve a record's sidecar source path: append the extension only
    * when the filename lacks one.
    */
  def resolveName(filename: String, extension: String): String =
    if (filename.matches(".*\\.[A-Za-z0-9]+$")) filename
    else if (extension == null || extension.isEmpty) filename
    else s"$filename.$extension"

  /** Column form of [[resolveName]] — MUST stay in lockstep with it
    * (the Ingestor joins copy verdicts back to records by this key).
    */
  def resolvedNameCol(filename: org.apache.spark.sql.Column,
                      extension: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.when(filename.rlike("\\.[A-Za-z0-9]+$"), filename)
      .when(extension.isNull || extension === "", filename)
      .otherwise(org.apache.spark.sql.functions.concat_ws(".", filename, extension))

  private def withRetry[T](maxRetries: Int, sleepMs: Long => Unit)(f: => T): T = {
    var attempt = 0
    while (true) {
      try return f
      catch {
        case _: java.io.IOException if attempt < maxRetries =>
          sleepMs(math.min(1000L << attempt, 10000L))
          attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Copy every record's sidecar group. `df` must carry `filename` and
    * `extension` columns; `srcSubdirs` lists each absolute source dir a
    * record needs one file from (1 entry = simple copy, 2 = atomic
    * pair). Returns nothing; counts land in the accumulators and the
    * per-record verdict in the returned DataFrame (`__transfer_ok`).
    */
  def copy(df: DataFrame, spec: CopySpec,
           copied: LongAccumulator, failed: LongAccumulator,
           hadoopConf: Configuration): DataFrame = {
    val serConf = new SerializableConfiguration(hadoopConf)
    val spark = df.sparkSession
    import spark.implicits._
    val cols = df.columns
    val fnameIdx = cols.indexOf("filename")
    val extIdx = cols.indexOf("extension")
    require(fnameIdx >= 0, "FileCopySink needs a 'filename' column")

    val verdicts = df.map { (row: Row) =>
      val conf = serConf.value
      val filename = row.getString(fnameIdx)
      val ext = if (extIdx >= 0 && !row.isNullAt(extIdx)) row.getString(extIdx) else ""
      if (filename == null) ("<null filename>", false)
      else {
        // Any per-record failure — including a filename that is not a
        // legal Hadoop Path (':' on ext4, empty after rename) throwing
        // IllegalArgumentException — routes to the file_transfer_failure
        // channel; only the record fails, never the task.
        try {
          val name = resolveName(filename, ext)
          val sources = spec.sources.map(s => new Path(s.dir, s.rename(name)))
          // Each primary path resolves against its OWN FileSystem: sources and
          // destination may live on different schemes (s3a images →
          // hdfs dest), and using the source FS for the dest path
          // throws "Wrong FS" per record — every row would land in the
          // failure channel.
          val srcFs = sources.map(_.getFileSystem(conf))
          val destFs = new Path(spec.destDir).getFileSystem(conf)
          // Atomic pre-check: EVERY source must resolve (first existing
          // candidate in probe order) before ANY copy starts.
          val resolvedSrcs = spec.sources.zip(srcFs).map { case (s, f) =>
            (s.candidates(name).map(c => new Path(s.dir, c))
              .find(f.exists), f)
          }
          if (resolvedSrcs.exists(_._1.isEmpty)) (name, false)
          else {
            try {
              resolvedSrcs.map { case (p, f) => (p.get, f) }.foreach { case (src, fs) =>
                val dest = new Path(spec.destDir, src.getName)
                withRetry(spec.maxRetries, Thread.sleep) {
                  if (destFs.exists(dest)) destFs.delete(dest, false)
                  FileUtil.copy(fs, src, destFs, dest, false, true, conf)
                }
              }
              (name, true)
            } catch { case _: java.io.IOException => (name, false) }
          }
        } catch {
          case scala.util.control.NonFatal(_) => (filename, false)
        }
      }
    }.toDF("__file", "__transfer_ok")
      // The map embeds FileUtil.copy SIDE EFFECTS — persist so downstream
      // consumers (verdict joins) never re-execute the copies.
      .persist()

    // Materialize now so the accumulators below are exact (and the copy
    // pass runs exactly once).
    // coalesce: sum over ZERO rows (empty manifest) is SQL NULL, and
    // Row.getLong on null throws.
    val agg = verdicts.agg(
      coalesce(sum(when(col("__transfer_ok"), 1).otherwise(0)), lit(0)).cast("long"),
      coalesce(sum(when(!col("__transfer_ok"), 1).otherwise(0)), lit(0)).cast("long")).head()
    copied.add(agg.getLong(0))
    failed.add(agg.getLong(1))
    verdicts
  }
}
