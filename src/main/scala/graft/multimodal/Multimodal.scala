package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: media travel as opaque `binary` payloads with a
  * typed metadata struct alongside — the pattern that scales to 100 TB
  * because Spark never interprets the bytes except inside explicitly
  * partitioned decode passes.
  *
  * Decode status by modality: IMAGE decode is REAL — the ImageIO
  * header read ([[graft.engine.validate.ImageProbe]], the same kernel
  * behind the V10 resolution validator) recovers true dimensions from
  * png/jpg/gif/bmp bytes without a pixel decode. AUDIO header decode
  * is REAL for WAV, FLAC and MP3 payloads
  * ([[graft.engine.validate.AudioProbe.meta]] — pure-JVM parsing:
  * RIFF chunk walk, STREAMINFO bit unpacking, MPEG frame walk;
  * channels, sample rate, bit depth where the codec fixes it, sample
  * count). VIDEO header decode is REAL for MP4 / ISO-BMFF and RIFF AVI
  * containers ([[graft.engine.validate.VideoProbe.meta]] — box/chunk
  * walking: track dimensions, movie duration, frame count, codec
  * FourCC). Containers no probe can read (ogg/opus/m4a audio,
  * mkv/webm video) go through [[MediaDecoder.decodeStub]]
  * (deterministic fake frames/sample-rate derived from the payload,
  * clearly marked by `decodeStatus = "stubbed"`); swapping in a real
  * codec changes ONE function and none of the plumbing (schema,
  * partitioning, batch shape, the mapPartitions signature all stay).
  */
object Multimodal {

  /** Typed decode result carried next to the payload. `decodeStatus`
    * is "ok" for a successful real decode, a diagnosis string
    * (ImageProbe's failure classes) for an undecodable image — whose
    * dimensions read -1 — and "stubbed" for the audio/video stand-in.
    */
  final case class MediaMeta(
      kind: String, // image | audio | video
      width: Int,
      height: Int,
      nFrames: Int,
      sampleRateHz: Int,
      channels: Int, // audio: channel count; other kinds: 0
      bitsPerSample: Int, // audio: bit depth; other kinds: 0
      nBytes: Long,
      sha256: String,
      decodeStatus: String)

  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("kind", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("nFrames", IntegerType, nullable = false),
    StructField("sampleRateHz", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("bitsPerSample", IntegerType, nullable = false),
    StructField("nBytes", LongType, nullable = false),
    StructField("sha256", StringType, nullable = false),
    StructField("decodeStatus", StringType, nullable = false)))

  /** Load a media directory as (path, name, payload) — distributed
    * listing + lazy content via binaryFile; content column prunes away
    * when a downstream op only needs names.
    */
  def scan(spark: SparkSession, dir: String): DataFrame =
    spark.read.format("binaryFile")
      .option("recursiveFileLookup", "true")
      .load(dir)
      .select(col("path"),
        element_at(split(col("path"), "/"), -1).as("name"),
        col("content").as("payload"))
      .filter(!col("name").startsWith("."))

  /** Decode pass: one partition-batched sweep attaching [[MediaMeta]].
    * The mapPartitions shape is the real contract — a production
    * decoder amortizes codec init per PARTITION, not per row (exactly
    * how a Pandas-UDF/mapInPandas batch decoder behaves).
    */
  def withMeta(df: DataFrame, kind: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    require(df.columns.contains("payload"), "expected a 'payload' binary column")
    // Join back on `path` — the unique key. `name` is a basename and
    // recursiveFileLookup makes basename collisions routine
    // (train/img001.jpg vs test/img001.jpg); joining on it would attach
    // the wrong meta and multiply rows.
    require(df.columns.contains("path"), "expected a unique 'path' column")
    val decoded: Dataset[(String, MediaMeta)] =
      df.select(col("path"), col("payload")).as[(String, Array[Byte])]
        .mapPartitions { it =>
          // per-partition decoder init would go here (codec contexts,
          // native buffers) — the stub needs none.
          it.map { case (path, bytes) =>
            (path, MediaDecoder.decode(kind, bytes))
          }
        }
    df.join(decoded.toDF("path", "meta"), "path")
  }

  /** Feature-extraction pass: payload bytes → dense `Array[Float]`
    * feature vector, in the same per-partition batch shape as
    * [[withMeta]] (a production embedding model amortizes weights/
    * session init per PARTITION; the stub needs none). The output
    * column plugs directly into the ANN operators
    * ([[graft.ops.Similarity]]) — media in, nearest-neighbor search
    * out, all plumbing real.
    */
  def featureExtract(df: DataFrame, idCol: String,
                     payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val feats: Dataset[(Long, Array[Float])] =
      df.select(col(idCol).cast("long"), col(payloadCol))
        .as[(Long, Array[Byte])]
        .mapPartitions { it =>
          // per-partition model init would go here — the stub needs none.
          it.map { case (id, bytes) => (id, MediaDecoder.featureStub(bytes)) }
        }
    feats.toDF(idCol, "features")
  }

  /** Resize plan: pure metadata math (target fit preserving aspect),
    * demonstrating typed-struct column surgery without touching bytes.
    * A real implementation maps the payload through the decoder in the
    * same partition pass.
    */
  def resizePlan(df: DataFrame, targetW: Int, targetH: Int): DataFrame = {
    val w = col("meta.width")
    val h = col("meta.height")
    val scale = least(lit(targetW) / w, lit(targetH) / h)
    df.withColumn("resize_w", ceil(w * scale).cast("int"))
      .withColumn("resize_h", ceil(h * scale).cast("int"))
  }

  /** Frame sampling plan for video-kind media: every `stride`-th frame
    * index, capped at `maxFrames` — an array column the downstream
    * extractor explodes, so sampling cost shows up as rows, not bytes.
    */
  def frameSamplePlan(df: DataFrame, stride: Int, maxFrames: Int): DataFrame = {
    require(stride > 0, s"stride must be positive, got $stride")
    require(maxFrames > 0, s"maxFrames must be positive, got $maxFrames")
    df.withColumn("sampled_frames",
      slice(sequence(lit(0), col("meta.nFrames") - 1, lit(stride)), 1, maxFrames))
  }
}

object MediaDecoder {

  /** Modality dispatch: REAL ImageIO header decode for images (the
    * [[graft.engine.validate.ImageProbe]] kernel — width/height from
    * the header, no pixel decode, so the per-file cost is a few KB of
    * reads no matter the image size); REAL WAV/FLAC/MP3 header decode
    * for audio ([[graft.engine.validate.AudioProbe.meta]]);
    * REAL MP4/AVI header decode for video
    * ([[graft.engine.validate.VideoProbe.meta]]); [[decodeStub]] for
    * everything else (ogg/opus/m4a, mkv/webm), whose
    * codecs are not installed in this environment. An image the
    * probe cannot read yields (-1, -1) dimensions and carries the
    * probe's diagnosis (empty / not-an-image / truncated-header) in
    * `decodeStatus` — the row flows on for the caller to filter or
    * dead-letter, never an executor exception mid-job.
    */
  private def sha256Hex(bytes: Array[Byte]): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(bytes).map(b => f"$b%02x").mkString

  def decode(kind: String, rawBytes: Array[Byte]): Multimodal.MediaMeta = kind match {
    case "image" =>
      val bytes = if (rawBytes == null) Array.empty[Byte] else rawBytes
      val sha = sha256Hex(bytes)
      graft.engine.validate.ImageProbe.dimensions(bytes) match {
        case Some((w, h)) => Multimodal.MediaMeta(
          kind = "image", width = w, height = h, nFrames = 1,
          sampleRateHz = 0, channels = 0, bitsPerSample = 0,
          nBytes = bytes.length.toLong, sha256 = sha, decodeStatus = "ok")
        case None => Multimodal.MediaMeta(
          kind = "image", width = -1, height = -1, nFrames = 0,
          sampleRateHz = 0, channels = 0, bitsPerSample = 0,
          nBytes = bytes.length.toLong, sha256 = sha,
          decodeStatus = graft.engine.validate.ImageProbe.diagnose(bytes))
      }
    case "audio" =>
      // REAL header decode for WAV, FLAC and MP3 payloads (the unified
      // AudioProbe.meta walk — pure byte parsing, no codec); container
      // formats it cannot read (ogg/opus/m4a) fall through to the
      // honest stub.
      val bytes = if (rawBytes == null) Array.empty[Byte] else rawBytes
      graft.engine.validate.AudioProbe.meta(bytes) match {
        case Some(m) => Multimodal.MediaMeta(
          kind = "audio", width = -1, height = -1,
          nFrames = math.min(m.nSamples, Int.MaxValue.toLong).toInt,
          sampleRateHz = m.sampleRateHz, channels = m.channels,
          bitsPerSample = m.bitsPerSample,
          nBytes = bytes.length.toLong, sha256 = sha256Hex(bytes),
          decodeStatus = "ok")
        case None => decodeStub(kind, rawBytes)
      }
    case "video" =>
      // REAL header decode for MP4 (ISO-BMFF box walk) and RIFF AVI
      // containers ([[graft.engine.validate.VideoProbe.meta]]) —
      // width/height from the video track header, duration from the
      // movie header, frame count from the sample index; containers
      // the probe cannot read (mkv/webm) fall through to the stub.
      val bytes = if (rawBytes == null) Array.empty[Byte] else rawBytes
      graft.engine.validate.VideoProbe.meta(bytes) match {
        case Some(m) => Multimodal.MediaMeta(
          kind = "video", width = m.width, height = m.height,
          nFrames = math.min(m.nFrames, Int.MaxValue.toLong).toInt,
          sampleRateHz = 0, channels = 0, bitsPerSample = 0,
          nBytes = bytes.length.toLong, sha256 = sha256Hex(bytes),
          decodeStatus = "ok")
        case None => decodeStub(kind, rawBytes)
      }
    case "document" =>
      // REAL structural probe for every document modality
      // ([[graft.engine.read.DocumentProbe]] — format by magic, PDF
      // page count/encryption from the xref walk, no text decode);
      // page count rides `nFrames`. Encrypted documents inventory
      // with an "encrypted" status so a curation pass can count and
      // route them.
      val bytes = if (rawBytes == null) Array.empty[Byte] else rawBytes
      graft.engine.read.DocumentProbe.probe(bytes) match {
        case Some(m) => Multimodal.MediaMeta(
          kind = "document", width = -1, height = -1,
          nFrames = math.max(m.units, 0),
          sampleRateHz = 0, channels = 0, bitsPerSample = 0,
          nBytes = bytes.length.toLong, sha256 = sha256Hex(bytes),
          decodeStatus = if (m.encrypted) "encrypted" else "ok")
        case None => Multimodal.MediaMeta(
          kind = "document", width = -1, height = -1, nFrames = 0,
          sampleRateHz = 0, channels = 0, bitsPerSample = 0,
          nBytes = bytes.length.toLong, sha256 = sha256Hex(bytes),
          decodeStatus = "not a readable document")
      }
    case _ => decodeStub(kind, rawBytes)
  }

  /** STUB FEATURE EXTRACTOR — deterministic byte-class counts standing
    * in for a real embedding model (none installed in this container):
    * [vowels, digits, spaces, lowercase, uppercase, sentence punct].
    * Integer counts are exactly representable in float32, so downstream
    * cosine math is bit-reproducible across engines. Replace with a
    * real encoder (ONNX/DJL) to go live — the signature and the
    * per-partition batch shape are the production contract.
    */
  def featureStub(bytes: Array[Byte]): Array[Float] = {
    val f = new Array[Float](6)
    if (bytes == null) return f // null payload → zero vector (zero norm)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      if (b == 'a' || b == 'e' || b == 'i' || b == 'o' || b == 'u') f(0) += 1
      if (b >= '0' && b <= '9') f(1) += 1
      if (b == ' ') f(2) += 1
      if (b >= 'a' && b <= 'z') f(3) += 1
      if (b >= 'A' && b <= 'Z') f(4) += 1
      if (b == '.' || b == ',' || b == '!' || b == '?' || b == ';' || b == ':') f(5) += 1
      i += 1
    }
    f
  }

  /** STUB DECODE — deterministic fake for the AUDIO/VIDEO kinds: those
    * codecs are not installed in this container. Dimensions derive from
    * the first payload bytes so results are stable across
    * runs/executors; `sha256`/`nBytes` are real. Replace this body with
    * javacv / soundfile calls to go live — the signature is the
    * production contract (images already decode for real, see
    * [[decode]]).
    */
  def decodeStub(kind: String, rawBytes: Array[Byte]): Multimodal.MediaMeta = {
    // Null payload = missing media: degenerate (empty) meta, same
    // contract as featureStub's zero vector — never an NPE mid-job.
    val bytes = if (rawBytes == null) Array.empty[Byte] else rawBytes
    val b0 = if (bytes.nonEmpty) bytes(0) & 0xff else 0
    val b1 = if (bytes.length > 1) bytes(1) & 0xff else 0
    val sha = sha256Hex(bytes)
    Multimodal.MediaMeta(
      kind = kind,
      width = (b0 % 64 + 1) * 16,
      height = (b1 % 64 + 1) * 16,
      nFrames = if (kind == "video") bytes.length % 300 + 1 else 1,
      sampleRateHz = if (kind == "audio") 16000 else 0,
      channels = if (kind == "audio") 1 else 0,
      bitsPerSample = if (kind == "audio") 16 else 0,
      nBytes = bytes.length.toLong,
      sha256 = sha,
      decodeStatus = "stubbed")
  }
}
