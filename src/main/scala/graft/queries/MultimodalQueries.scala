package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal-column plumbing: media travel as opaque `binary` columns
  * with typed metadata alongside. The real decode (image/audio libs)
  * is not available in this container, so the "decode" here is a
  * QUERY-LOCAL deterministic pseudo-decode expressed as column ops:
  * byte length, content hash, and character-derived pseudo-dimensions.
  * (Deliberately NOT [[graft.multimodal.MediaDecoder.decodeStub]]'s
  * byte-based formula — `ascii()` works on codepoints and is what the
  * DuckDB oracle can mirror exactly; the stub decoder has its own unit
  * tests.) What the query proves end-to-end: binary payloads flow
  * through scans/groupBys without materializing on the driver, and
  * metadata extraction is a single codegen'd pass.
  */
object MultimodalQueries {

  /** m4 fixture: REAL encoded images (png/jpg/gif/bmp via ImageIO) plus
    * the three failure classes, with the expected dimensions/diagnosis
    * stored alongside the bytes at generation time — the m3
    * stored-expected-columns pattern. Spark must recover (w, h) from
    * the BYTES through the real [[graft.engine.validate.ImageProbe]]
    * header read (`image_validator.py:187-225`); the oracle just reads
    * the expected columns back. */
  private val m4Dir = "/tmp/graft_gate_m4_images"

  private def encodeImage(fmt: String, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, (x * 31 + y * 17) & 0xffffff); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(img, fmt, bos), s"no ImageIO writer for $fmt")
    bos.toByteArray
  }

  private def writeM4Fixture(s: SparkSession): Unit = {
    import s.implicits._
    val good: Seq[(Long, Array[Byte], Option[Int], Option[Int], String)] =
      for {
        (fmt, fi) <- Seq("png", "jpg", "gif", "bmp").zipWithIndex
        i <- 0 until 5
        w = 16 + 13 * i + fi
        h = 16 + 7 * i
      } yield ((fi * 10 + i).toLong, encodeImage(fmt, w, h),
        Some(w), Some(h), "ok")
    // Failure classes, matching ImageProbe.diagnose verbatim: empty
    // payload; non-image bytes; a PNG truncated mid-IHDR (signature
    // matches so a reader is selected, but the header read fails).
    val bad: Seq[(Long, Array[Byte], Option[Int], Option[Int], String)] = Seq(
      (100L, Array.emptyByteArray, None, None, "file is empty"),
      (101L, "definitely not an image".getBytes("UTF-8"), None, None,
        "not a recognized image format"),
      (102L, encodeImage("png", 32, 32).take(20), None, None,
        "image header could not be decoded"))
    s.createDataset(good ++ bad)
      .toDF("img_id", "payload", "exp_w", "exp_h", "exp_status")
      .coalesce(1).write.mode("overwrite").parquet(m4Dir)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // -- m4 / V10 kernel gate: the ImageProbe header read recovers the
    //    true dimensions from real encoded bytes of four formats, and
    //    classifies the three failure modes. -1 stands in for "no
    //    dimensions" so the int columns stay null-free (null-bearing
    //    int columns decay to float64 in the compare). ----------------
    "m4_image_dims" -> { (s, _) =>
      writeM4Fixture(s)
      val probe = udf { bytes: Array[Byte] =>
        graft.engine.validate.ImageProbe.dimensions(bytes) match {
          case Some((w, h)) => (w, h, "ok")
          case None => (-1, -1, graft.engine.validate.ImageProbe.diagnose(bytes))
        }
      }
      s.read.parquet(m4Dir)
        .withColumn("__p", probe(col("payload")))
        .select(col("img_id"), col("__p._1").as("w"), col("__p._2").as("h"),
          col("__p._3").as("status"))
        .orderBy("img_id")
    },

    // -- m5: the SAME real-decode kernel, but through the Multimodal
    //    withMeta path (typed mapPartitions batch decode + meta join on
    //    path) instead of a bare UDF — gating the full multimodal
    //    plumbing: binary payload → partition-batched MediaDecoder
    //    .decode → typed struct → joined back without row
    //    multiplication. Oracle reads the stored expected columns; the
    //    "ok"-status coalesce mirrors m4's -1 convention. -------------
    "m5_real_dims" -> { (s, _) =>
      writeM4Fixture(s)
      val media = s.read.parquet(m4Dir)
        .withColumn("path", concat(lit("mem://img/"), col("img_id")))
      graft.multimodal.Multimodal.withMeta(media, "image")
        .select(col("img_id"), col("meta.width").as("w"),
          col("meta.height").as("h"),
          col("meta.decodeStatus").as("status"))
        .orderBy("img_id")
    },

    "m1_binary_meta" -> { (s, d) =>
      // text → utf-8 bytes as the stand-in media payload
      val blob = col("text").cast("binary")
      val width = (ascii(substring(col("text"), 1, 1)) % 64 + 1) * 16
      val height = (ascii(substring(col("text"), 2, 1)) % 64 + 1) * 16
      Tables.documents(s, d)
        .withColumn("payload", blob)
        .withColumn("n_bytes", length(col("payload")))
        .withColumn("content_sha", sha2(col("payload"), 256))
        .withColumn("width", width)
        .withColumn("height", height)
        .groupBy("source")
        .agg(
          count(lit(1)).as("n_media"),
          sum("n_bytes").as("total_bytes"),
          countDistinct("content_sha").as("n_distinct_payloads"),
          // concat, not concat_ws: concat_ws IGNORES null args (a null
          // dim would yield "" and still count) while the oracle's ||
          // propagates NULL, which count(DISTINCT) skips — concat has
          // the same null-propagation as ||.
          countDistinct(concat(col("width").cast("string"), lit("x"),
            col("height").cast("string"))).as("n_resolutions"),
          max("width").as("max_w"),
          max("height").as("max_h"))
        .orderBy("source")
    },

    // -- m3: the full media→features→ANN composition: payload bytes →
    //    mapPartitions feature extraction (stub encoder, real batch
    //    plumbing) → brute-force top-k cosine search. Integer-count
    //    features are float32-exact, so the oracle's double math lands
    //    on identical cosines. ----------------------------------------
    "m3_feature_ann" -> { (s, d) =>
      val media = Tables.documents(s, d)
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
      def feats(m: org.apache.spark.sql.DataFrame) =
        graft.multimodal.Multimodal.featureExtract(m, "doc_id", "payload")
          .select(col("doc_id").as("vec_id"), col("features").as("embedding"))
      // Filter BEFORE extraction for the query side: the typed
      // mapPartitions blocks predicate pushdown, so filtering after
      // would feature-extract the whole corpus to fetch 3 vectors.
      graft.ops.Similarity
        .bruteForceTopK(feats(media), feats(media.filter(col("doc_id") < 3)),
          "vec_id", "embedding", k = 3)
        .select(col("q_id"), col("rank"), col("neighbor_id"),
          round(col("cos"), 6).as("cos_r"))
        .orderBy("q_id", "rank")
    },

    // V10 analogue: all media must share ONE resolution — report the
    // distinct-resolution inventory exactly like the image validator
    // (image_validator.py:250-307 collects the resolution set).
    "m2_resolution_check" -> { (s, d) =>
      val width = (ascii(substring(col("text"), 1, 1)) % 4 + 1) * 64
      val height = (ascii(substring(col("text"), 2, 1)) % 4 + 1) * 64
      Tables.documents(s, d)
        .withColumn("res", // concat ≡ oracle's || on NULL, see m1
          concat(width.cast("string"), lit("x"), height.cast("string")))
        .groupBy("res")
        .agg(count(lit(1)).as("n"),
          concat_ws(",", transform(slice(sort_array(collect_set(col("doc_id"))), 1, 3),
            x => x.cast("string"))).as("sample_ids"))
        .orderBy("res")
    })

  def oracle: Map[String, String] = Map(
    "m5_real_dims" ->
      s"""SELECT img_id, coalesce(exp_w, -1) AS w, coalesce(exp_h, -1) AS h,
         |  exp_status AS status
         |FROM read_parquet('$m4Dir/*.parquet')
         |ORDER BY img_id""".stripMargin,
    "m4_image_dims" ->
      s"""SELECT img_id, coalesce(exp_w, -1) AS w, coalesce(exp_h, -1) AS h,
         |  exp_status AS status
         |FROM read_parquet('$m4Dir/*.parquet')
         |ORDER BY img_id""".stripMargin,
    "m1_binary_meta" ->
      """SELECT source, count(*) AS n_media,
        | sum(octet_length(encode(text)))::BIGINT AS total_bytes,
        | count(DISTINCT sha256(text)) AS n_distinct_payloads,
        | count(DISTINCT ((ascii(substr(text,1,1)) % 64 + 1) * 16)::VARCHAR || 'x' ||
        |                ((ascii(substr(text,2,1)) % 64 + 1) * 16)::VARCHAR) AS n_resolutions,
        | max((ascii(substr(text,1,1)) % 64 + 1) * 16) AS max_w,
        | max((ascii(substr(text,2,1)) % 64 + 1) * 16) AS max_h
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    "m3_feature_ann" ->
      """WITH f AS (
        |  SELECT doc_id, [
        |    len(regexp_extract_all(text, '[aeiou]'))::DOUBLE,
        |    len(regexp_extract_all(text, '[0-9]'))::DOUBLE,
        |    len(regexp_extract_all(text, ' '))::DOUBLE,
        |    len(regexp_extract_all(text, '[a-z]'))::DOUBLE,
        |    len(regexp_extract_all(text, '[A-Z]'))::DOUBLE,
        |    len(regexp_extract_all(text, '[.,!?;:]'))::DOUBLE ] AS v
        |  FROM documents)
        |SELECT q_id, rank, neighbor_id, round(cos, 6) AS cos_r FROM (
        |  SELECT q_id, neighbor_id, cos,
        |    row_number() OVER (PARTITION BY q_id
        |      ORDER BY cos DESC, neighbor_id) AS rank
        |  FROM (
        |    -- zero-norm guard: the engine defines cosine(0-vec, x) = 0,
        |    -- while list_cosine_similarity yields NaN (which would sort
        |    -- FIRST under DESC and steal rank 1)
        |    SELECT q.doc_id AS q_id, c.doc_id AS neighbor_id,
        |      CASE WHEN isnan(list_cosine_similarity(c.v, q.v)) THEN 0.0
        |           ELSE list_cosine_similarity(c.v, q.v) END AS cos
        |    FROM f q JOIN f c ON q.doc_id < 3 AND c.doc_id != q.doc_id)
        |) WHERE rank <= 3 ORDER BY q_id, rank""".stripMargin,
    "m2_resolution_check" ->
      """SELECT res, count(*) AS n,
        | array_to_string(list_slice(list_sort(list(DISTINCT doc_id)), 1, 3), ',') AS sample_ids
        |FROM (
        |  SELECT doc_id,
        |    ((ascii(substr(text,1,1)) % 4 + 1) * 64)::VARCHAR || 'x' ||
        |    ((ascii(substr(text,2,1)) % 4 + 1) * 64)::VARCHAR AS res
        |  FROM documents)
        |GROUP BY 1 ORDER BY 1""".stripMargin)
}
