package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Similarity]] product quantization — what the ann_pq gate's exact
  * regime can't see: real-compression recall, the train/encode
  * algebra, dimension and guard failures.
  */
class ProductQuantSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic pseudo-embeddings: 16-dim, values from a hash mix —
    * no RNG state, same on every run.
    */
  private def vecs(n: Int): Seq[(Long, Array[Float])] =
    (0 until n).map { i =>
      val v = Array.tabulate(16) { j =>
        (((i * 2654435761L + j * 40503L) % 1000).toFloat / 500f) - 1f
      }
      (i.toLong, v)
    }

  test("exact regime: k = N codebook reproduces brute-force top-k") {
    val df = vecs(60).toDF("vec_id", "embedding")
    val book = Similarity.trainPq(df, "vec_id", "embedding",
      m = 4, step = 1, iters = 1)
    val enc = Similarity.pqEncode(df, book, "vec_id", "embedding")
    // with one centroid per source sub-vector, every vector
    // reconstructs exactly -> ADC cosine == exact cosine, ranks equal
    val queries = df.filter(col("vec_id") < 5)
    val pq = Similarity.pqTopK(enc, queries, book, "vec_id", "embedding", 4)
      .select("q_id", "rank", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val brute = Similarity.bruteForceTopK(df, queries, "vec_id", "embedding", 4)
      .select("q_id", "rank", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(pq == brute)
  }

  test("encode emits one code array per vector, ordered by subspace") {
    val df = vecs(12).toDF("vec_id", "embedding")
    val book = Similarity.trainPq(df, "vec_id", "embedding",
      m = 4, step = 3, iters = 1)
    val enc = Similarity.pqEncode(df, book, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(enc.size == 12)
    assert(enc.values.forall(_.length == 4))
    // codes are labels drawn from the init ids (multiples of step)
    val validCodes = (0L until 12L by 3L).toSet
    assert(enc.values.flatten.forall(validCodes))
    // a vector that seeded a centroid encodes to its own sub-vectors
    // after one no-drift iteration... at minimum, deterministically:
    val enc2 = Similarity.pqEncode(df.repartition(7), book,
      "vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(enc2 == enc)
  }

  test("real compression: recall@4 against brute force stays high") {
    val df = vecs(80).toDF("vec_id", "embedding")
    val book = Similarity.trainPq(df, "vec_id", "embedding",
      m = 4, step = 8, iters = 2) // 10 centroids per subspace over 80
    val enc = Similarity.pqEncode(df, book, "vec_id", "embedding")
    val queries = df.filter(col("vec_id") < 8)
    val pq = Similarity.pqTopK(enc, queries, book, "vec_id", "embedding", 4)
      .select("q_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = Similarity.bruteForceTopK(df, queries, "vec_id", "embedding", 4)
      .select("q_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (pq & brute).size.toDouble / brute.size
    assert(recall >= 0.5, s"recall@4 collapsed to $recall")
  }

  // ----------------------------------------------------------------
  // IVF-PQ composition
  // ----------------------------------------------------------------

  private def coarseOf(df: org.apache.spark.sql.DataFrame, every: Int) =
    df.filter(col("vec_id") % every === 0)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cent_emb"))

  test("ivfpq exact regime with full probing reproduces brute-force top-k") {
    val df = vecs(60).toDF("vec_id", "embedding")
    val coarse = coarseOf(df, 10) // 6 cells
    val book = Similarity.trainIvfPq(df, coarse, "vec_id", "embedding",
      m = 4, step = 1, iters = 1)
    val enc = Similarity.ivfPqEncode(df, coarse, book, "vec_id", "embedding")
    val queries = df.filter(col("vec_id") < 5)
    // nprobe = |C|: every cell probed, reconstruction exact -> brute
    val got = Similarity.ivfPqTopK(enc, queries, coarse, book,
        "vec_id", "embedding", k = 4, nprobe = 6)
      .select("q_id", "rank", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val brute = Similarity.bruteForceTopK(df, queries, "vec_id", "embedding", 4)
      .select("q_id", "rank", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(got == brute)
  }

  test("ivfpq encode carries the coarse bucket next to the codes") {
    val df = vecs(40).toDF("vec_id", "embedding")
    val coarse = coarseOf(df, 8) // 5 cells
    val book = Similarity.trainIvfPq(df, coarse, "vec_id", "embedding",
      m = 4, step = 4, iters = 1)
    val enc = Similarity.ivfPqEncode(df, coarse, book, "vec_id", "embedding")
    assert(enc.columns.toSeq == Seq("vec_id", "bucket", "codes"))
    assert(enc.count() == 40)
    // bucket agrees with the standalone coarse assignment
    val direct = Similarity.ivfAssign(df, coarse, "vec_id", "embedding")
      .select("vec_id", "bucket")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = enc.select("vec_id", "bucket")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == direct)
    // partitioning cannot change the encoding
    val enc2 = Similarity.ivfPqEncode(df.repartition(7), coarse, book,
      "vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2))).toSet
    val enc1 = enc
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2))).toSet
    assert(enc2 == enc1)
  }

  test("ivfpq narrow probing only searches probed cells") {
    val df = vecs(60).toDF("vec_id", "embedding")
    val coarse = coarseOf(df, 10)
    val book = Similarity.trainIvfPq(df, coarse, "vec_id", "embedding",
      m = 4, step = 1, iters = 1)
    val enc = Similarity.ivfPqEncode(df, coarse, book, "vec_id", "embedding")
    val queries = df.filter(col("vec_id") < 3)
    val got = Similarity.ivfPqTopK(enc, queries, coarse, book,
        "vec_id", "embedding", k = 60, nprobe = 1)
      .select("q_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // with one probed cell, every neighbor lives in the query's own cell
    val bucketOf = enc.select("vec_id", "bucket")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val probeOf = got.map(_._1).distinct.map { qid =>
      qid -> got.filter(_._1 == qid).map(n => bucketOf(n._2)).distinct
    }.toMap
    assert(probeOf.values.forall(_.length == 1),
      s"neighbors crossed cell boundaries under nprobe=1: $probeOf")
  }

  test("ivfpq real compression: recall@4 stays high, residuals help") {
    val df = vecs(80).toDF("vec_id", "embedding")
    val coarse = coarseOf(df, 16) // 5 cells
    val book = Similarity.trainIvfPq(df, coarse, "vec_id", "embedding",
      m = 4, step = 8, iters = 2) // 10 codes per subspace
    val enc = Similarity.ivfPqEncode(df, coarse, book, "vec_id", "embedding")
    val queries = df.filter(col("vec_id") < 8)
    val got = Similarity.ivfPqTopK(enc, queries, coarse, book,
        "vec_id", "embedding", k = 4, nprobe = 5) // all cells: isolate PQ loss
      .select("q_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = Similarity.bruteForceTopK(df, queries, "vec_id", "embedding", 4)
      .select("q_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (got & brute).size.toDouble / brute.size
    assert(recall >= 0.5, s"ivfpq recall@4 collapsed to $recall")
  }

  test("ivfpq index save/load round-trip searches identically") {
    val df = vecs(60).toDF("vec_id", "embedding")
    val coarse = coarseOf(df, 10)
    val book = Similarity.trainIvfPq(df, coarse, "vec_id", "embedding",
      m = 4, step = 6, iters = 1)
    val enc = Similarity.ivfPqEncode(df, coarse, book, "vec_id", "embedding")
    val queries = df.filter(col("vec_id") < 4)
    val fresh = Similarity.ivfPqTopK(enc, queries, coarse, book,
        "vec_id", "embedding", k = 3, nprobe = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val dir = tmpDir("ivfpq").toString + "/index"
    Similarity.saveIvfPqIndex(dir, coarse, book, enc, "vec_id")
    val (c2, b2, e2) = Similarity.loadIvfPqIndex(spark, dir, "vec_id")
    val loaded = Similarity.ivfPqTopK(e2, queries, c2, b2,
        "vec_id", "embedding", k = 3, nprobe = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(loaded == fresh)
    // the landed layout is bucket-partitioned (probe joins prune files)
    val dirs = new java.io.File(dir + "/encoded").listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("bucket="))
    assert(dirs.nonEmpty, "encoded frame lost its bucket partitioning")
    // a mis-shaped encoded frame is rejected before any write
    intercept[IllegalArgumentException] {
      Similarity.saveIvfPqIndex(dir, coarse, book,
        enc.select("vec_id", "codes", "bucket"), "vec_id")
    }
  }

  test("guards: m must divide the dimension; empty corpus fails loud") {
    val df = vecs(10).toDF("vec_id", "embedding")
    intercept[IllegalArgumentException] {
      Similarity.trainPq(df, "vec_id", "embedding", m = 5, step = 1, iters = 1)
    }
    intercept[IllegalArgumentException] {
      Similarity.trainPq(df.filter(col("vec_id") < 0), "vec_id", "embedding",
        m = 4, step = 1, iters = 1)
    }
  }
}
