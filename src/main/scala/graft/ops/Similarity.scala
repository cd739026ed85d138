package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{GraftFunctions => F}

/** Similarity search over an embedding column (`Array[Float]`).
  *
  * Shapes:
  *  - brute-force: broadcast the query set against ONE scan of the
  *    corpus; exact, cost = scan × |Q|. The per-query rank is a window
  *    partitioned by query id — with few queries and huge N, prefer
  *    more shuffle partitions or the IVF path.
  *  - IVF: assign every vector to its nearest centroid once (scan ×
  *    |C| with centroids broadcast), then probe only the `nprobe`
  *    nearest buckets per query. The probed fraction ≈ nprobe/|C|.
  *
  * Centroid choice is pluggable — pass any small DataFrame of
  * `(cent_id, cent_emb)`; k-means, a sample, or a stratified subset
  * all work. Everything downstream is exact given the assignment.
  */
object Similarity {

  /** Bounded per-query heap, ordered worst-first ((cos asc, id desc) at
    * the head) so the root is the element to evict. */
  private type Heap = collection.mutable.PriorityQueue[(Double, Long)]
  private val worstFirst: Ordering[(Double, Long)] =
    Ordering.by { case (cos, id) => (-cos, id) }

  /** Keep `(cos, id)` iff it beats the current worst under the
    * (cos desc, id asc) rank order. */
  private def offer(h: Heap, k: Int, cos: Double, id: Long): Unit = {
    if (h.size < k) h.enqueue((cos, id))
    else {
      val (wc, wi) = h.head
      if (cos > wc || (cos == wc && id < wi)) { h.dequeue(); h.enqueue((cos, id)) }
    }
  }

  /** Exact cosine — delegates to the shared float-array kernel
    * ([[graft.functions.VectorOpsUtil.cosine]]) so the heap path and the
    * codegen'd SQL kernel can never drift apart in accumulation order
    * (rank parity with the oracle gates depends on bit-identical sums).
    */
  private def cosine(vec: Array[Float], qvec: Array[Float]): Double =
    graft.functions.VectorOpsUtil.cosine(vec, qvec)

  /** Exact top-k neighbors for each query vector:
    * `(q_id, rank, neighbor_id, cos)`.
    *
    * Physical shape: partition-local bounded heaps (mapPartitions) emit
    * at most `partitions × |Q| × k` candidates, then one small window
    * ranks them globally. The naive alternative — window over the full
    * `N × |Q|` cross product — shuffles the whole scored corpus into
    * |Q| partitions; the heap version shuffles only the candidates, so
    * it survives N at 100 TB with tiny |Q|. Exact: the global top-k is
    * always contained in the union of per-partition top-k.
    *
    * Queries are collected to the driver (they broadcast to every task);
    * the query SET must be driver-sized — guarded at 100k.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
                     idCol: String, vecCol: String, k: Int): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val qArr: Array[(Long, Array[Float])] = queries
      .select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])].collect()
    require(qArr.length <= 100000,
      s"query set too large to broadcast (${qArr.length} > 100000)")
    val qB = spark.sparkContext.broadcast(qArr)

    val candidates = corpus.select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val qs = qB.value
        val heaps = qs.map { case (qid, _) =>
          qid -> collection.mutable.PriorityQueue.empty[(Double, Long)](worstFirst)
        }.toMap
        it.foreach { case (id, vec) =>
          var i = 0
          while (i < qs.length) {
            val (qid, qvec) = qs(i)
            if (id != qid) offer(heaps(qid), k, cosine(vec, qvec), id)
            i += 1
          }
        }
        heaps.iterator.flatMap { case (qid, h) =>
          h.iterator.map { case (cos, id) => (qid, id, cos) }
        }
      }.toDF("q_id", "neighbor_id", "cos")

    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("neighbor_id"))
    candidates
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("q_id", "rank", "neighbor_id", "cos")
  }

  /** Bucket assignment: each corpus vector's nearest centroid
    * (tie-break on smallest centroid id). One scan, centroids broadcast.
    *
    * The argmax is a `max_by` over a lexicographic (cos, -cent_id)
    * struct — a hash aggregate with map-side partial combine. The
    * window-function alternative (`row_number` over the N×|C| cross
    * product) shuffles and SORTS every expanded row into per-id
    * partitions; at 100 TB that sort dominates, while this aggregate
    * reduces each id's |C| rows to one before the exchange.
    */
  def ivfAssign(corpus: DataFrame, centroids: DataFrame,
                idCol: String, vecCol: String): DataFrame = {
    corpus.crossJoin(broadcast(centroids))
      .withColumn("__ccos", F.cosineSim(col(vecCol), col("cent_emb")))
      .groupBy(col(idCol))
      .agg(max_by(
        struct(col("cent_id"), col(vecCol).as("__vec")),
        struct(col("__ccos"), (-col("cent_id")).as("__tie"))).as("__best"))
      .select(col(idCol), col("__best.__vec").as(vecCol),
        col("__best.cent_id").as("bucket"))
  }

  /** Fixed-iteration Lloyd's k-means over the embedding column,
    * producing the `(cent_id, cent_emb)` frame [[ivfTopK]] wants — no
    * more hand-fed centroids.
    *
    * Deterministic by construction (oracle-checkable):
    *  - init: every `step`-th vector by id (`id % step == 0`), centroid
    *    id = source vector id;
    *  - each iteration: cosine assignment ([[ivfAssign]] — broadcast
    *    centroids, map-side `max_by` argmax) then per-dimension mean via
    *    `posexplode` → (bucket, pos) partial-aggregated avg → re-
    *    assembled ordered array. All DataFrame aggregation — no driver
    *    loops over data, no RDD collects;
    *  - new coordinates are rounded through FLOAT: double-precision sums
    *    differ in the last ulp across partition orders, and the
    *    float32 round-trip absorbs that, keeping runs (and the SQL
    *    oracle) bit-identical;
    *  - empty clusters drop out (standard Lloyd's degeneracy; with
    *    every-Nth init each centroid starts with at least its own
    *    source vector).
    *
    * Iterations are eagerly checkpointed ([[Checkpoints.truncate]]) —
    * same plan-growth rule as `Dedup.duplicateGroups`. Cost per iteration = one corpus scan ×
    * |C| (broadcast) + one shuffle keyed (bucket, pos); |C| · dim
    * values move in the final reassembly. At 100 TB: train on a
    * sampled corpus (`df.sample`) and assign the full corpus once with
    * the result — Lloyd's converges on a sample; nothing requires the
    * full pass per iteration.
    */
  def kmeans(corpus: DataFrame, idCol: String, vecCol: String,
             step: Long, iters: Int): DataFrame = {
    // Rounds tracker: reliable-checkpoint files of iteration N-1 are
    // deleted once iteration N materializes (bounded DFS footprint).
    val rounds = new Checkpoints.Rounds
    var cents = rounds.truncate(corpus.filter(col(idCol) % step === 0)
      .select(col(idCol).cast("long").as("cent_id"), col(vecCol).as("cent_emb")))
    // Fail loud, not empty: an id space with no multiple of `step`
    // would otherwise train zero centroids and make every downstream
    // ivfTopK silently return no neighbors.
    require(!cents.isEmpty,
      s"kmeans init selected no centroids: no id in '$idCol' is a multiple of $step")
    for (_ <- 1 to iters) {
      val assigned = ivfAssign(corpus, cents, idCol, vecCol)
      cents = rounds.truncate(assigned
        .select(col("bucket").as("cent_id"),
          posexplode(col(vecCol)).as(Seq("__pos", "__v")))
        .groupBy("cent_id", "__pos")
        .agg(avg(col("__v").cast("double")).as("__m"))
        .groupBy("cent_id")
        .agg(transform(
          array_sort(collect_list(struct(col("__pos"), col("__m")))),
          s => s.getField("__m").cast("float")).as("cent_emb")))
    }
    cents
  }

  /** IVF top-k: search only the `nprobe` buckets nearest each query.
    * `(q_id, rank, neighbor_id)` — approximate (recall < 1 when a true
    * neighbor lives in an unprobed bucket).
    *
    * Physical shape: the probe-side candidates (≈ N·nprobe/|C| rows per
    * query) are reduced by partition-local bounded heaps BEFORE the
    * rank window — the same shape as [[bruteForceTopK]]. The earlier
    * `row_number` window over the raw join output shuffled every
    * candidate of a query into one partition and sorted it there; with
    * few queries against a 100 TB corpus that one task owns a huge
    * slice. The heap pass emits at most `partitions × |Q| × k` rows,
    * so the final window ranks a driver-trivial frame. Exact given the
    * probed buckets: the per-query global top-k is contained in the
    * union of per-partition top-k.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, centroids: DataFrame,
              idCol: String, vecCol: String, k: Int, nprobe: Int): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val assigned = ivfAssign(corpus, centroids, idCol, vecCol)
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("__q"))
    val pw = Window.partitionBy("q_id").orderBy(col("__pcos").desc, col("cent_id"))
    val probes = q.crossJoin(broadcast(centroids))
      .withColumn("__pcos", F.cosineSim(col("__q"), col("cent_emb")))
      .withColumn("__pr", row_number().over(pw))
      .filter(col("__pr") <= nprobe)
      .select(col("q_id"), col("__q"), col("cent_id").as("bucket"))
    val candidates = assigned.join(broadcast(probes), "bucket")
      .filter(col(idCol) =!= col("q_id"))
      .select(col("q_id").cast("long"), col(idCol).cast("long"),
        col(vecCol), col("__q"))
      .as[(Long, Long, Array[Float], Array[Float])]
      .mapPartitions { it =>
        val heaps = collection.mutable.HashMap.empty[Long, Heap]
        it.foreach { case (qid, id, vec, qvec) =>
          val h = heaps.getOrElseUpdate(qid,
            collection.mutable.PriorityQueue.empty(worstFirst))
          offer(h, k, cosine(vec, qvec), id)
        }
        heaps.iterator.flatMap { case (qid, h) =>
          h.iterator.map { case (cos, id) => (qid, id, cos) }
        }
      }.toDF("q_id", "neighbor_id", "cos")
    val fw = Window.partitionBy("q_id").orderBy(col("cos").desc, col("neighbor_id"))
    candidates
      .withColumn("rank", row_number().over(fw).cast("long"))
      .filter(col("rank") <= k)
      .select("q_id", "rank", "neighbor_id")
  }

  // ------------------------------------------------------------------
  // Product quantization (Jégou, Douze & Schmid 2011, "Product
  // Quantization for Nearest Neighbor Search" — public knowledge).
  // The memory-bounded ANN path: a d-dim float vector (256 bytes at
  // d=64) compresses to m sub-codes (~m bytes), so a 100 TB embedding
  // corpus's SEARCH structure fits a cluster's RAM and scoring reads
  // no raw vectors at all — scan codes, sum per-subspace lookup-table
  // entries. Compose with IVF (train on a sample, encode everything,
  // probe buckets, ADC-score codes) for the standard IVFPQ layout.
  // ------------------------------------------------------------------

  /** Train a PQ codebook: split the vector into `m` equal sub-spaces
    * and run [[kmeans]]-style Lloyd's independently in each — here ONE
    * dataframe program trains all m sub-quantizers simultaneously
    * (the sub id is just another grouping key; no per-subspace jobs).
    *
    * Deterministic like [[kmeans]]: init takes every `step`-th vector
    * by id as one centroid per subspace (code = source vector id — a
    * LABEL, not a dense index), assignment is argmin L2 with
    * smallest-code tie-break, means round-trip through float32, rounds
    * are eagerly checkpointed. Returns `(sub, code, cent)`.
    *
    * 100 TB shape: train on a driver-chosen sample (`corpus.sample`)
    * — Lloyd's converges on a sample — then [[pqEncode]] the full
    * corpus once. Assignment cost is the textbook m·k distance
    * evaluations per vector, map-side partial-aggregated; only
    * (sub, code, pos, partial-mean) tuples shuffle.
    */
  def trainPq(corpus: DataFrame, idCol: String, vecCol: String,
              m: Int, step: Long, iters: Int): DataFrame = {
    require(m >= 1, s"trainPq needs m >= 1 subspaces, got $m")
    val rounds = new Checkpoints.Rounds
    val subs = subVectors(corpus, idCol, vecCol, m)
    var book = rounds.truncate(subs.filter(col("__id") % step === 0)
      .select(col("sub"), col("__id").as("code"), col("sv").as("cent")))
    require(!book.isEmpty,
      s"trainPq init selected no centroids: no id in '$idCol' is a multiple of $step")
    for (_ <- 1 to iters) {
      val assigned = pqAssign(subs, book)
      val means = assigned
        .select(col("sub"), col("code"),
          posexplode(col("sv")).as(Seq("__pos", "__v")))
        .groupBy("sub", "code", "__pos")
        .agg(avg(col("__v").cast("double")).as("__mean"))
        .groupBy("sub", "code")
        .agg(transform(
          array_sort(collect_list(struct(col("__pos"), col("__mean")))),
          s => s.getField("__mean").cast("float")).as("__new"))
      // Left-join onto the previous book: a centroid that attracted no
      // sub-vectors this round keeps its old position instead of
      // silently vanishing (per-subspace k would otherwise decay below
      // the init size, shrinking the code space).
      book = rounds.truncate(book
        .withColumnRenamed("cent", "__prev")
        .join(means, Seq("sub", "code"), "left")
        .select(col("sub"), col("code"),
          coalesce(col("__new"), col("__prev")).as("cent")))
    }
    book
  }

  /** Train a PQ codebook AND encode the corpus off ONE sub-vector
    * pass (the [[ivfPqTrainEncode]] pattern for the plain-PQ index):
    * the exploded sub-vector frame — a full corpus explode plus the
    * dimension probe — is persisted and shared by the training
    * iterations and the encode aggregation instead of being rebuilt
    * by a separate [[pqEncode]] call; the encoded frame is
    * checkpoint-truncated before the cache releases. Same
    * `(book, encoded)` as [[trainPq]] then [[pqEncode]] by
    * construction (identical sub-vector values feed both).
    */
  def pqTrainEncode(corpus: DataFrame, idCol: String, vecCol: String,
                    m: Int, step: Long, iters: Int)
  : (DataFrame, DataFrame) = {
    require(m >= 1, s"pqTrainEncode needs m >= 1 subspaces, got $m")
    val rounds = new Checkpoints.Rounds
    val subs = subVectors(corpus, idCol, vecCol, m)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      var book = rounds.truncate(subs.filter(col("__id") % step === 0)
        .select(col("sub"), col("__id").as("code"), col("sv").as("cent")))
      require(!book.isEmpty,
        s"pqTrainEncode init selected no centroids: no id in '$idCol' " +
          s"is a multiple of $step")
      for (_ <- 1 to iters) {
        val assigned = pqAssign(subs, book)
        val means = assigned
          .select(col("sub"), col("code"),
            posexplode(col("sv")).as(Seq("__pos", "__v")))
          .groupBy("sub", "code", "__pos")
          .agg(avg(col("__v").cast("double")).as("__mean"))
          .groupBy("sub", "code")
          .agg(transform(
            array_sort(collect_list(struct(col("__pos"), col("__mean")))),
            s => s.getField("__mean").cast("float")).as("__new"))
        book = rounds.truncate(book
          .withColumnRenamed("cent", "__prev")
          .join(means, Seq("sub", "code"), "left")
          .select(col("sub"), col("code"),
            coalesce(col("__new"), col("__prev")).as("cent")))
      }
      val enc = Checkpoints.truncate(pqAssign(subs, book)
        .groupBy(col("__id"))
        .agg(transform(
          array_sort(collect_list(struct(col("sub"), col("code")))),
          s => s.getField("code")).as("codes"))
        .select(col("__id").as(idCol), col("codes")))
      (book, enc)
    } finally subs.unpersist()
  }

  /** `(__id, sub, sv)` — each vector exploded into its m sub-vectors.
    * The dimension is probed from one row at construction and must be
    * divisible by m (slice would silently truncate the tail otherwise)
    * — an eager fail-loud, like kmeans' empty-init require. Every OTHER
    * row is then asserted to match that dimension with a per-row
    * codegen'd raise_error: a ragged embedding column would otherwise
    * slice short and null-pad distances downstream.
    *
    * `carry` names input columns to ride along unchanged (per-id
    * constants like the IVF bucket) so a consumer never has to join
    * them back on afterwards.
    */
  private def subVectors(corpus: DataFrame, idCol: String, vecCol: String,
                         m: Int, carry: Seq[String] = Nil): DataFrame = {
    val first = corpus.select(size(col(vecCol)).as("__d")).limit(1).collect()
    require(first.nonEmpty, "PQ needs a non-empty corpus to size subspaces")
    val d = first(0).getInt(0)
    require(d > 0 && d % m == 0,
      s"PQ subspaces m=$m must divide the vector dimension d=$d")
    val subDim = d / m
    val structs = array((0 until m).map { s =>
      struct(lit(s).as("sub"),
        slice(col("__vec"), s * subDim + 1, subDim).as("sv"))
    }: _*)
    corpus.select(col(idCol).cast("long").as("__id") +: carry.map(col) :+
        when(size(col(vecCol)) === d, col(vecCol))
          .otherwise(raise_error(concat(
            lit(s"PQ: ragged embedding dimension: expected $d, got "),
            size(col(vecCol)).cast("string"),
            lit(s" at $idCol="), col(idCol).cast("string"))))
          .as("__vec"): _*)
      .select(col("__id") +: carry.map(col) :+ explode(structs).as("__s"): _*)
      .select(col("__id") +: carry.map(col) :+ col("__s.sub").as("sub") :+
        col("__s.sv").as("sv"): _*)
  }

  /** Squared L2 between two float arrays as portable HOF algebra
    * (sequential accumulation — same order everywhere).
    */
  private def l2sq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) =>
        (x.cast("double") - y.cast("double")) *
          (x.cast("double") - y.cast("double"))),
      lit(0.0), (acc, v) => acc + v)

  /** Argmin-L2 sub-quantizer assignment: broadcast equi-join on `sub`
    * (never a cross product), `min_by` over the lexicographic
    * (distance, code) struct — the [[ivfAssign]] aggregate shape, so
    * each sub-vector's k candidate rows reduce map-side. `carry`
    * columns (per-id constants) ride as extra grouping keys — same
    * groups, since they are functionally dependent on `__id`.
    */
  private def pqAssign(subs: DataFrame, book: DataFrame,
                       carry: Seq[String] = Nil): DataFrame =
    subs.join(broadcast(book), "sub")
      .withColumn("__dist", l2sq(col("sv"), col("cent")))
      .groupBy("__id", (carry :+ "sub"): _*)
      .agg(min_by(struct(col("code"), col("sv")),
        struct(col("__dist"), col("code"))).as("__best"))
      .select(col("__id") +: carry.map(col) :+ col("sub") :+
        col("__best.code").as("code") :+ col("__best.sv").as("sv"): _*)

  /** Encode every vector as its m sub-codes, ordered by subspace:
    * `(<idCol>, codes: array<long>)`. Pure DataFrame algebra — the
    * codebook broadcasts, distances reduce map-side, and the corpus is
    * read exactly once.
    */
  def pqEncode(corpus: DataFrame, codebook: DataFrame,
               idCol: String, vecCol: String): DataFrame = {
    val m = codebook.select("sub").distinct().count().toInt
    pqAssign(subVectors(corpus, idCol, vecCol, m), codebook)
      .groupBy(col("__id"))
      .agg(transform(
        array_sort(collect_list(struct(col("sub"), col("code")))),
        s => s.getField("code")).as("codes"))
      .select(col("__id").as(idCol), col("codes"))
  }

  /** Asymmetric-distance top-k over PQ codes: each query precomputes a
    * per-subspace lookup table (dot(q_sub, cent) and ||cent||²), and
    * scoring a corpus vector is m table lookups — NO raw vectors are
    * read, the scan touches only `(id, codes)`. Cosine is assembled
    * from the tables: dot ≈ Σ_m LUT_dot, ‖x‖ ≈ √(Σ_m LUT_norm²) —
    * EXACT (not approximate) whenever the codebook reconstructs the
    * vector exactly, the regime the gate pins; recall under real
    * compression is spec-tested.
    *
    * Physical shape mirrors [[bruteForceTopK]]: codebook + queries
    * broadcast (driver-size guarded), partition-local bounded heaps,
    * then one window over candidates. `(q_id, rank, neighbor_id, cos)`.
    */
  def pqTopK(encoded: DataFrame, queries: DataFrame, codebook: DataFrame,
             idCol: String, vecCol: String, k: Int): DataFrame = {
    val spark = encoded.sparkSession
    import spark.implicits._
    val bookArr: Array[(Int, Long, Array[Float])] = codebook
      .select(col("sub").cast("int"), col("code").cast("long"), col("cent"))
      .as[(Int, Long, Array[Float])].collect()
    require(bookArr.length <= 1000000,
      s"codebook too large to broadcast (${bookArr.length} > 1e6 entries)")
    val qArr: Array[(Long, Array[Float])] = queries
      .select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])].collect()
    require(qArr.length <= 100000,
      s"query set too large to broadcast (${qArr.length} > 100000)")
    val m = bookArr.map(_._1).distinct.length
    val bookB = spark.sparkContext.broadcast(bookArr)
    val qB = spark.sparkContext.broadcast(qArr)

    val candidates = encoded
      .select(col(idCol).cast("long"), col("codes"))
      .as[(Long, Array[Long])]
      .mapPartitions { it =>
        val qs = qB.value
        // Codes are LABELS (trainPq uses source vector ids — any long),
        // so they cannot be bit-packed into a (sub, code) long key.
        // Densify: each (sub, code) gets a per-subspace slot once per
        // partition; all LUTs become flat arrays indexed [sub][slot],
        // so the hot scoring loop is pure array reads.
        val codeSlot = Array.fill(m)(new java.util.HashMap[Long, Integer]())
        val cents = Array.fill(m)(
          collection.mutable.ArrayBuffer.empty[Array[Float]])
        bookB.value.foreach { case (sub, code, cent) =>
          require(sub >= 0 && sub < m, s"pqTopK: subspace id $sub out of [0,$m)")
          if (codeSlot(sub).get(code) == null) {
            codeSlot(sub).put(code, cents(sub).length)
            cents(sub) += cent
          }
        }
        // norm² LUT: [sub][slot] -> ||cent||²
        val norm2: Array[Array[Double]] = cents.map(
          _.map(c => graft.functions.VectorOpsUtil.dot(c, c)).toArray)
        // dot LUT: [query][sub][slot] -> dot(q_sub, cent)
        val dotLut: Array[Array[Array[Double]]] = qs.map { case (_, qvec) =>
          val subDim = qvec.length / m
          Array.tabulate(m) { sub =>
            cents(sub).map { cent =>
              var s = 0.0
              var i = 0
              while (i < cent.length) {
                s += cent(i).toDouble * qvec(sub * subDim + i).toDouble
                i += 1
              }
              s
            }.toArray
          }
        }
        val qNorm: Array[Double] = qs.map { case (_, qvec) =>
          math.sqrt(graft.functions.VectorOpsUtil.dot(qvec, qvec))
        }
        val heaps: Array[Heap] = qs.map(_ =>
          collection.mutable.PriorityQueue.empty[(Double, Long)](worstFirst))
        val slots = new Array[Int](m)
        it.foreach { case (id, codes) =>
          var n2 = 0.0
          var sub = 0
          while (sub < codes.length) {
            val sl = codeSlot(sub).get(codes(sub))
            if (sl == null) throw new IllegalArgumentException(
              s"pqTopK: code ${codes(sub)} in subspace $sub not in codebook")
            slots(sub) = sl
            n2 += norm2(sub)(sl)
            sub += 1
          }
          val xn = math.sqrt(n2)
          var qi = 0
          while (qi < qs.length) {
            val qid = qs(qi)._1
            if (id != qid) {
              val lut = dotLut(qi)
              var d = 0.0
              var s = 0
              while (s < codes.length) {
                d += lut(s)(slots(s))
                s += 1
              }
              val qn = qNorm(qi)
              val cos = if (qn == 0.0 || xn == 0.0) 0.0 else d / (qn * xn)
              offer(heaps(qi), k, cos, id)
            }
            qi += 1
          }
        }
        heaps.iterator.zipWithIndex.flatMap { case (h, qi) =>
          h.iterator.map { case (cos, id) => (qs(qi)._1, id, cos) }
        }
      }.toDF("q_id", "neighbor_id", "cos")

    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("neighbor_id"))
    candidates
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("q_id", "rank", "neighbor_id", "cos")
  }

  // ------------------------------------------------------------------
  // IVF-PQ: the composed production index (Jégou, Douze & Schmid 2011
  // §IV) — coarse cells bound the probed fraction, PQ codes bound the
  // bytes per vector. Encode: assign each vector to its nearest coarse
  // centroid, PQ-encode the RESIDUAL x − c(bucket) (residual energy is
  // far below vector energy, so the same code budget quantizes much
  // finer). Search: probe the nprobe nearest cells per query and
  // ADC-score codes — dot(q, x̂) = dot(q, c) + Σ_m LUT[sub][code] and
  // ‖x̂‖² = ‖c‖² + 2·Σ_m cross[bucket][sub][code] + Σ_m ‖cent‖², all
  // table lookups; the scan reads only (id, bucket, codes).
  // ------------------------------------------------------------------

  /** Coarse-assign and subtract: `(<idCol>, bucket, __res)` with
    * `__res = vec − cent(bucket)` rounded through float32 (both
    * operands are float; the float difference is what the codebook
    * trains on and what the oracle restates).
    */
  private def residuals(corpus: DataFrame, coarse: DataFrame,
                        idCol: String, vecCol: String): DataFrame =
    ivfAssign(corpus, coarse, idCol, vecCol)
      .join(broadcast(coarse.select(col("cent_id").as("bucket"),
        col("cent_emb").as("__cent"))), "bucket")
      .select(col(idCol), col("bucket"),
        zip_with(col(vecCol), col("__cent"),
          (x, c) => (x - c).cast("float")).as("__res"))

  /** Train the residual codebook of an IVF-PQ index: coarse-assign,
    * subtract, then [[trainPq]] on the residuals (same determinism:
    * every-`step`-th init, argmin-L2, float32 means, checkpointed
    * rounds). Returns the `(sub, code, cent)` frame [[ivfPqEncode]] /
    * [[ivfPqTopK]] consume. At 100 TB: pass a SAMPLE as `corpus` —
    * Lloyd's converges on a sample — and encode the full corpus once.
    */
  def trainIvfPq(corpus: DataFrame, coarse: DataFrame, idCol: String,
                 vecCol: String, m: Int, step: Long, iters: Int): DataFrame =
    trainPq(residuals(corpus, coarse, idCol, vecCol)
      .select(col(idCol), col("__res")), idCol, "__res", m, step, iters)

  /** Encode the corpus against a coarse quantizer + residual codebook:
    * `(<idCol>, bucket, codes)`. ONE pass: the bucket rides the
    * exploded sub-vector rows as a carry column and the per-id code
    * aggregation groups on `(id, bucket)` (the bucket is functionally
    * dependent on the id, so the groups — and the codes — are
    * identical to a plain per-id aggregation). The former shape
    * consumed the residual frame twice (PQ-encode branch + a bucket
    * join-back), which re-executed the coarse-assignment scan and paid
    * an id-keyed shuffle join of two corpus-sized frames — at 100 TB
    * that is a whole extra corpus scan plus a payload shuffle for a
    * column this pass already had in hand.
    */
  def ivfPqEncode(corpus: DataFrame, coarse: DataFrame, codebook: DataFrame,
                  idCol: String, vecCol: String): DataFrame =
    encodeResiduals(residuals(corpus, coarse, idCol, vecCol), codebook, idCol)

  /** PQ-encode a residual frame `(<idCol>, bucket, __res)`, keeping the
    * bucket: one broadcast equi-join on `sub`, one (id, bucket)-keyed
    * aggregation — no join-back, no second residual pass. `knownM`
    * skips the subspace-count probe job when the caller trained the
    * codebook itself and already knows m.
    */
  private def encodeResiduals(res: DataFrame, codebook: DataFrame,
                              idCol: String,
                              knownM: Option[Int] = None): DataFrame = {
    val m = knownM.getOrElse(
      codebook.select("sub").distinct().count().toInt)
    pqAssign(subVectors(res, idCol, "__res", m, carry = Seq("bucket")),
        codebook, carry = Seq("bucket"))
      .groupBy("__id", "bucket")
      .agg(transform(
        array_sort(collect_list(struct(col("sub"), col("code")))),
        s => s.getField("code")).as("codes"))
      .select(col("__id").as(idCol), col("bucket"), col("codes"))
  }

  /** Train AND encode an IVF-PQ index off ONE residual pass: the
    * coarse-assignment scan (assign + subtract — itself a full corpus
    * pass) is computed once and persisted across the two consumers
    * instead of once for training and again for encoding. Training
    * materializes eagerly (checkpointed Lloyd's rounds), the encoded
    * frame is checkpoint-truncated before the residual cache is
    * released — so the returned frames never recompute the residual
    * subtree. Same `(book, encoded)` as calling [[trainIvfPq]] then
    * [[ivfPqEncode]] — this overload exists because at any scale those
    * two calls pay the coarse assignment twice (and at 100 TB the
    * training call is typically handed a SAMPLE, where this overload
    * is for the same-frame case the gates pin).
    */
  def ivfPqTrainEncode(corpus: DataFrame, coarse: DataFrame, idCol: String,
                       vecCol: String, m: Int, step: Long, iters: Int)
  : (DataFrame, DataFrame) = {
    val res = residuals(corpus, coarse, idCol, vecCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val book = trainPq(res.select(col(idCol), col("__res")),
        idCol, "__res", m, step, iters)
      val enc = Checkpoints.truncate(
        encodeResiduals(res, book, idCol, knownM = Some(m)))
      (book, enc)
    } finally res.unpersist()
  }

  /** ADC top-k over an IVF-PQ index: probe the `nprobe` coarse cells
    * nearest each query, score ONLY codes in probed cells, assemble
    * cosine from lookup tables — no raw corpus vector is read.
    * `(q_id, rank, neighbor_id, cos)`; exact whenever the codebook
    * reconstructs the residuals exactly (the gate regime), recall <
    * 1 under real compression (spec-measured).
    *
    * Physical shape: coarse centroids, codebook and queries broadcast
    * (each driver-size guarded); candidates = encoded ⋈ broadcast
    * probes on the bucket key (partition-pruned equi-join — the scan
    * touches ≈ nprobe/|C| of the corpus); partition-local bounded
    * heaps; one final window over `partitions × |Q| × k` rows. The
    * per-query dot LUTs and per-bucket cross LUTs are built lazily
    * per partition, so a task pays only for the (query, bucket) pairs
    * it actually sees.
    */
  def ivfPqTopK(encoded: DataFrame, queries: DataFrame, coarse: DataFrame,
                codebook: DataFrame, idCol: String, vecCol: String,
                k: Int, nprobe: Int): DataFrame = {
    val spark = encoded.sparkSession
    import spark.implicits._
    val bookArr: Array[(Int, Long, Array[Float])] = codebook
      .select(col("sub").cast("int"), col("code").cast("long"), col("cent"))
      .as[(Int, Long, Array[Float])].collect()
    require(bookArr.length <= 1000000,
      s"codebook too large to broadcast (${bookArr.length} > 1e6 entries)")
    val coarseArr: Array[(Long, Array[Float])] = coarse
      .select(col("cent_id").cast("long"), col("cent_emb"))
      .as[(Long, Array[Float])].collect()
    require(coarseArr.length <= 1000000,
      s"coarse centroid set too large to broadcast (${coarseArr.length} > 1e6)")
    val qArr: Array[(Long, Array[Float])] = queries
      .select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])].collect()
    require(qArr.length <= 100000,
      s"query set too large to broadcast (${qArr.length} > 100000)")
    val m = bookArr.map(_._1).distinct.length
    val bookB = spark.sparkContext.broadcast(bookArr)
    val coarseB = spark.sparkContext.broadcast(coarseArr)
    val qB = spark.sparkContext.broadcast(qArr)

    // Probe selection mirrors ivfTopK: nprobe nearest cells per query.
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("__q"))
    val pw = Window.partitionBy("q_id").orderBy(col("__pcos").desc, col("cent_id"))
    val probes = q.crossJoin(broadcast(coarse))
      .withColumn("__pcos", F.cosineSim(col("__q"), col("cent_emb")))
      .withColumn("__pr", row_number().over(pw))
      .filter(col("__pr") <= nprobe)
      .select(col("q_id").cast("long"), col("cent_id").as("bucket"))

    val candidates = encoded
      .join(broadcast(probes), "bucket")
      .filter(col(idCol) =!= col("q_id"))
      .select(col("q_id"), col(idCol).cast("long"), col("bucket").cast("long"),
        col("codes"))
      .as[(Long, Long, Long, Array[Long])]
      .mapPartitions { it =>
        // residual codebook, densified per subspace (codes are labels)
        val codeSlot = Array.fill(m)(new java.util.HashMap[Long, Integer]())
        val cents = Array.fill(m)(
          collection.mutable.ArrayBuffer.empty[Array[Float]])
        bookB.value.foreach { case (sub, code, cent) =>
          require(sub >= 0 && sub < m, s"ivfPqTopK: subspace id $sub out of [0,$m)")
          if (codeSlot(sub).get(code) == null) {
            codeSlot(sub).put(code, cents(sub).length)
            cents(sub) += cent
          }
        }
        val rNorm2: Array[Array[Double]] = cents.map(
          _.map(c => graft.functions.VectorOpsUtil.dot(c, c)).toArray)
        val coarseMap = new java.util.HashMap[Long, Array[Float]]()
        coarseB.value.foreach { case (cid, cemb) => coarseMap.put(cid, cemb) }
        val qMap = new java.util.HashMap[Long, Array[Float]]()
        qB.value.foreach { case (qid, qvec) => qMap.put(qid, qvec) }
        // lazy per-partition caches — built only for seen keys
        val qNorm = new java.util.HashMap[Long, java.lang.Double]()
        val cNorm2 = new java.util.HashMap[Long, java.lang.Double]()
        val dotQC = new java.util.HashMap[(Long, Long), java.lang.Double]()
        // cross[bucket] : [sub][slot] -> dot(c_sub, cent)
        val cross = new java.util.HashMap[Long, Array[Array[Double]]]()
        // dotLut[q] : [sub][slot] -> dot(q_sub, cent)
        val dotLut = new java.util.HashMap[Long, Array[Array[Double]]]()
        def subLuts(v: Array[Float]): Array[Array[Double]] = {
          val subDim = v.length / m
          Array.tabulate(m) { sub =>
            cents(sub).map { cent =>
              var s = 0.0
              var i = 0
              while (i < cent.length) {
                s += cent(i).toDouble * v(sub * subDim + i).toDouble
                i += 1
              }
              s
            }.toArray
          }
        }
        val heaps = collection.mutable.HashMap.empty[Long, Heap]
        it.foreach { case (qid, id, bucket, codes) =>
          val qvec = qMap.get(qid)
          val cemb = coarseMap.get(bucket)
          require(qvec != null, s"ivfPqTopK: probe query $qid not in query set")
          require(cemb != null, s"ivfPqTopK: bucket $bucket not in coarse set")
          val qLut = { // per-query residual dot LUT
            var l = dotLut.get(qid)
            if (l == null) { l = subLuts(qvec); dotLut.put(qid, l) }
            l
          }
          val bLut = { // per-bucket cross LUT
            var l = cross.get(bucket)
            if (l == null) { l = subLuts(cemb); cross.put(bucket, l) }
            l
          }
          val qcKey = (qid, bucket)
          var qc = dotQC.get(qcKey)
          if (qc == null) {
            qc = graft.functions.VectorOpsUtil.dot(qvec, cemb)
            dotQC.put(qcKey, qc)
          }
          var cn2 = cNorm2.get(bucket)
          if (cn2 == null) {
            cn2 = graft.functions.VectorOpsUtil.dot(cemb, cemb)
            cNorm2.put(bucket, cn2)
          }
          var qn = qNorm.get(qid)
          if (qn == null) {
            qn = math.sqrt(graft.functions.VectorOpsUtil.dot(qvec, qvec))
            qNorm.put(qid, qn)
          }
          var d = qc.doubleValue()
          var crossSum = 0.0
          var r2 = 0.0
          var sub = 0
          while (sub < codes.length) {
            val sl = codeSlot(sub).get(codes(sub))
            if (sl == null) throw new IllegalArgumentException(
              s"ivfPqTopK: code ${codes(sub)} in subspace $sub not in codebook")
            d += qLut(sub)(sl)
            crossSum += bLut(sub)(sl)
            r2 += rNorm2(sub)(sl)
            sub += 1
          }
          val xn = math.sqrt(cn2.doubleValue() + 2.0 * crossSum + r2)
          val cos =
            if (qn.doubleValue() == 0.0 || xn == 0.0) 0.0
            else d / (qn.doubleValue() * xn)
          offer(heaps.getOrElseUpdate(qid,
            collection.mutable.PriorityQueue.empty(worstFirst)), k, cos, id)
        }
        heaps.iterator.flatMap { case (qid, h) =>
          h.iterator.map { case (cos, id) => (qid, id, cos) }
        }
      }.toDF("q_id", "neighbor_id", "cos")

    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("neighbor_id"))
    candidates
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("q_id", "rank", "neighbor_id", "cos")
  }

  // ------------------------------------------------------------------
  // Index persistence: an IVF-PQ index is built once over the corpus
  // and served for months — the encode pass (the expensive full scan)
  // must never rerun because a search job restarted. Three parquet
  // frames under one directory: coarse/ (cent_id, cent_emb),
  // codebook/ (sub, code, cent), encoded/ (id, bucket, codes) — the
  // encoded frame is REPARTITIONED BY BUCKET on write, so a search's
  // probe join prunes whole files (the probed-cell scan reads only
  // nprobe/|C| of the index bytes, which is the point of IVF).
  // ------------------------------------------------------------------

  /** Persist an IVF-PQ index. `encoded` is [[ivfPqEncode]]'s output;
    * overwrite semantics. The id column is stored under its given
    * name and recovered by [[loadIvfPqIndex]].
    */
  def saveIvfPqIndex(path: String, coarse: DataFrame, codebook: DataFrame,
                     encoded: DataFrame, idCol: String): Unit = {
    require(encoded.columns.toSeq == Seq(idCol, "bucket", "codes"),
      s"encoded frame must be ($idCol, bucket, codes), got " +
        encoded.columns.mkString(","))
    coarse.select("cent_id", "cent_emb")
      .write.mode("overwrite").parquet(s"$path/coarse")
    codebook.select("sub", "code", "cent")
      .write.mode("overwrite").parquet(s"$path/codebook")
    encoded
      .repartition(col("bucket"))
      .write.mode("overwrite").partitionBy("bucket")
      .parquet(s"$path/encoded")
  }

  /** Load a persisted index: `(coarse, codebook, encoded)`, ready for
    * [[ivfPqTopK]]. The bucket partitioning survives the round-trip
    * (hive-style dirs), so probe joins prune at the file level.
    */
  def loadIvfPqIndex(spark: org.apache.spark.sql.SparkSession,
                     path: String, idCol: String)
  : (DataFrame, DataFrame, DataFrame) = {
    val coarse = spark.read.parquet(s"$path/coarse")
    val codebook = spark.read.parquet(s"$path/codebook")
    val encoded = spark.read.parquet(s"$path/encoded")
      .select(col(idCol), col("bucket").cast("long"), col("codes"))
    (coarse, codebook, encoded)
  }
}
