package graft.ops

import java.io.{BufferedInputStream, EOFException, InputStream}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** fastText supervised-model import — load the `.bin` artifact class
  * the published curation stack actually ships (CCNet's language-id
  * and quality classifiers, FineWeb's edu scorer are all fastText
  * supervised binaries) and score documents with it as a Spark
  * column, no fastText runtime required.
  *
  * Format per the public fastText sources (all fields little-endian,
  * `FastText::signature/loadModel`, `Args::load`, `Dictionary::load`,
  * `DenseMatrix::load`):
  *
  * {{{
  * int32 magic = 793712314, int32 version (= 12 here)
  * args: 11×int32 (dim ws epoch minCount neg wordNgrams loss model
  *       bucket minn maxn) + int32 lrUpdateRate + double t
  * dict: int32 size nwords nlabels, int64 ntokens pruneidx_size,
  *       then size × (NUL-terminated word bytes, int64 count, int8 type)
  * int8 quant_input, input matrix (int64 rows, int64 cols, floats)
  * int8 qout,        output matrix (int64 rows, int64 cols, floats)
  * }}}
  *
  * Prediction replicates `Dictionary::getLine` + `Model::predict`
  * exactly: whitespace tokens plus a trailing EOS `</s>`; in-vocab
  * words contribute their row (plus their precomputed char-ngram rows
  * when `maxn > 0`), OOV words contribute char-ngram rows of
  * `<word>`, word n-grams hash combinations of the per-token FNV
  * hashes into the bucket range; the document vector is the MEAN of
  * all contributed input rows; label scores are `softmax(W_out·h)`
  * (loss=softmax) or `sigmoid` per label (loss=ova). Documents are
  * scored as ONE fastText line — embedded newlines fold into the
  * whitespace split (the CCNet preprocessing convention), with EOS
  * appended once at the end, matching `predictLine` on the joined
  * text.
  *
  * Out of contract, rejected loudly: quantized models (`.ftz`),
  * pruned dictionaries (`pruneidx_size > 0` — these only arise from
  * quantization), hierarchical-softmax loss, and format versions
  * other than 12 (every published artifact of the class above is
  * v12).
  *
  * Scale shape: the model is a driver-side parse (bounded by the
  * artifact size, ~100 MB for the published classifiers) broadcast
  * once per executor; scoring is a per-row kernel over the broadcast
  * arrays — a loop-dominated byte/hash kernel no built-in expresses
  * (UDF by the repo's documented precedent), one scan, no shuffle.
  */
object FastText {

  val Magic = 793712314
  val Version = 12
  val Eos = "</s>"
  val Bow = "<"
  val Eow = ">"
  val LabelPrefix = "__label__"

  /** Loss / model enums per `args.h`. */
  val LossHs = 1; val LossNs = 2; val LossSoftmax = 3; val LossOva = 4
  val ModelCbow = 1; val ModelSg = 2; val ModelSup = 3

  /** A loaded supervised model. `input` is row-major
    * `(nwords + bucket) × dim`; `output` is `nlabels × dim`;
    * `wordSubwords(i)` is word `i`'s precomputed row list (the word
    * row itself, plus its char-ngram rows when `maxn > 0`).
    */
  final case class Model(
      dim: Int, bucket: Int, wordNgrams: Int, minn: Int, maxn: Int,
      loss: Int, nwords: Int,
      vocab: Map[String, Int], labels: Array[String],
      wordSubwords: Array[Array[Int]],
      input: Array[Float], inputRows: Int,
      output: Array[Float]) extends Serializable {

    /** fastText's FNV-1a (32-bit, SIGN-EXTENDED byte XOR — the
      * dictionary.cc variant; equals standard FNV-1a on ASCII).
      */
    def hash(s: String): Int = {
      val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      var h = 0x811c9dc5 // 2166136261
      var i = 0
      while (i < bytes.length) {
        h = h ^ bytes(i) // sign-extends, matching uint32(int8(c))
        h = h * 16777619
        i += 1
      }
      h
    }

    /** `Dictionary::computeSubwords` on the already-wrapped
      * `<word>`: char-ngrams of byte-length-aware UTF-8 chars, length
      * `minn..maxn`, skipping the 1-char ngrams that touch either
      * boundary marker; each pushes `nwords + hash % bucket`.
      */
    private[ops] def computeSubwords(word: Array[Byte], out: ArrayBuffer[Int]): Unit = {
      var i = 0
      while (i < word.length) {
        if ((word(i) & 0xC0) != 0x80) {
          var j = i; var n = 1
          val ngram = new java.io.ByteArrayOutputStream()
          while (j < word.length && n <= maxn) {
            ngram.write(word(j)); j += 1
            while (j < word.length && (word(j) & 0xC0) == 0x80) {
              ngram.write(word(j)); j += 1
            }
            if (n >= minn && !(n == 1 && (i == 0 || j == word.length))) {
              var h = 0x811c9dc5
              val nb = ngram.toByteArray
              var k = 0
              while (k < nb.length) { h = h ^ nb(k); h = h * 16777619; k += 1 }
              out += nwords + java.lang.Integer
                .remainderUnsigned(h, bucket)
            }
            n += 1
          }
        }
        i += 1
      }
    }

    /** `Dictionary::getLine` + `addWordNgrams`: the input-matrix row
      * list of one document line.
      */
    private[ops] def lineRows(text: String): Array[Int] = {
      val toks0 =
        if (text == null) Array.empty[String]
        else text.split("[ \t\n\f\r]+").filter(_.nonEmpty)
      val rows = new ArrayBuffer[Int]()
      val wordHashes = new ArrayBuffer[Int]()
      var stop = false
      val toks = toks0 :+ Eos // predictLine appends the newline → EOS
      var t = 0
      while (t < toks.length && !stop) {
        val tok = toks(t)
        val wid = vocab.getOrElse(tok, -1)
        val isLabel =
          if (wid >= 0) false // vocab holds WORD entries only
          else tok.startsWith(LabelPrefix)
        if (!isLabel) {
          if (wid < 0) {
            if (tok != Eos && maxn > 0)
              computeSubwords((Bow + tok + Eow)
                .getBytes(java.nio.charset.StandardCharsets.UTF_8), rows)
          } else if (maxn <= 0) rows += wid
          else rows ++= wordSubwords(wid)
          wordHashes += hash(tok)
        }
        if (tok == Eos) stop = true
        t += 1
      }
      // addWordNgrams: uint64 chain over the SIGN-EXTENDED int32
      // hashes (the C++ int32→uint64 conversion), unsigned modulo
      var i = 0
      while (i < wordHashes.length) {
        var h: Long = wordHashes(i).toLong
        var j = i + 1
        while (j < wordHashes.length && j < i + wordNgrams) {
          h = h * 116049371L + wordHashes(j).toLong
          rows += nwords + java.lang.Long.remainderUnsigned(h, bucket.toLong).toInt
          j += 1
        }
        i += 1
      }
      rows.toArray
    }

    /** Label probabilities for one document: softmax (loss=softmax)
      * or independent sigmoids (loss=ova) over `W_out · mean(rows)`.
      * Empty lines (only possible on null text with an OOV-subword-
      * free model) yield an empty array, like fastText's predict.
      */
    def predictAll(text: String): Array[Double] = {
      val rows = lineRows(text)
      if (rows.isEmpty) return Array.empty
      val hidden = new Array[Double](dim)
      var i = 0
      while (i < rows.length) {
        val off = rows(i) * dim
        var d = 0
        while (d < dim) { hidden(d) += input(off + d); d += 1 }
        i += 1
      }
      var d = 0
      while (d < dim) { hidden(d) /= rows.length; d += 1 }
      val logits = new Array[Double](labels.length)
      var l = 0
      while (l < labels.length) {
        val off = l * dim
        var z = 0.0
        var k = 0
        while (k < dim) { z += output(off + k) * hidden(k); k += 1 }
        logits(l) = z
        l += 1
      }
      if (loss == LossOva) logits.map(z => 1.0 / (1.0 + math.exp(-z)))
      else { // softmax (numerically shifted)
        val mx = logits.max
        val exps = logits.map(z => math.exp(z - mx))
        val s = exps.sum
        exps.map(_ / s)
      }
    }

    /** Top-k `(label, prob)` sorted by prob desc, label asc on ties
      * (deterministic under shuffle).
      */
    def predict(text: String, k: Int = 1): Array[(String, Double)] =
      predictAll(text).zip(labels)
        .sortBy { case (p, lab) => (-p, lab) }
        .take(k).map { case (p, lab) => (lab, p) }
  }

  // ------------------------------------------------------------ load

  private final class LeReader(in: InputStream) {
    private def b(): Int = {
      val v = in.read()
      if (v < 0) throw new EOFException("truncated fastText model")
      v
    }
    def i8(): Int = b()
    def i32(): Int = b() | (b() << 8) | (b() << 16) | (b() << 24)
    def i64(): Long = (i32().toLong & 0xFFFFFFFFL) | (i32().toLong << 32)
    def f64(): Double = java.lang.Double.longBitsToDouble(i64())
    def f32(): Float = java.lang.Float.intBitsToFloat(i32())
    def cstr(): String = {
      val buf = new java.io.ByteArrayOutputStream()
      var c = b()
      while (c != 0) { buf.write(c); c = b() }
      new String(buf.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
    }
    def floats(n: Long): Array[Float] = {
      require(n <= Int.MaxValue / 2, s"matrix too large to load: $n floats")
      val out = new Array[Float](n.toInt)
      val bytes = new Array[Byte](1 << 16)
      var filled = 0
      var idx = 0
      while (idx < out.length) {
        val remaining = (out.length - idx).toLong * 4 - filled
        val want = math.min(bytes.length - filled, remaining).toInt
        val got = in.read(bytes, filled, want)
        if (got < 0) throw new EOFException("truncated fastText matrix")
        filled += got
        val usable = filled / 4 * 4
        var o = 0
        while (o < usable) {
          out(idx) = java.lang.Float.intBitsToFloat(
            (bytes(o) & 0xFF) | ((bytes(o + 1) & 0xFF) << 8) |
              ((bytes(o + 2) & 0xFF) << 16) | ((bytes(o + 3) & 0xFF) << 24))
          idx += 1; o += 4
        }
        System.arraycopy(bytes, usable, bytes, 0, filled - usable)
        filled -= usable
      }
      out
    }
  }

  /** Parse a fastText supervised `.bin` from any Hadoop filesystem.
    * Fails loud on the out-of-contract shapes documented above.
    */
  def load(spark: SparkSession, path: String): Model = {
    val p = new org.apache.hadoop.fs.Path(path)
    val in = new BufferedInputStream(
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).open(p), 1 << 20)
    try {
      val r = new LeReader(in)
      val magic = r.i32()
      require(magic == Magic,
        s"$path: not a fastText model (magic $magic, want $Magic)")
      val version = r.i32()
      require(version == Version,
        s"$path: unsupported fastText format version $version (want $Version)")
      val dim = r.i32(); r.i32() /* ws */; r.i32() /* epoch */
      r.i32() /* minCount */; r.i32() /* neg */
      val wordNgrams = r.i32()
      val loss = r.i32()
      val model = r.i32()
      val bucket = r.i32()
      val minn = r.i32(); val maxn = r.i32()
      r.i32() /* lrUpdateRate */; r.f64() /* t */
      require(model == ModelSup,
        s"$path: model type $model is not supervised — train/score cbow/sg embeddings elsewhere")
      require(loss == LossSoftmax || loss == LossOva,
        s"$path: loss $loss unsupported (softmax=3 or one-vs-all=4 only; hierarchical softmax models are out of contract)")

      val size = r.i32(); val nwords = r.i32(); val nlabels = r.i32()
      r.i64() /* ntokens */
      val pruneSize = r.i64()
      require(pruneSize <= 0,
        s"$path: pruned dictionary (pruneidx_size=$pruneSize) — pruned/quantized models are out of contract")
      require(size == nwords + nlabels,
        s"$path: dict size $size != nwords $nwords + nlabels $nlabels")
      val vocab = Map.newBuilder[String, Int]
      val labels = new Array[String](nlabels)
      var i = 0
      while (i < size) {
        val w = r.cstr(); r.i64() /* count */
        val tpe = r.i8()
        if (tpe == 0) { require(i < nwords, s"$path: word entry at $i out of word range"); vocab += (w -> i) }
        else labels(i - nwords) = w
        i += 1
      }
      val quant = r.i8()
      require(quant == 0, s"$path: quantized input matrix (.ftz) is out of contract")
      val m1 = r.i64(); val n1 = r.i64()
      require(n1 == dim, s"$path: input matrix cols $n1 != dim $dim")
      require(m1 == nwords.toLong + bucket,
        s"$path: input matrix rows $m1 != nwords + bucket ${nwords.toLong + bucket}")
      val input = r.floats(m1 * n1)
      val qout = r.i8()
      require(qout == 0, s"$path: quantized output matrix is out of contract")
      val m2 = r.i64(); val n2 = r.i64()
      require(m2 == nlabels && n2 == dim,
        s"$path: output matrix $m2×$n2, want $nlabels×$dim")
      val output = r.floats(m2 * n2)

      val vmap = vocab.result()
      val base = Model(dim, bucket, wordNgrams, minn, maxn, loss, nwords,
        vmap, labels, Array.empty, input, m1.toInt, output)
      // initNgrams: precompute each word's subword rows (word row
      // first, then <word> char-ngrams; EOS gets only its own row)
      val subs =
        if (maxn <= 0) Array.empty[Array[Int]]
        else {
          val bywid = new Array[Array[Int]](nwords)
          vmap.foreach { case (w, wid) =>
            val buf = new ArrayBuffer[Int]()
            buf += wid
            if (w != Eos) base.computeSubwords((Bow + w + Eow)
              .getBytes(java.nio.charset.StandardCharsets.UTF_8), buf)
            bywid(wid) = buf.toArray
          }
          bywid
        }
      base.copy(wordSubwords = subs)
    } finally in.close()
  }

  /** Column face: top-1 prediction as
    * `struct<label: string, prob: double>` (null for the empty-line
    * case). The model rides a broadcast variable — one deserialization
    * per executor, not per task.
    */
  def predictCol(spark: SparkSession, model: Model, textCol: Column): Column = {
    val bc = spark.sparkContext.broadcast(model)
    val f = udf { text: String =>
      val top = bc.value.predict(text, 1)
      if (top.isEmpty) None else Some((top(0)._1, top(0)._2))
    }
    f(textCol).cast("struct<label:string,prob:double>")
  }

  /** All label probabilities as `map<string,double>` — the audit face
    * (score distributions, calibration checks).
    */
  def predictAllCol(spark: SparkSession, model: Model, textCol: Column): Column = {
    val bc = spark.sparkContext.broadcast(model)
    val f = udf { text: String =>
      val m = bc.value
      m.labels.zip(m.predictAll(text)).toMap
    }
    f(textCol)
  }

  // ------------------------------------------------------------ save

  /** Write a [[Model]] back in the same v12 binary layout — the
    * round-trip witness (load → save → load must be bit-identical on
    * the semantic fields), and the fixture author for specs/gates.
    */
  def save(model: Model, path: String,
           conf: org.apache.hadoop.conf.Configuration): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val out = new java.io.BufferedOutputStream(
      p.getFileSystem(conf).create(p, true), 1 << 20)
    def i8(v: Int): Unit = out.write(v & 0xFF)
    def i32(v: Int): Unit = { i8(v); i8(v >> 8); i8(v >> 16); i8(v >> 24) }
    def i64(v: Long): Unit = { i32(v.toInt); i32((v >> 32).toInt) }
    def f64(v: Double): Unit = i64(java.lang.Double.doubleToLongBits(v))
    try {
      i32(Magic); i32(Version)
      i32(model.dim); i32(5); i32(5); i32(1); i32(5); i32(model.wordNgrams)
      i32(model.loss); i32(ModelSup); i32(model.bucket)
      i32(model.minn); i32(model.maxn); i32(100); f64(1e-4)
      val nlabels = model.labels.length
      i32(model.nwords + nlabels); i32(model.nwords); i32(nlabels)
      i64(0L); i64(-1L)
      val byId = model.vocab.toSeq.sortBy(_._2)
      require(byId.map(_._2) == (0 until model.nwords),
        "vocab ids must be dense 0..nwords-1")
      byId.foreach { case (w, _) =>
        out.write(w.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        i8(0); i64(1L); i8(0)
      }
      model.labels.foreach { w =>
        out.write(w.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        i8(0); i64(1L); i8(1)
      }
      i8(0) // quant_input
      i64(model.inputRows.toLong); i64(model.dim.toLong)
      model.input.foreach(f => i32(java.lang.Float.floatToIntBits(f)))
      i8(0) // qout
      i64(nlabels.toLong); i64(model.dim.toLong)
      model.output.foreach(f => i32(java.lang.Float.floatToIntBits(f)))
    } finally out.close()
  }
}
