package graft.ops

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** fastText `.bin` import: the binary layout parsed from bytes
  * authored independently here (ByteBuffer, never FastText.save), the
  * dictionary-hash contract pinned against published FNV-1a vectors,
  * prediction hand-derived on a tiny model, the subword and word-ngram
  * row machinery cross-checked against an independent
  * reimplementation, and the save↔load round trip.
  */
class FastTextSpec extends SparkSpec {
  import spark.implicits._

  // ---- independent binary author (little-endian, v12 layout) -------
  private def authorBin(
      dim: Int, bucket: Int, wordNgrams: Int, minn: Int, maxn: Int,
      loss: Int, words: Seq[String], labels: Seq[String],
      input: Array[Float], output: Array[Float],
      magic: Int = FastText.Magic, version: Int = FastText.Version,
      quant: Int = 0, model: Int = FastText.ModelSup,
      pruneSize: Long = -1L): Array[Byte] = {
    val buf = ByteBuffer.allocate(1 << 20).order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(magic).putInt(version)
    buf.putInt(dim).putInt(5).putInt(5).putInt(1).putInt(5).putInt(wordNgrams)
    buf.putInt(loss).putInt(model).putInt(bucket)
    buf.putInt(minn).putInt(maxn).putInt(100).putDouble(1e-4)
    buf.putInt(words.size + labels.size).putInt(words.size).putInt(labels.size)
    buf.putLong(0L).putLong(pruneSize)
    words.foreach { w =>
      buf.put(w.getBytes("UTF-8")).put(0.toByte).putLong(1L).put(0.toByte)
    }
    labels.foreach { w =>
      buf.put(w.getBytes("UTF-8")).put(0.toByte).putLong(1L).put(1.toByte)
    }
    buf.put(quant.toByte)
    buf.putLong(words.size.toLong + bucket).putLong(dim.toLong)
    require(input.length == (words.size + bucket) * dim)
    input.foreach(buf.putFloat)
    buf.put(0.toByte)
    buf.putLong(labels.size.toLong).putLong(dim.toLong)
    require(output.length == labels.size * dim)
    output.foreach(buf.putFloat)
    val out = new Array[Byte](buf.position()); buf.rewind(); buf.get(out)
    out
  }

  private def writeBin(name: String, bytes: Array[Byte]): String = {
    val p = tmpDir("ft").resolve(name)
    java.nio.file.Files.write(p, bytes)
    p.toString
  }

  // independent FNV-1a (the spec's own constants, not the ops code)
  private def fnv(s: String): Int = {
    var h = 0x811c9dc5
    s.getBytes("UTF-8").foreach { b => h ^= b; h *= 16777619 }
    h
  }

  test("dictionary hash matches the published FNV-1a 32-bit vectors") {
    val m = FastText.Model(1, 1, 1, 0, 0, FastText.LossSoftmax, 0,
      Map.empty, Array.empty, Array.empty, Array.empty, 0, Array.empty)
    assert(m.hash("") == 0x811c9dc5)
    assert(m.hash("a") == 0xe40c292c)
    assert(m.hash("b") == 0xe70c2de5)
    assert(m.hash("abc") == 0x1a47e90b)
    // non-ASCII byte exercises the sign-extended XOR branch
    assert(m.hash("é") == fnv("é"))
  }

  test("load parses an independently authored v12 binary exactly") {
    val words = Seq("the", "cat", "</s>")
    val labels = Seq("__label__pos", "__label__neg")
    val dim = 2; val bucket = 4
    val input = Array.tabulate((words.size + bucket) * dim)(i => i * 0.5f)
    val output = Array[Float](1f, -1f, -0.5f, 2f)
    val path = writeBin("m.bin", authorBin(dim, bucket, 1, 0, 0,
      FastText.LossSoftmax, words, labels, input, output))
    val m = FastText.load(spark, path)
    assert(m.dim == 2 && m.bucket == 4 && m.nwords == 3 &&
      m.wordNgrams == 1 && m.minn == 0 && m.maxn == 0)
    assert(m.vocab == Map("the" -> 0, "cat" -> 1, "</s>" -> 2))
    assert(m.labels.toSeq == labels)
    assert(m.input.toSeq == input.toSeq && m.output.toSeq == output.toSeq)
  }

  test("prediction hand-derived: rows, mean vector, softmax") {
    val words = Seq("the", "cat", "</s>")
    val labels = Seq("__label__pos", "__label__neg")
    // input rows: the=(1,0), cat=(0,1), </s>=(2,2); bucket rows 0
    val input = Array[Float](1, 0, 0, 1, 2, 2, 0, 0, 0, 0, 0, 0, 0, 0)
    // output: pos=(1,2), neg=(2,1)
    val output = Array[Float](1, 2, 2, 1)
    val path = writeBin("hand.bin", authorBin(2, 4, 1, 0, 0,
      FastText.LossSoftmax, words, labels, input, output))
    val m = FastText.load(spark, path)
    // "the cat" + EOS → rows {0,1,2}; hidden = (1,1); logits pos=3, neg=3
    val p1 = m.predictAll("the cat")
    assert(math.abs(p1(0) - 0.5) < 1e-12 && math.abs(p1(1) - 0.5) < 1e-12)
    // "cat" + EOS → hidden = (1, 1.5); pos = 4, neg = 3.5 →
    // softmax: e^.5/(e^.5+1)
    val p2 = m.predictAll("cat")
    val want = math.exp(0.5) / (math.exp(0.5) + 1)
    assert(math.abs(p2(0) - want) < 1e-9)
    assert(m.predict("cat", 1).head._1 == "__label__pos")
    // OOV-only text with maxn=0 still scores via the EOS row
    val p3 = m.predictAll("zebra unknown")
    assert(p3.length == 2) // hidden = </s> row alone = (2,2)
    // null text = empty line + EOS
    assert(m.predictAll(null).length == 2)
  }

  test("word-ngram rows: uint64 chain over sign-extended hashes, unsigned modulo") {
    val words = Seq("a", "b", "</s>")
    val labels = Seq("__label__x")
    val dim = 1; val bucket = 5
    val input = Array.tabulate((3 + bucket) * dim)(i => (i + 1).toFloat)
    val output = Array[Float](1f)
    val path = writeBin("ng.bin", authorBin(dim, bucket, 2, 0, 0,
      FastText.LossSoftmax, words, labels, input, output))
    val m = FastText.load(spark, path)
    val rows = m.lineRows("a b")
    // words: a(0), b(1), </s>(2); bigrams (a,b), (b,</s>)
    def big(h1: Int, h2: Int): Int =
      3 + java.lang.Long.remainderUnsigned(
        h1.toLong * 116049371L + h2.toLong, bucket.toLong).toInt
    assert(rows.toSeq == Seq(0, 1, 2,
      big(fnv("a"), fnv("b")), big(fnv("b"), fnv("</s>"))))
  }

  test("subword rows: boundary-marked char ngrams, UTF-8 aware, EOS exempt") {
    val words = Seq("cat", "</s>")
    val labels = Seq("__label__x")
    val dim = 1; val bucket = 7; val minn = 2; val maxn = 3
    val input = Array.tabulate((2 + bucket) * dim)(i => (i + 1).toFloat)
    val output = Array[Float](1f)
    val path = writeBin("sw.bin", authorBin(dim, bucket, 1, minn, maxn,
      FastText.LossSoftmax, words, labels, input, output))
    val m = FastText.load(spark, path)
    // independent subword derivation for "<cat>": ngrams of len 2..3
    // starting at each char: <c <ca ca cat at at> t> (skip 1-char)
    val expect = Seq("<c", "<ca", "ca", "cat", "at", "at>", "t>")
      .map(g => 2 + java.lang.Integer.remainderUnsigned(fnv(g), bucket))
    assert(m.wordSubwords(0).toSeq == 0 +: expect)
    assert(m.wordSubwords(1).toSeq == Seq(1)) // EOS: own row only
    // OOV token goes through the same machinery on <word>
    val oov = m.lineRows("xy")
    val expOov = Seq("<x", "<xy", "xy", "xy>", "y>")
      .map(g => 2 + java.lang.Integer.remainderUnsigned(fnv(g), bucket))
    assert(oov.toSeq == expOov ++ Seq(1)) // then EOS subword list
    // multibyte char counts as ONE ngram char; the FULL wrapped word
    // is itself an ngram when its char length ≤ maxn (fastText keeps it)
    val sw = new scala.collection.mutable.ArrayBuffer[Int]()
    m.computeSubwords("<é>".getBytes("UTF-8"), sw)
    val expAcc = Seq("<é", "<é>", "é>")
      .map(g => 2 + java.lang.Integer.remainderUnsigned(fnv(g), bucket))
    assert(sw.toSeq == expAcc)
  }

  test("save → load round trip preserves the semantic fields") {
    val words = Seq("the", "cat", "</s>")
    val labels = Seq("__label__pos", "__label__neg")
    val input = Array.tabulate((3 + 4) * 2)(i => (i * 0.25f))
    val output = Array[Float](1, 2, 3, 4)
    val p0 = writeBin("rt.bin", authorBin(2, 4, 2, 0, 0,
      FastText.LossSoftmax, words, labels, input, output))
    val m = FastText.load(spark, p0)
    val p1 = tmpDir("ftrt").resolve("saved.bin").toString
    FastText.save(m, p1, sc.hadoopConfiguration)
    val m2 = FastText.load(spark, p1)
    assert(m2.vocab == m.vocab && m2.labels.toSeq == m.labels.toSeq &&
      m2.input.toSeq == m.input.toSeq && m2.output.toSeq == m.output.toSeq &&
      m2.dim == m.dim && m2.bucket == m.bucket &&
      m2.wordNgrams == m.wordNgrams)
    assert(m2.predictAll("the cat").toSeq == m.predictAll("the cat").toSeq)
  }

  test("out-of-contract models are rejected loudly") {
    val words = Seq("a", "</s>"); val labels = Seq("__label__x")
    val input = Array.tabulate((2 + 4) * 1)(_.toFloat)
    val output = Array[Float](1f)
    def bin(magic: Int = FastText.Magic, version: Int = 12,
            loss: Int = FastText.LossSoftmax, quant: Int = 0,
            model: Int = FastText.ModelSup, prune: Long = -1L) =
      writeBin(s"bad$magic$version$loss$quant$model$prune.bin",
        authorBin(1, 4, 1, 0, 0, loss, words, labels, input, output,
          magic = magic, version = version, quant = quant, model = model,
          pruneSize = prune))
    def msg(p: String): String =
      intercept[IllegalArgumentException](FastText.load(spark, p)).getMessage
    assert(msg(bin(magic = 42)).contains("magic"))
    assert(msg(bin(version = 11)).contains("version"))
    assert(msg(bin(loss = FastText.LossHs)).contains("hierarchical"))
    assert(msg(bin(quant = 1)).contains("quantized"))
    assert(msg(bin(model = FastText.ModelCbow)).contains("supervised"))
    assert(msg(bin(prune = 3L)).contains("pruned"))
  }

  test("every byte prefix of a valid binary loads or fails loud — never hangs or index-crashes") {
    val words = Seq("a", "b", "</s>"); val labels = Seq("__label__x")
    val input = Array.tabulate((3 + 4) * 2)(_.toFloat)
    val full = authorBin(2, 4, 2, 0, 0, FastText.LossSoftmax,
      words, labels, input, Array[Float](1f, 2f))
    val dir = tmpDir("ftfuzz")
    // step 3 keeps the loop fast while still crossing every section
    for (n <- 0 to full.length by 3) {
      val p = dir.resolve(s"p$n.bin")
      java.nio.file.Files.write(p, java.util.Arrays.copyOfRange(full, 0, n))
      try { FastText.load(spark, p.toString); () }
      catch {
        case _: IllegalArgumentException => ()
        case _: java.io.EOFException => ()
      }
    }
  }

  test("predictCol scores a frame distributively") {
    val words = Seq("good", "bad", "</s>")
    val labels = Seq("__label__pos", "__label__neg")
    val input = Array[Float](1, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
    val output = Array[Float](5, -5, -5, 5)
    val path = writeBin("col.bin", authorBin(2, 4, 1, 0, 0,
      FastText.LossSoftmax, words, labels, input, output))
    val m = FastText.load(spark, path)
    val df = Seq((1L, "good good"), (2L, "bad"), (3L, "good bad"))
      .toDF("id", "text")
    val got = df.select(col("id"),
        FastText.predictCol(spark, m, col("text")).as("p"))
      .select(col("id"), col("p.label"), round(col("p.prob"), 4))
      .as[(Long, String, Double)].collect().sortBy(_._1)
    assert(got(0)._2 == "__label__pos" && got(1)._2 == "__label__neg")
    assert(got(2)._3 == 0.5) // good+bad cancel → tie broken label-asc
    assert(got(2)._2 == "__label__neg")
  }
}
