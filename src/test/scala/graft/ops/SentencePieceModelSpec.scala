package graft.ops

import java.io.ByteArrayOutputStream

import graft.SparkSpec

/** SentencePiece `.model` protobuf interop: byte-level golden check
  * of the writer, a parse of independently authored bytes (including
  * unknown fields that must be skipped by wire type), the
  * save→load→segment round trip against the in-engine Unigram
  * encoder, and trained-model round-tripping.
  */
class SentencePieceModelSpec extends SparkSpec {

  // independent protobuf author (never the ops writer)
  private def varint(v0: Long): Array[Byte] = {
    val out = new ByteArrayOutputStream(); var v = v0
    while ((v & ~0x7FL) != 0) { out.write(((v & 0x7F) | 0x80).toInt); v >>>= 7 }
    out.write(v.toInt); out.toByteArray
  }
  private def tagOf(field: Int, wire: Int): Array[Byte] =
    varint((field.toLong << 3) | wire)
  private def ld(field: Int, body: Array[Byte]): Array[Byte] =
    tagOf(field, 2) ++ varint(body.length.toLong) ++ body
  private def pieceMsg(piece: String, score: Float, tpe: Int,
                       extra: Array[Byte] = Array.empty): Array[Byte] = {
    val pb = piece.getBytes("UTF-8")
    val bits = java.lang.Float.floatToIntBits(score)
    ld(1, pb) ++
      Array(0x15.toByte, (bits & 0xFF).toByte, ((bits >> 8) & 0xFF).toByte,
        ((bits >> 16) & 0xFF).toByte, ((bits >> 24) & 0xFF).toByte) ++
      Array(0x18.toByte) ++ varint(tpe.toLong) ++ extra
  }

  test("parse: independently authored bytes, unknown fields skipped by wire type") {
    val model =
      ld(1, pieceMsg("<unk>", -7.5f, SentencePieceModel.TypeUnknown)) ++
      ld(1, pieceMsg("<s>", 0f, SentencePieceModel.TypeControl)) ++
      // a piece message carrying an unknown length-delimited field 99
      ld(1, pieceMsg("▁he", -1.5f, SentencePieceModel.TypeNormal,
        extra = ld(99, "future".getBytes("UTF-8")))) ++
      ld(1, pieceMsg("llo", -2.25f, SentencePieceModel.TypeUserDefined)) ++
      ld(1, pieceMsg("<0x41>", -10f, SentencePieceModel.TypeByte)) ++
      // trainer_spec: unknown varint field 1, then model_type=1, vocab_size
      ld(2, Array(0x08.toByte) ++ varint(42L) ++
        Array(0x18.toByte) ++ varint(1L) ++
        Array(0x20.toByte) ++ varint(5L)) ++
      // an unknown TOP-LEVEL fixed64 field must be skipped too
      tagOf(77, 1) ++ Array.fill(8)(0x11.toByte)
    val spm = SentencePieceModel.parse(model, "authored")
    assert(spm.pieces == Seq("▁he" -> -1.5, "llo" -> -2.25))
    assert(spm.unkScore.contains(-7.5) && spm.unkPiece.contains("<unk>"))
    assert(spm.controls == Seq("<s>") && spm.bytePieces == 1)
    assert(spm.modelType.contains(1))
  }

  test("writer golden bytes: the serialized layout is the documented wire format") {
    val got = SentencePieceModel.serialize(Seq("ab" -> -1.0), -5.0)
    val want =
      ld(1, pieceMsg("<unk>", -5f, SentencePieceModel.TypeUnknown)) ++
      ld(1, pieceMsg("<s>", 0f, SentencePieceModel.TypeControl)) ++
      ld(1, pieceMsg("</s>", 0f, SentencePieceModel.TypeControl)) ++
      ld(1, pieceMsg("ab", -1f, SentencePieceModel.TypeNormal)) ++
      ld(2, Array(0x18.toByte) ++ varint(1L) ++
        Array(0x20.toByte) ++ varint(4L))
    assert(got.toSeq == want.toSeq)
  }

  test("save → load round trip: same pieces, same unk score, identical segmentation") {
    val pieces = Seq("hel" -> -1.0, "lo" -> -1.25, "hello" -> -2.0,
      "h" -> -3.0, "e" -> -3.0, "l" -> -3.0, "o" -> -3.0)
    val path = tmpDir("spm").resolve("m.model").toString
    SentencePieceModel.save(pieces, -9.5, path, sc.hadoopConfiguration)
    val spm = SentencePieceModel.load(spark, path)
    assert(spm.pieces == pieces && spm.unkScore.contains(-9.5))
    assert(spm.modelType.contains(1))
    val e1 = new VocabTokenizer.UnigramEncoder(pieces.toArray, -9.5)
    val e2 = new VocabTokenizer.UnigramEncoder(spm.pieces.toArray,
      spm.unkScore.get)
    for (w <- Seq("hello", "hell", "helloo", "xyz", "ohell"))
      assert(e1.encodeWord(w).toSeq == e2.encodeWord(w).toSeq, w)
  }

  test("trained in-engine unigram model round-trips through .model") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "low lower lowest new newer newest"),
      (2L, "low low new new wider wide"),
      (3L, "the newest lower wide low")).toDF("doc_id", "text")
    val trained = VocabTokenizer.learnUnigram(corpus, "text",
      vocabSize = 24)
    val path = tmpDir("spmtr").resolve("trained.model").toString
    SentencePieceModel.save(trained, -20.0, path, sc.hadoopConfiguration)
    val spm = SentencePieceModel.load(spark, path)
    // float32 storage: scores agree to float precision, order preserved
    assert(spm.pieces.map(_._1) == trained.map(_._1))
    spm.pieces.zip(trained).foreach { case ((_, got), (_, want)) =>
      assert(math.abs(got - want) <= math.abs(want) * 1e-6 + 1e-9)
    }
    val e1 = new VocabTokenizer.UnigramEncoder(trained.toArray, -20.0)
    val e2 = new VocabTokenizer.UnigramEncoder(spm.pieces.toArray,
      spm.unkScore.get)
    for (w <- Seq("lowest", "newest", "wider", "low", "zzz"))
      assert(e1.encodeWord(w).toSeq == e2.encodeWord(w).toSeq, w)
  }

  test("every byte prefix of a valid model parses or fails loud — never hangs or index-crashes") {
    val full = SentencePieceModel.serialize(
      Seq("▁the" -> -1.0, "cat" -> -2.5, "s" -> -3.25), -7.0)
    for (n <- 0 to full.length) {
      val prefix = java.util.Arrays.copyOfRange(full, 0, n)
      try { SentencePieceModel.parse(prefix, s"prefix-$n"); () }
      catch { case _: IllegalArgumentException => () }
    }
    // deterministic pseudo-random corruptions: single byte flips
    for (i <- full.indices by 7) {
      val mut = full.clone(); mut(i) = (mut(i) ^ 0x5A).toByte
      try { SentencePieceModel.parse(mut, s"flip-$i"); () }
      catch { case _: IllegalArgumentException => () }
    }
  }

  test("malformed models fail loud") {
    def msg(b: Array[Byte]): String =
      intercept[IllegalArgumentException](
        SentencePieceModel.parse(b, "bad")).getMessage
    assert(msg(Array.empty).contains("no segmenting pieces"))
    // truncated length-delimited payload
    assert(msg(Array(0x0A.toByte, 0x7F.toByte, 0x01.toByte))
      .contains("truncated"))
    // piece entry with no piece string
    val noPiece = ld(1, Array(0x15.toByte, 0, 0, 0, 0).map(_.toByte))
    assert(msg(noPiece).contains("without a piece string"))
  }
}
