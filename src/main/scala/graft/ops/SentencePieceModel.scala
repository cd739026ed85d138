package graft.ops

import java.io.ByteArrayOutputStream

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.SparkSession

/** SentencePiece `.model` interop — read/write the protobuf
  * `ModelProto` every SentencePiece consumer ships (HuggingFace
  * `spm_file`, T5/Llama tokenizer artifacts), so the in-engine
  * Unigram-LM ([[VocabTokenizer.learnUnigram]] +
  * [[VocabTokenizer.UnigramEncoder]]) round-trips through the format
  * the ecosystem actually exchanges — the tokenizer twin of the ARPA
  * round trip ([[LanguageModel.saveKn3Arpa]]).
  *
  * Wire format per the public `sentencepiece_model.proto`:
  *
  * {{{
  * message ModelProto {
  *   repeated SentencePiece pieces = 1;   // field 1, length-delimited
  *   optional TrainerSpec trainer_spec = 2; // model_type = field 3
  *   …
  * }
  * message SentencePiece {
  *   optional string piece = 1;  // length-delimited
  *   optional float  score = 2;  // fixed32
  *   optional Type   type  = 3;  // varint; NORMAL=1 UNKNOWN=2
  * }                             //   CONTROL=3 USER_DEFINED=4
  * }}}                           //   UNUSED=5 BYTE=6
  *
  * The parser is a minimal, spec-faithful protobuf reader: varints,
  * the four wire types, unknown fields skipped by type — so real
  * artifacts with trainer/normalizer specs and future fields load
  * fine. The writer emits pieces + a minimal unigram TrainerSpec.
  *
  * Scale note: a tokenizer model is task-binary-sized (≤ a few MB for
  * 250k pieces) — driver parse + closure shipping, the same contract
  * as [[VocabTokenizer.loadVocab]].
  */
object SentencePieceModel {

  val TypeNormal = 1; val TypeUnknown = 2; val TypeControl = 3
  val TypeUserDefined = 4; val TypeUnused = 5; val TypeByte = 6

  /** A parsed model: `pieces` are the segmenting entries (NORMAL +
    * USER_DEFINED, file order — feed them straight to
    * [[VocabTokenizer.UnigramEncoder]]); `unkScore` is the UNKNOWN
    * piece's score when present; `controls` (CONTROL: `<s>`, `</s>`,
    * pads) and `bytePieces` (`<0xNN>` byte-fallback entries) are
    * carried for inspection but never match raw text;
    * `modelType` from the trainer spec (1 = unigram) when present.
    */
  final case class Spm(
      pieces: Seq[(String, Double)],
      unkScore: Option[Double],
      unkPiece: Option[String],
      controls: Seq[String],
      bytePieces: Int,
      modelType: Option[Int])

  // ------------------------------------------------------------ read

  private final class Reader(buf: Array[Byte], var pos: Int, val end: Int) {
    def hasMore: Boolean = pos < end
    def varint(): Long = {
      var shift = 0; var out = 0L
      while (true) {
        require(pos < end, "truncated varint in .model")
        val b = buf(pos); pos += 1
        out |= (b & 0x7FL) << shift
        if ((b & 0x80) == 0) return out
        shift += 7
        require(shift < 64, "varint overflow in .model")
      }
      0L
    }
    def fixed32(): Int = {
      require(pos + 4 <= end, "truncated fixed32 in .model")
      val v = (buf(pos) & 0xFF) | ((buf(pos + 1) & 0xFF) << 8) |
        ((buf(pos + 2) & 0xFF) << 16) | ((buf(pos + 3) & 0xFF) << 24)
      pos += 4; v
    }
    def bytes(n: Int): Array[Byte] = {
      require(n >= 0 && pos + n <= end, "truncated length-delimited field")
      val out = java.util.Arrays.copyOfRange(buf, pos, pos + n)
      pos += n; out
    }
    def skip(wireType: Int): Unit = wireType match {
      case 0 => varint(); ()
      case 1 => require(pos + 8 <= end, "truncated fixed64"); pos += 8
      case 2 => val n = varint().toInt; bytes(n); ()
      case 5 => fixed32(); ()
      case w => throw new IllegalArgumentException(
        s"unsupported protobuf wire type $w in .model")
    }
  }

  private def parsePiece(r: Reader): (String, Double, Int) = {
    var piece: String = null
    var score = 0.0f
    var tpe = TypeNormal // proto default
    while (r.hasMore) {
      val tag = r.varint()
      val (field, wire) = ((tag >> 3).toInt, (tag & 7).toInt)
      field match {
        case 1 => piece = new String(r.bytes(r.varint().toInt),
          java.nio.charset.StandardCharsets.UTF_8)
        case 2 => score = java.lang.Float.intBitsToFloat(r.fixed32())
        case 3 => tpe = r.varint().toInt
        case _ => r.skip(wire)
      }
    }
    require(piece != null, "SentencePiece entry without a piece string")
    (piece, score.toDouble, tpe)
  }

  private def parseTrainerModelType(r: Reader): Option[Int] = {
    var mt: Option[Int] = None
    while (r.hasMore) {
      val tag = r.varint()
      val (field, wire) = ((tag >> 3).toInt, (tag & 7).toInt)
      if (field == 3 && wire == 0) mt = Some(r.varint().toInt)
      else r.skip(wire)
    }
    mt
  }

  /** Parse a `.model` from any Hadoop filesystem. */
  def load(spark: SparkSession, path: String): Spm = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val len = fs.getFileStatus(p).getLen
    require(len <= (256L << 20), s"$path: .model larger than 256 MB")
    val buf = new Array[Byte](len.toInt)
    val in = fs.open(p)
    try in.readFully(0, buf) finally in.close()
    parse(buf, path)
  }

  private[ops] def parse(buf: Array[Byte], what: String): Spm = {
    val r = new Reader(buf, 0, buf.length)
    val pieces = new ArrayBuffer[(String, Double)]()
    val controls = new ArrayBuffer[String]()
    var unk: Option[(String, Double)] = None
    var bytes = 0
    var modelType: Option[Int] = None
    while (r.hasMore) {
      val tag = r.varint()
      val (field, wire) = ((tag >> 3).toInt, (tag & 7).toInt)
      field match {
        case 1 =>
          require(wire == 2, s"$what: pieces field with wire type $wire")
          val n = r.varint().toInt
          require(n >= 0 && r.pos + n <= r.end,
            s"$what: truncated pieces entry")
          val sub = new Reader(buf, r.pos, r.pos + n)
          r.pos += n
          val (pc, sc, tpe) = parsePiece(sub)
          tpe match {
            case TypeNormal | TypeUserDefined => pieces += ((pc, sc))
            case TypeUnknown =>
              require(unk.isEmpty, s"$what: multiple UNKNOWN pieces")
              unk = Some((pc, sc))
            case TypeControl => controls += pc
            case TypeByte => bytes += 1
            case TypeUnused => ()
            case t => throw new IllegalArgumentException(
              s"$what: unknown SentencePiece type $t")
          }
        case 2 =>
          require(wire == 2, s"$what: trainer_spec with wire type $wire")
          val n = r.varint().toInt
          require(n >= 0 && r.pos + n <= r.end,
            s"$what: truncated trainer_spec")
          val sub = new Reader(buf, r.pos, r.pos + n)
          r.pos += n
          modelType = parseTrainerModelType(sub).orElse(modelType)
        case _ => r.skip(wire)
      }
    }
    require(pieces.nonEmpty, s"$what: no segmenting pieces in model")
    Spm(pieces.toSeq, unk.map(_._2), unk.map(_._1), controls.toSeq,
      bytes, modelType)
  }

  // ----------------------------------------------------------- write

  private def putVarint(out: ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7FL) != 0) { out.write(((v & 0x7F) | 0x80).toInt); v >>>= 7 }
    out.write(v.toInt)
  }

  private def pieceBytes(piece: String, score: Double, tpe: Int): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val pb = piece.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    out.write(0x0A); putVarint(out, pb.length.toLong); out.write(pb, 0, pb.length)
    out.write(0x15)
    val bits = java.lang.Float.floatToIntBits(score.toFloat)
    out.write(bits & 0xFF); out.write((bits >> 8) & 0xFF)
    out.write((bits >> 16) & 0xFF); out.write((bits >> 24) & 0xFF)
    out.write(0x18); putVarint(out, tpe.toLong)
    out.toByteArray
  }

  /** Serialize pieces (+ `<unk>` with `unkScore`, + `<s>`/`</s>`
    * controls, the standard spm layout: unk/bos/eos first) and a
    * minimal unigram TrainerSpec. `load(save(…))` restores the same
    * pieces in order and the same unk score, so
    * [[VocabTokenizer.UnigramEncoder]] built from either side
    * segments identically.
    */
  def serialize(pieces: Seq[(String, Double)], unkScore: Double): Array[Byte] = {
    require(pieces.nonEmpty, "refusing to write an empty .model")
    val out = new ByteArrayOutputStream()
    def writePiece(b: Array[Byte]): Unit = {
      out.write(0x0A); putVarint(out, b.length.toLong); out.write(b, 0, b.length)
    }
    writePiece(pieceBytes("<unk>", unkScore, TypeUnknown))
    writePiece(pieceBytes("<s>", 0.0, TypeControl))
    writePiece(pieceBytes("</s>", 0.0, TypeControl))
    pieces.foreach { case (p, s) => writePiece(pieceBytes(p, s, TypeNormal)) }
    // trainer_spec { model_type: UNIGRAM, vocab_size }
    val ts = new ByteArrayOutputStream()
    ts.write(0x18); putVarint(ts, 1L)
    ts.write(0x20); putVarint(ts, (pieces.size + 3).toLong)
    val tsb = ts.toByteArray
    out.write(0x12); putVarint(out, tsb.length.toLong); out.write(tsb, 0, tsb.length)
    out.toByteArray
  }

  /** Write to any Hadoop filesystem. */
  def save(pieces: Seq[(String, Double)], unkScore: Double, path: String,
           conf: org.apache.hadoop.conf.Configuration): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val out = p.getFileSystem(conf).create(p, true)
    try out.write(serialize(pieces, unkScore)) finally out.close()
  }
}
