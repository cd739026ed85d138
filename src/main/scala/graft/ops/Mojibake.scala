package graft.ops

import java.nio.ByteBuffer
import java.nio.CharBuffer
import java.nio.charset.{CharacterCodingException, Charset, CodingErrorAction}

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Mojibake repair — undo the classic crawl-corpus encoding accident
  * where UTF-8 bytes were decoded as cp1252/latin-1 ("café" → "cafÃ©",
  * "it's" → "itâ€™s"). The fix inverts the accident: re-encode the
  * text through the legacy charset and strictly re-decode as UTF-8
  * (the ftfy recipe), up to [[Mojibake.MaxRounds]] rounds so doubly
  * mangled text ("cafÃƒÂ©") also heals.
  *
  * Acceptance is conservative — a repair applies only when
  *  1. EVERY char re-encodes through cp1252 (with a latin-1 retry for
  *     the five cp1252 holes 0x81/0x8D/0x8F/0x90/0x9D, which lenient
  *     legacy decoders pass through as C1 controls),
  *  2. the bytes strictly decode as UTF-8 (no U+FFFD, REPORT mode),
  *  3. the result actually changed, and
  *  4. the result is shorter (real mojibake inflates every non-ASCII
  *     code point into 2–4 legacy chars, so genuine repairs always
  *     shrink; requiring it blocks pathological fixed points).
  * Pure-ASCII text is untouched by construction; genuine legacy text
  * ("café" typed as such) fails condition 2 because a lone 0xE9 byte
  * is not valid UTF-8. Mixed-script text with any char outside the
  * legacy repertoires (CJK + mojibake in one string) fails condition 1
  * and is left alone — the documented whole-string simplification
  * (segment-level repair is ftfy's extra mile).
  *
  * Scale shape: a pure per-row kernel (two charset passes over the
  * row's chars per round), no shuffle, no state.
  */
object Mojibake {

  /** Repair rounds: 2 heals double-mojibake, the deepest level that
    * occurs at meaningful rates in crawls.
    */
  val MaxRounds = 2

  private def encoder(cs: String) = Charset.forName(cs).newEncoder()
    .onMalformedInput(CodingErrorAction.REPORT)
    .onUnmappableCharacter(CodingErrorAction.REPORT)

  private def utf8Decoder = Charset.forName("UTF-8").newDecoder()
    .onMalformedInput(CodingErrorAction.REPORT)
    .onUnmappableCharacter(CodingErrorAction.REPORT)

  /** One inversion round; None when the text is not mojibake under
    * the acceptance rules above.
    */
  private def repairOnce(s: String): Option[String] = {
    def enc(cs: String): Option[ByteBuffer] =
      try Some(encoder(cs).encode(CharBuffer.wrap(s)))
      catch { case _: CharacterCodingException => None }
    // cp1252 first (maps 0x80–0x9F to the smart-quote block the
    // accident produces), latin-1 for strings that hit a cp1252 hole.
    enc("windows-1252").orElse(enc("ISO-8859-1")).flatMap { bytes =>
      try {
        val out = utf8Decoder.decode(bytes).toString
        if (out != s && out.length < s.length) Some(out) else None
      } catch { case _: CharacterCodingException => None }
    }
  }

  /** Fully repaired text (input returned unchanged when no round
    * applies); null-safe.
    */
  def repair(s: String): String = {
    if (s == null) return null
    var cur = s
    var round = 0
    var changed = true
    while (changed && round < MaxRounds) {
      repairOnce(cur) match {
        case Some(next) => cur = next; round += 1
        case None => changed = false
      }
    }
    cur
  }

  /** True iff [[repair]] would change the text. */
  def isMojibake(s: String): Boolean =
    s != null && repairOnce(s).isDefined

  /** One-kernel result carrier for pipeline stages that need the fixed
    * text AND the changed flag without paying a second repair pass.
    */
  final case class Repaired(fixed: String, changed: Boolean)

  private val repairUdf = udf((s: String) => repair(s))
  private val flagUdf = udf((s: String) => isMojibake(s))
  private val structUdf = udf((s: String) => {
    val f = repair(s)
    Repaired(f, s != null && f != s)
  })

  /** Column form of [[repair]]. */
  def fixMojibake(c: Column): Column = repairUdf(c)

  /** Column form of [[isMojibake]]. */
  def mojibakeFlag(c: Column): Column = flagUdf(c)

  /** Struct column `(fixed, changed)` — both facets from ONE kernel
    * evaluation (the curation pipeline's stage-metric shape).
    */
  def repairStruct(c: Column): Column = structUdf(c)
}
