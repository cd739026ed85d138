package graft.ops

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Unicode normalization (UAX #15) — the canonical/compatibility fold
  * a multilingual corpus applies before tokenization and dedup keys:
  *
  *  - NFC composes canonical-equivalent sequences (`e` + U+0301 →
  *    `é`, conjoining jamo → precomposed Hangul, singleton folds like
  *    ANGSTROM SIGN → Å) without changing what the text *says* —
  *    the safe default for stored text, and what byte-identity dedup
  *    needs so the two spellings of `é` stop being distinct documents;
  *  - NFKC additionally folds compatibility variants (ligature `ﬁ` →
  *    `fi`, full-width `Ａ１` → `A1`, `㎞` → `km`, circled digits,
  *    superscripts, NBSP → space) — lossy on purpose, the standard
  *    pre-tokenizer fold (SentencePiece trains on NFKC text);
  *  - [[nfkcLower]] composes NFKC with locale-independent lowercasing,
  *    the usual dedup/langid key.
  *
  * Complements [[TextAnalysis.normalizeText]] (the punctuation/space
  * ASCII fold): that cascade handles the typographic family Unicode
  * normalization deliberately preserves (curly quotes are NOT
  * compatibility-equivalent to ASCII quotes), while this handles the
  * canonical/compatibility axis regexps cannot reach.
  *
  * Scale shape: a pure per-row JDK kernel (`java.text.Normalizer` is a
  * table-driven single pass), no shuffle, NULL-safe. The quick-check
  * fast path inside the JDK makes already-normalized ASCII corpora
  * near-free.
  */
object UnicodeNorm {

  /** NFC-normalized text; null in, null out. */
  def nfcString(s: String): String =
    if (s == null) null else Normalizer.normalize(s, Normalizer.Form.NFC)

  /** NFKC-normalized text; null in, null out. */
  def nfkcString(s: String): String =
    if (s == null) null else Normalizer.normalize(s, Normalizer.Form.NFKC)

  private val nfcUdf = udf((s: String) => nfcString(s))
  private val nfkcUdf = udf((s: String) => nfkcString(s))

  /** Column form of [[nfcString]]. */
  def nfc(c: Column): Column = nfcUdf(c)

  /** Column form of [[nfkcString]]. */
  def nfkc(c: Column): Column = nfkcUdf(c)

  /** NFKC + lowercase — the standard case-insensitive dedup key. The
    * lowercase runs AFTER the fold so width/ligature variants of the
    * same letters land on one key.
    */
  def nfkcLower(c: Column): Column = lower(nfkcUdf(c))
}
