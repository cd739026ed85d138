package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[UnicodeNorm]] against UCD-derived expectations (the same pairs the
  * t43 gate pins, plus idempotence/casefold properties). Every literal
  * is written as explicit escapes so the source encoding can never
  * silently change which codepoints are under test.
  */
class UnicodeNormSpec extends SparkSpec {
  import spark.implicits._

  test("NFC folds the canonical axis only") {
    assert(UnicodeNorm.nfcString("e\u0301clair") == "\u00E9clair")
    assert(UnicodeNorm.nfcString("A\u030A") == "\u00C5")
    assert(UnicodeNorm.nfcString("\u212B") == "\u00C5") // ANGSTROM singleton
    assert(UnicodeNorm.nfcString("\u2126") == "\u03A9") // OHM singleton
    assert(UnicodeNorm.nfcString("\u1100\u1161") == "\uAC00") // jamo
    // compatibility variants survive NFC
    assert(UnicodeNorm.nfcString("\uFB01 \uFF21 \u00B5 \u2460") ==
      "\uFB01 \uFF21 \u00B5 \u2460")
  }

  test("NFKC adds the compatibility folds") {
    assert(UnicodeNorm.nfkcString("\uFB01ne \uFB03x") == "fine ffix")
    assert(UnicodeNorm.nfkcString("\uFF21\uFF22\uFF11\uFF12") == "AB12")
    assert(UnicodeNorm.nfkcString("\u339E") == "km")
    assert(UnicodeNorm.nfkcString("5\u00A0km") == "5 km")
    assert(UnicodeNorm.nfkcString("\u00B5m") == "\u03BCm")
    assert(UnicodeNorm.nfkcString("\u00BD") == "1\u20442")
    assert(UnicodeNorm.nfkcString("\u2162\u2163") == "IIIIV")
    // half-width katakana + voicing mark compose after the width fold
    assert(UnicodeNorm.nfkcString("\uFF8A\uFF9F\uFF9D") == "\u30D1\u30F3")
  }

  test("both forms are idempotent and null/ASCII-safe") {
    val inputs = Seq("e\u0301clair", "\uFB01ne", "\u212B", "plain ascii",
      "\uFF8A\uFF9F", "\u00BD cup")
    for (s <- inputs) {
      val c = UnicodeNorm.nfcString(s)
      val k = UnicodeNorm.nfkcString(s)
      assert(UnicodeNorm.nfcString(c) == c, s"NFC not idempotent on $s")
      assert(UnicodeNorm.nfkcString(k) == k, s"NFKC not idempotent on $s")
    }
    assert(UnicodeNorm.nfcString(null) == null)
    assert(UnicodeNorm.nfkcString(null) == null)
    assert(UnicodeNorm.nfcString("") == "")
    assert(UnicodeNorm.nfkcString("plain") == "plain")
  }

  test("column forms match the kernel; nfkcLower folds width then case") {
    val df = Seq("e\u0301CLAIR", "\uFF21\uFF22c", null: String).toDF("t")
    val got = df.select(
        UnicodeNorm.nfc(col("t")).as("c"),
        UnicodeNorm.nfkc(col("t")).as("k"),
        UnicodeNorm.nfkcLower(col("t")).as("l"))
      .as[(String, String, String)].collect().toSeq
    assert(got == Seq(
      ("\u00E9CLAIR", "\u00E9CLAIR", "\u00E9clair"),
      ("\uFF21\uFF22c", "ABc", "abc"),
      (null, null, null)))
  }
}
