package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Mojibake]] against hand-computed byte-level expectations.
  *
  * Every mangled fixture is derived on paper from the UTF-8 byte
  * sequence of the clean string read back through cp1252/latin-1:
  * é = C3 A9 → "Ã©", ’ = E2 80 99 → "â€™" (99 is ™ in cp1252),
  * … = E2 80 A6 → "â€¦", 中 = E4 B8 AD → "ä¸­" (soft hyphen),
  * ā = C4 81 → "Ä" (0x81 is a cp1252 hole → latin-1 retry).
  */
class MojibakeSpec extends SparkSpec {
  import spark.implicits._

  test("classic single-round repairs") {
    assert(Mojibake.repair("cafÃ©") == "café")
    assert(Mojibake.repair("itâ€™s fine") == "it’s fine")
    assert(Mojibake.repair("â€œquotedâ€¦") == "“quoted…")
    assert(Mojibake.repair("naÃ¯ve rÃ©sumÃ©") == "naïve résumé")
    assert(Mojibake.repair("Î±Î²Î³") == "αβγ")
  }

  test("double mojibake heals in two rounds, never more") {
    // café → (round 1 of mangling) cafÃ© → (round 2) cafÃƒÂ©
    assert(Mojibake.repair("cafÃƒÂ©") == "café")
    // MaxRounds = 2 bounds the loop: a triple-mangled string comes
    // back one level short of clean — the documented depth cap.
    val triple = "cafÃƒÆ’Ã‚Â©" // hand-mangled once more via cp1252
    assert(Mojibake.repair(triple) == Mojibake.repair("cafÃ©") ||
      Mojibake.repair(triple).length < triple.length)
  }

  test("cp1252 hole routes through the latin-1 retry") {
    // ā = U+0101 = C4 81; 0x81 has no cp1252 glyph so lenient decoders
    // pass it through as C1 control U+0081 — only latin-1 re-encodes it.
    assert(Mojibake.repair("lÄtvian") == "lātvian")
  }

  test("CJK through latin-1 glyphs repairs") {
    // 中 = E4 B8 AD, 文 = E6 96 87; cp1252(96)=– (U+2013), cp1252(87)=‡
    assert(Mojibake.repair("ä¸­æ–‡") == "中文")
  }

  test("non-mojibake text is untouched") {
    assert(Mojibake.repair("plain ASCII stays") == "plain ASCII stays")
    // genuine legacy-accented text: lone 0xE9 is invalid UTF-8
    assert(Mojibake.repair("café naïve légitime") == "café naïve légitime")
    // CJK chars fail the legacy re-encode, so the mixed string is left
    // alone (whole-string rule)
    assert(Mojibake.repair("中文 with Ã© mixed") == "中文 with Ã© mixed")
    assert(Mojibake.repair("") == "")
    assert(Mojibake.repair(null) == null)
  }

  test("flag agrees with repair-changes") {
    val cases = Seq("cafÃ©", "plain", "café légitime", "中文 Ã©", "", null,
      "â€œquotedâ€¦", "lÄtvian")
    for (s <- cases)
      assert(Mojibake.isMojibake(s) == (s != null && Mojibake.repair(s) != s),
        s"flag/repair disagree on: $s")
  }

  test("column forms match the kernel row-for-row") {
    val df = Seq("cafÃ©", "plain", null, "Î±Î²Î³", "中文 Ã©").toDF("t")
    val got = df.select(
        Mojibake.fixMojibake(col("t")).as("f"),
        Mojibake.mojibakeFlag(col("t")).as("c"))
      .as[(String, Boolean)].collect().toSeq
    val want = Seq("cafÃ©", "plain", null, "Î±Î²Î³", "中文 Ã©")
      .map(s => (Mojibake.repair(s), Mojibake.isMojibake(s)))
    assert(got == want)
  }

  test("repairs always shrink; idempotent on clean text") {
    val clean = Seq("café", "it’s fine", "“quoted…", "中文", "αβγ")
    for (s <- clean) assert(Mojibake.repair(s) == s, s"clean text moved: $s")
  }
}
