package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[AhoCorasick]] automaton + the large-list term-blocking entry
  * points, including exact equivalence with the expression-tree path
  * ([[Curation.blockedTermFlag]]) they scale past.
  */
class AhoCorasickSpec extends SparkSpec {

  test("classic overlap: he/she/his/hers over 'ushers'") {
    val ac = AhoCorasick.build(Seq("he", "she", "his", "hers"))
    assert(ac.matchedPatterns("ushers").toSeq === Seq("he", "hers", "she"))
    // ordered by END offset; same-end ties in pattern order
    assert(ac.occurrences("ushers") ===
      Seq((2, "he"), (1, "she"), (2, "hers")))
    assert(ac.anyMatch("ushers"))
    assert(!ac.anyMatch("usher".dropRight(3))) // "us"
    assert(ac.matchedPatterns("xyz").isEmpty)
    assert(ac.matchedPatterns(null).isEmpty)
    assert(!ac.anyMatch(null))
  }

  test("patterns sharing text characters both match (padded adjacency)") {
    val ac = AhoCorasick.build(Seq(" a ", " b "))
    // " a b ": the middle space terminates ' a ' AND opens ' b '
    assert(ac.matchedPatterns(" a b ").toSeq === Seq(" a ", " b "))
  }

  test("duplicate patterns collapse; build guards fail loud") {
    val ac = AhoCorasick.build(Seq("x", "x", "xy"))
    assert(ac.patterns.toSeq === Seq("x", "xy"))
    intercept[IllegalArgumentException](AhoCorasick.build(Nil))
    intercept[IllegalArgumentException](AhoCorasick.build(Seq("a", "")))
  }

  test("blockedTermsMatched/-FlagLarge ≡ blockedTermFlag on messy text") {
    import spark.implicits._
    val terms = Seq("BadTerm", "Spam  phrase", "alpha", "beta gamma",
      "Tab\tsep", "unseen")
    val texts = Seq(
      "clean row, nothing here",
      "ends with badterm",
      "BADTERM, punctuation glued",     // no space boundary → no hit
      "some spam\nphrase over a newline",
      "alpha and beta\tgamma together",
      "tab sep normalized both sides",
      "beta gammaX is not a boundary hit",
      "", "   \t\n  ")
    val df = texts.zipWithIndex.map(_.swap).toDF("id", "text")
    val got = df.select(col("id"),
        Curation.blockedTermFlag(col("text"), terms).as("expr_flag"),
        Curation.blockedTermFlagLarge(col("text"), terms).as("ac_flag"),
        Curation.blockedTermsMatched(col("text"), terms).as("hits"))
      .orderBy("id").collect()
    got.foreach { r =>
      assert(r.getBoolean(1) === r.getBoolean(2),
        s"flag mismatch on id=${r.getInt(0)}")
      assert(r.getBoolean(2) === (r.getSeq[String](3).nonEmpty))
    }
    val hits = got.map(r => r.getInt(0) -> r.getSeq[String](3)).toMap
    assert(hits(1) === Seq("badterm"))
    assert(hits(2) === Nil)
    assert(hits(3) === Seq("spam phrase"))
    assert(hits(4) === Seq("alpha", "beta gamma"))
    assert(hits(5) === Seq("tab sep"))
    assert(hits(6) === Nil)
    assert(hits(7) === Nil && hits(8) === Nil)
  }

  test("null text and null-safe flags") {
    import spark.implicits._
    val df = Seq((0, null: String), (1, "has alpha here")).toDF("id", "text")
    val out = df.select(col("id"),
        Curation.blockedTermFlagLarge(col("text"), Seq("alpha")).as("f"))
      .orderBy("id").collect()
    assert(out.map(_.getBoolean(1)).toSeq === Seq(false, true))
  }

  test("dropBlockedTermsLarge filters exactly the flagged rows") {
    import spark.implicits._
    val df = Seq("keep me", "drop badword now", "also keep")
      .zipWithIndex.map(_.swap).toDF("id", "text")
    val kept = Curation.dropBlockedTermsLarge(df, "text", Seq("badword"))
      .select("id").as[Int].collect().sorted
    assert(kept.toSeq === Seq(0, 2))
  }

  test("20k-term list: builds, matches, stays beyond the expression cap") {
    val terms = (0 until 20000).map(i => s"term$i word$i")
    val ac = AhoCorasick.build(terms.map(t => s" $t "))
    assert(ac.nodes > 20000)
    assert(ac.anyMatch(" prefix term19999 word19999 suffix "))
    assert(!ac.anyMatch(" term19999 word19998 "))
    // the expression-tree path refuses lists this size — that's the point
    intercept[IllegalArgumentException](
      Curation.blockedTermFlag(lit("x"), terms))
  }
}
