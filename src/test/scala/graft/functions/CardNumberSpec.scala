package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.Curation

class CardNumberSpec extends SparkSpec {
  import spark.implicits._

  private def redactOne(s: String): String =
    Seq(Tuple1(s)).toDF("t")
      .select(CardNumber.redact(col("t")).as("r")).as[String].head()

  private def countOne(s: String): Int =
    Seq(Tuple1(s)).toDF("t")
      .select(CardNumber.count(col("t")).as("n")).as[Int].head()

  test("Luhn-valid cards redact; checksum-failing runs pass through") {
    // Industry-published test PANs: Visa 16, Mastercard 16, Amex 15.
    assert(redactOne("pay 4111 1111 1111 1111 now") == "pay [CARD] now")
    assert(redactOne("mc 5500-0000-0000-0004.") == "mc [CARD].")
    assert(redactOne("amex 378282246310005 ok") == "amex [CARD] ok")
    // Same shape, checksum off by one: NOT redacted.
    assert(redactOne("ref 4111 1111 1111 1112 x") == "ref 4111 1111 1111 1112 x")
    assert(countOne("ref 4111 1111 1111 1112 x") == 0)
  }

  test("embedded longer digit runs are never prefix-matched") {
    // 20 contiguous digits: one zone, length-rejected — serial numbers
    // stay intact even when a prefix happens to pass Luhn.
    val serial = "acct 41111111111111111111 ."
    assert(redactOne(serial) == serial)
    assert(countOne(serial) == 0)
    // 20 digits GROUPED like a card (valid Visa + one more group): the
    // zone is consumed whole and length-rejected — a bounded-quantifier
    // pattern would instead backtrack to the Luhn-valid 16-digit prefix
    // and mangle the serial to "[CARD] 1111".
    val grouped = "pay 4111 1111 1111 1111 1111 now"
    assert(redactOne(grouped) == grouped)
    assert(countOne(grouped) == 0)
    // Digits glued to letters form one word-token (letters and digits
    // are both \w): "SN4111111111111111A"-style serials are NOT cards.
    assert(redactOne("id:4111111111111111x") == "id:4111111111111111x")
    assert(countOne("SN4111111111111111") == 0)
    // Punctuation IS a boundary: the same digits after a colon match.
    assert(redactOne("id:4111111111111111.") == "id:[CARD].")
  }

  test("adjacency: junk-plus-card zones stay whole, card-only zones partition") {
    // A PAN one space from a NON-card number forms a >19-digit zone
    // with no full partition into valid PANs: deliberately NOT
    // redacted (indistinguishable from a longer serial — the
    // conservative rule), and critically NOT mangled into a partial
    // window either.
    val adjacent = "order 1234 4111 1111 1111 1111 thanks"
    assert(redactOne(adjacent) == adjacent)
    assert(countOne(adjacent) == 0)
    // But a zone that partitions COMPLETELY into consecutive
    // Luhn-valid PAN-length segments is a card list: redact each.
    assert(redactOne("pay 4111 1111 1111 1111 5500 0000 0000 0004 now") ==
      "pay [CARD] [CARD] now")
    assert(redactOne("4111111111111111 5500000000000004") ==
      "[CARD] [CARD]")
    assert(countOne(
      "a 4111111111111111 5500000000000004 378282246310005 z") == 3)
    // Any digit-free context restores detection: punctuation, a word,
    // or a double space all break the zone.
    assert(redactOne("order 1234, 4111 1111 1111 1111 thanks") ==
      "order 1234, [CARD] thanks")
    assert(redactOne("order 1234  4111 1111 1111 1111 thanks") ==
      "order 1234  [CARD] thanks")
    assert(redactOne("order no 1234 card 4111 1111 1111 1111 x") ==
      "order no 1234 card [CARD] x")
  }

  test("glued tails reject the zone whole — no backtracked slice ever") {
    // "…1111 1111x": a trailing-\b regex would backtrack past the
    // glued group and redact the Luhn-valid 16-digit slice, mangling a
    // serial. The scanner rejects the glue-tainted zone wholesale.
    val glued = "pay 4111 1111 1111 1111 1111x now"
    assert(redactOne(glued) == glued)
    assert(countOne(glued) == 0)
    val hyph = "sn 4111-1111-1111-1111-1111a end"
    assert(redactOne(hyph) == hyph)
    assert(countOne(hyph) == 0)
  }

  test("multiple cards per document; string start/end boundaries") {
    assert(countOne(
      "two 4111-1111-1111-1111 and 5500 0000 0000 0004 mixed 1234567890123 end") == 2)
    assert(redactOne("4111111111111111") == "[CARD]")
    assert(redactOne("4111111111111111 and 378282246310005") == "[CARD] and [CARD]")
  }

  test("NULL and cardless text propagate unchanged") {
    val out = Seq((1L, "no digits"), (2L, null.asInstanceOf[String]),
        (3L, "short 4111 1111"), (4L, ""))
      .toDF("id", "t")
      .select(col("id"), CardNumber.count(col("t")).as("n"),
        CardNumber.redact(col("t")).as("r"))
      .collect().map(r => r.getLong(0) ->
        ((if (r.isNullAt(1)) -1 else r.getInt(1),
          if (r.isNullAt(2)) null else r.getString(2)))).toMap
    assert(out(1L) == ((0, "no digits")))
    assert(out(2L) == ((-1, null)))
    assert(out(3L) == ((0, "short 4111 1111")))
    assert(out(4L) == ((0, "")))
  }

  test("redactPiiAll: phones win overlaps, cards redact after") {
    val dirty = "call +1-555-0100-123 or bill 4111 1111 1111 1111 from " +
      "10.0.0.7 via a@b.com"
    val out = Seq(Tuple1(dirty)).toDF("t")
      .select(Curation.redactPiiAll(col("t")).as("r")).as[String].head()
    assert(out == "call [PHONE] or bill [CARD] from [IP] via [EMAIL]")
  }

  test("SQL surface: card_count and redact_cards registered") {
    graft.GraftExtensions.register(spark)
    val row = spark.sql(
      "SELECT card_count('x 4111 1111 1111 1111 y 4111 1111 1111 1112') AS n, " +
        "redact_cards('x 4111 1111 1111 1111 y') AS r").head()
    assert(row.getInt(0) == 1)
    assert(row.getString(1) == "x [CARD] y")
  }
}
