package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.{GraftFunctions => F}

/** The shape guards exist purely to dodge ANSI's throw-per-failure cost;
  * they must never change a result. Pin guard ≡ bare equivalence on an
  * adversarial corpus covering every guard boundary (digitless garbage,
  * Infinity/NaN literals, overflow, signs, whitespace, every datetime
  * pattern plus near-misses that fail only inside the strict formatter).
  */
class GuardedParseSpec extends SparkSpec {

  private val corpus: Seq[String] = Seq(
    null, "", " ", "N", "R", "abc", "not_a_number", "--", "+", "-", ".",
    "12", " 42 ", "+7", "-7", "007", "2147483647", "2147483648",
    "9223372036854775807", "99999999999999999999", "12.0", "12.5", ".5",
    "5.", "1e5", "1E-3", "1.25e2", "-0.0", "Infinity", "-Infinity",
    "infinity", "INF", "inf", "NaN", "nan", "0x1A", "1,000", "12d", "12f",
    "\t13\n", "１２",  // full-width digits: guard passes, cast decides
    "2023-01-02", "2023-1-2", "2023-01-02 10:20:30", "2023-01-02T10:20:30",
    "2023-01-02T10:20:30.123456", "2023-01-02T10:20:30.5",
    "2023-01-02 10:20", "2023-01-02 10:20:30.123456", "2023-01-02 10:20:30.5",
    "2023/01/02", "2023-13-01", "2023-02-30", "12023-01-02",
    "1/2/2023", "01/02/2023", "13/2/2023", "2/13/2023", "1/2/2023 5:06:07",
    "1-2-2023", "1.2.2023", "1/2/2023 ", " 1/2/2023", "1/2/23", "1/2/12023",
    "2023-01-02x", "x2023-01-02", "1/2/2023 5:06", "99:99", "10:20:30")

  private def df = {
    import spark.implicits._
    corpus.toDF("s")
  }

  private def unguardedLenient(c: org.apache.spark.sql.Column,
                               dayFirst: Boolean): org.apache.spark.sql.Column = {
    val ambiguous =
      if (dayFirst) Seq("d/M/yyyy H:m:s", "d/M/yyyy", "d-M-yyyy", "d.M.yyyy")
      else Seq("M/d/yyyy H:m:s", "M/d/yyyy", "M-d-yyyy", "M.d.yyyy")
    val patterns = Seq(
      "yyyy-MM-dd HH:mm:ss.SSSSSS", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS",
      "yyyy-MM-dd HH:mm:ss",
      "yyyy-MM-dd'T'HH:mm:ss", "yyyy-MM-dd HH:mm", "yyyy-MM-dd",
      "yyyy/MM/dd") ++ ambiguous
    coalesce(patterns.map(p => try_to_timestamp(trim(c), lit(p))): _*)
  }

  test("tryCastNumeric ≡ bare try_cast for every numeric target") {
    for (target <- Seq("int", "bigint", "double", "float", "decimal(10,2)")) {
      val rows = df.select(
        col("s"),
        F.tryCastNumeric(col("s"), target).cast("string").as("guarded"),
        col("s").try_cast(target).cast("string").as("bare")).collect()
      rows.foreach { r =>
        assert(r.getAs[String]("guarded") == r.getAs[String]("bare"),
          s"target=$target input='${r.getAs[String]("s")}'")
      }
    }
  }

  test("fuzz: guard ≡ bare on 4000 random strings from a parse-shaped alphabet") {
    // Biased toward near-parseable shapes: digits, signs, separators,
    // exponent/inf/nan fragments, whitespace, full-width digits — the
    // strings most likely to disagree at a guard boundary.
    val atoms = Array(
      "0", "1", "7", "9", "12", "003", "+", "-", ".", "e", "E", " ", "\t",
      "/", ":", "T", "inf", "Inf", "NaN", "nan", "a", "Z", "１", "2023",
      "01", "31", "13", "60", "999999999999999999999", "d", "f", "x")
    val rnd = new scala.util.Random(20260813L)
    val fuzz = (1 to 4000).map { _ =>
      val n = rnd.nextInt(12)
      (1 to n).map(_ => atoms(rnd.nextInt(atoms.length))).mkString
    }.distinct
    import spark.implicits._
    val fdf = fuzz.toDF("s")
    for (target <- Seq("int", "bigint", "double", "decimal(10,2)")) {
      val bad = fdf.select(
        col("s"),
        F.tryCastNumeric(col("s"), target).cast("string").as("guarded"),
        col("s").try_cast(target).cast("string").as("bare"))
        .filter(!(col("guarded") <=> col("bare"))).collect()
      assert(bad.isEmpty,
        s"target=$target diverged on: ${bad.take(5).map(_.getString(0)).mkString("['", "', '", "']")}")
    }
    for (dayFirst <- Seq(false, true)) {
      val bad = fdf.select(
        col("s"),
        F.parseDatetimeLenient(col("s"), dayFirst).cast("string").as("guarded"),
        unguardedLenient(col("s"), dayFirst).cast("string").as("bare"))
        .filter(!(col("guarded") <=> col("bare"))).collect()
      assert(bad.isEmpty,
        s"dayFirst=$dayFirst diverged on: ${bad.take(5).map(_.getString(0)).mkString("['", "', '", "']")}")
    }
  }

  test("guarded parseDatetimeLenient ≡ unguarded pattern chain, both orders") {
    for (dayFirst <- Seq(false, true)) {
      val rows = df.select(
        col("s"),
        F.parseDatetimeLenient(col("s"), dayFirst).cast("string").as("guarded"),
        unguardedLenient(col("s"), dayFirst).cast("string").as("bare")).collect()
      rows.foreach { r =>
        assert(r.getAs[String]("guarded") == r.getAs[String]("bare"),
          s"dayFirst=$dayFirst input='${r.getAs[String]("s")}'")
      }
    }
  }
}
