package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

class JoinsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(df: DataFrame, cols: String*): DataFrame =
    cols.foldLeft(df)((d, c) =>
      d.withColumn(c, timestamp_micros(col(c))))

  // left: (id, key, t)  — micros since epoch
  private def left = ts(Seq(
    (1L, "a", 1000L),
    (2L, "a", 5000L),
    (3L, "b", 2000L),
    (4L, "c", 9000L)).toDF("id", "key", "t"), "t")

  // right: (key, t, rid)
  private def right = ts(Seq(
    ("a", 500L, 10L),
    ("a", 1000L, 11L), // equal-ts: inclusive match for left id=1
    ("a", 4000L, 12L),
    ("b", 7000L, 13L)  // after left id=3 → no match
  ).toDF("key", "t", "rid"), "t")

  test("asofJoin picks the latest right row at or before each left ts") {
    val out = Joins.asofJoin(left, right, Seq("key"), "t", "t",
      carryCols = Seq("rid"), rightTieCol = "rid")
      .select("id", "asof_rid", "asof_gap_micros")
      .as[(Long, Option[Long], Option[Long])].collect()
      .map { case (k, r, g) => k -> ((r, g)) }.toMap
    assert(out(1L) == ((Some(11L), Some(0L))))   // ts-equal right included
    assert(out(2L) == ((Some(12L), Some(1000L))))
    assert(out(3L) == ((None, None)))            // only a LATER right row
    assert(out(4L) == ((None, None)))            // key with no right rows
  }

  test("asofJoin tolerance nulls matches older than the window") {
    val out = Joins.asofJoin(left, right, Seq("key"), "t", "t",
      carryCols = Seq("rid"), rightTieCol = "rid",
      toleranceMicros = 500L)
      .select("id", "asof_rid").as[(Long, Option[Long])].collect().toMap
    assert(out(1L).contains(11L)) // gap 0 <= 500
    assert(out(2L).isEmpty)       // gap 1000 > 500
  }

  test("asofJoin breaks right-side ts ties by the tie column, largest wins") {
    val l = ts(Seq((1L, "k", 2000L)).toDF("id", "key", "t"), "t")
    val r = ts(Seq(("k", 1000L, 7L), ("k", 1000L, 9L), ("k", 1000L, 8L))
      .toDF("key", "t", "rid"), "t")
    val out = Joins.asofJoin(l, r, Seq("key"), "t", "t",
      carryCols = Seq("rid"), rightTieCol = "rid")
      .select("asof_rid").as[Long].collect()
    assert(out.toSeq == Seq(9L))
  }

  test("asofJoin forward picks the earliest right row at or after each left ts") {
    val out = Joins.asofJoin(left, right, Seq("key"), "t", "t",
      carryCols = Seq("rid"), rightTieCol = "rid", direction = "forward")
      .select("id", "asof_rid", "asof_gap_micros")
      .as[(Long, Option[Long], Option[Long])].collect()
      .map { case (k, r, g) => k -> ((r, g)) }.toMap
    assert(out(1L) == ((Some(11L), Some(0L))))   // equal ts inclusive
    assert(out(2L) == ((None, None)))            // ("a", 5000): nothing later
    assert(out(3L) == ((Some(13L), Some(5000L)))) // the later b row matches now
    assert(out(4L) == ((None, None)))
  }

  test("asofJoin nearest picks the smaller gap; ties go backward") {
    val l = ts(Seq(
      (1L, "k", 5000L),   // back gap 1000 (rid 7) vs fwd gap 2000 (rid 8)
      (2L, "k", 7500L),   // back gap 500 (rid 8) vs fwd gap 500 (rid 9): tie → backward
      (3L, "k", 500L)     // nothing before → forward
    ).toDF("id", "key", "t"), "t")
    val r = ts(Seq(
      ("k", 4000L, 7L), ("k", 7000L, 8L), ("k", 8000L, 9L))
      .toDF("key", "t", "rid"), "t")
    val out = Joins.asofJoin(l, r, Seq("key"), "t", "t",
      carryCols = Seq("rid"), rightTieCol = "rid", direction = "nearest")
      .select("id", "asof_rid").as[(Long, Option[Long])].collect().toMap
    assert(out(1L).contains(7L))
    assert(out(2L).contains(8L)) // tie broken backward
    assert(out(3L).contains(7L))
    // tolerance still applies per candidate: 400µs leaves id=3 unmatched
    val tight = Joins.asofJoin(l, r, Seq("key"), "t", "t",
      carryCols = Seq("rid"), rightTieCol = "rid", direction = "nearest",
      toleranceMicros = 400L)
      .select("id", "asof_rid").as[(Long, Option[Long])].collect().toMap
    assert(tight(3L).isEmpty)
  }

  test("asofJoin plans a window over one shuffle, never a theta-join") {
    val out = Joins.asofJoin(left, right, Seq("key"), "t", "t",
      carryCols = Seq("rid"), rightTieCol = "rid")
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"as-of must not plan a join:\n$plan")
    assert(plan.contains("Window"), s"expected running-last window:\n$plan")
  }

  // points: (pid, key, t); intervals: (iid, key, s, e)
  private def points = ts(Seq(
    (1L, "a", 1000L),
    (2L, "a", 2500L),
    (3L, "a", 9999L),
    (4L, "b", 1500L)).toDF("pid", "key", "t"), "t")

  private def intervals = ts(Seq(
    (100L, "a", 1000L, 3000L), // spans 3 bins at bin=1000: catches 1, 2
    (101L, "a", 2500L, 2500L), // degenerate point-interval: catches 2
    (102L, "b", 2000L, 1000L), // end < start → dropped
    (103L, "c", 0L, 99999L)    // key with no points
  ).toDF("iid", "key", "s", "e"), "s", "e")

  test("rangeJoin emits each in-window pair exactly once, ends inclusive") {
    val out = Joins.rangeJoin(points, intervals, Seq("key"),
      "t", "s", "e", binMicros = 1000L)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 100L), (2L, 100L), (2L, 101L)))
  }

  test("rangeJoin result is bin-width invariant") {
    def run(bin: Long) = Joins.rangeJoin(points, intervals, Seq("key"),
      "t", "s", "e", binMicros = bin)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(run(1L) == run(1000L) && run(1000L) == run(1000000L))
  }

  test("rangeJoin plans an equi-join, never a nested loop") {
    val out = Joins.rangeJoin(points, intervals, Seq("key"),
      "t", "s", "e", binMicros = 1000L)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop"),
      s"range join must not nested-loop:\n$plan")
    assert(plan.contains("Join"), s"expected an equi-join node:\n$plan")
  }

  test("rangeJoin rejects colliding non-key columns") {
    val bad = intervals.withColumnRenamed("iid", "pid")
    val e = intercept[IllegalArgumentException] {
      Joins.rangeJoin(points, bad, Seq("key"), "t", "s", "e", 1000L)
    }
    assert(e.getMessage.contains("pid"))
  }

  test("saltedJoin ≡ plain join for every supported type, incl. a hot key") {
    // 500 rows of hot key "h" + a tail; right has h, t1 and an
    // unmatched-on-left key; left also has a key missing on the right
    val left = ((1 to 500).map(i => ("h", i.toLong)) ++
      Seq(("t1", 1000L), ("t2", 2000L))).toDF("key", "lv")
    val right = Seq(("h", "hot"), ("t1", "tail"), ("only_right", "x"))
      .toDF("key", "rv")
    for (jt <- Seq("inner", "left", "left_semi", "left_anti")) {
      val plain = left.join(right, Seq("key"), jt)
      val salted = Joins.saltedJoin(left, right, Seq("key"), salt = 8, jt)
      assert(salted.columns.toSeq == plain.columns.toSeq, s"columns for $jt")
      val p = plain.collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
      val s = salted.collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
      assert(s == p, s"multiset mismatch for $jt")
    }
  }

  test("saltedJoin actually splits the hot key across sub-keys") {
    val left = (1 to 500).map(i => ("h", i.toLong)).toDF("key", "lv")
    val nSalts = left.withColumn("__salt",
      pmod(hash((left.columns.map(col) :+ spark_partition_id()): _*), lit(8)))
      .select("__salt").distinct().count()
    assert(nSalts > 4, s"hot key spread over only $nSalts sub-keys")
  }

  test("saltedJoin splits even EXACT-duplicate hot rows (the pre-dedup crawl case)") {
    // 400 identical rows: a whole-row hash alone would give them ONE
    // salt; mixing in the input partition id spreads them
    val left = (1 to 400).map(_ => ("h", "same payload")).toDF("key", "lv")
      .repartition(8)
    val nSalts = left.withColumn("__salt",
      pmod(hash((left.columns.map(col) :+ spark_partition_id()): _*), lit(8)))
      .select("__salt").distinct().count()
    assert(nSalts > 2, s"duplicate rows collapsed onto $nSalts salt(s)")
    // and correctness still holds
    val right = Seq(("h", "r")).toDF("key", "rv")
    assert(Joins.saltedJoin(left, right, Seq("key"), 8, "inner").count() == 400)
  }

  test("saltedJoin rejects right-preserving join types") {
    val df = Seq(("a", 1)).toDF("key", "v")
    val e = intercept[IllegalArgumentException] {
      Joins.saltedJoin(df, df.withColumnRenamed("v", "w"), Seq("key"), 4, "right")
    }
    assert(e.getMessage.contains("saltedJoin"))
  }

  test("asofJoin rejects a left frame already carrying an output name") {
    // Without the guard, withColumn would silently OVERWRITE the
    // caller's column — asof_rid here — and then drop nothing.
    val poisoned = left.withColumn("asof_rid", lit(-1L))
    val e = intercept[IllegalArgumentException] {
      Joins.asofJoin(poisoned, right, Seq("key"), "t", "t",
        carryCols = Seq("rid"), rightTieCol = "rid")
    }
    assert(e.getMessage.contains("asof_rid"))
    val gapPoisoned = left.withColumn("asof_gap_micros", lit(-1L))
    val e2 = intercept[IllegalArgumentException] {
      Joins.asofJoin(gapPoisoned, right, Seq("key"), "t", "t",
        carryCols = Seq("rid"), rightTieCol = "rid")
    }
    assert(e2.getMessage.contains("asof_gap_micros"))
    // The nearest direction's temporaries are reserved too.
    val mbPoisoned = left.withColumn("__mb", lit(1))
    val e3 = intercept[IllegalArgumentException] {
      Joins.asofJoin(mbPoisoned, right, Seq("key"), "t", "t",
        carryCols = Seq("rid"), rightTieCol = "rid", direction = "nearest")
    }
    assert(e3.getMessage.contains("__mb"))
  }

  test("asofJoin NULL keys never match, in every direction") {
    import java.sql.Timestamp
    def t(s: String) = Timestamp.valueOf(s)
    val l = Seq(
      (1L, Option("a"), t("2024-01-01 00:10:00")),
      (2L, Option.empty[String], t("2024-01-01 00:10:00")))
      .toDF("id", "key", "ts")
    val r = Seq(
      (10L, Option("a"), t("2024-01-01 00:00:00")),
      (13L, Option("a"), t("2024-01-01 00:30:00")),
      (11L, Option.empty[String], t("2024-01-01 00:00:00")),
      (12L, Option.empty[String], t("2024-01-01 00:30:00")))
      .toDF("rid", "key", "rts")
    val expect = Map(
      "backward" -> 10L, "forward" -> 13L,
      "nearest" -> 10L) // 10-vs-20 min gaps: backward closer
    for (dir <- Seq("backward", "forward", "nearest")) {
      val out = Joins.asofJoin(l, r, Seq("key"), "ts", "rts",
        carryCols = Seq("rid"), rightTieCol = "rid", direction = dir)
        .select("id", "asof_rid").as[(Long, Option[Long])].collect().toMap
      assert(out(1L).contains(expect(dir)), s"direction=$dir")
      assert(out(2L).isEmpty,
        s"direction=$dir: NULL-keyed left row must not match " +
          "NULL-keyed right rows")
      assert(out.size == 2, s"direction=$dir: left rows preserved")
    }
  }
}
