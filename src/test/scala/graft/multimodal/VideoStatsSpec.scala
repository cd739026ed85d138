package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Temporal video stats: the hash-sequence kernel on paper-derived
  * sequences, both faces agreeing on the same frames, and the
  * static-clip gate. Expectations derive from frame BYTE identity
  * only (identical bytes → distance 0; distinct frames → ≥ 1), so
  * JPEG codec numerics never enter an expected value.
  */
class VideoStatsSpec extends SparkSpec {
  import spark.implicits._

  import MediaTestBuilders.jpegFrame

  private def avi(frames: Seq[Array[Byte]]): Array[Byte] =
    MediaTestBuilders.avi(MediaTestBuilders.movi(frames))

  test("fromHashes: paper-derived cut and static counts") {
    // distances between consecutive: 1, 0, 64 (complement)
    val h = Seq(0L, 1L, 1L, ~1L)
    val s = VideoStats.fromHashes(h, cutHamming = 16, staticHamming = 2)
    assert(s == VideoStats.Stats(4, 1, 2.0 / 3))
    val tight = VideoStats.fromHashes(h, cutHamming = 0, staticHamming = 0)
    assert(tight == VideoStats.Stats(4, 2, 1.0 / 3))
    assert(VideoStats.fromHashes(Seq(7L), 16, 2) ==
      VideoStats.Stats(1, 0, 1.0))
    assert(VideoStats.fromHashes(Nil, 16, 2) == VideoStats.Stats(0, 0, 1.0))
    intercept[IllegalArgumentException](VideoStats.fromHashes(Nil, -1, 0))
  }

  test("payload face: a static clip reads 1.0, a montage of distinct frames cuts at every pair") {
    val f = jpegFrame(31)
    val g = jpegFrame(113)
    val static0 = avi(Seq(f, f, f, f))
    val montage = avi(Seq(f, g, f, g))
    val df = Seq((1L, static0), (2L, montage), (3L, "junk".getBytes))
      .toDF("id", "content")
    val got = df.select(col("id"),
        VideoStats.statsCol(col("content"), cutHamming = 0,
          staticHamming = 0).as("s"))
      .orderBy("id").collect()
    assert(got(0).getStruct(1).getInt(1) == 0 &&
      got(0).getStruct(1).getDouble(2) == 1.0)
    assert(got(1).getStruct(1).getInt(1) == 3 &&
      got(1).getStruct(1).getDouble(2) == 0.0)
    assert(got(2).isNullAt(1))
  }

  test("BYO-frames face agrees with the payload face on the same frames") {
    val f = jpegFrame(31)
    val g = jpegFrame(113)
    val frames = Seq(
      (1L, 0L, f), (1L, 1L, f), (1L, 2L, f),
      (2L, 0L, f), (2L, 1L, g), (2L, 2L, f),
      // out-of-order delivery: the order column, not row order, rules
      (3L, 2L, f), (3L, 0L, g), (3L, 1L, g),
      (4L, 0L, "junk".getBytes)).toDF("vid", "idx", "frame")
    val got = VideoStats.statsFromFrames(frames, "vid", "idx", "frame",
        cutHamming = 0, staticHamming = 0)
      .orderBy("vid")
      .as[(Long, Int, Int, Double)].collect().toSeq
    assert(got == Seq(
      (1L, 3, 0, 1.0),
      (2L, 3, 2, 0.0),
      (3L, 3, 1, 0.5))) // g,g,f sorted by idx: distances 0 then ≥1
  }

  test("dropStaticVideos: static and undecodable drop; montage and single-frame clips survive") {
    val f = jpegFrame(31)
    val g = jpegFrame(113)
    // id 4: only ONE decodable frame (the rest corrupt) — a vacuous
    // static_ratio of 1.0 must not drop it (the ≥ 2 frames contract)
    val oneGood = avi(Seq("corrupt".getBytes, f, "alsocorrupt".getBytes))
    val batch = Seq(
      (1L, avi(Seq(f, g, f, g))),
      (2L, avi(Seq(f, f, f, f))),
      (3L, "not video".getBytes),
      (4L, oneGood)).toDF("id", "content")
    val kept = VideoStats.dropStaticVideos(batch, "content",
        staticHamming = 0)
      .select("id").as[Long].collect().toSet
    assert(kept == Set(1L, 4L))
  }
}
