package graft.multimodal

import graft.SparkSpec

/** MJPEG-AVI frame-hash signatures: the RIFF walk against authored
  * AVIs built chunk-by-chunk by independent code (the m8 stance),
  * even sampling, container-layout invariance (re-mux), and the
  * video near-dup semantics — all expectations derived from frame
  * IDENTITY (same JPEG bytes ⇒ same dHash), never from JPEG codec
  * numerics.
  */
class VideoFrameHashSpec extends SparkSpec {
  import spark.implicits._

  // authored AVI bytes — the shared spec-side builders (one copy)
  import MediaTestBuilders.{avi, chunk, jpegFrame, list, movi}

  private val framesA: Seq[Array[Byte]] = (0 until 12).map(i => jpegFrame(29 + 2 * i))
  private val framesB: Seq[Array[Byte]] = (0 until 6).map(i => jpegFrame(101 + 5 * i))

  test("frameChunks walk: frames extract and hash; 12 frames sample to 8 evenly") {
    val bytes = avi(movi(framesA))
    val hs = VideoFrameHash.frameHashes(bytes, maxFrames = 8).get
    val want = (0 until 8).map(i => (i.toLong * 12 / 8).toInt)
      .flatMap(i => ImageHash.dhash64(framesA(i)))
    assert(hs == want && hs.length == 8)
    // fewer frames than the cap: all of them, in order
    val all = VideoFrameHash.frameHashes(avi(movi(framesB)), maxFrames = 8).get
    assert(all == framesB.flatMap(ImageHash.dhash64))
  }

  test("re-mux invariance: 00db ids, rec-LIST nesting and junk chunks hash identically") {
    val base = VideoFrameHash.frameHashes(avi(movi(framesA))).get
    val asDb = avi(movi(framesA, id = "01db"))
    val recWrapped = avi(list("movi",
      framesA.grouped(3).flatMap(g =>
        list("rec ", g.flatMap(f => chunk("00dc", f)).toArray)).toArray))
    val withJunk = avi(
      chunk("JUNK", Array.fill[Byte](64)(0)),
      list("hdrl", chunk("avih", Array.fill[Byte](56)(0))),
      movi(framesA))
    assert(VideoFrameHash.frameHashes(asDb).get == base)
    assert(VideoFrameHash.frameHashes(recWrapped).get == base)
    assert(VideoFrameHash.frameHashes(withJunk).get == base)
  }

  test("non-AVI, frame-less AVI and all-corrupt frames signature to None") {
    assert(VideoFrameHash.frameHashes(null).isEmpty)
    assert(VideoFrameHash.frameHashes("not a video".getBytes).isEmpty)
    assert(VideoFrameHash.frameHashes(
      avi(list("hdrl", chunk("avih", Array.fill[Byte](56)(0))))).isEmpty)
    // frames present but none decodes → Some(empty) at the function
    // level is suppressed by the SIGNATURE column (NULL) — here the
    // per-frame skip is visible
    val corrupt = avi(movi(Seq("garbage".getBytes, "more garbage".getBytes)))
    assert(VideoFrameHash.frameHashes(corrupt).get.isEmpty)
  }

  test("a corrupt frame is skipped, the rest still hash") {
    val mixed = avi(movi(Seq(framesA.head, "garbage".getBytes, framesA(1))))
    val hs = VideoFrameHash.frameHashes(mixed).get
    assert(hs == Seq(framesA.head, framesA(1)).flatMap(ImageHash.dhash64))
  }

  test("nearDuplicateVideos: re-mux pairs at full coverage, different clip stays apart") {
    val df = Seq(
      (0L, avi(movi(framesA))),
      (1L, avi(movi(framesA, id = "01db"))), // re-mux of the same stream
      (2L, avi(movi(framesB))),              // different clip
      (3L, "not a video".getBytes)           // undecodable
    ).toDF("video_id", "content")
    val pairs = VideoFrameHash.nearDuplicateVideos(df, "video_id", "content")
    val got = pairs
      .select("vid_a", "vid_b", "n_frames_a", "n_frames_b",
        "matched_a", "matched_b")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    pairs.unpersist()
    assert(got == Set((0L, 1L, 8L, 8L, 8L, 8L)))
  }

  test("a clip contained in a longer one reaches full coverage on its own side") {
    val subset = framesA.take(3) // 3 of A's first sampled frames
    val df = Seq(
      (0L, avi(movi(framesA))),
      (1L, avi(movi(subset)))).toDF("video_id", "content")
    val pairs = VideoFrameHash.nearDuplicateVideos(df, "video_id", "content")
    val got = pairs.select("vid_a", "vid_b", "matched_b")
      .as[(Long, Long, Long)].collect().toSeq
    pairs.unpersist()
    // A samples indices 0,1,3,4,6,7,9,10 of its 12 frames; the subset's
    // frames 0,1 are sampled on both sides (frame 2 is not in A's
    // sample), so matched_b = 2 of 3 — still ≥ the 0.5 default on b's
    // side? 2/3 ≥ 0.5 → pair emitted with matched_b = 2.
    assert(got == Seq((0L, 1L, 2L)))
  }

  test("video index: a re-muxed copy of an indexed clip drops; new clips and non-videos survive") {
    val index = VideoFrameHash.buildVideoIndex(
      Seq((100L, avi(movi(framesA)))).toDF("video_id", "content"),
      "video_id", "content")
    val batch = Seq(
      (0L, avi(movi(framesA, id = "01db"))), // re-mux of the indexed clip
      (1L, avi(movi(framesB))),              // new clip
      (2L, "junk".getBytes)                  // no signature: must survive
    ).toDF("video_id", "content")
    val kept = VideoFrameHash.dropNearDuplicateVideos(batch, index,
        "video_id", "content")
      .select("video_id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L))
  }

  test("curateVideos: validate → exact → set-signature near-dup → index") {
    val base = avi(movi(framesA))
    val batch = Seq(
      (0L, base),
      (1L, base.clone()),                     // byte copy → exact
      (2L, avi(movi(framesA, id = "01db"))),  // re-mux → perceptual
      (3L, avi(movi(framesB))),
      (4L, "junk".getBytes)                   // no signature → validate
    ).toDF("video_id", "content")
    val r = MediaPipeline.curateVideos(batch,
      MediaPipeline.Config("video_id", "content"))
    assert(r.kept.select("video_id").as[Long].collect().toSet == Set(0L, 3L))
    assert(r.metrics == Seq("n_received" -> 5L, "n_valid" -> 4L,
      "n_exact_kept" -> 3L, "n_near_kept" -> 2L, "n_final" -> 2L))
    val idx = VideoFrameHash.buildVideoIndex(
      Seq((100L, avi(movi(framesB)))).toDF("video_id", "content"),
      "video_id", "content")
    val r2 = MediaPipeline.curateVideos(batch,
      MediaPipeline.Config("video_id", "content"), Some(idx))
    assert(r2.kept.select("video_id").as[Long].collect().toSet == Set(0L))
  }

  test("BYO frames: byte-identical frame images produce the MJPEG walk's exact signature") {
    // the H.264 reality: keyframes extracted out-of-band, handed in as
    // (video_id, frame bytes) — on the same frame images the two
    // faces MUST agree hash-for-hash or the persisted index fractures
    // by extraction path
    val viaAvi = VideoFrameHash.buildVideoIndex(
        Seq((7L, avi(movi(framesB)))).toDF("video_id", "content"),
        "video_id", "content")
      .as[(Long, Long)].collect().toSet
    val viaFrames = VideoFrameHash.signatureFromFrames(
        framesB.map(f => (7L, f)).toDF("video_id", "frame"),
        "video_id", "frame")
      .as[(Long, Long)].collect().toSet
    assert(viaFrames == viaAvi && viaAvi.nonEmpty)
    // undecodable frames drop; an all-garbage video has no signature
    val withJunk = VideoFrameHash.signatureFromFrames(
      (framesB.map(f => (7L, f)) :+ ((7L, "junk".getBytes)) :+
        ((8L, "all junk".getBytes))).toDF("video_id", "frame"),
      "video_id", "frame")
    assert(withJunk.filter($"video_id" === 7L).count() == viaAvi.size)
    assert(withJunk.filter($"video_id" === 8L).count() == 0)
  }

  test("BYO frames: near-dup pairs and containment match the payload face semantics") {
    val frames =
      framesA.take(8).map(f => (10L, f)) ++   // full clip
      framesA.slice(2, 6).map(f => (11L, f)) ++ // contained excerpt
      framesB.map(f => (12L, f)) ++             // different clip
      Seq((13L, "not an image".getBytes))       // no signature
    val pairs = VideoFrameHash.nearDuplicateVideosFromFrames(
        frames.toDF("video_id", "frame"), "video_id", "frame")
      .select("vid_a", "vid_b", "n_frames_a", "n_frames_b",
        "matched_a", "matched_b")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    assert(pairs == Set((10L, 11L, 8L, 4L, 4L, 4L)))
  }

  test("BYO frames: incremental drop against an MJPEG-built index") {
    // index built by the PAYLOAD face; batch arrives as extracted
    // keyframes — the cross-path scenario the shared kernel exists for
    val idx = VideoFrameHash.buildVideoIndex(
      Seq((0L, avi(movi(framesA)))).toDF("video_id", "content"),
      "video_id", "content")
    val batch = Seq((20L, "copy of A"), (21L, "clip B"), (22L, "opaque"))
      .toDF("video_id", "label")
    val batchFrames =
      (framesA.take(8).map(f => (20L, f)) ++ framesB.map(f => (21L, f)) :+
        ((22L, "undecodable".getBytes))).toDF("video_id", "frame")
    val kept = VideoFrameHash.dropNearDuplicateVideosFromFrames(
        batch, batchFrames, idx, "video_id", "frame")
      .select("video_id").as[Long].collect().toSet
    assert(kept == Set(21L, 22L))
  }

  test("curateVideosFromFrames: validate → exact set-digest → near-dup → index, same metrics") {
    val batch = Seq((0L, "clip A"), (1L, "re-extracted A"),
      (2L, "excerpt of A"), (3L, "clip B"), (4L, "opaque"))
      .toDF("video_id", "label")
    val frames = (
      framesA.take(8).map(f => (0L, f)) ++
      framesA.take(8).map(f => (1L, f)) ++   // same frame bytes → same set
      framesA.slice(2, 6).map(f => (2L, f)) ++
      framesB.map(f => (3L, f)) :+
      ((4L, "no pixels here".getBytes))).toDF("video_id", "frame")
    val idx = VideoFrameHash.buildVideoIndex(
      Seq((100L, avi(movi(framesB)))).toDF("video_id", "content"),
      "video_id", "content")
    val r = MediaPipeline.curateVideosFromFrames(batch, frames,
      MediaPipeline.Config("video_id", "frame"), Some(idx))
    assert(r.kept.select("video_id").as[Long].collect().toSeq == Seq(0L))
    assert(r.metrics == Seq(
      "n_received" -> 5L,  // all five
      "n_valid" -> 4L,     // the frame-less video drops
      "n_exact_kept" -> 3L, // the identical keyframe set drops (id 1)
      "n_near_kept" -> 2L, // the contained excerpt drops (id 2)
      "n_final" -> 1L))    // clip B covered by the MJPEG-built index
  }

  test("guards: maxHamming, minMatchFrac, maxFrames ranges") {
    val df = Seq((0L, avi(movi(framesB)))).toDF("video_id", "content")
    intercept[IllegalArgumentException] {
      VideoFrameHash.nearDuplicateVideos(df, "video_id", "content",
        maxHamming = 64)
    }
    intercept[IllegalArgumentException] {
      VideoFrameHash.nearDuplicateVideos(df, "video_id", "content",
        minMatchFrac = 0.0)
    }
    intercept[IllegalArgumentException] {
      VideoFrameHash.frameHashes(avi(movi(framesB)), maxFrames = 0)
    }
  }
}
