package graft.ops

import graft.SparkSpec

/** SRT/WebVTT parsing: hand-authored payloads, every cue timestamp and
  * text hand-derived; non-cue blocks (headers, notes, bare indices)
  * drop; markup strips; transcripts assemble in time order.
  */
class SubtitlesSpec extends SparkSpec {
  import spark.implicits._

  private val srt =
    """1
      |00:00:01,000 --> 00:00:03,500
      |Hello there.
      |
      |2
      |00:00:04,200 --> 00:00:06,000
      |Second <i>line</i>
      |with a wrap.
      |
      |3
      |01:02:03,456 --> 01:02:04,000
      |{\an8}Top text
      |""".stripMargin

  private val vtt =
    """WEBVTT
      |
      |NOTE this block is commentary and must drop
      |
      |00:05.000 --> 00:07.250 align:middle
      |<v Speaker>No hours on this one
      |
      |00:01:00.000 --> 00:01:02.000
      |Full hours here
      |""".stripMargin

  test("SRT cues: timestamps to ms, markup stripped, wraps collapsed") {
    val got = Subtitles.parseCues(
        Seq((1L, srt)).toDF("doc_id", "content"), "doc_id", "content")
      .orderBy("cue_index")
      .select("cue_index", "start_ms", "end_ms", "text")
      .as[(Int, Long, Long, String)].collect().toSeq
    assert(got == Seq(
      (0, 1000L, 3500L, "Hello there."),
      (1, 4200L, 6000L, "Second line with a wrap."),
      (2, 3723456L, 3724000L, "Top text")))
  }

  test("WebVTT: header and NOTE blocks drop, optional hours, cue settings ignored") {
    val got = Subtitles.parseCues(
        Seq((1L, vtt)).toDF("doc_id", "content"), "doc_id", "content")
      .orderBy("cue_index")
      .select("cue_index", "start_ms", "end_ms", "text")
      .as[(Int, Long, Long, String)].collect().toSeq
    assert(got == Seq(
      (0, 5000L, 7250L, "No hours on this one"),
      (1, 60000L, 62000L, "Full hours here")))
  }

  test("WebVTT: 3+-digit hours parse whole, never as a shifted interior match") {
    val long = Seq(
      "WEBVTT", "",
      "100:00:00.000 --> 100:00:01.500", "Marathon archive", "",
      // 5-digit hours exceed the grammar; the lookbehind stops the
      // line from matching at an interior offset with hours misread
      "10000:00:00.000 --> 10000:00:01.000", "Too many digits", "",
      // oversized START with a VALID end is the nastier shape: the
      // match must not restart after the oversized field's colon and
      // read '00:00.000' as a 0-hour mm:ss (silently wrong start)
      "10000:00:00.000 --> 00:00:01.000", "Partial parse bait"
    ).mkString("\n")
    val got = Subtitles.parseCues(
        Seq((1L, long)).toDF("doc_id", "content"), "doc_id", "content")
      .select("start_ms", "end_ms", "text")
      .as[(Long, Long, String)].collect().toSeq
    assert(got == Seq((360000000L, 360001500L, "Marathon archive")))
  }

  test("CRLF payloads and NULL/garbage documents") {
    val crlf = srt.replace("\n", "\r\n")
    val cues = Subtitles.parseCues(Seq(
        (1L, crlf), (2L, null: String), (3L, "just some prose\n\nno cues"))
      .toDF("doc_id", "content"), "doc_id", "content")
    val byDoc = cues.groupBy("doc_id").count()
      .as[(Long, Long)].collect().toMap
    assert(byDoc == Map(1L -> 3L))
  }

  private val ass =
    """[Script Info]
      |Title: fixture
      |
      |[Events]
      |Format: Layer, Start, End, Style, Name, MarginL, MarginR, MarginV, Effect, Text
      |Dialogue: 0,0:00:01.50,0:00:03.25,Default,,0,0,0,,{\an8}Styled line
      |Dialogue: 0,0:00:04.00,0:00:05.00,Default,,0,0,0,,Hard\Nbreak, with comma
      |Comment: 0,0:00:06.00,0:00:07.00,Default,,0,0,0,,never shown
      |""".stripMargin

  test("ASS events: Dialogue lines only, centisecond times, overrides stripped, text commas kept") {
    val got = Subtitles.parseAss(
        Seq((1L, ass)).toDF("doc_id", "content"), "doc_id", "content")
      .orderBy("cue_index")
      .select("cue_index", "start_ms", "end_ms", "text")
      .as[(Int, Long, Long, String)].collect().toSeq
    assert(got == Seq(
      (0, 1500L, 3250L, "Styled line"),
      (1, 4000L, 5000L, "Hard break, with comma")))
    // transcripts compose over the shared cue schema
    val t = Subtitles.assembleTranscripts(
        Subtitles.parseAss(Seq((1L, ass)).toDF("doc_id", "content"),
          "doc_id", "content"), "doc_id")
      .select("transcript", "n_cues", "span_ms")
      .as[(String, Long, Long)].collect().head
    assert(t == (("Styled line Hard break, with comma", 2L, 3500L)))
  }

  test("transcripts: time-ordered assembly, cue count, covered span") {
    val got = Subtitles.transcripts(Seq(
        (1L, srt), (2L, vtt), (3L, "nothing")).toDF("doc_id", "content"),
        "doc_id", "content")
      .orderBy("doc_id")
      .select("doc_id", "transcript", "n_cues", "span_ms")
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, "Hello there. Second line with a wrap. Top text", 3L,
        3724000L - 1000L),
      (2L, "No hours on this one Full hours here", 2L, 62000L - 5000L)))
  }
}
