package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SubRip (.srt) and WebVTT (.vtt) subtitle parsing — the video→text
  * bridge: transcripts are the textual training data most video
  * corpora actually contribute, and both formats are plain text with
  * published grammars (SubRip's de-facto block format; WebVTT per the
  * W3C spec). Everything here is pure column expressions — parsing a
  * 100 TB subtitle corpus is one codegen'd scan, no UDFs.
  *
  * Cue model: a payload splits on blank lines into blocks; a block
  * with a `HH:MM:SS,mmm --> HH:MM:SS,mmm` timing line (SRT comma,
  * WebVTT dot, hours optional in WebVTT) is a cue; everything after
  * the timing line is cue text (markup tags stripped — `<i>`, `<v
  * Speaker>`, `{\\an8}` ASS-style braces). Non-cue blocks (the WEBVTT
  * header, `NOTE`/`STYLE` blocks, bare indices) drop. Cue indices are
  * POSITIONAL (the SRT numeric line is advisory and WebVTT cues often
  * have none).
  */
object Subtitles {

  // Hours: WebVTT allows MORE than two digits (a days-long stream
  // archive is legal); 4 is plenty for real media. The (?<![\d:])
  // lookbehind stops a 5+-digit hours field from matching at an
  // interior offset in EITHER form: '10000:00:00.000' must not read
  // as hours '0000' (digit before the match) NOR as a 0-hour
  // 'mm:ss.fff' starting after the oversized field's colon (colon
  // before the match). Oversized hours fail loud (no cue), never
  // parse partially.
  private val TimingRe =
    "(?<![\\d:])(?:(\\d{1,4}):)?(\\d{2}):(\\d{2})[.,](\\d{3})\\s*-->\\s*" +
      "(?:(\\d{1,4}):)?(\\d{2}):(\\d{2})[.,](\\d{3})"

  private def ms(h: Column, m: Column, s: Column, f: Column): Column = {
    // an absent hours group extracts as '' — ANSI cast would throw
    val hours = when(h === "", lit(0L)).otherwise(h.cast("long"))
    (hours * 3600 + m.cast("long") * 60 + s.cast("long")) * 1000 +
      f.cast("long")
  }

  /** Parse one subtitle payload column into cue rows:
    * `(…idCols, cue_index, start_ms, end_ms, text)`. `cue_index` is
    * the 0-based position among the document's cues; cue text has
    * markup stripped and inner newlines collapsed to single spaces.
    */
  def parseCues(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val blocks = split(
      regexp_replace(coalesce(col(textCol), lit("")), "\r\n?", "\n"),
      "\n[ \t]*\n+")
    val lines = split(col("__blk"), "\n")
    // 1-based index of the timing line inside the block (0 = none)
    val timingAt = array_position(
      transform(lines, l => l.rlike(TimingRe)), true)
    val timing = regexp_extract(col("__blk"), TimingRe, 0)
    def grp(i: Int) = regexp_extract(col("__blk"), TimingRe, i)
    val rawText = array_join(
      slice(lines, (col("__ta") + 1).cast("int"),
        greatest(size(lines) - col("__ta").cast("int"), lit(0)).cast("int")),
      " ")
    val cleaned = trim(regexp_replace(regexp_replace(rawText,
      "<[^>]*>", ""), "\\{[^}]*\\}", ""))
    df.select(col(idCol), explode(blocks).as("__blk"))
      .withColumn("__ta", timingAt)
      .filter(col("__ta") > 0 && timing =!= "")
      .withColumn("start_ms", ms(grp(1), grp(2), grp(3), grp(4)))
      .withColumn("end_ms", ms(grp(5), grp(6), grp(7), grp(8)))
      .withColumn("text", cleaned)
      .withColumn("cue_index",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(col(idCol)).orderBy(col("start_ms"),
            col("end_ms"), col("text"))) - 1)
      .select(col(idCol), col("cue_index"), col("start_ms"),
        col("end_ms"), col("text"))
  }

  /** SubStation Alpha (.ssa/.ass) events — the third caption grammar
    * in the wild (fansub corpora ship it almost exclusively). One
    * `Dialogue:` line per cue: ten comma-separated fields with commas
    * legal in the final Text field (split limit 10), timestamps
    * `H:MM:SS.cc` in CENTIseconds, `{\...}` override blocks stripped,
    * `\N`/`\n` hard breaks collapsed to spaces. Output schema matches
    * [[parseCues]], so [[assembleTranscripts]] and every cue consumer
    * compose unchanged.
    */
  def parseAss(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val assTimeRe = "(\\d+):(\\d{2}):(\\d{2})[.:](\\d{2})"
    def assMs(t: Column): Column =
      (regexp_extract(t, assTimeRe, 1).cast("long") * 3600 +
        regexp_extract(t, assTimeRe, 2).cast("long") * 60 +
        regexp_extract(t, assTimeRe, 3).cast("long")) * 1000 +
        regexp_extract(t, assTimeRe, 4).cast("long") * 10
    val lines = split(
      regexp_replace(coalesce(col(textCol), lit("")), "\r\n?", "\n"), "\n")
    val fields = split(
      regexp_replace(col("__ln"), "^\\s*Dialogue:\\s*", ""), ",", 10)
    val rawText = element_at(col("__f"), 10)
    val cleaned = trim(regexp_replace(regexp_replace(rawText,
      "\\{[^}]*\\}", ""), "\\\\[Nnh]", " "))
    df.select(col(idCol), explode(lines).as("__ln"))
      .filter(col("__ln").rlike("^\\s*Dialogue:"))
      .withColumn("__f", fields)
      .filter(size(col("__f")) >= 10 &&
        element_at(col("__f"), 2).rlike(assTimeRe) &&
        element_at(col("__f"), 3).rlike(assTimeRe))
      .withColumn("start_ms", assMs(element_at(col("__f"), 2)))
      .withColumn("end_ms", assMs(element_at(col("__f"), 3)))
      .withColumn("text", cleaned)
      .withColumn("cue_index",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(col(idCol)).orderBy(col("start_ms"),
            col("end_ms"), col("text"))) - 1)
      .select(col(idCol), col("cue_index"), col("start_ms"),
        col("end_ms"), col("text"))
  }

  /** One transcript row per document from a cue frame (the
    * [[parseCues]]/[[parseAss]] schema): cues joined in time order
    * with single spaces — the frame the TEXT pipeline (language id,
    * quality, dedup, perplexity) consumes directly. Documents with no
    * non-empty cue emit no row. Also carries the cue count and the
    * covered duration (last end − first start, ms).
    */
  def assembleTranscripts(cues: DataFrame, idCol: String): DataFrame =
    cues
      .filter(col("text") =!= "")
      .groupBy(col(idCol))
      .agg(
        array_join(array_sort(collect_list(struct(
          col("start_ms"), col("end_ms"), col("cue_index"), col("text"))))
          .getField("text"), " ").as("transcript"),
        count(lit(1)).as("n_cues"),
        (max("end_ms") - min("start_ms")).as("span_ms"))

  /** [[assembleTranscripts]] over [[parseCues]] (SRT/WebVTT payloads). */
  def transcripts(df: DataFrame, idCol: String, textCol: String): DataFrame =
    assembleTranscripts(parseCues(df, idCol, textCol), idCol)
}
