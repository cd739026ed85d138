package graft.engine.validate

/** Audio metadata probe: a RIFF/WAVE chunk walker recovering channels,
  * sample rate, bits-per-sample and frame count from the container
  * header WITHOUT decoding samples — the audio analogue of
  * [[ImageProbe]]'s header-only image read. Pure JVM byte parsing (no
  * codec dependency), so unlike compressed formats this modality CAN
  * decode for real in this environment; wired behind
  * [[graft.multimodal.MediaDecoder.decode]] for `kind="audio"`.
  *
  * Parser stance (crawl data lies): the outer RIFF size field is
  * ignored — chunks are walked against the actual byte length; chunk
  * sizes are read as UNSIGNED 32-bit; chunks are padded to even
  * offsets per spec; unknown chunks (`LIST`, `fact`, `bext`, ...) are
  * skipped, so metadata-bearing WAVs parse the same as canonical
  * 44-byte-header ones; a declared `data` size that overruns the
  * actual payload is clamped to the bytes present (truncated download
  * ≠ unreadable). Any format tag is accepted — frame count needs only
  * a sane block align — but degenerate fmt values (zero channels/rate/
  * align) are a parse failure, not a divide-by-zero.
  */
object AudioProbe {

  /** Header facts of one WAVE payload. `nFrames` counts sample frames
    * (all channels advance together): `data bytes / blockAlign`.
    */
  final case class WavInfo(channels: Int, sampleRateHz: Int,
                           bitsPerSample: Int, nFrames: Long) {
    def durationMs: Long =
      if (sampleRateHz <= 0) 0L else nFrames * 1000L / sampleRateHz
  }

  private def u16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  private def u32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  private def tag(b: Array[Byte], off: Int): String =
    new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

  private def isRiffWave(b: Array[Byte]): Boolean =
    b != null && b.length >= 12 && tag(b, 0) == "RIFF" && tag(b, 8) == "WAVE"

  def info(bytes: Array[Byte]): Option[WavInfo] = {
    if (!isRiffWave(bytes)) return None
    // offsets tracked as Long: a hostile chunk size near 0xFFFFFFFF
    // must end the walk by exceeding the length, NEVER wrap/clamp back
    // into Int range (an Int offset clamped to MaxValue makes
    // `off + 8` overflow negative and re-enter the loop out of bounds)
    var off = 12L
    var fmt: Option[(Int, Int, Int, Int)] = None // channels, rate, align, bits
    var dataBytes = -1L
    while (off + 8 <= bytes.length && (fmt.isEmpty || dataBytes < 0)) {
      val o = off.toInt // safe: off + 8 <= length <= Int.MaxValue
      val id = tag(bytes, o)
      val declared = u32(bytes, o + 4)
      val start = o + 8
      val avail = math.min(declared, (bytes.length - start).toLong)
      if (id == "fmt " && fmt.isEmpty && avail >= 16) {
        val channels = u16(bytes, start + 2)
        val rate = u32(bytes, start + 4)
        val align = u16(bytes, start + 12)
        val bits = u16(bytes, start + 14)
        if (channels >= 1 && rate >= 1 && rate <= Int.MaxValue && align >= 1)
          fmt = Some((channels, rate.toInt, align, bits))
      } else if (id == "data" && dataBytes < 0) {
        dataBytes = avail
      }
      // next chunk: declared size padded to even — Long arithmetic,
      // monotonically increasing, so a lying size just fails the
      // loop bound
      off += 8L + declared + (declared & 1L)
    }
    fmt.collect { case (channels, rate, align, bits) if dataBytes >= 0 =>
      WavInfo(channels, rate, bits, dataBytes / align)
    }
  }

  /** Failure diagnosis, same contract as [[ImageProbe.diagnose]]:
    * stable strings a pipeline can group dead-letters by.
    */
  def diagnose(bytes: Array[Byte]): String =
    if (bytes == null || bytes.isEmpty) "file is empty"
    else if (!isRiffWave(bytes)) "not a RIFF/WAVE container"
    else info(bytes) match {
      case Some(_) => "ok"
      case None =>
        // distinguish the two walk failures for triage (same Long-
        // offset rule as info: a lying size ends the walk, no wrap)
        var off = 12L
        var sawFmt = false
        while (off + 8 <= bytes.length && !sawFmt) {
          val o = off.toInt
          if (tag(bytes, o) == "fmt ") sawFmt = true
          else {
            val declared = u32(bytes, o + 4)
            off += 8L + declared + (declared & 1L)
          }
        }
        if (sawFmt) "wave data chunk missing or fmt truncated"
        else "wave fmt chunk missing"
    }
}
