package graft.operators

/**
 * Subtitle / caption parsing (SubRip `.srt` + W3C WebVTT) — the caption
 * side of a video-centric training corpus: speech-aligned text arrives
 * as subtitle tracks, and the pipeline needs cue-level (start, end,
 * text) rows to align captions with frames, measure speech density, or
 * feed the text filters downstream.
 *
 * Reference surface: the reference's multimodal ingest treats video as
 * payload + typed metadata (`NeuronDB/src/ml/ml_multimodal.c`); caption
 * tracks are the public-format companion the reference leaves to its
 * loaders.
 *
 * Format rules implemented (both from the public specs):
 *  - SRT: blank-line-separated blocks — numeric cue index line, a
 *    timing line `HH:MM:SS,mmm --> HH:MM:SS,mmm`, then 1+ text lines.
 *  - WebVTT: a `WEBVTT` signature line (optionally followed by header
 *    metadata until the first blank line); cues may carry an optional
 *    id line before the timing line; timings use `.` for the
 *    millisecond separator, MAY omit the hours field, and MAY be
 *    followed by cue settings (`align:start` …) which are not text.
 *  - Both: CRLF/CR normalized to LF; timing arrow must be `-->`;
 *    end ≤ start, malformed timestamps, or a cue with no timing line
 *    refuse the whole track (None) — a half-parsed caption file must
 *    not silently drop speech.
 *
 * Scale shape: stateless per-row map (track blob in, cues out) — no
 * shuffle; cue explosion is the same "archive → member rows" shape as
 * the WARC/ZIP readers.
 */
object Subtitles {

  final case class Cue(index: Int, startMs: Long, endMs: Long, text: String)

  private def fmtTs(ms: Long, sepDot: Boolean): String = {
    val h = ms / 3600000
    val m = (ms % 3600000) / 60000
    val s = (ms % 60000) / 1000
    val f = ms % 1000
    f"$h%02d:$m%02d:$s%02d${if (sepDot) "." else ","}$f%03d"
  }

  /** Serialize cues as an SRT track (1-based indices, CRLF line ends —
    * the convention real SRT files ship with). */
  def encodeSrt(cues: Seq[Cue]): String =
    cues.zipWithIndex.map { case (c, i) =>
      s"${i + 1}\r\n${fmtTs(c.startMs, sepDot = false)} --> ${fmtTs(c.endMs, sepDot = false)}\r\n${c.text}"
    }.mkString("", "\r\n\r\n", if (cues.nonEmpty) "\r\n" else "")

  /** Serialize cues as a WebVTT track (optional id line per cue, dot
    * millisecond separator, a settings token on every other cue to
    * exercise the parser's settings strip). */
  def encodeVtt(cues: Seq[Cue]): String = {
    val body = cues.zipWithIndex.map { case (c, i) =>
      val id = s"cue-${i + 1}\n"
      val settings = if (i % 2 == 1) " align:start position:10%" else ""
      s"$id${fmtTs(c.startMs, sepDot = true)} --> ${fmtTs(c.endMs, sepDot = true)}$settings\n${c.text}"
    }.mkString("\n\n")
    "WEBVTT - generated\n\n" + body + (if (cues.nonEmpty) "\n" else "")
  }

  // HH:MM:SS,mmm or HH:MM:SS.mmm or MM:SS.mmm (VTT short form)
  private val TsFull = """(\d{2,}):(\d{2}):(\d{2})[.,](\d{3})""".r
  private val TsShort = """(\d{2}):(\d{2})[.,](\d{3})""".r

  private def parseTs(s: String): Long = s.trim match {
    case TsFull(h, m, sec, f) =>
      require(m.toInt < 60 && sec.toInt < 60, s"timestamp field out of range: $s")
      h.toLong * 3600000L + m.toLong * 60000L + sec.toLong * 1000L + f.toLong
    case TsShort(m, sec, f) =>
      require(m.toInt < 60 && sec.toInt < 60, s"timestamp field out of range: $s")
      m.toLong * 60000L + sec.toLong * 1000L + f.toLong
    case other => sys.error(s"bad timestamp: '$other'")
  }

  private def parseTimingLine(line: String): (Long, Long) = {
    val arrow = line.indexOf("-->")
    require(arrow > 0, s"no --> in timing line: '$line'")
    val start = parseTs(line.substring(0, arrow))
    // settings (VTT) follow the end timestamp after whitespace
    val endPart = line.substring(arrow + 3).trim
    val endTok = endPart.takeWhile(c => !c.isWhitespace)
    val end = parseTs(endTok)
    require(end > start, s"cue end $end <= start $start")
    (start, end)
  }

  /** Parse an SRT or WebVTT track (auto-detected by the WEBVTT
    * signature). None on ANY malformed cue. */
  def parse(track: String): Option[Seq[Cue]] =
    try {
      val norm = track.replace("\r\n", "\n").replace('\r', '\n')
      val isVtt = norm.startsWith("WEBVTT")
      // split into blank-line-separated blocks
      val blocks0 = norm.split("\n{2,}").toSeq.map(_.stripLineEnd).filter(_.trim.nonEmpty)
      // VTT: drop the signature/header block; NOTE/STYLE blocks too
      val blocks =
        if (isVtt) blocks0.drop(1).filterNot(b =>
          b.startsWith("NOTE") || b.startsWith("STYLE") || b.startsWith("REGION"))
        else blocks0
      var idx = 0
      val out = blocks.map { b =>
        val lines = b.split("\n").toSeq
        // timing line: first line containing -->; anything before it is
        // the SRT index or the VTT cue id
        val t = lines.indexWhere(_.contains("-->"))
        require(t >= 0, s"cue block with no timing line: '${b.take(40)}'")
        require(t <= 1, "more than one id line before the timing line")
        if (!isVtt && t == 1)
          require(lines.head.trim.forall(_.isDigit), s"bad SRT index: '${lines.head}'")
        val (start, end) = parseTimingLine(lines(t))
        idx += 1
        Cue(idx, start, end, lines.drop(t + 1).mkString("\n"))
      }
      Some(out)
    } catch { case _: Exception => None }
}
