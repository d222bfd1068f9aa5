package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Subtitles
import graft.operators.Subtitles.Cue

/** SRT + WebVTT parser invariants: round-trips, auto-detect, VTT
  * settings/id/NOTE handling, short timestamps, CR/CRLF normalization,
  * and loud refusal of malformed timings. Pure JVM. */
class SubtitlesSpec extends AnyFunSuite {

  private def cues = Seq(
    Cue(1, 13, 1513, "hello subtitle world"),
    Cue(2, 2013, 3513, "second cue here"),
    Cue(3, 4013, 5513, "third"))

  test("SRT round-trip preserves order, timings, and text") {
    val parsed = Subtitles.parse(Subtitles.encodeSrt(cues)).get
    assert(parsed == cues)
  }

  test("VTT round-trip: signature, cue ids, and settings are not text") {
    val parsed = Subtitles.parse(Subtitles.encodeVtt(cues)).get
    assert(parsed == cues)
  }

  test("multi-line cue text and '-->' INSIDE text survive") {
    val tricky = Seq(Cue(1, 0, 1000, "line one\nline --> two"))
    assert(Subtitles.parse(Subtitles.encodeSrt(tricky)).get == tricky)
  }

  test("VTT short MM:SS.mmm timestamps and NOTE blocks parse") {
    val track = "WEBVTT\n\nNOTE a comment\nspanning lines\n\n" +
      "00:05.250 --> 00:07.000\nshort stamp text\n"
    val parsed = Subtitles.parse(track).get
    assert(parsed == Seq(Cue(1, 5250, 7000, "short stamp text")))
  }

  test("hours beyond 99 and bare-CR line endings normalize") {
    val track = "1\r100:00:01,000 --> 100:00:02,000\rdeep stream\r"
    assert(Subtitles.parse(track).get ==
      Seq(Cue(1, 360001000L, 360002000L, "deep stream")))
  }

  test("empty tracks parse to zero cues in both formats") {
    assert(Subtitles.parse(Subtitles.encodeSrt(Nil)).get.isEmpty)
    assert(Subtitles.parse(Subtitles.encodeVtt(Nil)).get.isEmpty)
  }

  test("malformed cues are refused: bad arrow, end<=start, minutes>=60, no timing") {
    assert(Subtitles.parse("1\n00:00:01,000 -> 00:00:02,000\nx\n").isEmpty)
    assert(Subtitles.parse("1\n00:00:02,000 --> 00:00:02,000\nx\n").isEmpty)
    assert(Subtitles.parse("1\n00:61:01,000 --> 00:62:02,000\nx\n").isEmpty)
    assert(Subtitles.parse("just some text\nwithout any cue\n").isEmpty)
    assert(Subtitles.parse("1\nnot-a-number\n00:00:01,000 --> 00:00:02,000\nx\n").isEmpty)
  }
}
