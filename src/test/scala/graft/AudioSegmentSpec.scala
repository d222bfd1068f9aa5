package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.AudioSegment
import graft.operators.AudioSegment.Segment

/** Energy-gate segmentation invariants: exact integer energies, run
  * merging, the minimum-voiced-run hysteresis, trim bounds, and edge
  * cases (all-silent, short tail frame). Pure JVM. */
class AudioSegmentSpec extends AnyFunSuite {

  private def frames(spec: (Int, Int)*): Array[Short] =
    spec.flatMap { case (n, amp) => Array.fill(n * 4)(amp.toShort) }.toArray

  test("frame energies are exact truncating means; short tails drop") {
    val xs = Array[Short](100, -100, 50, -50, 7, 7, 7) // frameLen 4: one frame + tail 3
    assert(AudioSegment.frameEnergies(xs, 4).toSeq == Seq(75L))
    assert(AudioSegment.frameEnergies(Array.empty[Short], 4).isEmpty)
  }

  test("consecutive same-class frames merge into runs") {
    val xs = frames((3, 0), (2, 500), (1, 0), (4, 500))
    assert(AudioSegment.segment(xs, 4, 100L) == Seq(
      Segment(0, 3, voiced = false), Segment(3, 5, voiced = true),
      Segment(5, 6, voiced = false), Segment(6, 10, voiced = true)))
  }

  test("hysteresis: voiced runs under the gate become silence and merge") {
    val xs = frames((3, 0), (1, 500), (3, 0), (2, 500))
    val segs = AudioSegment.segment(xs, 4, 100L, minVoicedFrames = 2)
    assert(segs == Seq(Segment(0, 7, voiced = false), Segment(7, 9, voiced = true)))
  }

  test("trim bounds span first to last voiced frame in samples") {
    val xs = frames((2, 0), (3, 500), (2, 0), (1, 500), (2, 0))
    assert(AudioSegment.trimBounds(xs, 4, 100L) == (2 * 4, 8 * 4))
    // with the gate, the trailing blip drops and bounds shrink
    assert(AudioSegment.trimBounds(xs, 4, 100L, minVoicedFrames = 2) == (2 * 4, 5 * 4))
  }

  test("all-silent input yields one segment and empty trim") {
    val xs = frames((5, 0))
    assert(AudioSegment.segment(xs, 4, 100L) == Seq(Segment(0, 5, voiced = false)))
    assert(AudioSegment.trimBounds(xs, 4, 100L) == (0, 0))
  }
}
