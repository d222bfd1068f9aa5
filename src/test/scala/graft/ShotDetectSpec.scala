package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{ShotDetect, Y4m}

/** Cut-detector invariants: exact integer luma diffs, threshold
  * crossings as shot starts, keyframe-per-shot, single-frame and
  * empty inputs, and the Y4M probe path. Pure JVM. */
class ShotDetectSpec extends AnyFunSuite {

  private def frame(v: Int) = Array.fill(64)(v.toByte)

  test("luma diffs are exact truncating means") {
    val ds = ShotDetect.lumaDiffs(Seq(frame(10), frame(10), frame(90), frame(87)))
    assert(ds == Seq(0L, 80L, 3L))
  }

  test("shot starts at frame 0 and at every threshold crossing") {
    val fs = Seq(frame(10), frame(10), frame(200), frame(200), frame(40))
    assert(ShotDetect.shotStarts(fs, 20L) == Seq(0, 2, 4))
    assert(ShotDetect.keyframes(fs, 20L) == Seq(0, 2, 4))
    // higher threshold: only the big cut survives
    assert(ShotDetect.shotStarts(fs, 170L) == Seq(0, 2))
  }

  test("gradual change below threshold never cuts") {
    val fs = (0 until 10).map(i => frame(100 + i))
    assert(ShotDetect.shotStarts(fs, 20L) == Seq(0))
  }

  test("single frame is one shot; empty input none") {
    assert(ShotDetect.shotStarts(Seq(frame(5)), 20L) == Seq(0))
    assert(ShotDetect.shotStarts(Nil, 20L) == Nil)
  }

  test("probeY4m rides the real container walk") {
    val frames = Seq(
      (frame(30), Array.fill(16)(128.toByte), Array.fill(16)(128.toByte)),
      (frame(30), Array.fill(16)(128.toByte), Array.fill(16)(128.toByte)),
      (frame(140), Array.fill(16)(128.toByte), Array.fill(16)(128.toByte)))
    val y4m = Y4m.encodeY4m(8, 8, frames)
    assert(ShotDetect.probeY4m(y4m, 20L).contains((3, 2, 2L, 110L)))
    assert(ShotDetect.probeY4m("not y4m".getBytes, 20L).isEmpty)
  }
}
