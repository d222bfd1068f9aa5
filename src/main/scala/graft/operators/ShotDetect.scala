package graft.operators

/**
 * Shot-boundary detection and keyframe selection — the video-curation
 * step between container decode and any frame-level model: multimodal
 * training samples frames per SHOT, not per wall-clock tick, so a
 * pipeline must find the cuts first.
 *
 * Method: the classic luma-difference detector — mean absolute
 * difference of consecutive frames' Y planes in exact integer
 * arithmetic (sum |a-b| / plane size, truncating), a cut wherever the
 * difference crosses the threshold, then one keyframe per shot (its
 * FIRST frame — deterministic, no quality scoring needed).
 *
 * Reference surface: the reference treats video as opaque payloads
 * with metadata (`NeuronDB/src/ml/ml_multimodal.c`); cut detection is
 * public-method work composed with the repo's Y4M codec.
 *
 * Scale shape: stateless per-row map over payload blobs — no shuffle.
 */
object ShotDetect {

  /** Mean absolute luma difference between consecutive frames
    * (truncating integer division — oracle-exact). Index i compares
    * frame i to frame i+1; length = nFrames-1. */
  def lumaDiffs(frames: Seq[Array[Byte]]): Seq[Long] =
    frames.iterator.sliding(2).withPartial(false).map { w =>
      val a = w.head; val b = w(1)
      require(a.length == b.length, "frame size mismatch")
      var s = 0L
      var i = 0
      while (i < a.length) { s += math.abs((a(i) & 0xff) - (b(i) & 0xff)); i += 1 }
      s / a.length
    }.toSeq

  /** Shot start indices (frame 0 always starts a shot; then every
    * frame whose difference from its predecessor crosses `threshold`). */
  def shotStarts(frames: Seq[Array[Byte]], threshold: Long): Seq[Int] =
    if (frames.isEmpty) Nil
    else 0 +: lumaDiffs(frames).zipWithIndex.collect {
      case (d, i) if d >= threshold => i + 1
    }

  /** Keyframe indices: the first frame of every shot. */
  def keyframes(frames: Seq[Array[Byte]], threshold: Long): Seq[Int] =
    shotStarts(frames, threshold)

  /** Probe a Y4M payload: (nFrames, nShots, keyframe index sum, max
    * inter-frame diff). None when the container refuses. */
  def probeY4m(payload: Array[Byte], threshold: Long): Option[(Int, Int, Long, Long)] =
    Y4m.decodeY4m(payload).map { case (_, planes) =>
      val ys = planes.map(_._1)
      val ks = keyframes(ys, threshold)
      val ds = lumaDiffs(ys)
      (ys.length, ks.length, ks.map(_.toLong).sum,
        if (ds.isEmpty) 0L else ds.max)
    }
}
