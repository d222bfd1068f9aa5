package graft.operators

/**
 * Energy-based audio segmentation (VAD-style silence trimming) — the
 * step between audio ingest and feature extraction: crawled clips
 * carry leading/trailing silence and dead air between utterances, and
 * a speech pipeline wants voiced spans, not wall-clock bytes.
 *
 * Method: the classic frame-energy gate — fixed-length frames, mean
 * absolute amplitude per frame (integer arithmetic: sum(|s|)/N with
 * truncating division, so an oracle replays it exactly), a threshold
 * splitting voiced from silent, and run-length merging of consecutive
 * same-class frames into segments. `minVoicedFrames` drops blips
 * shorter than the gate (the hysteresis a real VAD needs).
 *
 * Reference surface: the reference's audio ingest normalizes payloads
 * before embedding (`NeuronDB/src/ml/ml_multimodal.c`); segmentation
 * is public-method DSP re-expressed as per-row integer math.
 *
 * Scale shape: stateless per-row map over payload blobs — no shuffle.
 */
object AudioSegment {

  /** One merged run of frames: [startFrame, endFrame), voiced flag. */
  final case class Segment(start: Int, end: Int, voiced: Boolean)

  /** Frame energies: mean |sample| per frame (truncating integer
    * division; the tail frame is dropped if short — deterministic). */
  def frameEnergies(samples: Array[Short], frameLen: Int): Array[Long] = {
    require(frameLen > 0, "frameLen must be positive")
    val n = samples.length / frameLen
    Array.tabulate(n) { f =>
      var s = 0L
      var i = f * frameLen
      val end = i + frameLen
      while (i < end) { s += math.abs(samples(i).toLong); i += 1 }
      s / frameLen
    }
  }

  /** Segment by energy threshold with a minimum voiced-run gate:
    * voiced runs shorter than `minVoicedFrames` are reclassified as
    * silence BEFORE merging, so blips never split a silent span. */
  def segment(samples: Array[Short], frameLen: Int, threshold: Long,
              minVoicedFrames: Int = 1): Seq[Segment] = {
    require(minVoicedFrames >= 1, "minVoicedFrames must be >= 1")
    val e = frameEnergies(samples, frameLen)
    if (e.isEmpty) return Nil
    val voiced = e.map(_ >= threshold)
    // reclassify short voiced runs
    val cls = voiced.clone()
    var i = 0
    while (i < cls.length) {
      if (cls(i)) {
        var j = i
        while (j < cls.length && cls(j)) j += 1
        if (j - i < minVoicedFrames) (i until j).foreach(k => cls(k) = false)
        i = j
      } else i += 1
    }
    val out = Seq.newBuilder[Segment]
    var s = 0
    i = 1
    while (i <= cls.length) {
      if (i == cls.length || cls(i) != cls(s)) {
        out += Segment(s, i, cls(s))
        s = i
      }
      i += 1
    }
    out.result()
  }

  /** Trim bounds in SAMPLES: [start, end) spanning the first to last
    * voiced frame; (0, 0) for all-silent input. */
  def trimBounds(samples: Array[Short], frameLen: Int, threshold: Long,
                 minVoicedFrames: Int = 1): (Int, Int) = {
    val segs = segment(samples, frameLen, threshold, minVoicedFrames)
      .filter(_.voiced)
    if (segs.isEmpty) (0, 0)
    else (segs.head.start * frameLen, segs.last.end * frameLen)
  }
}
