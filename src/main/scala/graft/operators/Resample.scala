package graft.operators

/**
 * Audio resampling (linear interpolation, exact integer arithmetic) —
 * the rate-normalization step of an audio curation pipeline: corpora
 * arrive at 8/16/22.05/44.1 kHz and models train at one rate, so every
 * clip passes through a resampler before feature extraction.
 *
 * Reference surface: the reference's audio ingest
 * (`NeuronDB/src/ml/ml_multimodal.c`) normalizes payloads before
 * embedding; the arithmetic here is the public linear-interpolation
 * form.
 *
 * Exactness contract (what makes this oracle-able): for a rational
 * ratio p/q, output frame j samples the source at position j·q/p;
 * with t = j·q, idx = ⌊t/p⌋, frac = t mod p (both nonnegative), the
 * sample is
 *
 *   out[j] = x[idx] + ((x[idx+1] − x[idx]) · frac) / p
 *
 * — all in int math with TRUNCATING division (Java `/`, which matches
 * DuckDB's integer `//`), so Spark and the oracle agree bit-exactly.
 * Output length = ⌊(n−1)·p/q⌋ + 1 (the last source frame is never
 * extrapolated past).
 *
 * Interleaved multi-channel input resamples each channel over its own
 * frame axis. Scale shape: stateless per-row map.
 */
object Resample {

  /** Resample interleaved PCM frames by p/q (p=up, q=down). */
  def resampleLinear(xs: Array[Short], channels: Int, p: Int, q: Int): Array[Short] = {
    require(channels >= 1 && xs.length % channels == 0, "bad channel layout")
    require(p >= 1 && q >= 1, "bad ratio")
    val nIn = xs.length / channels
    if (nIn == 0) return Array.empty
    val nOut = ((nIn - 1).toLong * p / q).toInt + 1
    val out = new Array[Short](nOut * channels)
    var c = 0
    while (c < channels) {
      var j = 0
      while (j < nOut) {
        val t = j.toLong * q
        val idx = (t / p).toInt
        val frac = (t % p).toInt
        val x0 = xs(idx * channels + c).toInt
        val v =
          if (frac == 0 || idx + 1 >= nIn) x0
          else {
            val x1 = xs((idx + 1) * channels + c).toInt
            // Long product: (x1-x0)·frac reaches ±2^31 for unreduced
            // ratios like 44100/8000 scaled up (frac < p can be large);
            // DuckDB's side is BIGINT already, so Long keeps the
            // truncating-division pairing exact instead of wrapping.
            x0 + ((x1 - x0).toLong * frac / p).toInt
          }
        out(j * channels + c) = v.toShort
        j += 1
      }
      c += 1
    }
    out
  }
}
