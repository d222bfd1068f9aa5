package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * IMA/DVI ADPCM (WAVE_FORMAT_IMA_ADPCM, audioFormat 17) — the first
 * STATEFUL codec in the audio decode family: each 4-bit code updates a
 * (predictor, step-index) pair, so decode is a sequential recurrence
 * rather than G.711's per-byte table expansion. Pure integer math
 * (public-domain IMA/DVI reference algorithm, same tables as the
 * multimedia RFCs), which keeps it oracle-exact: the DuckDB sibling
 * replays the recurrence as a recursive CTE carrying the same state.
 *
 * Reference surface: the waveform branch of `embed_multimodal`
 * (`NeuronDB/src/ml/ml_multimodal.c`) — the reference decodes audio
 * payloads to features; this closes the predictive-codec slice that
 * G.711 (`Multimodal.decodeWavSamples`) left open. Perceptual codecs
 * (MP3/AAC) remain on the documented stub.
 */
object Adpcm {

  /** IMA step-size table, 89 entries (public-domain reference values). */
  val stepTable: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)

  /** Step-index adjustment per code magnitude (low 3 bits). */
  val indexTable: Array[Int] = Array(-1, -1, -1, -1, 2, 4, 6, 8)

  /** Decode a nibble stream from an initial (predictor, index) state.
    * Returns the reconstructed samples; the final state is
    * `(samples.last, index')` but callers needing it use [[decodeFull]]. */
  def decode(nibbles: Array[Byte], pred0: Int, idx0: Int): Array[Short] =
    decodeFull(nibbles, pred0, idx0)._1

  /** Decode plus the final (predictor, stepIndex) state — the state is
    * what a streaming decoder would checkpoint between blocks. */
  def decodeFull(nibbles: Array[Byte], pred0: Int, idx0: Int): (Array[Short], Int, Int) = {
    var pred = pred0
    var idx = math.max(0, math.min(88, idx0))
    val out = new Array[Short](nibbles.length)
    var i = 0
    while (i < nibbles.length) {
      val n = nibbles(i) & 0x0F
      val step = stepTable(idx)
      var diff = step >> 3
      if ((n & 4) != 0) diff += step
      if ((n & 2) != 0) diff += step >> 1
      if ((n & 1) != 0) diff += step >> 2
      pred = if ((n & 8) != 0) pred - diff else pred + diff
      if (pred > 32767) pred = 32767 else if (pred < -32768) pred = -32768
      idx = math.max(0, math.min(88, idx + indexTable(n & 7)))
      out(i) = pred.toShort
      i += 1
    }
    (out, pred, idx)
  }

  /** Encode a nibble stream as a REAL RIFF/WAVE byte stream: audioFormat
    * 17, mono, bits 4, the canonical 20-byte fmt chunk (cbSize=2 +
    * samplesPerBlock) plus a `fact` chunk, one data block whose 4-byte
    * header carries the initial (predictor int16 LE, stepIndex u8, 0)
    * and whose body packs nibbles low-first — the standard single-block
    * layout. The fixture-side generator, the role `encodeWavG711` plays
    * for the companded codecs. */
  def encodeWavAdpcmIma(nibbles: Array[Byte], pred0: Short, idx0: Int,
                        sampleRate: Int): Array[Byte] = {
    require(sampleRate >= 1, "need a positive rate")
    require(idx0 >= 0 && idx0 <= 88, s"step index out of range: $idx0")
    val dataBytes = 4 + (nibbles.length + 1) / 2
    val bb = java.nio.ByteBuffer.allocate(12 + (8 + 20) + (8 + 4) + 8 + dataBytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII"))
    bb.putInt(4 + (8 + 20) + (8 + 4) + 8 + dataBytes)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")); bb.putInt(20)
    bb.putShort(17) // WAVE_FORMAT_IMA_ADPCM
    bb.putShort(1); bb.putInt(sampleRate)
    bb.putInt(sampleRate / 2) // ~4 bits/sample byte rate
    bb.putShort(dataBytes.toShort) // blockAlign: the single block
    bb.putShort(4) // bitsPerSample
    bb.putShort(2) // cbSize
    bb.putShort((nibbles.length + 1).toShort) // samplesPerBlock (incl. seed)
    bb.put("fact".getBytes("US-ASCII")); bb.putInt(4)
    bb.putInt(nibbles.length + 1)
    bb.put("data".getBytes("US-ASCII")); bb.putInt(dataBytes)
    bb.putShort(pred0); bb.put(idx0.toByte); bb.put(0.toByte)
    var i = 0
    while (i < nibbles.length) {
      val lo = nibbles(i) & 0x0F
      val hi = if (i + 1 < nibbles.length) nibbles(i + 1) & 0x0F else 0
      bb.put(((hi << 4) | lo).toByte)
      i += 2
    }
    bb.array()
  }

  /** Decode a mono single-block IMA ADPCM WAV payload: own RIFF chunk
    * walk (audioFormat 17 carries bits=4, which the PCM/G.711 meta guard
    * rightly rejects), then the [[decodeFull]] recurrence. Returns
    * (sampleRate, samples, finalPredictor, finalStepIndex); None for
    * anything that is not a well-formed mono IMA ADPCM stream. */
  def decodeWavAdpcm(payload: Array[Byte]): Option[(Int, Array[Short], Int, Int)] = {
    if (payload == null || payload.length < 12) return None
    val bb = java.nio.ByteBuffer.wrap(payload)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourcc(): String = {
      val b = new Array[Byte](4); bb.get(b); new String(b, "US-ASCII")
    }
    if (fourcc() != "RIFF") return None
    bb.getInt
    if (fourcc() != "WAVE") return None
    var fmtOk = false
    var rate = 0
    var nSamples = -1
    var data: Option[(Int, Int)] = None // (position, size)
    while (bb.remaining() >= 8) {
      val id = fourcc()
      val sz = bb.getInt
      if (sz < 0 || sz > bb.remaining()) return None
      val next = math.min(bb.position().toLong + sz + (sz & 1), bb.limit().toLong).toInt
      if (id == "fmt " && sz >= 16) {
        val af = bb.getShort & 0xFFFF
        val ch = bb.getShort & 0xFFFF
        rate = bb.getInt
        bb.getInt; bb.getShort
        val bits = bb.getShort & 0xFFFF
        fmtOk = af == 17 && ch == 1 && bits == 4 && rate > 0
      } else if (id == "fact" && sz >= 4) {
        nSamples = bb.getInt
      } else if (id == "data") {
        data = Some((bb.position(), sz))
      }
      bb.position(next)
    }
    val (pos, sz) = data.getOrElse(return None)
    if (!fmtOk || sz < 4) return None
    bb.position(pos)
    val pred0 = bb.getShort.toInt
    val idx0 = bb.get() & 0xFF
    bb.get() // reserved
    if (idx0 > 88) return None
    val body = sz - 4
    // fact counts the header seed sample; nibble count from the body,
    // trimmed to fact when the last byte's high nibble is padding
    val maxNibbles = body * 2
    val want = if (nSamples > 0) math.min(nSamples - 1, maxNibbles) else maxNibbles
    val nibbles = new Array[Byte](math.max(want, 0))
    var i = 0
    while (i < nibbles.length) {
      val b = bb.get(pos + 4 + i / 2) & 0xFF
      nibbles(i) = (if (i % 2 == 0) b & 0x0F else (b >> 4) & 0x0F).toByte
      i += 1
    }
    val (xs, fp, fi) = decodeFull(nibbles, pred0, idx0)
    Some((rate, xs, fp, fi))
  }

  /** Waveform features over a media table of IMA ADPCM WAV payloads —
    * per-row decode (partition-local, no shuffle) emitting the sample
    * count, peak, exact int64 energy, and the FINAL (predictor,
    * stepIndex) state (what a block-streaming decoder checkpoints).
    * Non-ADPCM rows yield NULLs, same contract as `decodeImages`. */
  def decodeAdpcmFeatures(media: DataFrame, payloadCol: String = "payload"): DataFrame = {
    val dec = udf((payload: Array[Byte]) =>
      decodeWavAdpcm(payload).map { case (rate, xs, fp, fi) =>
        var peak = 0
        var energy = 0L
        var i = 0
        while (i < xs.length) {
          val v = xs(i).toInt
          val a = math.abs(v)
          if (a > peak) peak = a
          energy += v.toLong * v
          i += 1
        }
        (rate, xs.length, peak, energy, fp, fi)
      })
    media.withColumn("adpcm", dec(col(payloadCol)))
      .withColumn("audio_sample_rate", col("adpcm._1"))
      .withColumn("audio_n_samples", col("adpcm._2"))
      .withColumn("audio_peak", col("adpcm._3"))
      .withColumn("audio_energy", col("adpcm._4"))
      .withColumn("audio_final_pred", col("adpcm._5"))
      .withColumn("audio_final_index", col("adpcm._6"))
      .drop("adpcm")
  }
}
