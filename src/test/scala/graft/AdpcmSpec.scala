package graft

import org.apache.spark.sql.functions._
import graft.operators.Adpcm

class AdpcmSpec extends SparkSpecBase {
  import spark.implicits._

  test("single-step decode matches the hand-computed IMA recurrence") {
    // idx0=0 -> step 7; nibble 7 = +(0 + 7 + 3 + 1) = +11, index += 8
    val (xs, fp, fi) = Adpcm.decodeFull(Array[Byte](7), pred0 = 0, idx0 = 0)
    assert(xs.toSeq == Seq(11.toShort) && fp == 11 && fi == 8)
    // nibble 15 = same magnitude, sign bit set
    val (ys, gp, gi) = Adpcm.decodeFull(Array[Byte](15), pred0 = 0, idx0 = 0)
    assert(ys.toSeq == Seq((-11).toShort) && gp == -11 && gi == 8)
    // nibble 0: diff = step>>3 = 0, index decrement clamps at 0
    val (zs, _, zi) = Adpcm.decodeFull(Array[Byte](0), pred0 = 5, idx0 = 0)
    assert(zs.toSeq == Seq(5.toShort) && zi == 0)
  }

  test("predictor saturates at int16 and the step index clamps at 88") {
    val (xs, fp, fi) = Adpcm.decodeFull(Array[Byte](7, 7), pred0 = 32700, idx0 = 88)
    assert(xs(0) == 32767.toShort && fp == 32767 && fi == 88)
    val (ys, gp, _) = Adpcm.decodeFull(Array[Byte](15, 15), pred0 = -32700, idx0 = 88)
    assert(ys(0) == -32768.toShort && gp == -32768)
  }

  test("WAV round trip: encode -> chunk walk -> decode equals direct decode") {
    for (n <- Seq(1, 2, 7, 64)) {
      val nibbles = Array.tabulate(n)(i => ((i * 5 + 3) % 16).toByte)
      val wav = Adpcm.encodeWavAdpcmIma(nibbles, pred0 = -200, idx0 = 17,
        sampleRate = 8000)
      val Some((rate, xs, fp, fi)) = Adpcm.decodeWavAdpcm(wav)
      val (direct, dp, di) = Adpcm.decodeFull(nibbles, -200, 17)
      assert(rate == 8000 && xs.toSeq == direct.toSeq && fp == dp && fi == di,
        s"round trip diverged at n=$n")
    }
  }

  test("malformed payloads are rejected, not crashed") {
    assert(Adpcm.decodeWavAdpcm(null).isEmpty)
    assert(Adpcm.decodeWavAdpcm(Array[Byte](1, 2, 3)).isEmpty)
    assert(Adpcm.decodeWavAdpcm("RIFFxxxxWAVE".getBytes("US-ASCII")).isEmpty)
    // a PCM16 wav is not ADPCM: fmt guard must reject it
    val pcm = graft.operators.Multimodal.encodeWavPcm16(Array[Short](1, 2), 8000, 1)
    assert(Adpcm.decodeWavAdpcm(pcm).isEmpty)
  }

  test("decodeAdpcmFeatures emits exact energy/peak and the final state") {
    val nibbles = Array.tabulate(10)(i => (i % 16).toByte)
    val wav = Adpcm.encodeWavAdpcmIma(nibbles, pred0 = 100, idx0 = 30, sampleRate = 16000)
    val (xs, fp, fi) = Adpcm.decodeFull(nibbles, 100, 30)
    val df = Seq((1L, wav)).toDF("doc_id", "payload")
    val r = Adpcm.decodeAdpcmFeatures(df).collect().head
    assert(r.getAs[Int]("audio_sample_rate") == 16000)
    assert(r.getAs[Int]("audio_n_samples") == 10)
    assert(r.getAs[Int]("audio_peak") == xs.map(v => math.abs(v.toInt)).max)
    assert(r.getAs[Long]("audio_energy") == xs.map(v => v.toLong * v).sum)
    assert(r.getAs[Int]("audio_final_pred") == fp)
    assert(r.getAs[Int]("audio_final_index") == fi)
  }
}
