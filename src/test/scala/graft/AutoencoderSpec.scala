package graft

import graft.ml.Dimensionality

class AutoencoderSpec extends SparkSpecBase {
  import spark.implicits._

  // 100 points on a 2-d linear manifold inside 8-d, values in [0,1].
  private lazy val data = {
    val rows = (0 until 100).map { i =>
      val a = (i % 10) / 10.0f
      val b = (i / 10) / 10.0f
      (i.toLong, Seq(a, b, (a + b) / 2, (a * 0.5f), (b * 0.5f),
        (0.3f * a + 0.7f * b), (0.9f * a), (0.1f * b)).map(_.toFloat))
    }
    rows.toDF("id", "vec")
  }

  test("training drives reconstruction loss down on a low-rank manifold") {
    val m = Dimensionality.autoencoderTrain(data, "vec", bottleneck = 2,
      learningRate = 0.3, epochs = 150, seed = 7L)
    assert(m.lossCurve.last < m.lossCurve.head * 0.25,
      s"loss ${m.lossCurve.head} -> ${m.lossCurve.last} did not drop enough")
    // loss is roughly monotone over the tail (full-batch GD, fixed lr)
    assert(m.lossCurve.last <= m.lossCurve(epochsMid(m)) + 1e-9)
  }
  private def epochsMid(m: Dimensionality.AeModel): Int = m.lossCurve.length / 2

  test("training is deterministic under a fixed seed") {
    val a = Dimensionality.autoencoderTrain(data, "vec", 2, epochs = 20, seed = 11L)
    val b = Dimensionality.autoencoderTrain(data, "vec", 2, epochs = 20, seed = 11L)
    assert(a.w1.toSeq == b.w1.toSeq && a.w2.toSeq == b.w2.toSeq)
    assert(a.lossCurve.toSeq == b.lossCurve.toSeq)
  }

  test("encode yields bottleneck-dim vectors; reconstruct reports per-row error") {
    val m = Dimensionality.autoencoderTrain(data, "vec", 2, epochs = 30, seed = 7L)
    val enc = Dimensionality.autoencoderEncode(m, data, "id", "vec")
    assert(enc.head().getSeq[Float](1).length == 2)
    val rec = Dimensionality.autoencoderReconstruct(m, data, "id", "vec")
    val errs = rec.select("sq_error").collect().map(_.getDouble(0))
    assert(errs.forall(_ >= 0.0))
    assert(errs.length == 100)
    // mean per-row error equals the last training loss (same forward pass)
    val meanErr = errs.sum / errs.length
    assert(meanErr <= m.lossCurve.head, "reconstruction no better than init")
  }

  test("bottleneck must be positive") {
    intercept[IllegalArgumentException](
      Dimensionality.autoencoderTrain(data, "vec", 0))
  }
}
