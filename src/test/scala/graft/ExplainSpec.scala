package graft

import graft.ml.{Explain, UnifiedApi}

class ExplainSpec extends SparkSpecBase {
  import spark.implicits._

  // y = 2·x0 − 3·x1 + 0.5·x2 (+0 intercept), exactly linear so the
  // fitted model recovers the weights and SHAP has a closed form.
  private lazy val train = {
    val rows = (0 until 200).map { i =>
      val x0 = (i % 10).toFloat / 10f
      val x1 = ((i / 10) % 10).toFloat / 10f
      val x2 = ((i / 100) % 2).toFloat
      (Seq(x0, x1, x2), 2.0 * x0 - 3.0 * x1 + 0.5 * x2)
    }
    rows.toDF("vec", "y")
  }
  private lazy val modelId = UnifiedApi.train("linear_regression", train, "vec",
    Some("y"), Map("regularization" -> "0.0")).modelId

  test("shapValues on a linear model equal w_i * x_i for every feature") {
    // For f(x)=Σ w_k x_k with zeroing baseline, f(S∪i)−f(S) = w_i·x_i for
    // EVERY subset S, so the sampled estimate is exact, not approximate.
    val x = Array(0.4f, 0.2f, 1.0f)
    val shap = Explain.shapValues(modelId, x, nSamples = 8)
      .collect().map(r => (r.getInt(0), r.getDouble(1))).toMap
    val w = Seq(2.0, -3.0, 0.5)
    (0 to 2).foreach { i =>
      assert(math.abs(shap(i) - w(i) * x(i)) < 1e-4,
        s"shap($i)=${shap(i)} want ${w(i) * x(i)}")
    }
  }

  test("registerLinear deploys a fixed scorer: predictions and SHAP are the exact closed form") {
    val w = Array(2.0, -3.0, 0.5)
    val tm = UnifiedApi.registerLinear(w, 0.25, "vec")
    val preds = UnifiedApi.predict(tm.modelId,
        Seq((Seq(1.0f, 1.0f, 1.0f), 0)).toDF("vec", "ignore"))
      .select("prediction").collect().map(_.getDouble(0))
    // left-to-right fold: ((0.25 + 2) + -3) + 0.5
    assert(preds.head == ((0.25 + 2.0) - 3.0) + 0.5)
    val x = Array(0.4f, 0.2f, 1.0f)
    val shap = Explain.shapValues(tm.modelId, x, nSamples = 8)
      .collect().map(r => (r.getInt(0), r.getDouble(1))).toMap
    (0 to 2).foreach { i =>
      // fixed scorer ⇒ no fit noise at all: w_i·x_i to float-widening ulps
      assert(math.abs(shap(i) - w(i) * x(i)) < 1e-12,
        s"shap($i)=${shap(i)} want ${w(i) * x(i)}")
    }
  }

  test("shapValues is deterministic across runs") {
    val x = Array(0.4f, 0.2f, 1.0f)
    val a = Explain.shapValues(modelId, x, nSamples = 16).collect().map(_.getDouble(1)).toSeq
    val b = Explain.shapValues(modelId, x, nSamples = 16).collect().map(_.getDouble(1)).toSeq
    assert(a == b)
  }

  test("limeExplain matches the reference per-coordinate weighted formula computed locally") {
    val x = Array(0.4f, 0.2f, 1.0f)
    val n = 200
    val seed = 42L
    val got = Explain.limeExplain(modelId, x, nSamples = n, seed = seed)
      .collect().map(r => (r.getInt(0), r.getDouble(1))).toMap

    // Re-derive locally from the same splitmix64 stream and the known
    // linear weights (the fit recovers them exactly on noiseless data).
    val w = Seq(2.0, -3.0, 0.5)
    val num = Array.fill(3)(0.0)
    val den = Array.fill(3)(0.0)
    (0 until n).foreach { j =>
      val pert = (0 until 3).map { k =>
        x(k) + ((Explain.u01(seed ^ (j.toLong << 24) ^ k.toLong) - 0.5) * 0.2).toFloat
      }
      val d2 = (0 until 3).map(k => math.pow(pert(k) - x(k), 2)).sum
      val wt = math.exp(-d2 / 0.5)
      val pred = (0 until 3).map(k => w(k) * pert(k)).sum
      (0 until 3).foreach { k =>
        num(k) += wt * pert(k) * pred
        den(k) += wt * pert(k) * pert(k)
      }
    }
    (0 to 2).foreach { k =>
      assert(math.abs(got(k) - num(k) / den(k)) < 1e-3,
        s"lime($k)=${got(k)} want ${num(k) / den(k)}")
    }
  }

  test("limeExplain survives a model whose features column is literally named 'features'") {
    // predict's array→Vector conversion overwrites that column in place;
    // the explode must read the preserved raw array, not the VectorUDT
    val w = Array(2.0, -3.0, 0.5)
    val tm = UnifiedApi.registerLinear(w, 0.0, "features")
    val got = Explain.limeExplain(tm.modelId, Array(0.4f, 0.2f, 1.0f), nSamples = 50)
      .collect().map(r => (r.getInt(0), r.getDouble(1))).toMap
    assert(got.size == 3)
    // the reference's per-coordinate formula is a weighted ratio of means:
    // coef_k ≈ f(x)/x_k near the instance (f(x)=0.7 here), all finite
    (0 to 2).foreach(k => assert(!got(k).isNaN && !got(k).isInfinite))
    assert(math.abs(got(0) - 0.7 / 0.4) < 0.2)
  }

  test("shap rejects non-positive sample counts") {
    intercept[IllegalArgumentException](
      Explain.shapValues(modelId, Array(1f, 1f, 1f), nSamples = 0))
  }
}
