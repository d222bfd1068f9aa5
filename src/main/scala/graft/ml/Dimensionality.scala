package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * t-SNE / UMAP dimensionality reduction (reference `reduce_tsne` /
 * `reduce_umap`, `ml_dimensionality_reduction.c:60-800`, SQL
 * `sql/14_ml_dimensionality.sql`).
 *
 * Both reference implementations fetch the ENTIRE table into memory and run
 * O(n²) optimization loops — a shape that cannot survive 100 TB. The
 * Spark-first re-expression is landmark-based (the standard scale-out for
 * neighbor-embedding methods, cf. landmark MDS / parametric-free Nyström
 * out-of-sample extension):
 *
 *   1. pick `sampleLimit` landmark rows deterministically — the smallest
 *      `xxhash64(id, seed)` values via a distributed top-k (per-partition
 *      heaps, no global sort);
 *   2. run the exact seeded optimizer LOCALLY on the landmark matrix
 *      (bounded by `sampleLimit`, the same loop shape as the reference but
 *      with a seeded PRNG instead of `rand()`);
 *   3. place every remaining row map-side: its k nearest landmarks in the
 *      ORIGINAL space, weighted 1/(1+d²), give its low-dimensional
 *      coordinates — one broadcast of `sampleLimit` vectors, no shuffle.
 *
 * At sf-test sizes (n ≤ sampleLimit) every row is a landmark and the result
 * IS the reference-shaped full optimization. Rows-only correctness
 * (iterative optimizer; seeded determinism asserted in MlSpec).
 *
 * t-SNE follows van der Maaten & Hinton 2008: per-point sigma by binary
 * search to the target perplexity, symmetrized P, t-kernel Q, gradient
 * 4·Σⱼ(pᵢⱼ−qᵢⱼ)·(1+‖yᵢ−yⱼ‖²)⁻¹·(yᵢ−yⱼ) with momentum 0.5→0.8 at iter 250.
 * UMAP mirrors the reference's simplified fuzzy-simplicial loop (kNN graph,
 * rho = nearest-neighbor distance, sigma searched to log(k), symmetrize by
 * max, attractive-only gradient — the reference omits the repulsive term;
 * we keep its semantics and its `min_dist`-scaled t-kernel).
 */
object Dimensionality {

  /** Exact t-SNE on a local matrix; deterministic under `seed`. */
  private[graft] def tsneLocal(x: Array[Array[Double]], nComponents: Int = 2,
                            perplexity: Double = 30.0, learningRate: Double = 200.0,
                            iterations: Int = 1000, seed: Long = 42L): Array[Array[Double]] = {
    val n = x.length
    require(n >= 2, "Need at least 2 vectors")
    val rnd = new scala.util.Random(seed)
    val y = Array.fill(n, nComponents)((rnd.nextDouble() - 0.5) * 1e-4)

    val d2 = Array.ofDim[Double](n, n)
    for (i <- 0 until n; j <- i + 1 until n) {
      var s = 0.0
      var k = 0
      while (k < x(i).length) { val df = x(i)(k) - x(j)(k); s += df * df; k += 1 }
      d2(i)(j) = s; d2(j)(i) = s
    }

    // per-point sigma via binary search to the target perplexity
    val p = Array.ofDim[Double](n, n)
    for (i <- 0 until n) {
      var sigMin = 1e-10; var sigMax = 1000.0; var sigma = 1.0
      var it = 0
      var done = false
      while (it < 50 && !done) {
        var sum = 0.0
        for (j <- 0 until n if j != i) { p(i)(j) = math.exp(-d2(i)(j) / (2 * sigma * sigma)); sum += p(i)(j) }
        var perp = 0.0
        if (sum > 1e-10) {
          var h = 0.0
          for (j <- 0 until n if j != i) {
            p(i)(j) /= sum
            if (p(i)(j) > 1e-10) h -= p(i)(j) * math.log(p(i)(j))
          }
          perp = math.exp(h)
        }
        if (perp < perplexity) sigMin = sigma else sigMax = sigma
        sigma = (sigMin + sigMax) / 2
        done = math.abs(perp - perplexity) < 0.1 || sigMax - sigMin < 1e-10
        it += 1
      }
    }
    // symmetrize: P_ij = (p_{j|i} + p_{i|j}) / 2n
    for (i <- 0 until n; j <- i + 1 until n) {
      val s = (p(i)(j) + p(j)(i)) / (2.0 * n)
      p(i)(j) = s; p(j)(i) = s
    }

    // momentum + adaptive per-parameter gains + early exaggeration: the
    // stabilizers from van der Maaten's canonical implementation — without
    // gains, learningRate=200 diverges on small n
    val exaggerationIters = math.min(100, iterations / 3)
    val yInc = Array.fill(n, nComponents)(0.0)
    val gains = Array.fill(n, nComponents)(1.0)
    val qu = Array.ofDim[Double](n, n)
    for (iter <- 0 until iterations) {
      val momentum = if (iter < 250) 0.5 else 0.8
      val exag = if (iter < exaggerationIters) 4.0 else 1.0
      var qSum = 0.0
      for (i <- 0 until n; j <- i + 1 until n) {
        var s = 0.0
        var d = 0
        while (d < nComponents) { val df = y(i)(d) - y(j)(d); s += df * df; d += 1 }
        val u = 1.0 / (1.0 + s)
        qu(i)(j) = u; qu(j)(i) = u; qSum += 2 * u
      }
      for (i <- 0 until n) {
        val g = new Array[Double](nComponents)
        for (j <- 0 until n if j != i) {
          val q = math.max(qu(i)(j) / qSum, 1e-12)
          val c = 4.0 * (exag * p(i)(j) - q) * qu(i)(j)
          var d = 0
          while (d < nComponents) { g(d) += c * (y(i)(d) - y(j)(d)); d += 1 }
        }
        var d = 0
        while (d < nComponents) {
          gains(i)(d) =
            if (math.signum(g(d)) != math.signum(yInc(i)(d))) gains(i)(d) + 0.2
            else math.max(gains(i)(d) * 0.8, 0.01)
          yInc(i)(d) = momentum * yInc(i)(d) - learningRate * gains(i)(d) * g(d)
          y(i)(d) += yInc(i)(d)
          d += 1
        }
      }
    }
    y
  }

  /** Reference-shaped simplified UMAP on a local matrix; deterministic. */
  private[graft] def umapLocal(x: Array[Array[Double]], nComponents: Int = 2,
                            nNeighbors: Int = 15, minDist: Double = 0.1,
                            learningRate: Double = 1.0, iterations: Int = 500,
                            seed: Long = 42L): Array[Array[Double]] = {
    val n = x.length
    require(n >= 2, "Need at least 2 vectors")
    val k = math.min(nNeighbors, n - 1)
    require(k >= 2, "n_neighbors must be between 2 and number of vectors")
    val rnd = new scala.util.Random(seed)
    val y = Array.fill(n, nComponents)((rnd.nextDouble() - 0.5) * 1e-4)

    val dist = Array.ofDim[Double](n, n)
    for (i <- 0 until n; j <- i + 1 until n) {
      var s = 0.0
      var d = 0
      while (d < x(i).length) { val df = x(i)(d) - x(j)(d); s += df * df; d += 1 }
      dist(i)(j) = math.sqrt(s); dist(j)(i) = math.sqrt(s)
    }
    val neighbors = Array.tabulate(n) { i =>
      (0 until n).filter(_ != i).sortBy(j => (dist(i)(j), j)).take(k).toArray
    }

    // fuzzy simplicial set: rho = nearest distance, sigma searched to log(k)
    val highProb = Array.ofDim[Double](n, n)
    for (i <- 0 until n) {
      val rho = dist(i)(neighbors(i)(0))
      var sigMin = 0.0; var sigMax = 1000.0; var sigma = 500.0
      var it = 0
      while (it < 50 && sigMax - sigMin >= 1e-10) {
        sigma = (sigMin + sigMax) / 2
        var sum = 0.0
        for (j <- neighbors(i)) sum += math.exp(-math.max(dist(i)(j) - rho, 0.0) / sigma)
        if (sum < math.log(k.toDouble)) sigMin = sigma else sigMax = sigma
        it += 1
      }
      for (j <- neighbors(i))
        highProb(i)(j) = math.exp(-math.max(dist(i)(j) - rho, 0.0) / sigma)
    }
    for (i <- 0 until n; j <- neighbors(i)) {
      val m = math.max(highProb(i)(j), highProb(j)(i))
      highProb(i)(j) = m; highProb(j)(i) = m
    }

    // per-edge SGD with immediate updates, per-step clip to ±4, and
    // linearly decaying alpha — umap-learn's optimize_layout scheme; a
    // batched gradient with the 1/lowDist factor diverges from the
    // 1e-4-scale init
    val edges = (for (i <- 0 until n; j <- neighbors(i) if highProb(i)(j) > 0.0)
      yield (i, j)).toArray
    for (it <- 0 until iterations) {
      val alpha = learningRate * (1.0 - it.toDouble / iterations)
      for ((i, j) <- edges) {
        var s = 0.0
        var d = 0
        while (d < nComponents) { val df = y(i)(d) - y(j)(d); s += df * df; d += 1 }
        val lowDist = math.sqrt(s + 1e-10)
        val a = 1.0 / (1.0 + s / (minDist * minDist))
        val c = -2.0 * a * highProb(i)(j) / (lowDist + 1e-10)
        var e = 0
        while (e < nComponents) {
          val step = math.max(-4.0, math.min(4.0, c * (y(i)(e) - y(j)(e))))
          y(i)(e) += alpha * step
          y(j)(e) -= alpha * step
          e += 1
        }
      }
    }
    y
  }

  /** Landmark fit + map-side out-of-sample placement. `method` is "tsne"
    * or "umap"; extra knobs mirror the reference defaults. */
  def reduce(df: DataFrame, idCol: String, vecCol: String,
             method: String = "tsne", nComponents: Int = 2,
             sampleLimit: Int = 1000, seed: Long = 42L,
             perplexity: Double = 30.0, learningRate: Double = 200.0,
             iterations: Int = 1000, nNeighbors: Int = 15,
             minDist: Double = 0.1, placementNeighbors: Int = 10): DataFrame = {
    require(nComponents >= 1, "n_components must be positive")
    // same loud reject as Dedup.dupGroups: non-numeric ids cast to NULL
    val idType = df.schema(idCol).dataType
    require(idType.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"idCol '$idCol' must be numeric, got $idType (hash string ids to longs upstream)")
    val spark = df.sparkSession

    val pts = df.select(col(idCol).cast("long").as("id"), col(vecCol).as("vec"))
    // deterministic landmark choice: smallest xxhash64(id, seed) — a
    // TakeOrdered top-k, never a global sort. Null-vector rows can't be
    // landmarks (no coordinates to fit) — they get a null reduced column
    // from the placement UDF, mirroring Knn's null tolerance.
    val landmarks = pts
      .filter(col("vec").isNotNull)
      .withColumn("__h", xxhash64(col("id"), lit(seed)))
      .orderBy("__h", "id").limit(sampleLimit)
      .select("id", "vec").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))

    val xs = landmarks.map(_._2)
    val fitted = method match {
      case "tsne" => tsneLocal(xs, nComponents, perplexity, learningRate, iterations, seed)
      case "umap" => umapLocal(xs, nComponents, nNeighbors, minDist, learningRate, iterations, seed)
      case other  => throw new IllegalArgumentException(s"unknown method: $other")
    }
    val byId = landmarks.map(_._1).zip(fitted).toMap
    val bLandmarks = spark.sparkContext.broadcast(landmarks.map(_._2))
    val bFitted = spark.sparkContext.broadcast(fitted)
    val bById = spark.sparkContext.broadcast(byId)
    val kPlace = math.min(placementNeighbors, landmarks.length)

    // landmark rows keep their exact fitted coords; others interpolate
    // from their kPlace nearest landmarks weighted by 1/(1+d²)
    val place = udf { (id: Long, v: Seq[Float]) =>
      if (v == null) null
      else bById.value.get(id) match {
        case Some(coords) => coords.map(_.toFloat)
        case None =>
          val x = v.toArray
          val lm = bLandmarks.value
          val scored = lm.indices.map { i =>
            var s = 0.0
            var d = 0
            while (d < x.length) { val df = x(d) - lm(i)(d); s += df * df; d += 1 }
            (i, s)
          }.sortBy(t => (t._2, t._1)).take(kPlace)
          val out = new Array[Double](nComponents)
          var wSum = 0.0
          for ((i, s) <- scored) {
            val w = 1.0 / (1.0 + s)
            wSum += w
            var d = 0
            while (d < nComponents) { out(d) += w * bFitted.value(i)(d); d += 1 }
          }
          out.map(o => (o / wSum).toFloat)
      }
    }
    pts.withColumn("reduced", place(col("id"), col("vec")))
      .select(col("id").as(idCol), col("reduced"))
  }

  // ------------------------------------------------------------------
  // Autoencoder (reference `train_autoencoder` / `encode_*`,
  // `ml_dimensionality_reduction.c:833-1400`): d → bottleneck → d MLP,
  // sigmoid hidden layer, linear output, MSE loss.
  //
  // Re-architecture: the reference runs per-sample SGD over an in-memory
  // copy of the table. Here every epoch is ONE distributed pass — weights
  // broadcast, each partition accumulates the full-batch gradient into a
  // flat buffer, partials tree-merge to the driver, one GD step. Model
  // state is (d·k + k + k·d + d) floats — planner-sized; only the data
  // pass distributes, so epochs scale with executors, not rows. Xavier
  // init from a splitmix64 stream (the reference's un-seeded rand() is
  // its documented reproducibility bug).
  // ------------------------------------------------------------------

  /** Weights of a trained d→k→d autoencoder (row-major matrices). */
  final case class AeModel(dim: Int, bottleneck: Int,
                           w1: Array[Double], b1: Array[Double],
                           w2: Array[Double], b2: Array[Double],
                           lossCurve: Array[Double]) {
    def encodeVec(x: Array[Float]): Array[Float] = {
      val h = new Array[Float](bottleneck)
      var j = 0
      while (j < bottleneck) {
        var s = b1(j); var i = 0
        while (i < dim) { s += w1(j * dim + i) * x(i); i += 1 }
        h(j) = (1.0 / (1.0 + math.exp(-s))).toFloat
        j += 1
      }
      h
    }
    def decodeVec(h: Array[Float]): Array[Float] = {
      val o = new Array[Float](dim)
      var i = 0
      while (i < dim) {
        var s = b2(i); var j = 0
        while (j < bottleneck) { s += w2(i * bottleneck + j) * h(j); j += 1 }
        o(i) = s.toFloat
        i += 1
      }
      o
    }
  }

  /** Full-batch distributed GD training. One aggregation job per epoch;
    * gradient buffer layout [w1grad | b1grad | w2grad | b2grad | loss]. */
  def autoencoderTrain(df: DataFrame, vecCol: String, bottleneck: Int,
                       learningRate: Double = 0.5, epochs: Int = 100,
                       seed: Long = 42L): AeModel = {
    require(bottleneck >= 1, "bottleneck_dim must be positive")
    val data = df.select(col(vecCol)).rdd
      .map(_.getSeq[Float](0).toArray)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dim = data.first().length
    val n = data.count().toDouble
    val k = bottleneck

    def u01(x: Long): Double = graft.ml.Explain.u01(x)
    val x1 = math.sqrt(6.0 / (dim + k)) // Xavier bounds per layer
    val w1 = Array.tabulate(k * dim)(i => (u01(seed ^ i.toLong) * 2 - 1) * x1)
    val b1 = new Array[Double](k)
    val w2 = Array.tabulate(dim * k)(i => (u01(~seed ^ i.toLong) * 2 - 1) * x1)
    val b2 = new Array[Double](dim)
    val losses = new Array[Double](epochs)

    val sc = df.sparkSession.sparkContext
    val bufLen = k * dim + k + dim * k + dim + 1
    var epoch = 0
    while (epoch < epochs) {
      val bw = sc.broadcast((w1.clone(), b1.clone(), w2.clone(), b2.clone()))
      // Per-partition partials merged in PARTITION-INDEX order: float sums
      // are order-sensitive, and a deterministic merge order is what makes
      // training reproducible across runs (treeAggregate's merge tree is
      // not). Partials are model-sized, so the collect is bounded.
      val seqOp: (Array[Double], Array[Float]) => Array[Double] =
        (buf, x) => {
          val (w1l, b1l, w2l, b2l) = bw.value
          // forward
          val z = new Array[Double](k); val h = new Array[Double](k)
          var j = 0
          while (j < k) {
            var s = b1l(j); var i = 0
            while (i < dim) { s += w1l(j * dim + i) * x(i); i += 1 }
            z(j) = s; h(j) = 1.0 / (1.0 + math.exp(-s)); j += 1
          }
          val d2 = new Array[Double](dim) // δ_out = 2(x̂−x)/n
          var i = 0
          while (i < dim) {
            var s = b2l(i); var jj = 0
            while (jj < k) { s += w2l(i * k + jj) * h(jj); jj += 1 }
            val e = s - x(i)
            buf(bufLen - 1) += e * e / n
            d2(i) = 2.0 * e / n
            i += 1
          }
          // backward: W2 & b2 grads, then δ_hidden through σ'
          i = 0
          while (i < dim) {
            var jj = 0
            while (jj < k) {
              buf(k * dim + k + i * k + jj) += d2(i) * h(jj); jj += 1
            }
            buf(k * dim + k + dim * k + i) += d2(i)
            i += 1
          }
          j = 0
          while (j < k) {
            var s = 0.0; i = 0
            while (i < dim) { s += w2l(i * k + j) * d2(i); i += 1 }
            val d1 = s * h(j) * (1.0 - h(j))
            i = 0
            while (i < dim) { buf(j * dim + i) += d1 * x(i); i += 1 }
            buf(k * dim + j) += d1
            j += 1
          }
          buf
        }
      val partials = data.mapPartitionsWithIndex { (idx, it) =>
        val buf = it.foldLeft(new Array[Double](bufLen))(seqOp)
        Iterator((idx, buf))
      }.collect().sortBy(_._1)
      val grad = new Array[Double](bufLen)
      partials.foreach { case (_, p) =>
        var i = 0; while (i < bufLen) { grad(i) += p(i); i += 1 }
      }
      bw.destroy()
      losses(epoch) = grad(bufLen - 1)
      var i = 0
      while (i < k * dim) { w1(i) -= learningRate * grad(i); i += 1 }
      i = 0
      while (i < k) { b1(i) -= learningRate * grad(k * dim + i); i += 1 }
      i = 0
      while (i < dim * k) { w2(i) -= learningRate * grad(k * dim + k + i); i += 1 }
      i = 0
      while (i < dim) { b2(i) -= learningRate * grad(k * dim + k + dim * k + i); i += 1 }
      epoch += 1
    }
    data.unpersist(blocking = false)
    AeModel(dim, k, w1, b1, w2, b2, losses)
  }

  /** Encode / reconstruct per row — map-side, model broadcast by closure. */
  def autoencoderEncode(model: AeModel, df: DataFrame, idCol: String,
                        vecCol: String): DataFrame = {
    val enc = udf((v: Seq[Float]) => model.encodeVec(v.toArray).toSeq)
    df.select(col(idCol), enc(col(vecCol)).as("encoded"))
  }

  /** Reconstruction + per-row squared error (the reference's
    * `reconstruction_error` surface). */
  def autoencoderReconstruct(model: AeModel, df: DataFrame, idCol: String,
                             vecCol: String): DataFrame = {
    val rec = udf { (v: Seq[Float]) =>
      val x = v.toArray
      val xhat = model.decodeVec(model.encodeVec(x))
      var se = 0.0; var i = 0
      while (i < x.length) { val d = xhat(i).toDouble - x(i); se += d * d; i += 1 }
      (xhat.toSeq, se)
    }
    df.select(col(idCol), rec(col(vecCol)).as("r"))
      .select(col(idCol), col("r._1").as("reconstructed"), col("r._2").as("sq_error"))
  }
}
