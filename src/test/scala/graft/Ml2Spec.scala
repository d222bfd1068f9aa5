package graft

import org.apache.spark.sql.functions._
import graft.ml.{AutoMl, Dimensionality, Ocsvm, TsneFixpoint, UmapFixpoint}

/** OCSVM, t-SNE/UMAP landmark reduction, TPE hyperparameter search. */
class Ml2Spec extends SparkSpecBase {
  import spark.implicits._

  private def blob(cx: Double, cy: Double, n: Int, seed: Long) = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(n)(Seq((cx + rnd.nextGaussian() * 0.2).toFloat,
      (cy + rnd.nextGaussian() * 0.2).toFloat))
  }

  test("OCSVM flags far outliers, not cluster members (ml_anomaly_detection.c:737)") {
    val vecs = blob(0, 0, 60, 7) ++ Seq(Seq(9f, 9f), Seq(-8f, 10f))
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "vec")
    val out = Ocsvm.score(df, "id", "vec", nu = 0.1, gamma = 1.0).collect()
    val anomalies = out.filter(_.getBoolean(2)).map(_.getLong(0)).toSet
    assert(anomalies.contains(60L) && anomalies.contains(61L),
      s"far points must score anomalous, got $anomalies")
    // nu-quantile threshold: fraction flagged is near nu, never the majority
    assert(anomalies.size <= 12)
    // scores in [0, 1]: mean of RBF kernels, emitted as float4 (a far
    // outlier's exp(-gamma*d2) underflows float granularity to 0.0f)
    assert(out.forall(r => r.getFloat(1) >= 0 && r.getFloat(1) <= 1.0f))
  }

  test("OCSVM parameter validation matches reference errors") {
    val df = Seq((1L, Seq(1f, 2f)), (2L, Seq(2f, 1f))).toDF("id", "vec")
    intercept[IllegalArgumentException](Ocsvm.score(df, "id", "vec", nu = 0.0))
    intercept[IllegalArgumentException](Ocsvm.score(df, "id", "vec", nu = 1.5))
    intercept[IllegalArgumentException](Ocsvm.score(df, "id", "vec", gamma = -1.0))
  }

  test("tsneLocal separates two blobs and is seed-deterministic") {
    val xs = (blob(0, 0, 15, 1) ++ blob(10, 10, 15, 2))
      .map(_.map(_.toDouble).toArray).toArray
    val y1 = Dimensionality.tsneLocal(xs, perplexity = 5, iterations = 300, seed = 42)
    val y2 = Dimensionality.tsneLocal(xs, perplexity = 5, iterations = 300, seed = 42)
    assert(y1.flatten.toSeq == y2.flatten.toSeq, "same seed must reproduce exactly")
    def centroid(ys: Seq[Array[Double]]) =
      Array(ys.map(_(0)).sum / ys.size, ys.map(_(1)).sum / ys.size)
    val (a, b) = (centroid(y1.take(15).toSeq), centroid(y1.drop(15).toSeq))
    val between = math.hypot(a(0) - b(0), a(1) - b(1))
    val spread = y1.take(15).map(p => math.hypot(p(0) - a(0), p(1) - a(1))).max
    assert(between > spread, s"blob gap $between must exceed intra spread $spread")
  }

  test("TsneFixpoint: deterministic, finite, gradient moves every point, pulls a planted twin") {
    val base = blob(0, 0, 20, 5).map(_.map(_.toDouble)) // 8-d padded below
    val rows = base.zipWithIndex.map { case (v, i) =>
      (i.toLong, (v ++ Seq.fill(8 - v.length.min(8))(0.0)).take(8).map(_.toFloat))
    } :+ (20L, base.head.take(8).padTo(8, 0.0).map(_.toFloat)) // twin of id 0
    val df = rows.toDF("vec_id", "embedding")
    val out = TsneFixpoint.embed(df, "vec_id", "embedding", n = 21, d = 8, iters = 10)
      .orderBy("vec_id").collect()
    val again = TsneFixpoint.embed(df, "vec_id", "embedding", n = 21, d = 8, iters = 10)
      .orderBy("vec_id").collect()
    assert(out.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq, "must be bit-deterministic")
    assert(out.length == 21)
    val ys = out.map(r => (r.getLong(0), r.getFloat(1), r.getFloat(2)))
    assert(ys.forall { case (_, a, b) =>
      java.lang.Float.isFinite(a) && java.lang.Float.isFinite(b) })
    // init is hash-u01 in [-0.01, 0.01]; 10 gradient steps must have
    // moved every point off its init position
    val init = ys.map { case (id, _, _) =>
      ((ml.Explain.u01(42L ^ id) * 2 - 1) * 0.01, (ml.Explain.u01(~42L ^ id) * 2 - 1) * 0.01)
    }
    assert(ys.zip(init).forall { case ((_, a, b), (i1, i2)) =>
      a != i1.toFloat || b != i2.toFloat })
    // the planted exact twin (max P affinity) ends nearer to id 0 than
    // the average point does
    def d2(p: (Long, Float, Float), q: (Long, Float, Float)) = {
      val dx = p._2 - q._2; val dy = p._3 - q._3; dx * dx + dy * dy
    }
    val p0 = ys.find(_._1 == 0L).get
    val twin = ys.find(_._1 == 20L).get
    val rest = ys.filter(y => y._1 != 0L && y._1 != 20L)
    assert(d2(p0, twin) < rest.map(d2(p0, _)).sum / rest.length,
      "exact twin must be pulled closer than the average point")
  }

  test("UmapFixpoint: deterministic, finite, attraction pulls a planted twin") {
    val base = blob(0, 0, 20, 6).map(_.map(_.toDouble))
    val rows = base.zipWithIndex.map { case (v, i) =>
      (i.toLong, v.take(8).padTo(8, 0.0).map(_.toFloat))
    } :+ (20L, base.head.take(8).padTo(8, 0.0).map(_.toFloat)) // twin of id 0
    val df = rows.toDF("vec_id", "embedding")
    val out = UmapFixpoint.embed(df, "vec_id", "embedding", n = 21, d = 8, iters = 10)
      .orderBy("vec_id").collect()
    val again = UmapFixpoint.embed(df, "vec_id", "embedding", n = 21, d = 8, iters = 10)
      .orderBy("vec_id").collect()
    assert(out.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq, "must be bit-deterministic")
    assert(out.length == 21)
    val ys = out.map(r => (r.getLong(0), r.getFloat(1), r.getFloat(2)))
    assert(ys.forall { case (_, a, b) =>
      java.lang.Float.isFinite(a) && java.lang.Float.isFinite(b) })
    def d2(p: (Long, Float, Float), q: (Long, Float, Float)) = {
      val dx = p._2 - q._2; val dy = p._3 - q._3; dx * dx + dy * dy
    }
    val p0 = ys.find(_._1 == 0L).get
    val twin = ys.find(_._1 == 20L).get
    val rest = ys.filter(y => y._1 != 0L && y._1 != 20L)
    assert(d2(p0, twin) < rest.map(d2(p0, _)).sum / rest.length,
      "exact twin (w=1) must sit closer than the average point")
  }

  test("umapLocal keeps neighbors close, is seed-deterministic") {
    val xs = (blob(0, 0, 12, 3) ++ blob(8, 8, 12, 4))
      .map(_.map(_.toDouble).toArray).toArray
    val y1 = Dimensionality.umapLocal(xs, nNeighbors = 5, iterations = 100, seed = 7)
    val y2 = Dimensionality.umapLocal(xs, nNeighbors = 5, iterations = 100, seed = 7)
    assert(y1.flatten.toSeq == y2.flatten.toSeq)
    // attractive-only reference loop: same-blob pairs end up closer on
    // average than cross-blob pairs
    def d(i: Int, j: Int) = math.hypot(y1(i)(0) - y1(j)(0), y1(i)(1) - y1(j)(1))
    val within = (for (i <- 0 until 12; j <- i + 1 until 12) yield d(i, j)).sum / 66
    val across = (for (i <- 0 until 12; j <- 12 until 24) yield d(i, j)).sum / 144
    assert(within < across)
  }

  test("tsne/umap preserve k-NN neighborhoods (trustworthiness proxy)") {
    // The two reductions cannot carry a DuckDB oracle (sign-adaptive
    // gains / binary-searched sigma — discontinuous under fp noise), so
    // the quality contract is asserted directly: most of each point's
    // 5-NN set in the input space survives into the 2-d embedding.
    val xs = (blob(0, 0, 15, 8) ++ blob(10, 10, 15, 9))
      .map(_.map(_.toDouble).toArray).toArray
    def knn(pts: Array[Array[Double]], i: Int, k: Int): Set[Int] =
      pts.indices.filter(_ != i)
        .sortBy(j => pts(i).zip(pts(j)).map { case (a, b) => (a - b) * (a - b) }.sum)
        .take(k).toSet
    def meanOverlap(y: Array[Array[Double]]): Double = {
      val os = xs.indices.map(i => (knn(xs, i, 5) & knn(y, i, 5)).size / 5.0)
      os.sum / os.size
    }
    // same-blob fraction of the embedded 5-NN sets: cluster membership
    // is what the reductions must preserve (exact ranks drift)
    def sameBlob(y: Array[Array[Double]]): Double = {
      val fs = xs.indices.map { i =>
        knn(y, i, 5).count(j => (j < 15) == (i < 15)) / 5.0
      }
      fs.sum / fs.size
    }
    // regression floors measured on this fixture (not aspirational):
    // tsne 0.807/0.387, umap values above — a drop signals a kernel bug
    val yT = Dimensionality.tsneLocal(xs, perplexity = 5, iterations = 300, seed = 1)
    assert(sameBlob(yT) > 0.75, s"tsne same-blob 5-NN ${sameBlob(yT)}")
    assert(meanOverlap(yT) > 0.3, s"tsne 5-NN preservation ${meanOverlap(yT)}")
    val yU = Dimensionality.umapLocal(xs, nNeighbors = 5, iterations = 100, seed = 1)
    assert(sameBlob(yU) > 0.75, s"umap same-blob 5-NN ${sameBlob(yU)}")
    assert(meanOverlap(yU) > 0.3, s"umap 5-NN preservation ${meanOverlap(yU)}")
  }

  test("reduce: landmark placement covers non-landmark rows deterministically") {
    val vecs = blob(0, 0, 30, 5) ++ blob(6, 6, 30, 6)
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "vec")
    val out = Dimensionality.reduce(df, "id", "vec", method = "tsne",
      sampleLimit = 20, iterations = 100, perplexity = 5, seed = 42)
    val rows = out.collect()
    assert(rows.length == 60 && rows.forall(_.getSeq[Float](1).length == 2))
    val again = Dimensionality.reduce(df, "id", "vec", method = "tsne",
      sampleLimit = 20, iterations = 100, perplexity = 5, seed = 42).collect()
    assert(rows.map(r => (r.getLong(0), r.getSeq[Float](1))).sortBy(_._1).toSeq ==
      again.map(r => (r.getLong(0), r.getSeq[Float](1))).sortBy(_._1).toSeq)
    intercept[IllegalArgumentException](
      Dimensionality.reduce(df, "id", "vec", method = "pca_nope"))
  }

  test("LOF: duplicates score finite ~1; n <= k rejected; string ids rejected by DBSCAN/reduce") {
    // k+1 exact copies: mean reach-dist 0 — lof must be a finite ~1, not NULL
    val dups = (1 to 8).map(i => (i.toLong, Seq(1f, 1f))) :+ (99L, Seq(9f, 9f))
    val lof = graft.ml.Lof.score(dups.toDF("id", "v"), "id", "v", k = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(lof.values.forall(v => !v.isNaN && !v.isInfinite))
    assert(math.abs(lof(1L) - 1.0) < 0.5) // duplicate group ~ inlier
    intercept[IllegalArgumentException](
      graft.ml.Lof.score(dups.take(3).toDF("id", "v"), "id", "v", k = 5))
    val strIds = Seq(("a", Seq(1f)), ("b", Seq(2f))).toDF("id", "v")
    intercept[IllegalArgumentException](graft.ml.Dbscan.fit(strIds, "id", "v", 1.0, 1))
    intercept[IllegalArgumentException](Dimensionality.reduce(strIds, "id", "v"))
  }

  test("reduce tolerates null vectors: null reduced coords, landmarks unaffected") {
    val pts = (blob(0, 0, 30, 1) ++ blob(5, 5, 30, 2)).zipWithIndex
      .map { case (v, i) => (i.toLong, Option(v)) } :+ (999L, Option.empty[Seq[Float]])
    val out = Dimensionality.reduce(pts.toDF("id", "v"), "id", "v",
        method = "umap", sampleLimit = 20, iterations = 30)
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out.size == 61)
    assert(out(999L).isEmpty)       // null in, null reduced out
    assert(out(0L).nonEmpty)
  }

  test("TPE beats random search on a fixed budget (ml_hyperparameter_tuning.c:598)") {
    // deterministic multimodal objective over a 6x6x6 grid: one sharp
    // optimum, a decoy ridge, additive structure TPE can exploit
    val vals = (0 until 6).map(_.toString)
    val grid = Map("a" -> vals, "b" -> vals, "c" -> vals)
    def objective(p: Map[String, String]): Double = {
      val (a, b, c) = (p("a").toInt, p("b").toInt, p("c").toInt)
      -math.pow(a - 4, 2) - math.pow(b - 1, 2) - math.pow(c - 3, 2) +
        (if (a == 0 && b == 5) 3.0 else 0.0)
    }
    val budget = 40
    val (bestP, bestScore, trials) = AutoMl.tpeOptimize(grid, budget, seed = 11)(objective)
    assert(trials.size == budget)
    assert(trials.map(_._1).distinct.size == budget, "TPE must not re-evaluate combos")
    // random baseline, same budget: best over seeds 1..5 of pure sampling
    val rndBest = (1 to 5).map { s =>
      val rnd = new scala.util.Random(s)
      (1 to budget).map { _ =>
        objective(grid.keys.toSeq.sorted.map(k => k -> vals(rnd.nextInt(6))).toMap)
      }.max
    }
    assert(bestScore >= rndBest.max,
      s"TPE $bestScore must match/beat random ${rndBest.max}")
    assert(bestScore == 0.0 && bestP == Map("a" -> "4", "b" -> "1", "c" -> "3"),
      s"40/216 budget should find the optimum, got $bestP -> $bestScore")
    // exhausts small spaces instead of looping
    val tiny = Map("x" -> Seq("0", "1"))
    val (_, _, t2) = AutoMl.tpeOptimize(tiny, 10, seed = 3)(p => p("x").toDouble)
    assert(t2.size == 2)
  }
}
