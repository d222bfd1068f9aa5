package graft

import org.apache.spark.sql.functions._
import graft.operators.DataValuation

class DataValuationSpec extends SparkSpecBase {
  import spark.implicits._

  /** 20 points on a line, two labels interleaved in blocks: ids 0..9
    * label 0, ids 10..19 label 1; vector = (id, 0, ..). */
  private def train = (0 until 20)
    .map(i => (i.toLong, Array.fill(4)(0f).updated(0, i.toFloat), if (i < 10) 0 else 1))
    .toDF("vec_id", "embedding", "label")

  test("knn-shapley efficiency: per-query values sum to the full-set utility") {
    val probe = Seq((100L, Array(0f, 0f, 0f, 0f), 0),
      (101L, Array(19f, 0f, 0f, 0f), 1))
      .toDF("vec_id", "embedding", "label")
    val k = 3
    val vals = DataValuation.knnShapley(train, probe, "vec_id", "embedding",
      "label", k).collect()
    assert(vals.length == 40)
    // v(N) = (matching labels among the k nearest) / k; both probes sit
    // at a pure-label end of the line, so utility is exactly 1.
    for (q <- Seq(100L, 101L)) {
      val s = vals.filter(_.getLong(0) == q).map(_.getFloat(4).toDouble).sum
      assert(math.abs(s - 1.0) < 1e-5, s"query $q total $s")
    }
    // all ten same-label points are exchangeable here (one contiguous
    // matching prefix), so each carries exactly 1/10 of the utility and
    // every wrong-label point carries 0 — the Shapley symmetry axiom.
    val v100 = vals.filter(_.getLong(0) == 100L)
    assert(v100.filter(_.getLong(1) < 10L)
      .forall(r => math.abs(r.getFloat(4) - 0.1f) < 1e-6))
    assert(v100.filter(_.getLong(1) >= 10L)
      .forall(r => math.abs(r.getFloat(4)) < 1e-6))
  }

  test("knn-shapley efficiency axiom holds on irregular random fixtures") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 3) {
      val n = 17 + trial * 5
      val k = 4
      val pts = (0 until n).map(i => (i.toLong,
        Array.fill(3)(rnd.nextInt(200).toFloat / 10f), rnd.nextInt(3)))
      val qv = Array.fill(3)(rnd.nextInt(200).toFloat / 10f)
      val qy = rnd.nextInt(3)
      val rows = DataValuation.knnShapley(
        pts.toDF("vec_id", "embedding", "label"),
        Seq((999L, qv, qy)).toDF("vec_id", "embedding", "label"),
        "vec_id", "embedding", "label", k).collect()
      val total = rows.map(_.getFloat(4).toDouble).sum
      // direct full-set utility with the operator's own quantization
      def quant(v: Array[Float]) = v.map(x => math.floor(x * 1000.0 + 0.5).toLong)
      val qq = quant(qv)
      val util = pts
        .map { case (id, v, y) =>
          val d = quant(v).zip(qq).map { case (a, b) => (a - b) * (a - b) }.sum
          (d, id, y)
        }
        .sortBy { case (d, id, _) => (d, id) }
        .take(k).count(_._3 == qy).toDouble / k
      assert(math.abs(total - util) < 1e-5, s"trial $trial: $total vs $util")
    }
  }

  test("knn-shapley: an opposite-label nearest neighbor is valued negatively") {
    val probe = Seq((100L, Array(9.6f, 0f, 0f, 0f), 1))
      .toDF("vec_id", "embedding", "label")
    val vals = DataValuation.knnShapley(train, probe, "vec_id", "embedding",
      "label", 3).collect()
    // id 9 (label 0) is second-closest and wrong-label: negative value
    val v9 = vals.find(_.getLong(1) == 9L).get.getFloat(4)
    assert(v9 < 0f, s"id 9 value $v9")
    val v10 = vals.find(_.getLong(1) == 10L).get.getFloat(4)
    assert(v10 > 0f, s"id 10 value $v10")
  }

  test("k-center: seed is the min id, radii non-increasing, picks spread out") {
    val rows = DataValuation.kcenterCoreset(train, "vec_id", "embedding", 4)
      .orderBy("step").collect()
    assert(rows.map(_.getLong(1)).distinct.length == 4)
    assert(rows.head.getLong(1) == 0L && rows.head.getLong(2) == -1L)
    // farthest-first from id 0 on a line: next pick is the far end (19)
    assert(rows(1).getLong(1) == 19L)
    val radii = rows.tail.map(_.getLong(2))
    assert(radii.zip(radii.tail).forall { case (a, b) => a >= b },
      s"radius curve not monotone: ${radii.toSeq}")
  }

  test("facility selection covers both clusters and its objective never rises") {
    // two tight clusters; candidate pool = even ids only
    val pts = (0 until 20).map { i =>
      val x = (if (i < 10) 0f else 100f) + (i % 10) * 0.1f
      (i.toLong, Array(x, 0f, 0f, 0f))
    }.toDF("vec_id", "embedding")
    val out = DataValuation.facilitySelect(pts,
      pts.filter($"vec_id" % 2 === 0), "vec_id", "embedding", 3)
      .orderBy("step").collect()
    assert(out.length == 3 && out.map(_.getLong(1)).distinct.length == 3)
    val tots = out.map(_.getLong(2))
    assert(tots.zip(tots.tail).forall { case (a, b) => b <= a },
      s"objective rose: ${tots.toSeq}")
    // after two rounds each cluster owns a center
    val first2 = out.take(2).map(_.getLong(1))
    assert(first2.exists(_ < 10) && first2.exists(_ >= 10), first2.toSeq)
  }

  test("facility selection refuses an over-budget points x pool product") {
    val pts = (0 until 20).map(i => (i.toLong, Array(i.toFloat, 0f)))
      .toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      DataValuation.facilitySelect(pts, pts, "vec_id", "embedding", 2,
        maxPairs = 100L) // 20 x 20 = 400 > 100
    }
    assert(e.getMessage.contains("maxPairs"))
    assert(e.getMessage.contains("IVF cell"))
    // empty candidate pool: empty selection, not a divide-by-zero
    assert(DataValuation.facilitySelect(pts, pts.filter($"vec_id" < 0),
      "vec_id", "embedding", 2).count() == 0L)
  }

  test("k-center at larger k: the array-literal fold keeps selections exact") {
    // 40 points on a line; farthest-first from 0 visits 39, 19|20, ...
    val pts = (0 until 40).map(i => (i.toLong, Array(i.toFloat, 0f)))
      .toDF("vec_id", "embedding")
    val rows = DataValuation.kcenterCoreset(pts, "vec_id", "embedding", 12)
      .orderBy("step").collect()
    assert(rows.length == 12)
    assert(rows.map(_.getLong(1)).distinct.length == 12)
    assert(rows.head.getLong(1) == 0L && rows(1).getLong(1) == 39L)
    // ties break to the smaller id: midpoint pick is 19 (not 20)
    assert(rows(2).getLong(1) == 19L)
    val radii = rows.tail.map(_.getLong(2))
    assert(radii.zip(radii.tail).forall { case (a, b) => a >= b },
      s"radius curve not monotone: ${radii.toSeq}")
    // covering radius halves as k doubles on a uniform line
    assert(radii.last < radii.head)
  }

  test("label-noise audit flags a planted mislabel and clears clean points") {
    // two tight clusters at x=0 and x=100; id 5 sits in cluster A with
    // cluster B's label
    val pts = (0 until 24).map { i =>
      val inA = i < 12
      val x = (if (inA) 0f else 100f) + i * 0.01f
      val label = if (i == 5) 1 else if (inA) 0 else 1
      (i.toLong, Array(x, 0f, 0f, 0f), label)
    }.toDF("vec_id", "embedding", "label")
    val model = graft.operators.Ivf.build(pts, "embedding", nlists = 2, seed = 1L)
    val out = DataValuation.labelNoiseKnn(model, pts, "vec_id", "embedding",
      "label", k = 5).collect().map(r =>
        r.getLong(0) -> (r.getLong(2), r.getBoolean(3))).toMap
    assert(out(5L) == ((0L, true)), s"planted mislabel: ${out(5L)}")
    assert(out(20L) == ((5L, false)))
    // clean A-cluster points lose exactly one agreeing neighbor (id 5)
    assert(out(4L)._1 == 4L && !out(4L)._2)
  }

  test("cartography: clean examples are confident, a mislabel is low-confidence") {
    val docs = (0 until 30).map { i =>
      val pos = i < 15
      val text = if (pos) "alpha beta gamma" else "delta epsilon zeta"
      // id 7 carries positive text with a negative label
      (i.toLong, text, if (i == 7) 0 else if (pos) 1 else 0)
    }.toDF("doc_id", "text", "y")
    val out = graft.ml.QualityClf.cartography(docs, "doc_id", "text",
      col("y") === 1, d = 16, epochs = 6, lr = 4.0).collect()
      .map(r => r.getLong(0) -> r).toMap
    val clean = out(0L).getFloat(2)
    val noisy = out(7L).getFloat(2)
    assert(clean > noisy, s"clean $clean vs mislabeled $noisy")
    // the mislabel never reaches majority-correct across snapshots
    assert(out(7L).getLong(4) < 6L)
    // variability is a population std: bounded by 0.5 for probabilities
    assert(out.values.forall(r => r.getFloat(3) >= 0f && r.getFloat(3) <= 0.5f))
  }

  test("cook's distance: degenerate inputs emit explicit NULLs, never garbage") {
    // n = 2 (s2 divides by n-2) and constant x (Cxx = 0): both NULL out
    val two = Seq((1L, 1L, 2L), (2L, 2L, 5L)).toDF("id", "x", "y")
    assert(DataValuation.cooksDistance(two, "id", "x", "y").collect()
      .forall(r => r.isNullAt(3) && r.isNullAt(4) && r.isNullAt(5)))
    val flat = (1 to 10).map(i => (i.toLong, 7L, i.toLong)).toDF("id", "x", "y")
    assert(DataValuation.cooksDistance(flat, "id", "x", "y").collect()
      .forall(_.isNullAt(5)))
  }

  test("cook's distance flags the injected outlier with the top score") {
    // y = 2x + 1 exactly, except one gross outlier at x=5
    val df = (0 until 40)
      .map(i => (i.toLong, (i % 8).toLong,
        if (i == 13) 100L else 2L * (i % 8) + 1 + (i % 3)))
      .toDF("id", "x", "y")
    val out = DataValuation.cooksDistance(df, "id", "x", "y").collect()
    val top = out.maxBy(_.getFloat(5))
    assert(top.getLong(0) == 13L, s"top influence id ${top.getLong(0)}")
    // leverage depends only on x: extreme x has higher leverage than the mean x
    val lev0 = out.find(_.getLong(1) == 0L).get.getFloat(4)
    val lev7 = out.find(_.getLong(1) == 7L).get.getFloat(4)
    val lev4 = out.find(_.getLong(1) == 4L).get.getFloat(4)
    assert(lev0 > lev4 && lev7 > lev4)
  }
}
