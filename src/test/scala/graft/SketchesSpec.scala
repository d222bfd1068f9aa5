package graft

import org.apache.spark.sql.functions._
import graft.functions.DetRandom.mix64
import graft.operators.Sketches

class SketchesSpec extends SparkSpecBase {
  import spark.implicits._

  // ---------------- KMV ----------------

  private def kmvState(k: Int, us: Seq[Long]): Array[Long] = {
    val agg = new Sketches.KmvAgg(k)
    us.foldLeft(agg.zero)((b, u) => agg.reduce(b, u))
  }

  test("KMV state is the k unsigned-smallest distinct hashes, merge-order invariant") {
    val k = 16
    val us = (1L to 500L) ++ (1L to 500L) // duplicates must collapse
    val expected = (1L to 500L).map(mix64).distinct
      .sortWith((a, b) => java.lang.Long.compareUnsigned(a, b) < 0).take(k)
    assert(kmvState(k, us).toSeq == expected)

    val agg = new Sketches.KmvAgg(k)
    val (l, r) = us.splitAt(137)
    val merged = agg.merge(kmvState(k, l), kmvState(k, r))
    val mergedRev = agg.merge(kmvState(k, r), kmvState(k, l))
    assert(merged.toSeq == expected && mergedRev.toSeq == expected)
  }

  test("KMV estimate is exact below k and within 4/sqrt(k) relative above") {
    val k = 64
    assert(Sketches.kmvEstimate(kmvState(k, 1L to 30L), k) == 30f)
    val n = 20000
    val est = Sketches.kmvEstimate(kmvState(k, (1L to n.toLong)), k)
    val rel = math.abs(est - n) / n.toDouble
    assert(rel < 4.0 / math.sqrt(k), s"KMV rel error $rel (est $est vs $n)")
  }

  test("kmvDistinct over a grouped frame: bounded state, sane estimates") {
    val rows = (1 to 5000).map(i => (s"g${i % 3}", (i % 997).toLong))
    val truth = rows.groupBy(_._1).map { case (g, vs) => g -> vs.map(_._2).distinct.size }
    val out = Sketches.kmvDistinct(rows.toDF("g", "u"), "g", "u", 64).collect()
    assert(out.length == 3)
    out.foreach { r =>
      assert(r.getAs[Long]("n_kept") == 64L)
      val est = r.getAs[Float]("est_distinct")
      val n = truth(r.getString(0)).toDouble
      val rel = math.abs(est - n) / n
      assert(rel < 4.0 / math.sqrt(64.0), s"group ${r.getString(0)} est $est truth $n")
    }
  }

  // ---------------- CMS ----------------

  test("CMS estimate always dominates the exact count and the grid mass is d*n") {
    val d = 4; val w = 256
    val terms = (1 to 2000).map(i => s"t${i % 61}")
    val toks = terms.toDF("term")
    val out = Sketches.cmsTopK(toks, "term", kTop = 10, d = d, w = w).collect()
    assert(out.length == 10)
    out.foreach { r =>
      assert(r.getAs[Long]("cms_est") >= r.getAs[Long]("exact_cnt"),
        s"CMS under-estimated ${r.getString(0)}")
    }
    // grid mass: every token increments exactly d counters
    val agg = new Sketches.CmsAgg(d, w)
    val grid = terms.map(Sketches.djb2u).foldLeft(agg.zero)((b, u) => agg.reduce(b, u))
    assert(grid.sum == d.toLong * terms.length)
  }

  test("CMS merge equals single-pass build") {
    val d = 2; val w = 64
    val agg = new Sketches.CmsAgg(d, w)
    val us = (1 to 300).map(i => Sketches.djb2u(s"x$i"))
    val whole = us.foldLeft(agg.zero)((b, u) => agg.reduce(b, u))
    val (l, r) = us.splitAt(111)
    val merged = agg.merge(
      l.foldLeft(agg.zero)((b, u) => agg.reduce(b, u)),
      r.foldLeft(agg.zero)((b, u) => agg.reduce(b, u)))
    assert(whole.toSeq == merged.toSeq)
  }

  // ---------------- histogram quantiles ----------------

  test("histQuantiles: exact rank values and in-range interpolated estimates") {
    val df = (1L to 1000L).map(v => (v, v)).toDF("v", "id")
    val out = Sketches.histQuantiles(df, "v", "id", bins = 64,
      ps = Seq(0.5, 0.9, 0.99)).collect().map(r =>
      (r.getDouble(0), r.getFloat(1), r.getLong(2))).sortBy(_._1)
    // exact = value at 1-based rank floor(p*(n-1))+1 over 1..1000
    assert(out.map(_._3).toSeq == Seq(500L, 900L, 990L))
    out.foreach { case (p, est, exact) =>
      assert(math.abs(est - exact) <= 1000.0 / 64 + 1, s"p=$p est=$est exact=$exact")
    }
  }

  test("histQuantiles degenerate: constant column returns the constant") {
    val df = (1L to 50L).map(i => (7L, i)).toDF("v", "id")
    val out = Sketches.histQuantiles(df, "v", "id", bins = 16, ps = Seq(0.5))
      .collect().head
    assert(out.getFloat(1) == 7f && out.getLong(2) == 7L)
  }

  test("histQuantilesByGroup matches the global walk per group; adaptive gate counts") {
    val df = ((1L to 900L).map(v => ("a", v)) ++ (1L to 300L).map(v => ("b", v * 10)))
      .toDF("g", "v")
    val qs = Sketches.histQuantilesByGroup(df, "g", "v", bins = 64, ps = Seq(0.5))
      .collect().map(r => (r.getString(0), r.getFloat(2))).toMap
    // each group's median estimate must sit near its own distribution
    assert(math.abs(qs("a") - 450.0) < 900.0 / 64 + 1)
    assert(math.abs(qs("b") - 1500.0) < 3000.0 / 64 + 10)
    val gate = Sketches.lengthFilterAdaptive(df, "g", "v", bins = 64,
      pLo = 0.05, pHi = 0.95).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(gate("a")._1 == 900L && gate("b")._1 == 300L)
    // ~90% survive a [p05, p95] gate in both groups
    assert(gate("a")._2 > 700L && gate("a")._2 < 900L)
    assert(gate("b")._2 > 230L && gate("b")._2 < 300L)
  }

  test("histQuantilesByGroup degenerate group returns its constant") {
    val df = (Seq.fill(40)(("c", 5L)) ++ (1L to 100L).map(v => ("d", v))).toDF("g", "v")
    val qs = Sketches.histQuantilesByGroup(df, "g", "v", bins = 16,
      ps = Seq(0.5, 0.9)).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getFloat(2)))
    assert(qs.filter(_._1 == "c").forall(_._3 == 5f))
  }

  // ---------------- HLL ----------------

  private def hllState(p: Int, us: Seq[Long]): Array[Byte] = {
    val agg = new Sketches.HllAgg(p)
    us.foldLeft(agg.zero)((b, u) => agg.reduce(b, u))
  }

  test("HLL merge of shard states equals the whole-stream sketch (register max)") {
    val p = 8
    val us = (1L to 4000L) ++ (1L to 4000L)
    val whole = hllState(p, us)
    val agg = new Sketches.HllAgg(p)
    val (l, r) = us.splitAt(1777)
    val merged = agg.merge(hllState(p, l), hllState(p, r))
    assert(merged.toSeq == whole.toSeq)
  }

  test("HLL estimate: linear-counting branch is near-exact, raw branch within 3/sqrt(m)") {
    val p = 8 // m = 256
    // small cardinality -> linear counting: est within a few % of truth
    val small = Sketches.hllSummary(hllState(p, 1L to 100L), p)
    assert(math.abs(small.est - 100f) / 100.0 < 0.15,
      s"linear-counting est ${small.est} vs 100")
    // large cardinality -> raw harmonic estimator: ~1.04/sqrt(m) stderr
    val n = 50000
    val big = Sketches.hllSummary(hllState(p, 1L to n.toLong), p)
    val rel = math.abs(big.est - n) / n.toDouble
    assert(rel < 3.0 * 1.04 / math.sqrt(256.0), s"HLL rel error $rel (est ${big.est})")
    assert(big.nZero == 0L, "50k distinct must touch all 256 registers")
  }

  test("HLL state is duplicate-insensitive and the denominator halves recompose") {
    val p = 8
    val once = Sketches.hllSummary(hllState(p, 1L to 500L), p)
    val thrice = Sketches.hllSummary(hllState(p, Seq.fill(3)(1L to 500L).flatten), p)
    assert(once == thrice)
    // S = sHi*2^32 + sLo must equal the direct register walk
    val regs = hllState(p, 1L to 500L)
    val s = regs.foldLeft(BigInt(0))((acc, r) => acc + (BigInt(1) << (57 - (r & 0xFF))))
    assert((BigInt(once.sHi) << 32) + BigInt(once.sLo) == s)
  }

  test("hllDistinct over a grouped frame: constant state, sane estimates") {
    val rows = (1 to 6000).map(i => (s"g${i % 3}", (i % 1499).toLong))
    val truth = rows.groupBy(_._1).map { case (g, vs) => g -> vs.map(_._2).distinct.size }
    val out = Sketches.hllDistinct(rows.toDF("g", "u"), "g", "u", p = 8).collect()
    assert(out.length == 3)
    out.foreach { r =>
      val est = r.getAs[Float]("est_distinct")
      val n = truth(r.getString(0)).toDouble
      val rel = math.abs(est - n) / n
      assert(rel < 3.0 * 1.04 / math.sqrt(256.0), s"group ${r.getString(0)} est $est truth $n")
    }
  }

  test("KmvMergeAgg: merge of per-shard states equals the whole-corpus sketch") {
    val k = 32
    val us = (1L to 3000L).map(u => (s"s${u % 7}", u))
    val whole = kmvState(k, us.map(_._2))
    val merge = new Sketches.KmvMergeAgg(k)
    val merged = us.groupBy(_._1).values
      .map(g => kmvState(k, g.map(_._2)))
      .foldLeft(merge.zero)((b, st) => merge.reduce(b, st.toSeq))
    assert(merged.toSeq == whole.toSeq,
      "shard-merge must be lossless for the k-minimum set")
  }
}
