package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Encoder, Encoders}

import graft.functions.DetRandom.mix64

/**
 * Mergeable corpus-statistics sketches — the single-pass, bounded-state
 * summaries a 100 TB curation run needs where exact `groupBy(term)` /
 * global sorts stop being affordable. The reference exposes corpus stats
 * through exact SQL aggregates (`NeuronDB/neurondb--1.0.sql` stats views);
 * at cluster scale the same questions are answered by sketches whose
 * states merge associatively, so Spark's partial aggregation gives
 * map-side combine for free and the shuffle carries O(state) bytes per
 * group instead of the full distinct universe.
 *
 * Every sketch here is DETERMINISTIC (splitmix64 over djb2 token
 * fingerprints — the repo's shared hash family, re-derivable in DuckDB
 * HUGEINT SQL via [[graft.functions.Mix64Sql]]), so unlike HLL++/t-digest
 * the estimates themselves are oracle-checkable bit-for-bit:
 *
 *  - KMV (k-minimum-values) distinct-count: state = the k smallest
 *    distinct 64-bit hashes, estimate (k-1)/U(h_k). Beats
 *    `countDistinct`'s expand+shuffle of every distinct value: the
 *    shuffle payload is ≤ k longs per group.
 *  - Count-min sketch over a token stream: d×w counter grid, point
 *    estimate = min over rows. One tiny mergeable state replaces the
 *    full term-frequency table for heavy-hitter queries.
 *  - Fixed-bin histogram quantiles: B integer-indexed bins (pure integer
 *    bin math), linear interpolation inside the crossing bin. Mergeable
 *    (bin counts add); one scan replaces a global sort.
 */
object Sketches {

  /** djb2-32 of the UTF-8 bytes, folded to the unsigned 32-bit domain —
    * the repo's standard string fingerprint (matches `djb2Fold` SQL). */
  @inline def djb2u(s: String): Long = {
    var h = 5381
    val bytes = s.getBytes("UTF-8")
    var i = 0
    while (i < bytes.length) { h = ((h << 5) + h) ^ (bytes(i) & 0xFF); i += 1 }
    h.toLong & 0xFFFFFFFFL
  }

  /** Column: unsigned-32 djb2 fingerprint of a string column. */
  val djb2Udf = udf((s: String) => if (s == null) null else Long.box(djb2u(s)))

  /** Correctly-rounded unsigned-64 → double (BigDecimal path), the same
    * rounding DuckDB's HUGEINT→DOUBLE cast performs; outputs are float4
    * anyway per the libm convention, belt and braces. */
  @inline private[operators] def u64ToDouble(h: Long): Double =
    new java.math.BigDecimal(java.lang.Long.toUnsignedString(h)).doubleValue()

  private val TWO64: Double = 1.8446744073709552E19 // 2^64, exactly representable

  // ======================================================================
  // KMV distinct sketch
  // ======================================================================

  /** Bounded sorted-unsigned-distinct-hash state. Buffer layout: ascending
    * by UNSIGNED value, no duplicates, length ≤ k. */
  final class KmvAgg(k: Int) extends Aggregator[Long, Array[Long], Array[Long]] {
    require(k >= 2, "KMV needs k >= 2")

    def zero: Array[Long] = Array.emptyLongArray

    def reduce(b: Array[Long], u: Long): Array[Long] = insert(b, mix64(u))

    private def insert(b: Array[Long], h: Long): Array[Long] = {
      var lo = 0
      var hi = b.length
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        val c = java.lang.Long.compareUnsigned(b(mid), h)
        if (c < 0) lo = mid + 1
        else if (c > 0) hi = mid
        else return b // already present
      }
      if (b.length >= k && lo >= k) return b // larger than current kth min
      val keep = math.min(b.length + 1, k)
      val out = new Array[Long](keep)
      System.arraycopy(b, 0, out, 0, lo)
      out(lo) = h
      System.arraycopy(b, lo, out, lo + 1, keep - lo - 1)
      out
    }

    def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
      if (x.isEmpty) return y
      if (y.isEmpty) return x
      val out = new Array[Long](math.min(x.length + y.length, k))
      var i = 0; var j = 0; var w = 0
      while (w < out.length && (i < x.length || j < y.length)) {
        val take =
          if (i >= x.length) { val v = y(j); j += 1; v }
          else if (j >= y.length) { val v = x(i); i += 1; v }
          else {
            val c = java.lang.Long.compareUnsigned(x(i), y(j))
            if (c < 0) { val v = x(i); i += 1; v }
            else if (c > 0) { val v = y(j); j += 1; v }
            else { val v = x(i); i += 1; j += 1; v }
          }
        if (w == 0 || out(w - 1) != take) { out(w) = take; w += 1 }
      }
      if (w == out.length) out else java.util.Arrays.copyOf(out, w)
    }

    def finish(b: Array[Long]): Array[Long] = b
    def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  }

  /** Merges FINISHED KMV states (the incremental pattern: per-shard /
    * per-day sketches persisted, then combined to answer distinct
    * queries without re-reading raw data). KMV merge is lossless for
    * the k-minimum set, so merge-of-shards ≡ sketch-of-whole exactly —
    * an oracle-checkable identity, not an approximation. */
  final class KmvMergeAgg(k: Int) extends Aggregator[Seq[Long], Array[Long], Array[Long]] {
    private val base = new KmvAgg(k)
    def zero: Array[Long] = Array.emptyLongArray
    def reduce(b: Array[Long], state: Seq[Long]): Array[Long] =
      if (state == null) b else base.merge(b, state.toArray)
    def merge(x: Array[Long], y: Array[Long]): Array[Long] = base.merge(x, y)
    def finish(b: Array[Long]): Array[Long] = b
    def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  }

  /** KMV estimate from a finished state: exact when the sketch saw fewer
    * than k distinct hashes, else (k-1) / U(h_k) with U = h_k / 2⁶⁴.
    * float4 output per the repo's libm/conversion convention. */
  def kmvEstimate(state: Seq[Long], k: Int): Float =
    if (state == null || state.isEmpty) 0f
    else if (state.length < k) state.length.toFloat
    else ((k - 1).toDouble * TWO64 / u64ToDouble(state.last)).toFloat

  /** Per-group KMV distinct estimate over a PRE-FINGERPRINTED unsigned-32
    * column `uCol` (see [[djb2Udf]]). Output: group, n_kept, kth-min hash
    * as unsigned 32-bit halves (bit-exact evidence), est_distinct float4.
    * The shuffle moves ≤ k longs per group — never the distinct values. */
  def kmvDistinct(df: DataFrame, groupCol: String, uCol: String, k: Int): DataFrame = {
    val agg = udaf(new KmvAgg(k))
    val est = udf((s: Seq[Long]) => kmvEstimate(s, k))
    df.groupBy(col(groupCol))
      .agg(agg(col(uCol)).as("ks"))
      .select(
        col(groupCol),
        size(col("ks")).cast("long").as("n_kept"),
        shiftrightunsigned(expr("element_at(ks, size(ks))"), 32).as("kth_hi"),
        expr("element_at(ks, size(ks))").bitwiseAND(lit(0xFFFFFFFFL)).as("kth_lo"),
        est(col("ks")).as("est_distinct"))
  }

  // ======================================================================
  // HyperLogLog distinct sketch
  // ======================================================================

  /** Dense HyperLogLog (Flajolet et al. 2007) over the same splitmix64
    * hash family as KMV — the CONSTANT-state distinct sketch (m = 2^p
    * bytes per group regardless of k-th-minimum dynamics), the shape the
    * industry standard `approx_count_distinct` uses. Unlike library
    * HLL++ implementations the estimate here is ORACLE-EXACT: the
    * harmonic-mean denominator Σ 2^(−M_j) is kept as the INTEGER
    * Σ 2^(57−M_j) (BigInt / HUGEINT — order-independent, no float
    * accumulation), so register contents, denominator and estimate are
    * all re-derivable bit-for-bit in SQL. Register index = top p hash
    * bits, rho = leading-zero count of the remaining 64−p bits + 1.
    *
    * Reference surface: distinct-count statistics in the reference's
    * stats views (`NeuronDB/neurondb--1.0.sql`); PG's own planner uses
    * the same HLL estimator family for ndv.
    */
  final class HllAgg(p: Int) extends Aggregator[Long, Array[Byte], Array[Byte]] {
    require(p >= 4 && p <= 16, "HLL needs 4 <= p <= 16")
    private val m = 1 << p

    def zero: Array[Byte] = new Array[Byte](m)

    def reduce(b: Array[Byte], u: Long): Array[Byte] = {
      val h = mix64(u)
      val idx = (h >>> (64 - p)).toInt
      val rem = h & ((1L << (64 - p)) - 1L)
      // bitlen(rem) = 64 - nlz(rem); rho = (64-p) - bitlen + 1; rem=0 -> 65-p
      val rho =
        if (rem == 0L) (65 - p)
        else (64 - p) - (64 - java.lang.Long.numberOfLeadingZeros(rem)) + 1
      if (rho > (b(idx) & 0xFF)) b(idx) = rho.toByte
      b
    }

    def merge(x: Array[Byte], y: Array[Byte]): Array[Byte] = {
      var i = 0
      while (i < x.length) {
        if ((y(i) & 0xFF) > (x(i) & 0xFF)) x(i) = y(i)
        i += 1
      }
      x
    }

    def finish(b: Array[Byte]): Array[Byte] = b
    def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** HLL evidence row from a finished register array — see [[hllSummary]]. */
  final case class HllSummary(nZero: Long, sHi: Long, sLo: Long,
                              checksum: Long, est: Float)

  /** alpha_m for m >= 128 (the published constant expression). */
  @inline private def hllAlpha(m: Int): Double = 0.7213 / (1.0 + 1.079 / m)

  /** Summarize a register array: V (zeros), S = Σ_j 2^(maxRho − M_j) as
    * an exact BigInt split into 32-bit halves, a positional checksum
    * Σ (j+1)·M_j, and the HLL estimate (raw harmonic-mean estimator with
    * the linear-counting small-range correction; float4 per the libm
    * convention — the `ln` branch is libm-sensitive). maxRho = 65 − p. */
  def hllSummary(regs: Array[Byte], p: Int): HllSummary = {
    val m = 1 << p
    val maxRho = 65 - p
    var v = 0L
    var checksum = 0L
    var s = BigInt(0)
    var j = 0
    while (j < m) {
      val r = regs(j) & 0xFF
      if (r == 0) v += 1L
      checksum += (j + 1).toLong * r
      s += BigInt(1) << (maxRho - r)
      j += 1
    }
    val mD = m.toDouble
    val raw = hllAlpha(m) * mD * mD * math.pow(2.0, maxRho.toDouble) / s.toDouble
    val est =
      if (raw <= 2.5 * mD && v > 0L) (mD * math.log(mD / v.toDouble)).toFloat
      else raw.toFloat
    HllSummary(v, (s >> 32).toLong, (s & 0xFFFFFFFFL).toLong, checksum, est)
  }

  /** Per-group HLL distinct estimate over a pre-fingerprinted unsigned-32
    * column (see [[djb2Udf]]). The shuffle carries exactly 2^p bytes per
    * group — constant, unlike `countDistinct`'s expand. Output: group,
    * n_zero, s_hi/s_lo (exact integer denominator halves), checksum,
    * est_distinct float4. */
  def hllDistinct(df: DataFrame, groupCol: String, uCol: String, p: Int): DataFrame = {
    val agg = udaf(new HllAgg(p))
    val summ = udf((regs: Array[Byte]) => hllSummary(regs, p))
    df.groupBy(col(groupCol))
      .agg(agg(col(uCol)).as("regs"))
      .select(col(groupCol), summ(col("regs")).as("s"))
      .select(col(groupCol),
        col("s.nZero").as("n_zero"),
        col("s.sHi").as("s_hi"),
        col("s.sLo").as("s_lo"),
        col("s.checksum").as("checksum"),
        col("s.est").as("est_distinct"))
  }

  // ======================================================================
  // Count-min sketch
  // ======================================================================

  /** Fixed row seeds: mix64(seedBase + r) — inlined as HUGEINT literals in
    * the SQL oracle, derived identically here. */
  def cmsRowSeeds(d: Int, seedBase: Long = 1000003L): Array[Long] =
    Array.tabulate(d)(r => mix64(seedBase + r))

  /** d×w counter grid over a stream of unsigned-32 fingerprints; w must be
    * a power of two (bucket = mix64(u ^ seed_r) & (w-1), an unsigned mod). */
  final class CmsAgg(d: Int, w: Int, seedBase: Long = 1000003L)
      extends Aggregator[Long, Array[Long], Array[Long]] {
    require((w & (w - 1)) == 0 && w > 0, "w must be a power of two")
    private val seeds = cmsRowSeeds(d, seedBase)

    def zero: Array[Long] = new Array[Long](d * w)

    def reduce(b: Array[Long], u: Long): Array[Long] = {
      var r = 0
      while (r < d) {
        b(r * w + (mix64(u ^ seeds(r)) & (w - 1)).toInt) += 1L
        r += 1
      }
      b
    }

    def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
      var i = 0
      while (i < x.length) { x(i) += y(i); i += 1 }
      x
    }

    def finish(b: Array[Long]): Array[Long] = b
    def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  }

  /** Point estimate for fingerprint `u` from a finished grid. */
  def cmsQuery(grid: Seq[Long], d: Int, w: Int, u: Long,
               seedBase: Long = 1000003L): Long = {
    val seeds = cmsRowSeeds(d, seedBase)
    var best = Long.MaxValue
    var r = 0
    while (r < d) {
      val v = grid(r * w + (mix64(u ^ seeds(r)) & (w - 1)).toInt)
      if (v < best) best = v
      r += 1
    }
    best
  }

  /** CMS-estimated counts for the exact top-`kTop` fingerprints of a token
    * stream: ONE pass builds the d×w grid (partial-agg merged — the grid,
    * not the terms, crosses the shuffle), the exact side is the plain
    * term-count topk used as ground truth. Output: term, exact_cnt,
    * cms_est (integer-exact, always ≥ exact_cnt). */
  def cmsTopK(tokens: DataFrame, termCol: String, kTop: Int,
              d: Int = 4, w: Int = 1024): DataFrame = {
    val withU = tokens.withColumn("__u", djb2Udf(col(termCol)))
    val cmsUdaf = udaf(new CmsAgg(d, w))
    val gridDf = withU.agg(cmsUdaf(col("__u")).as("grid"))
    val est = udf((grid: Seq[Long], u: Long) => cmsQuery(grid, d, w, u))
    val topk = withU.groupBy(col(termCol), col("__u"))
      .agg(count(lit(1)).as("exact_cnt"))
      .orderBy(col("exact_cnt").desc, col(termCol))
      .limit(kTop)
    topk.crossJoin(broadcast(gridDf))
      .select(col(termCol), col("exact_cnt"),
        est(col("grid"), col("__u")).as("cms_est"))
  }

  // ======================================================================
  // Histogram quantiles
  // ======================================================================

  /** One-scan fixed-bin quantile estimates over an integer column, next to
    * the EXACT rank-based quantile (via [[DistributedRank]] — no global
    * single-partition sort). Bin index is pure integer math
    * (`least(B-1, (v-lo)*B div (hi-lo))`), the interpolation inside the
    * crossing bin is the fixed expression tree
    * `lo + bin*wBin + wBin*((p*n - cumBefore)/cnt)` mirrored token-for-token
    * in the SQL oracle; float4 output. Returns (percentile, est, exact). */
  def histQuantiles(df: DataFrame, valueCol: String, tieBreak: String,
                    bins: Int, ps: Seq[Double]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val Row2 = df.agg(min(col(valueCol)).cast("long"), max(col(valueCol)).cast("long"),
      count(lit(1))).head()
    if (Row2.isNullAt(0)) { // empty input: no rows to rank
      return ps.map(p => (p, 0f, 0L)).toDF("percentile", "est", "exact")
    }
    val (lo, hi, n) = (Row2.getLong(0), Row2.getLong(1), Row2.getLong(2))
    if (hi == lo) {
      return ps.map(p => (p, lo.toFloat, lo)).toDF("percentile", "est", "exact")
    }
    val binCol = least(lit(bins - 1),
      expr(s"(($valueCol - $lo) * $bins) div ${hi - lo}"))
    // tiny side table: ≤ bins rows collected once
    val binCounts = df.groupBy(binCol.as("bin")).agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val wBin = (hi - lo).toDouble / bins.toDouble
    val ests = ps.map { p =>
      val t = p * n.toDouble
      var cum = 0.0
      var out = 0f
      var found = false
      for ((bin, cnt) <- binCounts if !found) {
        if (cum + cnt.toDouble >= t) {
          out = (lo.toDouble + bin.toDouble * wBin +
            wBin * ((t - cum) / cnt.toDouble)).toFloat
          found = true
        }
        cum += cnt.toDouble
      }
      (p, out)
    }
    // exact sibling: value at 1-based rank floor(p*(n-1))+1 on the
    // (value, tieBreak) total order — distributed rank, no global window
    val targets = ps.map(p => (math.floor(p * (n - 1).toDouble).toLong + 1L, p)).toMap
    val ranked = DistributedRank.withRank(
      df.select(col(valueCol).cast("long").as("v"), col(tieBreak)),
      col("v"), descending = false, col(tieBreak), "rn")
    val exact = ranked.filter(col("rn").isin(targets.keys.toSeq: _*))
      .select(col("rn"), col("v")).collect()
      .map(r => targets(r.getLong(0)) -> r.getLong(1)).toMap
    ests.map { case (p, e) => (p, e, exact(p)) }
      .toDF("percentile", "est", "exact")
  }

  /** Per-group fixed-bin histogram quantile estimates — the group-wise
    * face of [[histQuantiles]] with NO sort or window anywhere: one
    * (min, max, count) aggregate per group, integer bin assignment
    * against the group's own range, one (group, bin) count aggregate,
    * and a driver-side interpolation walk over the tiny
    * (≤ groups·bins) result. A degenerate group (hi == lo) returns its
    * constant for every percentile. Returns (group, percentile,
    * est: float4). The group column must be string-typed (the walk
    * rebuilds the frame driver-side). */
  def histQuantilesByGroup(df: DataFrame, groupCol: String, valueCol: String,
                           bins: Int, ps: Seq[Double]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val stats = df.groupBy(col(groupCol)).agg(
      min(col(valueCol)).cast("long").as("__lo"),
      max(col(valueCol)).cast("long").as("__hi"),
      count(lit(1)).as("__n"))
    val withBin = df.join(broadcast(stats), groupCol)
      .withColumn("__bin", when(col("__hi") === col("__lo"), lit(0L))
        .otherwise(least(lit((bins - 1).toLong),
          expr(s"(($valueCol - __lo) * $bins) div (__hi - __lo)"))))
    val counts = withBin.groupBy(col(groupCol), col("__bin"))
      .agg(count(lit(1)).as("__cnt"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).map { case (g, rs) => g -> rs.map(t => (t._2, t._3)).sortBy(_._1) }
    val statRows = stats.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val out = for {
      (g, (lo, hi, n)) <- statRows.toSeq.sortBy(_._1)
      p <- ps
    } yield {
      val est =
        if (hi == lo) lo.toFloat
        else {
          val wBin = (hi - lo).toDouble / bins.toDouble
          val t = p * n.toDouble
          var cum = 0.0
          var e = 0f
          var found = false
          for ((bin, cnt) <- counts(g) if !found) {
            if (cum + cnt.toDouble >= t) {
              e = (lo.toDouble + bin.toDouble * wBin +
                wBin * ((t - cum) / cnt.toDouble)).toFloat
              found = true
            }
            cum += cnt.toDouble
          }
          e
        }
      (g, p, est)
    }
    out.toDF(groupCol, "percentile", "est")
  }

  /** Adaptive per-group length gating — the curation step that drops
    * outlier-length documents against EACH group's own distribution
    * (fixed global cutoffs misfire when languages/domains have different
    * length profiles): per-group [pLo, pHi] histogram-quantile cutoffs
    * via [[histQuantilesByGroup]], broadcast back, one scan to gate.
    * Returns per-group (n_docs, n_kept, lo_cut, hi_cut). */
  def lengthFilterAdaptive(df: DataFrame, groupCol: String, valueCol: String,
                           bins: Int, pLo: Double, pHi: Double): DataFrame = {
    require(pLo < pHi, s"need pLo < pHi: $pLo, $pHi")
    val qs = histQuantilesByGroup(df, groupCol, valueCol, bins, Seq(pLo, pHi))
    val cuts = qs.groupBy(col(groupCol)).agg(
      min(when(col("percentile") === pLo, col("est"))).as("lo_cut"),
      min(when(col("percentile") === pHi, col("est"))).as("hi_cut"))
    df.join(broadcast(cuts), groupCol)
      .withColumn("__kept",
        col(valueCol) >= col("lo_cut") && col(valueCol) <= col("hi_cut"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__kept").cast("long")).as("n_kept"),
        min(col("lo_cut")).as("lo_cut"),
        min(col("hi_cut")).as("hi_cut"))
  }
}
