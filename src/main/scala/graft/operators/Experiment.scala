package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Experimentation analytics — the A/B readout stack: Welch's t-test
 * for the arm contrast, CUPED variance reduction from a pre-period
 * covariate (Deng et al. 2013), and the sample-ratio-mismatch
 * chi-square guardrail that must pass before any readout is trusted.
 * Together with funnel/retention these make the events table a full
 * product-analytics surface.
 *
 * Scale shape: every statistic folds to per-arm moment sums — one
 * two-phase groupBy each (CUPED adds one broadcast global-moments
 * row); integer-valued metrics keep the sums exact in doubles, and
 * every closing statistic emits float4 (separate aggregate feeds).
 */
object Experiment {

  /** Welch's unequal-variance t-test between arms `armA` and `armB`:
    * one row (n_a, n_b, mean_a, mean_b, t, dof) with sample variances
    * (n-1 denominators) and the Welch-Satterthwaite dof. Arms need
    * n >= 2 each; other arm labels are ignored. */
  def abTtest(df: DataFrame, armCol: String, valueCol: String,
              armA: String, armB: String): DataFrame = {
    val v = col(valueCol).cast("double")
    def side(arm: String, tag: String) = Seq(
      sum(when(col(armCol) === arm, 1L).otherwise(0L)).as(s"__n$tag"),
      sum(when(col(armCol) === arm, v).otherwise(0.0)).as(s"__s$tag"),
      sum(when(col(armCol) === arm, v * v).otherwise(0.0)).as(s"__q$tag"))
    val aggs = side(armA, "a") ++ side(armB, "b")
    df.filter(col(armCol).isNotNull && v.isNotNull && !isnan(v))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("__na").as("n_a"), col("__nb").as("n_b"), {
        def stats(tag: String) = {
          val n = col(s"__n$tag").cast("double")
          val m = col(s"__s$tag") / n
          // sample variance via the sum-of-squares identity, clamped
          val sv = greatest((col(s"__q$tag") - col(s"__s$tag") * m) /
            (n - 1.0), lit(0.0))
          (n, m, sv)
        }
        val (na, ma, va) = stats("a")
        val (nb, mb, vb) = stats("b")
        val se2 = va / na + vb / nb
        val dof = (se2 * se2) /
          ((va / na) * (va / na) / (na - 1.0) +
            (vb / nb) * (vb / nb) / (nb - 1.0))
        // an arm with n < 2 has no sample variance: emit NULLs, not
        // the NaN that (q - s·m)/(n-1) would propagate
        val ok = na >= 2.0 && nb >= 2.0 && se2 > 0
        struct(ma.cast("float").as("mean_a"), mb.cast("float").as("mean_b"),
          when(ok, (ma - mb) / sqrt(se2)).cast("float").as("t"),
          when(ok, dof).cast("float").as("dof")).as("f")
      })
      .select(col("n_a"), col("n_b"), col("f.mean_a").as("mean_a"),
        col("f.mean_b").as("mean_b"), col("f.t").as("t"),
        col("f.dof").as("dof"))
  }

  /** CUPED adjustment: theta = pooled cov(pre, post)/var(pre); per arm
    * the raw and adjusted means plus the variance-reduction ratio
    * var(adj)/var(post), all from moment identities (population
    * variances — the ratio is what matters). Emits one row per arm:
    * (arm, n, mean_post, mean_adj, var_ratio). */
  def cuped(df: DataFrame, armCol: String, preCol: String,
            postCol: String): DataFrame = {
    val x = col(preCol).cast("double")
    val y = col(postCol).cast("double")
    val clean = df.filter(col(armCol).isNotNull && x.isNotNull && y.isNotNull)
    val global = broadcast(clean.agg(
      count(lit(1)).as("__gn"), sum(x).as("__gsx"), sum(y).as("__gsy"),
      sum(x * x).as("__gsxx"), sum(x * y).as("__gsxy")))
    clean.groupBy(col(armCol))
      .agg(count(lit(1)).as("n"), sum(x).as("__sx"), sum(y).as("__sy"),
        sum(x * x).as("__sxx"), sum(y * y).as("__syy"),
        sum(x * y).as("__sxy"))
      .crossJoin(global)
      .select(col(armCol), col("n"), {
        val gn = col("__gn").cast("double")
        val gmx = col("__gsx") / gn
        val gcov = col("__gsxy") / gn - (col("__gsx") / gn) * (col("__gsy") / gn)
        val gvarx = col("__gsxx") / gn - gmx * gmx
        val theta = when(gvarx > 0, gcov / gvarx).otherwise(lit(0.0))
        val n = col("n").cast("double")
        val mx = col("__sx") / n
        val my = col("__sy") / n
        val vy = col("__syy") / n - my * my
        val vx = col("__sxx") / n - mx * mx
        val cxy = col("__sxy") / n - mx * my
        val madj = my - theta * (mx - gmx)
        val vadj = vy + theta * theta * vx - lit(2.0) * theta * cxy
        struct(my.cast("float").as("mean_post"),
          madj.cast("float").as("mean_adj"),
          when(vy > 0, vadj / vy).cast("float").as("var_ratio")).as("f")
      })
      .select(col(armCol), col("n"), col("f.mean_post").as("mean_post"),
        col("f.mean_adj").as("mean_adj"), col("f.var_ratio").as("var_ratio"))
  }

  /** Difference-in-differences: the 2x2 (arm x period) contrast
    * (treated post - treated pre) - (control post - control pre),
    * the workhorse quasi-experimental estimator when assignment was
    * not randomized. One fused scan-aggregate; means and the estimate
    * emit float4. `periodCol` is 0 (pre) / 1 (post); `armT`/`armC`
    * name the treated and control arms. */
  def diffInDiff(df: DataFrame, armCol: String, periodCol: String,
                 valueCol: String, armT: String, armC: String): DataFrame = {
    val v = col(valueCol).cast("double")
    val p = col(periodCol).cast("int")
    def cell(arm: String, period: Int, tag: String) = Seq(
      sum(when(col(armCol) === arm && p === period, 1L).otherwise(0L))
        .as(s"__n$tag"),
      sum(when(col(armCol) === arm && p === period, v).otherwise(0.0))
        .as(s"__s$tag"))
    val aggs = cell(armC, 0, "c0") ++ cell(armC, 1, "c1") ++
      cell(armT, 0, "t0") ++ cell(armT, 1, "t1")
    df.filter(col(armCol).isNotNull && v.isNotNull && p.isNotNull)
      .agg(aggs.head, aggs.tail: _*)
      .select(
        (col("__nc0") + col("__nc1") + col("__nt0") + col("__nt1")).as("n"), {
          def m(tag: String) = col(s"__s$tag") / col(s"__n$tag")
          struct(m("c0").cast("float").as("mean_c_pre"),
            m("c1").cast("float").as("mean_c_post"),
            m("t0").cast("float").as("mean_t_pre"),
            m("t1").cast("float").as("mean_t_post"),
            ((m("t1") - m("t0")) - (m("c1") - m("c0"))).cast("float")
              .as("did")).as("f")
        })
      .select(col("n"), col("f.mean_c_pre").as("mean_c_pre"),
        col("f.mean_c_post").as("mean_c_post"),
        col("f.mean_t_pre").as("mean_t_pre"),
        col("f.mean_t_post").as("mean_t_post"), col("f.did").as("did"))
  }

  /** One-way ANOVA F across all arms: between/within sums of squares
    * from per-arm moments (SSB = Σs_g²/n_g - S²/N, SSW = Σ(q_g -
    * s_g²/n_g)), F = (SSB/(k-1)) / (SSW/(N-k)). Emits one row:
    * (k, n, ssb, ssw, f) — float4 (separate aggregate feeds). */
  def anovaF(df: DataFrame, armCol: String, valueCol: String): DataFrame = {
    val v = col(valueCol).cast("double")
    df.filter(col(armCol).isNotNull && v.isNotNull && !isnan(v))
      .groupBy(col(armCol))
      .agg(count(lit(1)).as("__n"), sum(v).as("__s"), sum(v * v).as("__q"))
      .agg(count(lit(1)).as("k"), sum(col("__n")).as("n"),
        sum(col("__s")).as("__S"),
        sum(col("__s") * col("__s") / col("__n")).as("__b"),
        sum(col("__q") - col("__s") * col("__s") / col("__n")).as("__w"))
      .select(col("k"), col("n"), {
        val ssb = col("__b") - col("__S") * col("__S") / col("n")
        val ssw = col("__w")
        struct(ssb.cast("float").as("ssb"), ssw.cast("float").as("ssw"),
          when(col("k") > 1 && ssw > 0,
            (ssb / (col("k") - 1.0)) / (ssw / (col("n") - col("k"))))
            .cast("float").as("f")).as("g")
      })
      .select(col("k"), col("n"), col("g.ssb").as("ssb"),
        col("g.ssw").as("ssw"), col("g.f").as("f"))
  }

  /** Caliper 1-NN propensity matching (with replacement): each
    * treated unit matches its nearest control by score within
    * `caliper`, ties to the smallest control id. Candidates meet
    * through a BLOCKED equi-join on floor(score/caliper) with the
    * band trick (controls also register one block up), so a
    * within-caliper pair can never sit more than one block away and
    * nothing goes all-pairs — the [[EvalMetrics.editNearDup]]
    * geometry applied to causal matching. Emits one row per matched
    * treated unit: (t_id, c_id, score_diff, y_t, y_c); the ATT is
    * avg(y_t - y_c) downstream. */
  def propensityMatch(df: DataFrame, armCol: String, idCol: String,
                      scoreCol: String, valueCol: String, armT: String,
                      armC: String, caliper: Double): DataFrame = {
    require(caliper > 0, s"caliper $caliper")
    val sc = col(scoreCol).cast("double")
    // block width 2x caliper: a within-caliper pair's block ratio gap
    // is <= 0.5 + rounding, so adjacent registration provably covers
    // it even at float boundaries (the editNearDup width>dist margin)
    val blk = floor(sc / (2 * caliper)).cast("long")
    val base = df.filter(col(armCol).isNotNull && sc.isNotNull)
    val treated = base.filter(col(armCol) === armT)
      .select(blk.as("__b"), col(idCol).as("t_id"), sc.as("__ts"),
        col(valueCol).cast("double").as("y_t"))
    val controls0 = base.filter(col(armCol) === armC)
      .select(blk.as("__b"), col(idCol).as("c_id"), sc.as("__cs"),
        col(valueCol).cast("double").as("y_c"))
    // band trick: controls also register in the NEXT block, treated
    // probes its own and (via the shifted copies) the one below/above
    val controls = controls0
      .union(controls0.withColumn("__b", col("__b") + 1))
      .union(controls0.withColumn("__b", col("__b") - 1))
    treated.join(controls, Seq("__b"))
      .filter(abs(col("__ts") - col("__cs")) <= caliper)
      .groupBy(col("t_id"))
      .agg(min(struct(abs(col("__ts") - col("__cs")).as("d"),
        col("c_id").as("c"), col("y_t").as("yt"), col("y_c").as("yc")))
        .as("__m"))
      .select(col("t_id"), col("__m.c").as("c_id"),
        round(col("__m.d"), 6).as("score_diff"),
        col("__m.yt").as("y_t"), col("__m.yc").as("y_c"))
  }

  /** Sample-ratio-mismatch check: per arm the observed count, the
    * expected count under the declared split (exact rational
    * N·num/den), and the chi-square contribution (o-e)²/e — both
    * round-6 (pure mul/div chains). The caller sums contributions
    * against the chi-square critical value. Arms not in `expected`
    * are dropped (they fail the experiment design upstream). */
  def srmCheck(df: DataFrame, armCol: String,
               expected: Seq[(String, Int, Int)]): DataFrame = {
    require(expected.nonEmpty, "no expected split given")
    val spark = df.sparkSession
    import spark.implicits._
    val exp = broadcast(expected.toDF(armCol, "__num", "__den"))
    val counts = df.filter(col(armCol).isNotNull)
      .join(exp, Seq(armCol))
      .groupBy(col(armCol), col("__num"), col("__den"))
      .agg(count(lit(1)).as("n_obs"))
    val total = broadcast(counts.agg(sum(col("n_obs")).as("__tot")))
    counts.crossJoin(total)
      .select(col(armCol), col("n_obs"), {
        val e = col("__tot").cast("double") * col("__num") / col("__den")
        val o = col("n_obs").cast("double")
        struct(round(e, 6).as("n_expected"),
          round((o - e) * (o - e) / e, 6).as("chi2_contrib")).as("f")
      })
      .select(col(armCol), col("n_obs"), col("f.n_expected").as("n_expected"),
        col("f.chi2_contrib").as("chi2_contrib"))
  }
}
