package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.DetRandom

/**
 * Deterministic sampling for training-data pipelines (north-star
 * addition, next to [[Dedup]]/[[TemporalJoins]]): train/val splits and
 * stratified draws that are a PURE FUNCTION of row content — no RNG
 * state, no partition-order dependence, no seed plumbing across 1000
 * executors.
 *
 * The rule: a row's sampling coordinate is the md5 hex prefix of its
 * key rendered as a string. Lowercase-hex string comparison is monotone
 * in the hash value, md5 renders identically in every engine, and the
 * whole predicate pushes into any SQL dialect verbatim — which is what
 * makes these samples oracle-checkable AND reproducible when a pipeline
 * is re-run months later on different cluster topology (`Spark.sample`'s
 * seeded Bernoulli draw is partition-order dependent; this is not).
 * Same id ⇒ same split, forever — membership is stable under corpus
 * growth, the property leakage-safe train/test protocols need.
 */
object Sampling {

  /** md5 hex prefix (8 hex digits = 32 uniform bits) of the key. */
  private[operators] def coord(key: Column): Column =
    substring(md5(key.cast("string").cast("binary")), 1, 8)

  /** Hex threshold for a fraction: rows with coord < threshold are kept;
    * 8-digit zero-padded so string compare equals numeric compare.
    * Accepts boundary drift up to 1 + 1e-9 from summed fractions. */
  private[operators] def hexThreshold(fraction: Double): String = {
    require(fraction >= 0.0 && fraction <= 1.0 + 1e-9, "fraction must be in [0,1]")
    f"${math.min((fraction * 4294967296.0).toLong, 4294967295L)}%08x"
  }

  /** `coord < threshold(fraction)` as a Column — except fraction ≥ 1,
    * which must keep EVERY row: the 8-hex-digit threshold saturates at
    * "ffffffff", and a strict `<` there would silently drop the ~1-in-2³²
    * keys whose coord is exactly "ffffffff" (real rows at trillion scale). */
  private[operators] def keepBelow(key: Column, fraction: Double): Column =
    if (fraction >= 1.0) lit(true)
    else coord(key) < lit(hexThreshold(fraction))

  /** Keep ~`fraction` of rows, deterministically by key hash;
    * fraction 1.0 is exactly the identity. */
  def hashSample(df: DataFrame, keyCol: String, fraction: Double): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, "fraction must be in [0,1]")
    df.filter(keepBelow(col(keyCol), fraction))
  }

  /**
   * Disjoint deterministic splits (e.g. train/val/test = 0.8/0.1/0.1):
   * consecutive hash ranges; every row lands in exactly one split when
   * the fractions sum to 1 (float accumulation drift on the last bound
   * is absorbed — [0.55, 0.34, 0.11] sums to 1.0000000000000002).
   * Returns one DataFrame per fraction (fractions must sum to ≤ 1; any
   * remainder is dropped).
   */
  def split(df: DataFrame, keyCol: String, fractions: Seq[Double]): Seq[DataFrame] = {
    require(fractions.nonEmpty && fractions.sum <= 1.0 + 1e-9,
      "fractions must sum to at most 1")
    val bounds = fractions.scanLeft(0.0)(_ + _)
    bounds.sliding(2).map { case Seq(lo, hi) =>
      df.filter(!keepBelow(col(keyCol), lo) && keepBelow(col(keyCol), hi))
    }.toSeq
  }

  /**
   * Domain-weighted mixture resample — the data-mixture step of
   * training-feed assembly (domain reweighting / epochs-per-source):
   * weight w ∈ [0,1) keeps ~w of the domain's rows; w ≥ 1 replicates
   * each row floor(w) times and keeps one extra copy with probability
   * frac(w). Copies are distinguished by the emitted `rep` column; copy
   * r's keep decision hashes `(key, r)`, so fractional keeps are
   * independent across replication levels and the whole mixture stays a
   * pure function of row content (stable under corpus growth, like
   * every sampler here). Domains absent from `weights` are dropped.
   *
   * Scale shape: the weight spec is a broadcast of |domains| rows; the
   * corpus side is one scan + explode — no shuffle at all.
   */
  def mixtureSample(df: DataFrame, domainCol: String, keyCol: String,
                    weights: Map[String, Double]): DataFrame = {
    require(weights.nonEmpty, "weights must be non-empty")
    val spark = df.sparkSession
    import spark.implicits._
    val spec = weights.toSeq.map { case (d, w) =>
      require(w >= 0.0 && w.isFinite, s"weight must be finite and >= 0: $d -> $w")
      (d, math.floor(w).toLong, hexThreshold(w - math.floor(w)))
    }
    val specDf = spec.toDF(domainCol, "__whole", "__fth")
    df.join(broadcast(specDf), domainCol)
      .withColumn("rep", explode(sequence(lit(0L), col("__whole"))))
      .filter(col("rep") < col("__whole") ||
        coord(concat(col(keyCol).cast("string"), lit(":"),
          col("rep").cast("string"))) < col("__fth"))
      .drop("__whole", "__fth")
  }

  /** Exactly min(n, stratum size) rows per stratum, chosen by hash order
    * (deterministic; one shuffle on the strata key, heap-limited by
    * WindowGroupLimit — never a global sort). */
  def stratifiedTake(df: DataFrame, strataCols: Seq[String], keyCol: String,
                     n: Int): DataFrame = {
    require(n >= 1, "n must be positive")
    val w = Window.partitionBy(strataCols.map(col): _*)
      .orderBy(coord(col(keyCol)), col(keyCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n)
      .drop("__rn")
  }

  /** Weighted reservoir sample WITHOUT replacement (Efraimidis &
    * Spirtakis A-ES, Inf. Proc. Letters 2006) — the one-pass bounded-state
    * weighted draw: u_i = splitmix64(id)'s top 53 bits scaled to [0,1),
    * key_i = ln(u_i)/w_i, keep the k rows with the LARGEST key (monotone
    * image of the paper's u_i^(1/w_i), so P[i in sample] follows
    * sequential PPS-without-replacement). Deterministic — the draw is a
    * pure function of the id, stable under corpus growth and re-runs,
    * like every sampler here; the complement of [[systematicSample]]
    * (exact copy counts WITH replacement).
    *
    * Scale shape: one scan; top-k is `TakeOrderedAndProject` (per-
    * partition heaps, k rows to the driver) — no shuffle of the corpus,
    * and shard top-ks merge losslessly (top-k of top-ks), so per-day
    * samples compose into a corpus sample without re-reading data.
    *
    * Returns (id, weight, es_key float4) — key emitted float4 per the
    * libm convention (ln). */
  def weightedReservoir(df: DataFrame, idCol: String, weightCol: String,
                        k: Int): DataFrame = {
    require(k >= 1, s"k must be positive: $k")
    val u01 = udf { (id: Long) =>
      (DetRandom.mix64(id) >>> 11).toDouble / 9007199254740992.0 // 2^53
    }
    df.select(col(idCol).cast("long").as(idCol),
        col(weightCol).cast("double").as("weight"))
      .filter(col("weight") > 0)
      .withColumn("__key", log(u01(col(idCol))) / col("weight"))
      .orderBy(col("__key").desc, col(idCol))
      .limit(k)
      .select(col(idCol), col("weight"), col("__key").cast("float").as("es_key"))
  }

  /** Per-group weighted reservoir — [[weightedReservoir]] with an
    * independent k-draw per group (per-language / per-domain sampling
    * budgets): same A-ES key, ranked inside each group by a PARTITIONED
    * window (distributes across groups — never a global sort). Returns
    * (group, id, weight, es_key float4). */
  def weightedReservoirByGroup(df: DataFrame, groupCol: String, idCol: String,
                               weightCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be positive: $k")
    val u01 = udf { (id: Long) =>
      (DetRandom.mix64(id) >>> 11).toDouble / 9007199254740992.0 // 2^53
    }
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("__key").desc, col(idCol))
    df.select(col(groupCol), col(idCol).cast("long").as(idCol),
        col(weightCol).cast("double").as("weight"))
      .filter(col("weight") > 0)
      .withColumn("__key", log(u01(col(idCol))) / col("weight"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .select(col(groupCol), col(idCol), col("weight"),
        col("__key").cast("float").as("es_key"))
  }

  /** Systematic (low-variance) weighted resampling — deterministic,
    * EXACTLY k total copies, E[copies_i] ∝ weight_i (Madow's systematic
    * PPS scheme; the particle-filter resampler): traverse rows in id
    * order, lay the integer weights end-to-end on an axis of total W,
    * and give row i one copy per grid point t_j = (2j+1)·W/(2k) that
    * falls inside its interval. copies_i = g(cum_i) − g(cum_{i-1}) with
    * g(c) = ⌊(2kc + W − 1) / (2W)⌋ — pure integer arithmetic, so a SQL
    * oracle replays it exactly. A row with weight ≥ W/k gets its
    * guaranteed ⌊k·w/W⌋ copies (data-mixture "epochs" with no
    * randomness at all).
    *
    * Scale shape: the cumulative sum is the bucket-prefix pattern
    * (approxQuantile buckets over the id, partitioned window inside each
    * bucket, tiny per-bucket offset join — never a single-task global
    * sort). Bounds: needs 2·k·W < 2⁶³ (k ~ 10⁶ against W ~ 10¹² token
    * corpora is fine).
    *
    * Returns (id, weight, copies) for rows with copies > 0. */
  def systematicSample(df: DataFrame, idCol: String, weightCol: String,
                       k: Int): DataFrame = {
    require(k >= 1, s"k must be positive: $k")
    val spark = df.sparkSession
    val p = math.max(1, spark.sessionState.conf.numShufflePartitions)
    val base = df
      .select(col(idCol).cast("long").as("__id"),
        col(weightCol).cast("long").as("__w"))
      .filter(col("__w") > 0)
    val bounds: Array[Double] =
      if (p == 1) Array.empty
      else base.stat.approxQuantile(
        Array("__id"), (1 until p).map(_.toDouble / p).toArray, 0.001)(0)
    val uniq = bounds.distinct.sorted
    val bucketUdf = udf { (o: Long) =>
      val d = o.toDouble
      var lo = 0
      var hi = uniq.length
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (d <= uniq(mid)) hi = mid else lo = mid + 1
      }
      lo
    }
    val bucketed = base.withColumn("__b", bucketUdf(col("__id")))
    val w = Window.partitionBy(col("__b")).orderBy(col("__id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = bucketed.withColumn("__lcum", sum(col("__w")).over(w))
    val sums = bucketed.groupBy(col("__b")).agg(sum(col("__w")).as("__bsum"))
    val offsets = sums.as("a")
      .join(sums.as("b"), col("b.__b") < col("a.__b"), "left")
      .groupBy(col("a.__b").as("__b"))
      .agg(coalesce(sum(col("b.__bsum")), lit(0L)).as("__off"))
    val withCum = local.join(broadcast(offsets), "__b")
      .withColumn("__cum", col("__off") + col("__lcum"))
    val total = withCum.agg(max(col("__cum"))).head().getLong(0)
    require(total > 0 && 2L * k <= Long.MaxValue / total,
      s"2*k*W must fit int64 (k=$k, W=$total)")
    withCum
      .withColumn("__ge",
        expr(s"(${2L * k}L * __cum + ${total - 1}L) div ${2L * total}L"))
      .withColumn("__gs",
        expr(s"(${2L * k}L * (__cum - __w) + ${total - 1}L) div ${2L * total}L"))
      .withColumn("copies", col("__ge") - col("__gs"))
      .filter(col("copies") > 0)
      .select(col("__id").as(idCol), col("__w").as("weight"), col("copies"))
  }

  /** Temperature-scaled (τ = 1/2) mixture quotas over a domain column +
    * the exact per-domain draw — the multi-corpus rebalancing step every
    * pretraining mix performs (upweight small domains relative to
    * proportional sampling; the τ-smoothing of published multilingual
    * recipes, at the fixed τ = 1/2 an integer-exact oracle can replay).
    *
    * Allocation is EXACT integer largest-remainder apportionment over
    * s_d = ⌊√(n_d · scale)⌋: quotas sum to `budget` precisely (ties on
    * remainder break by domain name), and the only float is the IEEE
    * `sqrt` of an exactly-representable double — correctly rounded and
    * thus bit-identical in every engine; `scale` (default 2²⁰) buys
    * √-precision and must keep n_d · scale ≤ 2⁵³. A quota larger than
    * its domain (possible when τ-upweighting exceeds a tiny domain's
    * size) is CAPPED at n_d without redistribution — documented, and
    * visible in the output as n_sel < quota.
    *
    * The draw is the stable md5-hash order per domain ([[coord]]), so
    * membership is deterministic and stable under re-runs. Scale shape:
    * the domain table is tiny (collected once, like a centroid table);
    * the corpus sees one partitioned window — no global sort. */
  def temperatureMixture(df: DataFrame, domainCol: String, keyCol: String,
                         budget: Long, scale: Long = 1L << 20): DataFrame = {
    require(budget > 0, s"budget $budget")
    val spark = df.sparkSession
    import spark.implicits._
    val raw = df.groupBy(col(domainCol)).agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect()
    raw.foreach { case (d, _) =>
      require(d != null, s"null $domainCol — filter or fill before allocating") }
    val counts = raw.sortBy(_._1)
    require(counts.nonEmpty, "no domains")
    counts.foreach { case (_, n) =>
      require(n <= Long.MaxValue / scale, s"n*scale overflows: $n * $scale") }
    val sd = counts.map { case (d, n) => (d, n, math.floor(math.sqrt((n * scale).toDouble)).toLong) }
    val den = sd.map(_._3).sum
    require(den > 0 && budget <= Long.MaxValue / den, "budget*den must fit int64")
    val base = sd.map { case (d, n, s) => (d, n, s, budget * s / den, budget * s % den) }
    val leftover = budget - base.map(_._4).sum
    // Remainder ties break by domain name in UTF-8 BYTE order (hex-encode
    // the bytes; their String order equals unsigned byte order) — JVM
    // String order is UTF-16 code units, which diverges from the DuckDB
    // oracle's UTF-8 collation for supplementary-plane domain names.
    def utf8Key(s: String): String =
      s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        .map(b => f"${b & 0xff}%02x").mkString
    val bump = base.sortBy { case (d, _, _, _, rem) => (-rem, utf8Key(d)) }
      .take(leftover.toInt).map(_._1).toSet
    val quotas = base.map { case (d, n, s, b, _) =>
      (d, n, s, b + (if (bump.contains(d)) 1L else 0L))
    }
    val quotaDf = quotas.toSeq.toDF(domainCol, "n_docs", "s_d", "quota")
    val w = Window.partitionBy(col(domainCol))
      .orderBy(coord(col(keyCol)), col(keyCol))
    val selAgg = df.select(col(domainCol), col(keyCol))
      .withColumn("__rn", row_number().over(w))
      .join(broadcast(quotaDf.select(col(domainCol), col("quota"))), domainCol)
      .filter(col("__rn") <= col("quota"))
      .groupBy(col(domainCol))
      .agg(count(lit(1)).as("n_sel"), sum(col(keyCol)).as("id_sum"))
    // left join from the quota table so a zero-quota domain still
    // reports its row (n_sel = 0) instead of vanishing
    quotaDf.join(selAgg, Seq(domainCol), "left")
      .select(col(domainCol), col("n_docs"), col("s_d"), col("quota"),
        coalesce(col("n_sel"), lit(0L)).as("n_sel"),
        coalesce(col("id_sum"), lit(0L)).as("id_sum"))
  }
}
