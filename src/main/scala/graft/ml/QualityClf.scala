package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/**
 * Model-based quality/domain CLASSIFIER filtering — the fastText-style
 * linear classifier over hashed bag-of-words features that CCNet, GPT-3
 * ("quality classifier"), LLaMA and DCLM use to score web documents
 * against a curated-looking positive class. The reference ships no such
 * classifier; it is part of the training-data north star (SURVEY §2 /
 * BASELINE pipeline ops) alongside the perplexity filter
 * ([[graft.operators.LmFilter]]) — that one scores documents by an
 * n-gram LM, this one by a DISCRIMINATIVE model trained on labels.
 *
 * Model: logistic regression, w ∈ R^d + bias, zero-initialized
 * (convex — no seed stream needed), trained by full-batch gradient
 * descent for a fixed epoch count.
 *
 * Features per document: words = lowercased `[a-z0-9]+` runs; bucket
 * j = djb2(word) mod d ([[TextFunctions.djb2Bucket]], the repo-wide
 * term hash); x_j = count_j / total_words (0-vector for empty docs).
 *
 * Scale shape: features are computed ONCE and persisted; each epoch is
 * one broadcast of the (d+1)-cell model and ONE unordered (d+1)-cell
 * gradient aggregation with map-side partials — the corpus never
 * shuffles. At 100 TB that is `epochs` scans of a cached projection,
 * the standard full-batch shape (production would subsample the
 * training slice; the scoring pass is a single stateless map either
 * way).
 *
 * Oracle contract (fixpoint-family conventions, SCALING.md):
 * per-row dot products fold left-to-right in coordinate order
 * (`list_reduce` order), gradients are plain unordered sums
 * (~1e-15/epoch cross-engine drift), and scores pass through
 * `exp` (libm) so outputs are emitted float4 on both sides.
 */
object QualityClf {

  @inline private def sigmoid(a: Double): Double = 1.0 / (1.0 + math.exp(-a))

  // (r16: the r15 GradSum udaf is gone — both trainScore and
  // cartography run their epochs as treeAggregate over a cached
  // primitive RDD with the identical seqOp/combOp arithmetic, each
  // epoch shipping a fresh model clone in its closure.)

  /** Hashed-BoW feature vector; exactly mirrors the SQL in [[oracleSql]]. */
  private def features(text: String, d: Int): Array[Double] = {
    val out = new Array[Double](d)
    if (text == null) return out
    val m = java.util.regex.Pattern.compile("[a-z0-9]+").matcher(text.toLowerCase)
    var total = 0
    while (m.find()) {
      out(TextFunctions.djb2Bucket(m.group(), d)) += 1.0
      total += 1
    }
    if (total > 0) { var j = 0; while (j < d) { out(j) /= total; j += 1 } }
    out
  }

  /**
   * Train on every row of `df` (label = `labelSql` as 0/1 double) and
   * return (idCol, label BIGINT, score float) — score is the trained
   * model's P(label=1) per document. One frame so the whole train+score
   * contract sits under a single oracle.
   */
  def trainScore(df: DataFrame, idCol: String, textCol: String,
                 labelCol: org.apache.spark.sql.Column,
                 d: Int = 16, epochs: Int = 8, lr: Double = 4.0): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // r15 (guide §1.2): the epoch loop runs on a cached PRIMITIVE RDD
    // via treeAggregate — the MLlib gradient-descent shape. The pre-r15
    // loop built a fresh Dataset plan per epoch (required for
    // correctness: a reused Dataset object reuses its SHUFFLE STAGE
    // across jobs, serving stale epoch-1 map outputs — the
    // KmeansFixpoint/AeFixpoint convention), which charged ~60-100 ms
    // of analysis/optimization/codegen-lookup DRIVER time per epoch —
    // the dominant cost once the gradient itself is a (d+1)-cell
    // aggregate over a cached projection. An RDD aggregate has no plan
    // to build and no shuffle to stale-reuse: each epoch is one bare
    // job whose closure ships the CURRENT model values (task closures
    // re-serialize per job), so the hazard the `def`-plan convention
    // guards against does not exist on this path. Per-partition
    // accumulation order and the unordered partition merge are the
    // SAME drift class as the previous udaf (absorbed by the float4
    // emit; re-proven against the oracle at 3 SFs).
    val featUdf = udf((t: String) => features(t, d))
    val base = df.select(col(idCol).cast("long").as("id"),
        labelCol.cast("double").as("y"), featUdf(col(textCol)).as("xs"))
      .as[(Long, Double, Array[Double])].rdd
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val n = base.count()
      val model = new Array[Double](d + 1) // w(0..d-1) ++ bias
      for (_ <- 1 to epochs) {
        // fresh closure per epoch captures the current model snapshot
        val w = model.clone()
        val sums = base.treeAggregate(new Array[Double](d + 1))(
          seqOp = (b, row) => {
            val xs = row._3
            var z = 0.0
            var j = 0
            while (j < d) { z += w(j) * xs(j); j += 1 }
            val r = sigmoid(z + w(d)) - row._2
            j = 0
            while (j < d) { b(j) += r * xs(j); j += 1 }
            b(d) += r
            b
          },
          combOp = (a, b) => {
            var j = 0
            while (j <= d) { a(j) += b(j); j += 1 }
            a
          })
        var j = 0
        while (j < d) { model(j) -= lr * (sums(j) / n); j += 1 }
        model(d) -= lr * (sums(d) / n)
      }
      // scoring: one stateless pass over the same cached features; the
      // result is materialized by createDataFrame + localCheckpoint
      // BEFORE unpersist (AeFixpoint contract)
      val wFinal = model.clone()
      val scored = base.map { case (id, y, xs) =>
        var z = 0.0
        var j = 0
        while (j < d) { z += wFinal(j) * xs(j); j += 1 }
        (id, y.toLong, sigmoid(z + wFinal(d)).toFloat)
      }.toDF(idCol, "label", "score")
      scored.localCheckpoint(true)
    } finally base.unpersist()
  }

  // ------------------------------------------------------------------
  // DuckDB unroll
  // ------------------------------------------------------------------

  /** djb2 fold over UTF-8/ASCII codepoints, 32-bit wrap — same SQL form
    * as the rag/simhash oracles. */
  private def djb2Sql(strExpr: String): String = {
    val bytes =
      s"list_transform(range(1, length($strExpr) + 1), i -> CAST(unicode($strExpr[i]) AS BIGINT))"
    s"list_reduce(list_prepend(CAST(5381 AS BIGINT), $bytes), " +
      "(h, c) -> xor((h * 33) % 4294967296, c))"
  }

  /** Epoch-unrolled training + scoring for DuckDB; must mirror
    * [[trainScore]] bit-for-bit up to unordered-sum drift. */
  def oracleSql(table: String, idCol: String, textCol: String,
                labelSql: String, d: Int, epochs: Int, lr: Double): String =
    trainChainSql(table, idCol, textCol, labelSql, d, epochs, lr) +
      s"""
      |SELECT x.id AS $idCol, CAST(x.y AS BIGINT) AS label,
      |  CAST(1.0 / (1.0 + exp(-(list_reduce(list_prepend(0.0,
      |    list_transform(range(1, ${d + 1}), j -> w.l[j] * x.xs[j])),
      |    (a, b) -> a + b) + b.v))) AS REAL) AS score
      |FROM xs x, (SELECT list(v ORDER BY j) AS l FROM w_$epochs) w, b_$epochs b""".stripMargin

  /** The shared epoch-unrolled GD chain (docs → features → w_e/b_e per
    * epoch), ending inside the WITH list so callers append their own
    * final SELECT (and, for [[cartographySql]], per-epoch score CTEs). */
  private def trainChainSql(table: String, idCol: String, textCol: String,
                            labelSql: String, d: Int, epochs: Int, lr: Double): String = {
    val sb = new StringBuilder
    sb ++= s"""WITH docs AS MATERIALIZED (
      |  SELECT $idCol AS id, CAST($labelSql AS DOUBLE) AS y,
      |    regexp_extract_all(lower($textCol), '[a-z0-9]+') AS ws
      |  FROM $table),
      |wb AS MATERIALIZED (
      |  SELECT id, CAST(${djb2Sql("w")} % $d AS INTEGER) AS j
      |  FROM (SELECT id, unnest(ws) AS w FROM docs)),
      |cnt AS MATERIALIZED (SELECT id, j, count(*)::DOUBLE AS c FROM wb GROUP BY id, j),
      |tot AS MATERIALIZED (SELECT id, count(*)::DOUBLE AS t FROM wb GROUP BY id),
      |xs AS MATERIALIZED (
      |  SELECT d.id, d.y, list(
      |    CASE WHEN coalesce(t.t, 0) = 0 THEN 0.0
      |         ELSE coalesce(c.c, 0.0) / t.t END ORDER BY r.j) AS xs
      |  FROM docs d
      |  CROSS JOIN range(0, $d) r(j)
      |  LEFT JOIN cnt c ON c.id = d.id AND c.j = r.j
      |  LEFT JOIN tot t ON t.id = d.id
      |  GROUP BY d.id, d.y),
      |nn AS MATERIALIZED (SELECT count(*) AS n FROM xs),
      |w_0 AS MATERIALIZED (SELECT CAST(j AS INTEGER) AS j, 0.0 AS v FROM range(0, $d) t(j)),
      |b_0 AS MATERIALIZED (SELECT 0.0 AS v)""".stripMargin
    for (e <- 1 to epochs) {
      val p = e - 1
      sb ++= s""",
        |wl_$e AS MATERIALIZED (SELECT list(v ORDER BY j) AS l FROM w_$p),
        |r_$e AS MATERIALIZED (
        |  SELECT x.id, x.y, x.xs,
        |    1.0 / (1.0 + exp(-(list_reduce(list_prepend(0.0,
        |      list_transform(range(1, ${d + 1}), j -> w.l[j] * x.xs[j])),
        |      (a, b) -> a + b) + b.v))) - x.y AS r
        |  FROM xs x, wl_$e w, b_$p b),
        |g_$e AS MATERIALIZED (
        |  SELECT rr.j, sum(t.r * t.xs[rr.j + 1]) AS g
        |  FROM r_$e t CROSS JOIN range(0, $d) rr(j) GROUP BY rr.j),
        |w_$e AS MATERIALIZED (
        |  SELECT w.j, w.v - $lr * (g.g / (SELECT n FROM nn)) AS v
        |  FROM w_$p w JOIN g_$e g ON g.j = w.j),
        |b_$e AS MATERIALIZED (
        |  SELECT b.v - $lr * ((SELECT sum(r) FROM r_$e) / (SELECT n FROM nn)) AS v
        |  FROM b_$p b)""".stripMargin
    }
    sb.toString
  }

  /**
   * Dataset cartography (Swayamdipta et al., EMNLP 2020): training
   * dynamics as a curation map. Train the same GD classifier, but
   * snapshot the model after EVERY epoch and score each example under
   * all `epochs` snapshots:
   *   confidence  = mean_e P_e(gold label)   (easy-to-learn when high)
   *   variability = population std of those  (ambiguous when high)
   *   correct     = #epochs the argmax matches gold (hard when low)
   * Low-confidence low-variability examples are the classic
   * mislabel/outlier region; high-variability ones are the
   * most-informative training subset.
   *
   * Scale shape: identical to [[trainScore]] — `epochs` scans of the
   * cached feature projection for training, then ONE stateless scoring
   * pass carrying all snapshots (epochs × (d+1) doubles) in the task
   * closure. Probability chains pass through exp (libm), so the two
   * float stats emit float4; `correct` thresholds the float4-CAST
   * probability at 0.5 on both sides (the drifted double rounds to
   * the same float on both engines away from float4 boundaries).
   */
  def cartography(df: DataFrame, idCol: String, textCol: String,
                  labelCol: org.apache.spark.sql.Column,
                  d: Int = 16, epochs: Int = 6, lr: Double = 4.0): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // r16 (ADVICE r15): the epoch loop is the [[trainScore]]
    // treeAggregate over a cached primitive RDD — each epoch's closure
    // ships a FRESH model snapshot (`w = model.clone()`), so nothing
    // depends on Spark re-serializing one shared mutable Aggregator
    // instance per job (the hazard ADVICE flagged on the r15 udaf
    // form), and the per-epoch SQL plan build (~60-100 ms driver time
    // per epoch) is gone — the same device that took quality_clf
    // 3.4 s → 0.6 s in r15. seqOp/combOp are the old GradSum
    // reduce/merge verbatim: same double ops, same order, same
    // unordered partition-merge drift class (absorbed by the float4
    // emit; data_map re-proven against the oracle).
    val featUdf = udf((t: String) => features(t, d))
    val base = df.select(col(idCol).cast("long").as("id"),
        labelCol.cast("double").as("y"), featUdf(col(textCol)).as("xs"))
      .as[(Long, Double, Array[Double])].rdd
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val n = base.count()
      val model = new Array[Double](d + 1)
      val snaps = Array.ofDim[Double](epochs, d + 1)
      for (e <- 0 until epochs) {
        val w = model.clone() // fresh closure per epoch
        val sums = base.treeAggregate(new Array[Double](d + 1))(
          seqOp = (b, row) => {
            val xs = row._3
            var z = 0.0
            var j = 0
            while (j < d) { z += w(j) * xs(j); j += 1 }
            val r = sigmoid(z + w(d)) - row._2
            j = 0
            while (j < d) { b(j) += r * xs(j); j += 1 }
            b(d) += r
            b
          },
          combOp = (a, b) => {
            var j = 0
            while (j <= d) { a(j) += b(j); j += 1 }
            a
          })
        var j = 0
        while (j < d) { model(j) -= lr * (sums(j) / n); j += 1 }
        model(d) -= lr * (sums(d) / n)
        System.arraycopy(model, 0, snaps(e), 0, d + 1)
      }
      // one stateless scoring pass under all snapshots (epochs × (d+1)
      // doubles in the task closure), same arithmetic as the r15 UDF
      val scored = base.map { case (id, y, xs) =>
        val pg = new Array[Double](epochs)
        var correct = 0L
        var e = 0
        while (e < epochs) {
          val w = snaps(e)
          var z = 0.0
          var j = 0
          while (j < d) { z += w(j) * xs(j); j += 1 }
          val p = sigmoid(z + w(d))
          pg(e) = if (y == 1.0) p else 1.0 - p
          // compare the float4-CAST probability: both engines round the
          // drifted double to the same float unless it sits within the
          // drift of a float4 boundary — strictly tighter than comparing
          // raw doubles against 0.5 across engines
          if ((p.toFloat > 0.5f) == (y == 1.0)) correct += 1
          e += 1
        }
        var s = 0.0
        e = 0
        while (e < epochs) { s += pg(e); e += 1 }
        val conf = s / epochs
        var v = 0.0
        e = 0
        while (e < epochs) { v += (pg(e) - conf) * (pg(e) - conf); e += 1 }
        (id, y.toLong, conf.toFloat, math.sqrt(v / epochs).toFloat, correct)
      }.toDF(idCol, "label", "confidence", "variability", "correct")
      scored.localCheckpoint(true)
    } finally base.unpersist()
  }

  /** Epoch-unrolled cartography oracle: the [[trainChainSql]] chain
    * plus one score CTE per snapshot and a left-associated fold over
    * the per-epoch gold probabilities — the same evaluation order as
    * the scoring udf, so only libm/unordered-sum drift remains (float4
    * emits absorb it; `correct` is exact). */
  def cartographySql(table: String, idCol: String, textCol: String,
                     labelSql: String, d: Int, epochs: Int, lr: Double): String = {
    val score = (e: Int) =>
      s""",
         |p_$e AS MATERIALIZED (
         |  SELECT x.id, x.y,
         |    1.0 / (1.0 + exp(-(list_reduce(list_prepend(0.0,
         |      list_transform(range(1, ${d + 1}), j -> w.l[j] * x.xs[j])),
         |      (a, b) -> a + b) + b.v))) AS p
         |  FROM xs x, (SELECT list(v ORDER BY j) AS l FROM w_$e) w, b_$e b)"""
        .stripMargin
    val pgCols = (1 to epochs).map(e =>
      s"CASE WHEN p_1.y = 1.0 THEN p_$e.p ELSE 1.0 - p_$e.p END AS pg$e," +
        s" p_$e.p AS pp$e").mkString(",\n    ")
    val joins = (2 to epochs).map(e => s"JOIN p_$e ON p_$e.id = p_1.id")
      .mkString(" ")
    val pgSum = (1 to epochs).map(e => s"pg$e").mkString(" + ")
    val varSum = (1 to epochs).map(e => s"(pg$e - conf) * (pg$e - conf)")
      .mkString(" + ")
    val correct = (1 to epochs).map(e =>
      s"CASE WHEN (CAST(pp$e AS REAL) > 0.5) = (y = 1.0) THEN 1 ELSE 0 END")
      .mkString(" + ")
    trainChainSql(table, idCol, textCol, labelSql, d, epochs, lr) +
      (1 to epochs).map(score).mkString +
      s""",
      |jj AS MATERIALIZED (
      |  SELECT p_1.id, p_1.y,
      |    $pgCols
      |  FROM p_1 $joins),
      |cc AS MATERIALIZED (
      |  SELECT jj.*, ($pgSum) / $epochs.0 AS conf FROM jj)
      |SELECT id AS $idCol, CAST(y AS BIGINT) AS label,
      |  CAST(conf AS REAL) AS confidence,
      |  CAST(sqrt(($varSum) / $epochs.0) AS REAL) AS variability,
      |  CAST($correct AS BIGINT) AS correct
      |FROM cc""".stripMargin
  }
}
