package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Importance-based data SELECTION against a target domain (the DSIR
 * idea — Xie et al. 2023, "Data Selection for Language Models via
 * Importance Resampling"): fit hashed-unigram bag models of the TARGET
 * subset and the RAW corpus, score every document by how
 * target-enriched its tokens are, keep the top k.
 *
 * Two scores are computed per document:
 *
 *  - `score_int` — the SELECTION key: each hashed feature votes ±1 by
 *    the EXACT integer cross-multiplication sign of the smoothed
 *    enrichment ratio ((cT_f+1)·(Nc+B) vs (cC_f+1)·(Nt+B)), weighted by
 *    the doc's feature counts. Pure integer arithmetic end to end, so
 *    the top-k boundary can never flip on a float ulp (the repo's
 *    flake-proof-selection convention).
 *  - `logratio` — the canonical DSIR log importance weight
 *    Σ c_f·(ln p_f − ln q_f), emitted float4 per the libm convention;
 *    evidence, not the selection key.
 *
 * Scale shape: the feature models are B-row aggregates (B = 256
 * buckets — broadcast side); the corpus side is one token scan + a
 * broadcast join + one per-doc aggregate; selection is
 * TakeOrderedAndProject. No corpus-sized model, no second corpus pass.
 */
object Dsir {

  /** Hashed token feature: djb2 of the token mod B (exact, matches the
    * SQL oracle's djb2Fold chain). */
  private def bucketOf(b: Int) = udf { (t: String) =>
    (Sketches.djb2u(t) % b).toInt
  }

  /** Select the `k` most target-like docs. `targetFilter` marks the
    * target-domain subset (it stays part of the corpus for q).
    * Returns (idCol, score_int, n_toks, logratio float4) — top k by
    * score_int, ties to the smallest id. */
  def select(docs: DataFrame, idCol: String, textCol: String,
             targetFilter: org.apache.spark.sql.Column,
             k: Int, buckets: Int = 256): DataFrame = {
    require(k >= 1 && buckets >= 2, s"bad k=$k / buckets=$buckets")
    val toks = docs.select(col(idCol), targetFilter.as("__t"),
        explode(regexp_extract_all(lower(col(textCol)), lit("[a-z0-9]+"), lit(0))).as("tok"))
      .withColumn("f", bucketOf(buckets)(col("tok")))
    // ONE conditional aggregation fits both models — not a corpus pass
    // per model (the corpus count and the target count share the scan)
    val model = toks.groupBy("f").agg(
      count(lit(1)).as("cc"),
      sum(when(col("__t"), 1L).otherwise(0L)).as("ct"))
    val Array(nc, nt) = {
      val r = model.agg(sum("cc"), sum("ct")).head()
      Array(r.getLong(0), r.getLong(1))
    }
    val b = buckets.toLong
    val scored = model
      .withColumn("vote",
        when((col("ct") + 1L) * (nc + b) > (col("cc") + 1L) * (nt + b), lit(1L))
          .when((col("ct") + 1L) * (nc + b) < (col("cc") + 1L) * (nt + b), lit(-1L))
          .otherwise(lit(0L)))
      .withColumn("lr",
        log((col("ct") + 1L).cast("double") / (nt + b).toDouble) -
          log((col("cc") + 1L).cast("double") / (nc + b).toDouble))
    toks.join(broadcast(scored.select("f", "vote", "lr")), "f")
      .groupBy(col(idCol))
      .agg(sum(col("vote")).as("score_int"),
        count(lit(1)).as("n_toks"),
        sum(col("lr")).cast("float").as("logratio"))
      .orderBy(col("score_int").desc, col(idCol))
      .limit(k)
  }
}
