package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Token-level feature selection for corpus classifiers — the mutual
 * information between a token's document presence and a binary label,
 * the standard pre-step before training a fastText-style quality /
 * domain classifier (pick the top-MI vocabulary, drop the rest).
 *
 * Reference surface: the reference trains classifiers model-side; the
 * MI ranking is the public textbook method (Manning et al., IIR
 * ch. 13.5.1 — the four-cell presence/label decomposition).
 *
 * Scale shape: one explode to (token, label) presence pairs, ONE
 * two-phase groupBy on the token, and a broadcast of the single
 * totals row — the corpus shuffles once, keyed by token, and the
 * output is vocabulary-sized.
 */
object FeatureSelect {

  /** One cell's contribution (nij/N) * ln(N*nij / (rowTot*colTot));
    * empty cells contribute zero (the x·ln(x) → 0 limit). */
  private def cell(nij: Column, rowTot: Column, colTot: Column,
                   n: Column): Column =
    when(nij > 0,
      (nij.cast("double") / n) *
        log((n * nij.cast("double")) / (rowTot.cast("double") * colTot)))
      .otherwise(lit(0.0))

  /** Per-token mutual information with a binary label over DISTINCT
    * per-document presence (a token counts once per document). Tokens
    * in fewer than `minDocs` documents are dropped (their MI estimate
    * is noise). Emits (token, n_docs, n_pos, mi float4). */
  def tokenLabelMi(df: DataFrame, idCol: String, textCol: String,
                   labelCol: String, minDocs: Int = 5): DataFrame = {
    val spark = df.sparkSession
    val clean = df.filter(col(textCol).isNotNull && col(labelCol).isNotNull)
    val toks = array_distinct(
      filter(split(lower(col(textCol)), "\\s+"), t => length(t) > 0))
    val pairs = clean.select(explode(toks).as("token"),
      col(labelCol).cast("long").as("y"))
    val totals = broadcast(clean.agg(
      count(lit(1)).as("__N"),
      sum(col(labelCol).cast("long")).as("__N1")))
    pairs.groupBy(col("token"))
      .agg(count(lit(1)).as("n_docs"), sum(col("y")).as("n_pos"))
      .filter(col("n_docs") >= minDocs)
      .crossJoin(totals)
      .select(col("token"), col("n_docs"), col("n_pos"), {
        val n = col("__N").cast("double")
        val n11 = col("n_pos")
        val n10 = col("n_docs") - col("n_pos")
        val n01 = col("__N1") - col("n_pos")
        val n00 = col("__N") - col("__N1") - n10
        val present = col("n_docs")
        val absent = col("__N") - col("n_docs")
        val c1 = col("__N1").cast("double")
        val c0 = (col("__N") - col("__N1")).cast("double")
        (cell(n11, present, c1, n) + cell(n10, present, c0, n) +
          cell(n01, absent, c1, n) + cell(n00, absent, c0, n))
          .cast("float").as("mi")
      })
  }
}
