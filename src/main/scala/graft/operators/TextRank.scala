package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/**
 * TextRank keywords (Mihalcea & Tarau 2004): per-document PageRank
 * over the word co-occurrence graph — content words are nodes, words
 * within `window` positions of each other share an edge weighted by
 * co-occurrence count, and the stationary-ish score after a few power
 * iterations ranks the document's central vocabulary. The graph-based
 * complement to [[Rake]]'s frequency heuristic.
 *
 * Every number is an exact integer: scores live on the 10^6 grid with
 * the [[GraphAnalytics.pagerankInt]] floor-division convention
 * (per-node share = score // weighted-degree, damping 0.85), so the
 * oracle replays bit-for-bit — no float anywhere, including the final
 * ranking.
 *
 * Scale shape: tokenization is a stateless explode; the co-occurrence
 * self-join, degree aggregate, and every iteration's contribution
 * aggregate are all keyed by (doc, word) — corpus-parallel with
 * per-document graphs that are vocabulary-sized, never corpus-sized.
 */
object TextRank {

  def keywords(df: DataFrame, idCol: String, textCol: String,
               k: Int = 3, iterations: Int = 3, window: Int = 2): DataFrame = {
    require(k >= 1 && iterations >= 1 && window >= 1,
      s"bad dials: k=$k iters=$iterations window=$window")
    val stops = TextAnalysis.GopherStopwords.toSeq.sorted
    val toks = df.select(col(idCol).as("id"),
        posexplode(regexp_extract_all(lower(col(textCol)),
          lit("[a-z0-9]+"), lit(0))).as(Seq("pos", "w")))
      .filter(!col("w").isin(stops: _*))
      .withColumn("r", row_number().over(
        Window.partitionBy(col("id")).orderBy(col("pos"))).cast("long"))
      .select(col("id"), col("r"), col("w"))
    val a = toks.select(col("id"), col("r"), col("w"))
    val b = toks.select(col("id"), col("r").as("r2"), col("w").as("w2"))
    val pairs = a.join(b, Seq("id"))
      .filter(col("r2") > col("r") && col("r2") - col("r") <= window &&
        col("w") =!= col("w2"))
    val edges = pairs.select(col("id"), col("w").as("u"), col("w2").as("v"))
      .union(pairs.select(col("id"), col("w2").as("u"), col("w").as("v")))
      .groupBy(col("id"), col("u"), col("v"))
      .agg(count(lit(1)).as("wt"))
      .persist() // loop-invariant
    try {
      val wdeg = edges.groupBy(col("id"), col("u"))
        .agg(sum(col("wt")).as("wdeg"))
      val nodes = wdeg.select(col("id"), col("u").as("w"))
      var s = nodes.withColumn("score", lit(1000000L)).localCheckpoint(true)
      for (_ <- 1 to iterations) {
        val contrib = edges
          .join(s.select(col("id"), col("w").as("u"), col("score")),
            Seq("id", "u"))
          .join(wdeg, Seq("id", "u"))
          .select(col("id"), col("v").as("w"),
            (expr("score div wdeg") * col("wt")).as("c"))
          .groupBy(col("id"), col("w")).agg(sum(col("c")).as("c"))
        s = nodes.join(contrib, Seq("id", "w"), "left")
          .select(col("id"), col("w"),
            (lit(150000L) + expr("(850000 * coalesce(c, 0)) div 1000000"))
              .as("score"))
          .localCheckpoint(true)
      }
      s.withColumn("rnk", row_number().over(
          Window.partitionBy(col("id"))
            .orderBy(col("score").desc, col("w"))).cast("long"))
        .filter(col("rnk") <= k)
        .select(col("id").as(idCol), col("rnk"), col("w").as("keyword"),
          col("score").as("score_scaled"))
    } finally edges.unpersist()
  }

  /**
   * Extractive summarization — TextRank over SENTENCES (the second
   * half of Mihalcea & Tarau 2004): sentences are nodes, edge weight =
   * the number of distinct content words two sentences share (exact
   * integers — the classic log-length normalization is dropped so the
   * whole operator stays on the integer grid), and the top-`k`
   * PageRank sentences are the summary. Sentence unit here is the
   * naive terminator split (`[.!?]+`) — SQL-expressible on both
   * engines, unlike the abbreviation-aware [[Sentences.split]]; a
   * production pipeline can feed pre-split sentences instead.
   *
   * Emits (idCol, rnk, sent_idx, sentence, score_scaled) — top `k`
   * per document by (integer score desc, sentence index asc); every
   * number exact.
   */
  def summary(df: DataFrame, idCol: String, textCol: String,
              k: Int = 2, iterations: Int = 3): DataFrame = {
    require(k >= 1 && iterations >= 1, s"bad dials: k=$k iters=$iterations")
    val stops = TextAnalysis.GopherStopwords.toSeq.sorted
    val sents = df.select(col(idCol).as("id"),
        posexplode(split(col(textCol), "[.!?]+")).as(Seq("si", "raw")))
      .select(col("id"), col("si").cast("long").as("si"),
        trim(col("raw")).as("sent"))
      .filter(length(col("sent")) > 0)
    val words = sents.select(col("id"), col("si"),
        explode(regexp_extract_all(lower(col("sent")), lit("[a-z0-9]+"),
          lit(0))).as("w"))
      .filter(!col("w").isin(stops: _*))
      .distinct()
    val half = words.join(
        words.select(col("id"), col("si").as("sj"), col("w")),
        Seq("id", "w"))
      .filter(col("sj") > col("si"))
      .groupBy(col("id"), col("si"), col("sj"))
      .agg(count(lit(1)).as("wt"))
    val edges = half.select(col("id"), col("si").as("u"), col("sj").as("v"),
        col("wt"))
      .union(half.select(col("id"), col("sj").as("u"), col("si").as("v"),
        col("wt")))
      .persist()
    try {
      val wdeg = edges.groupBy(col("id"), col("u"))
        .agg(sum(col("wt")).as("wdeg"))
      val nodes = wdeg.select(col("id"), col("u"))
      var s = nodes.withColumn("score", lit(1000000L)).localCheckpoint(true)
      for (_ <- 1 to iterations) {
        val contrib = edges
          .join(s.select(col("id"), col("u"), col("score")), Seq("id", "u"))
          .join(wdeg, Seq("id", "u"))
          .select(col("id"), col("v").as("u"),
            (expr("score div wdeg") * col("wt")).as("c"))
          .groupBy(col("id"), col("u")).agg(sum(col("c")).as("c"))
        s = nodes.join(contrib, Seq("id", "u"), "left")
          .select(col("id"), col("u"),
            (lit(150000L) + expr("(850000 * coalesce(c, 0)) div 1000000"))
              .as("score"))
          .localCheckpoint(true)
      }
      s.withColumn("rnk", row_number().over(
          Window.partitionBy(col("id"))
            .orderBy(col("score").desc, col("u"))).cast("long"))
        .filter(col("rnk") <= k)
        .join(sents.select(col("id"), col("si").as("u"), col("sent")),
          Seq("id", "u"))
        .select(col("id").as(idCol), col("rnk"), col("u").as("sent_idx"),
          col("sent").as("sentence"), col("score").as("score_scaled"))
    } finally edges.unpersist()
  }
}
