package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/**
 * RAKE keyword extraction (Rose et al. 2010 — Rapid Automatic Keyword
 * Extraction): candidate phrases are the maximal runs of non-stopword
 * tokens between stopword/punctuation boundaries; each word scores
 * deg(w)/freq(w) (deg = total size of the phrases its instances sit
 * in, freq = instance count) and a phrase scores the sum of its words'
 * scores — long multi-word technical phrases rise, glue words drop.
 * The classic zero-model keyword stage of a curation pipeline.
 *
 * Composed entirely from codegen'd expressions (two posexplodes, one
 * boundary-counting window, three hash aggregates, one rank window) —
 * zero UDFs, so the DuckDB oracle replays the identical algebra.
 * Phrase boundaries: any non-[a-z0-9 ] character ends a phrase (the
 * punctuation rule) and so does any stopword (the stoplist rule —
 * [[TextAnalysis.GopherStopwords]], the repo's shared English list).
 *
 * Scale shape: stateless per-document explode, shuffles keyed by
 * (doc, word) and (doc, phrase) — corpus-parallel, no cross-document
 * state; word scores are per-document, as RAKE defines them.
 *
 * Emits one row per kept phrase rank: (idCol, rnk, phrase, score) —
 * top `k` per document by (float4 score desc, phrase asc); score is
 * float4 because the per-phrase sum is an unordered double aggregate.
 */
object Rake {

  def keywords(df: DataFrame, idCol: String, textCol: String,
               k: Int = 3): DataFrame = {
    require(k >= 1, s"k $k")
    val stops = TextAnalysis.GopherStopwords.toSeq.sorted
    val segs = df.select(col(idCol).as("id"),
        posexplode(split(lower(col(textCol)), "[^a-z0-9 ]+"))
          .as(Seq("si", "seg")))
    val toks = segs.select(col("id"), col("si"),
        posexplode(filter(split(col("seg"), " +"), w => w =!= ""))
          .as(Seq("wi", "w")))
      .withColumn("stop", col("w").isin(stops: _*))
    val byPos = Window.partitionBy(col("id"))
      .orderBy(col("si"), col("wi"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val kept = toks
      .withColumn("grp", sum(col("stop").cast("long")).over(byPos))
      .filter(!col("stop"))
      .select(col("id"), col("si"), col("grp"), col("wi"), col("w"))
    val phrases = kept
      .groupBy(col("id"), col("si"), col("grp"))
      .agg(count(lit(1)).as("plen"),
        array_join(transform(
          array_sort(collect_list(struct(col("wi"), col("w")))),
          s => s.getField("w")), " ").as("phrase"))
    val wordStats = kept
      .join(phrases.select(col("id"), col("si"), col("grp"), col("plen")),
        Seq("id", "si", "grp"))
      .groupBy(col("id"), col("w"))
      .agg(count(lit(1)).as("freq"), sum(col("plen")).as("deg"))
    val scored = kept
      .join(wordStats, Seq("id", "w"))
      .groupBy(col("id"), col("si"), col("grp"))
      .agg(sum(col("deg").cast("double") / col("freq").cast("double"))
        .cast("float").as("score"))
      .join(phrases, Seq("id", "si", "grp"))
      // classic RAKE ranks UNIQUE candidate phrases (identical phrase
      // text scores identically — same word multiset — so the dedupe
      // is a plain group-by, and a phrase the document repeats cannot
      // fill several top-k slots with copies of itself)
      .groupBy(col("id"), col("phrase"))
      .agg(max(col("score")).as("score"))
    val rank = Window.partitionBy(col("id"))
      .orderBy(col("score").desc, col("phrase"))
    scored
      .withColumn("rnk", row_number().over(rank).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("id").as(idCol), col("rnk"), col("phrase"), col("score"))
  }
}
