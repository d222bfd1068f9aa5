package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Topic-shift chunking — the RAG splitting upgrade over fixed-width
 * chunks ([[Rag]] chunk_text): open a new chunk where the lexical
 * cohesion between adjacent sentences drops (the TextTiling idea,
 * Hearst 1997, with single-sentence blocks and distinct-token Jaccard
 * as the cohesion signal). Sentence policy here is the simple literal
 * ". " split so the whole pipeline stays replayable; a production
 * caller feeds [[Sentences]] output instead.
 *
 * Scale shape: one posexplode, one self-equi-join on (doc, idx-1) for
 * the previous sentence, one doc-partitioned running sum — everything
 * co-partitioned on the document key, per-doc cost bounded by the
 * sentence count.
 */
object SemanticChunk {

  /** Per-sentence chunk assignment: (id, sent_idx, cohesion, boundary,
    * chunk_id) with cohesion = Jaccard of distinct lowercase tokens
    * against the PREVIOUS sentence (NULL for the first), boundary
    * where cohesion < tau, chunk_id the 1-based running boundary
    * count. */
  def chunk(df: DataFrame, idCol: String, textCol: String,
            tau: Double = 0.2): DataFrame = {
    require(tau > 0 && tau < 1, s"tau $tau")
    val toks = array_distinct(filter(
      split(lower(col("__s")), "[ \t\n\r]+"), t => length(t) > 0))
    val sents = df.filter(col(textCol).isNotNull)
      .select(col(idCol), posexplode(split(col(textCol), "\\. "))
        .as(Seq("sent_idx", "__s")))
      .select(col(idCol), col("sent_idx").cast("long").as("sent_idx"),
        toks.as("__t"))
    val prev = sents.select(col(idCol),
      (col("sent_idx") + 1).as("sent_idx"), col("__t").as("__p"))
    val inter = size(filter(col("__t"), x => array_contains(col("__p"), x)))
    val uni = size(col("__t")) + size(col("__p")) - inter
    val joined = sents.join(prev, Seq(idCol.toString, "sent_idx"), "left")
      .withColumn("cohesion",
        when(col("__p").isNull, lit(null).cast("double"))
          .otherwise(when(uni > 0,
            round(inter.cast("double") / uni.cast("double"), 6))
            .otherwise(0.0)))
      .withColumn("boundary",
        col("cohesion").isNull || col("cohesion") < tau)
    val run = Window.partitionBy(col(idCol)).orderBy(col("sent_idx"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    joined
      .withColumn("chunk_id",
        sum(when(col("boundary"), 1L).otherwise(0L)).over(run))
      .select(col(idCol), col("sent_idx"), col("cohesion"),
        col("boundary"), col("chunk_id"))
  }
}
