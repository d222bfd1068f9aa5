package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Embeddings

/**
 * RAG pipeline pieces (SURVEY §2.9): chunk → embed → retrieve.
 *
 * `neurondb.rag_query(q, table, vec_col, text_col, model, k)`
 * (`NeuronDB/neurondb--1.0.sql:6065-6089`) embeds the question and runs
 * kNN over the chunk embeddings; with `llm_fail_open` the embedder is the
 * deterministic djb2 fallback, which is what we use throughout.
 */
object Rag {

  /** `neurondb.chunk(doc, size, overlap)` exploded to one row per chunk. */
  def chunkDocuments(docs: DataFrame, idCol: String, textCol: String,
                     size: Int = 512, overlap: Int = 128): DataFrame =
    docs.select(col(idCol), posexplode(Embeddings.chunkUdf(col(textCol), lit(size), lit(overlap))))
      .withColumnRenamed("pos", "chunk_index")
      .withColumnRenamed("col", "chunk")

  /** Chunk + embed a corpus; the index side of rag_query. */
  def buildChunkIndex(docs: DataFrame, idCol: String, textCol: String,
                      model: String = "all-MiniLM-L6-v2",
                      size: Int = 512, overlap: Int = 128): DataFrame =
    chunkDocuments(docs, idCol, textCol, size, overlap)
      .withColumn("embedding", Embeddings.embed_text(col("chunk"), lit(model)))

  /** `rag_query`: embed the question, kNN over chunk embeddings.
    * `tieBreak` pins the k-cut among identical chunks (duplicate docs
    * produce identical embeddings, so exact distance ties are real). */
  def ragQuery(chunkIndex: DataFrame, question: String, k: Int = 5,
               model: String = "all-MiniLM-L6-v2",
               tieBreak: Seq[String] = Nil): DataFrame = {
    val qv = Embeddings.embedText(question, model)
    Knn.search(chunkIndex, "embedding", qv, k, "cosine", tieBreak = tieBreak)
  }

  /**
   * Embedding cache (`neurondb.embedding_cache`,
   * `neurondb--1.0.sql:3211-3222`; key hash `src/ml/embeddings.c:
   * 1104-1123`): keyed by (model, text-hash). As a DataFrame operation a
   * cache is a left join against previously computed rows; new texts get
   * embedded, the union is the refreshed cache.
   */
  def refreshEmbeddingCache(cache: DataFrame, texts: DataFrame, textCol: String,
                            model: String): DataFrame = {
    // NULL texts are unembeddable AND uncacheable (a NULL key never equals
    // anything, so the same row would be re-appended on every refresh);
    // the length prefix makes the key injective — model names contain ':'
    // (embedModality's "modality:model"), so sha2(model:text) alone lets
    // distinct (model, text) pairs collide onto one cache row
    val keyed = texts.select(col(textCol).as("text"))
      .filter(col("text").isNotNull)
      .distinct()
      .withColumn("cache_key", sha2(concat(
        lit(s"${model.length}:$model:"), col("text")), 256))
    val misses = keyed.join(cache.select("cache_key"), Seq("cache_key"), "left_anti")
      .withColumn("embedding", Embeddings.embed_text(col("text"), lit(model)))
      .withColumn("model_name", lit(model))
      .select("cache_key", "model_name", "text", "embedding")
    cache.unionByName(misses)
  }
}
