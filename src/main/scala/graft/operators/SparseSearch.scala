package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions, VectorParsers}
import graft.functions.VectorParsers.LearnedSparse

/**
 * Learned-sparse retrieval (SURVEY §2.6): the reference's sparse inverted
 * index (`NeuronDB/src/index/sparse_index.c`, SQL
 * `neurondb--1.0.sql:6710-6745`) and `sparse_search`
 * (`src/search/sparse_search.c`).
 *
 * The index is a posting-list DataFrame `(token, doc_id, weight)` —
 * partitioned by token at scale so a query's semi-join prunes to its own
 * tokens. Search = join on the query's tokens, per-doc
 * `sum(w_query · w_doc)` (the sparse dot product,
 * `neurondb--1.0.sql:6691-6707`), top-k.
 *
 * `splade_embed`/`colbertv2_embed` are ONNX-model paths in the reference
 * (`sparse_search.c:430+`); offline stand-in: deterministic term-hash
 * expansion [[termHashEmbed]] with BM25-ish weights — same shape
 * (`sparse_vector`), reproducible, no model.
 */
object SparseSearch {

  /** Build postings from a column of [[LearnedSparse]] structs
    * (`sparse_index_create`). Input df: (idCol, tokens array, weights array). */
  def buildIndex(df: DataFrame, idCol: String, tokensCol: String, weightsCol: String): DataFrame =
    df.select(col(idCol).as("doc_id"),
        explode(arrays_zip(col(tokensCol), col(weightsCol))).as("p"))
      .select(col("doc_id"), col(s"p.$tokensCol").as("token"), col(s"p.$weightsCol").as("weight"))

  /** The one scoring plan both search entry points share: posting-join on
    * the (tiny, broadcast) query, per-doc dot product, top-k. */
  private def scoreAgainst(postings: DataFrame, q: DataFrame, k: Int): DataFrame =
    postings
      .join(broadcast(q), "token")
      .groupBy("doc_id")
      .agg(sum(col("weight") * col("q_weight")).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)

  /** `sparse_index_search` / `sparse_search`: dot-product top-k via
    * posting-list join on the query's tokens only. */
  def search(postings: DataFrame, query: LearnedSparse, k: Int): DataFrame = {
    val spark = postings.sparkSession
    import spark.implicits._
    scoreAgainst(postings, query.tokens.zip(query.weights).toSeq.toDF("token", "q_weight"), k)
  }

  /** Term-keyed variant of [[search]] for raw-token postings (no hash
    * vocabulary): same plan, string terms as the join key. */
  def searchTerms(postings: DataFrame, query: Seq[(String, Double)], k: Int): DataFrame = {
    val spark = postings.sparkSession
    import spark.implicits._
    scoreAgainst(postings, query.toDF("token", "q_weight"), k)
  }

  /** Deterministic learned-sparse stand-in: token -> hash bucket in a
    * fixed vocab, weight = tf-damped (1 + ln(tf)). Same text ⇒ same
    * sparse vector, offline. */
  def termHashEmbed(text: String, vocabSize: Int = 30522, model: String = "SPLADE"): LearnedSparse = {
    val tf = TextFunctions.termFreqs(text)
    val buckets = scala.collection.mutable.Map.empty[Int, Double]
    tf.foreach { case (term, n) =>
      // the shared djb2 bucket — bit-identical to hfTokenize's vocabulary
      val bucket = TextFunctions.djb2Bucket(term, vocabSize)
      val w = 1.0 + math.log(n.toDouble)
      buckets(bucket) = buckets.getOrElse(bucket, 0.0) + w
    }
    val sorted = buckets.toArray.sortBy(_._1)
    LearnedSparse(vocabSize, model, sorted.map(_._1), sorted.map(_._2.toFloat))
  }

  val termHashEmbedUdf = udf((text: String) => {
    val s = termHashEmbed(text)
    (s.tokens, s.weights)
  })

  /** `splade_embed(text)` / `colbertv2_embed(text)`
    * (`neurondb--1.0.sql:6748-6775`): ONNX-model paths in the reference;
    * here the deterministic term-hash embedder tagged with the matching
    * model name, vocab 30522 (the BERT vocab size the reference uses). */
  def spladeEmbed(text: String): LearnedSparse = termHashEmbed(text, 30522, "SPLADE")
  def colbertv2Embed(text: String): LearnedSparse = termHashEmbed(text, 30522, "COLBERT")

  /** Corpus helper: documents -> (idCol, tokens, weights) learned-sparse columns. */
  def embedCorpus(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.withColumn("__sp", termHashEmbedUdf(col(textCol)))
      .select(col(idCol), col("__sp._1").as("sp_tokens"), col("__sp._2").as("sp_weights"))
}
