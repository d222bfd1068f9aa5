package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{Embeddings, TextFunctions, VectorOps}

/**
 * Unified LLM facade (SURVEY §2.9): `neurondb.llm(op, params)` and the
 * `ndb_llm_*` family (`NeuronDB/neurondb--1.0.sql:5159,3766-3838`).
 *
 * The reference routes these to HTTP providers; under `llm_fail_open` it
 * degrades to deterministic local computation. This engine is zero-egress
 * by design, so ONLY the deterministic degraded path exists: `embed` is
 * the djb2 fallback embedder, `rerank` is fallback-embedding cosine, and
 * `complete` is an explicitly-marked deterministic STUB (fingerprint-tagged
 * echo) — the plumbing (dispatch, batching, caching) is real, the language
 * model is not.
 */
object Llm {

  /** Deterministic pseudo-completion: prompt-derived, reproducible, and
    * unmistakably not a language model. */
  def complete(prompt: String, model: String = "stub"): String = {
    val fp = graft.functions.TextAnalysis.fingerprint(if (prompt == null) "" else prompt)
    val headTokens = TextFunctions.tokenize(prompt).take(8).mkString(" ")
    s"[stub-completion model=$model fp=$fp] $headTokens"
  }

  def embed(text: String, model: String = "all-MiniLM-L6-v2"): Array[Float] =
    Embeddings.embedText(text, model)

  def rerank(query: String, doc: String, model: String = "all-MiniLM-L6-v2"): Double =
    try 1.0 - VectorOps.cosineDistance(Embeddings.embedText(query, model),
      Embeddings.embedText(doc, model))
    catch { case _: IllegalArgumentException => 0.0 }

  /** `neurondb.llm(op, params)` dispatch. Params are the reference's
    * JSONB keys as a Map. */
  def llm(op: String, params: Map[String, String]): Any = op match {
    case "complete" => complete(params.getOrElse("prompt", ""), params.getOrElse("model", "stub"))
    case "embed"    => embed(params.getOrElse("text", ""), params.getOrElse("model", "all-MiniLM-L6-v2"))
    case "rerank"   => rerank(params.getOrElse("query", ""), params.getOrElse("doc", ""),
      params.getOrElse("model", "all-MiniLM-L6-v2"))
    case other => throw new IllegalArgumentException(s"unknown llm op: $other")
  }

  val completeUdf = udf((p: String, m: String) => complete(p, m))
  val rerankUdf = udf((q: String, d: String) => rerank(q, d))

  def register(spark: SparkSession): Unit = {
    spark.udf.register("ndb_llm_complete", completeUdf)
    spark.udf.register("ndb_llm_rerank", rerankUdf)
  }
}
