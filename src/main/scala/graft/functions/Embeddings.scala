package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

/**
 * Deterministic text-embedding fallback + chunking.
 *
 * `embedText` reproduces the reference's network-free fallback exactly
 * (`NeuronDB/src/ml/embeddings.c:399-441`, active under
 * `neurondb.llm_fail_open=on`): a djb2-xor hash of the input text is
 * evolved per-dimension by hashing the model name (or the dimension index
 * when no model is given), each step emitting
 * `((hash % 2000) - 1000) / 1000 ∈ [-1, 0.999]`.
 *
 * This is the only embedding path that is reproducible offline, so it is
 * the basis for every embedding-dependent operator (hybrid search, RAG,
 * near-dup detection) in this engine. Real providers (HF HTTP / ONNX in the
 * reference) are out of scope by design — callers can substitute any
 * `Array[Float]`-producing UDF.
 */
object Embeddings {

  final val DefaultDim = 384

  /** djb2-xor over the UTF-8 bytes, 32-bit unsigned wraparound. */
  @inline private def djb2(hash: Int, b: Int): Int = ((hash << 5) + hash) ^ (b & 0xFF)

  def embedText(text: String, model: String, dim: Int = DefaultDim): Array[Float] = {
    require(dim >= 1, s"embedding dimension must be positive, got $dim")
    var hash = 5381
    val bytes = (if (text == null) "" else text).getBytes("UTF-8")
    var j = 0
    while (j < bytes.length) { hash = djb2(hash, bytes(j)); j += 1 }
    val modelBytes = if (model == null) Array.emptyByteArray else model.getBytes("UTF-8")
    val out = new Array[Float](dim)
    var i = 0
    while (i < dim) {
      hash =
        if (modelBytes.nonEmpty) djb2(hash, modelBytes(i % modelBytes.length))
        else djb2(hash, i)
      // unsigned 32-bit modulo, then shift to [-1000, 999] / 1000
      val u = hash.toLong & 0xFFFFFFFFL
      out(i) = ((u % 2000L) - 1000L).toFloat / 1000.0f
      i += 1
    }
    out
  }

  val embedTextUdf: UserDefinedFunction =
    udf((text: String, model: String) => embedText(text, model))
  val embedTextDimUdf: UserDefinedFunction =
    udf((text: String, model: String, dim: Int) => embedText(text, model, dim))

  def embed_text(text: Column, model: Column): Column = embedTextUdf(text, model)

  /**
   * Fixed-size character chunking with overlap; stride = size - overlap
   * (`NeuronDB/neurondb--1.0.sql:6032-6062`). Returns the list of chunks;
   * callers `posexplode` to get (chunk_index, chunk).
   */
  def chunkText(doc: String, size: Int = 512, overlap: Int = 128): Seq[String] = {
    require(size > 0, "chunk size must be positive")
    require(overlap >= 0 && overlap < size, "overlap must be in [0, size)")
    if (doc == null || doc.isEmpty) Seq.empty
    else {
      val stride = size - overlap
      val out = Seq.newBuilder[String]
      var start = 0
      while (start < doc.length) {
        out += doc.substring(start, math.min(start + size, doc.length))
        start += stride
      }
      out.result()
    }
  }

  val chunkUdf: UserDefinedFunction =
    udf((doc: String, size: Int, overlap: Int) => chunkText(doc, size, overlap))

  /** `embed_text_batch` (`neurondb--1.0.sql:712`): batch form — in Spark
    * the set-orientation is the DataFrame itself, but the array form is
    * kept for API parity. */
  def embedTextBatch(texts: Seq[String], model: String): Seq[Array[Float]] =
    texts.map(embedText(_, model))

  /** Modality-keyed fallbacks: `embed_image` / `embed_multimodal` /
    * `clip_embed(input, modality)` / `imagebind_embed`
    * (`neurondb--1.0.sql:717-747,6915-6948`) — the deterministic fallback
    * keyed by modality+model, as the reference does when providers are
    * unavailable (SURVEY §2.9). */
  def embedModality(input: String, modality: String, model: String): Array[Float] =
    embedText(input, s"$modality:$model")

  val embedImageUdf: UserDefinedFunction =
    udf((input: String, model: String) => embedModality(input, "image", model))
  val clipEmbedUdf: UserDefinedFunction =
    udf((input: String, modality: String) => embedModality(input, modality, "clip"))
  val imagebindEmbedUdf: UserDefinedFunction =
    udf((input: String, modality: String) => embedModality(input, modality, "imagebind"))

  /** `neurondb.detokenize`: whitespace join, inverse of the simple
    * tokenizer (`neurondb--1.0.sql:5117-5466`). */
  def detokenize(tokens: Seq[String]): String =
    if (tokens == null) "" else tokens.mkString(" ")

  val detokenizeUdf: UserDefinedFunction = udf((t: Seq[String]) => detokenize(t))

  def register(spark: SparkSession): Unit = {
    spark.udf.register("embed_text", embedTextUdf)
    spark.udf.register("embed_text_dim", embedTextDimUdf)
    spark.udf.register("chunk_text", chunkUdf)
    spark.udf.register("embed_image", embedImageUdf)
    spark.udf.register("clip_embed", clipEmbedUdf)
    spark.udf.register("imagebind_embed", imagebindEmbedUdf)
    spark.udf.register("detokenize", detokenizeUdf)
  }
}
