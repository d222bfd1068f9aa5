package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

/**
 * Tokenization matching the reference's `bm25_tokenize`
 * (`NeuronDB/src/search/sparse_search.c:449-477`): runs of ASCII
 * alphanumerics (C `isalnum` — non-ASCII letters are separators, exactly
 * like the reference's byte-wise scan), lowercased, and capped at 255
 * chars per token (a longer run continues as a new token, matching the
 * reference's `j < 255` rescan). This replaces the PG `tsvector`
 * machinery the reference borrows for FTS — stemming is deliberately not
 * replicated (documented divergence, SURVEY §2.6).
 */
object TextFunctions {

  @inline private def isAsciiAlnum(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9')

  @inline private def asciiLower(c: Char): Char =
    if (c >= 'A' && c <= 'Z') (c + 32).toChar else c

  def tokenize(text: String): Seq[String] = {
    if (text == null) return Seq.empty
    val out = Seq.newBuilder[String]
    val sb = new StringBuilder
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      if (isAsciiAlnum(c)) {
        sb.append(asciiLower(c))
        if (sb.length == 255) { out += sb.toString; sb.clear() }
      } else if (sb.nonEmpty) { out += sb.toString; sb.clear() }
      i += 1
    }
    if (sb.nonEmpty) out += sb.toString
    out.result()
  }

  def termFreqs(text: String): Map[String, Int] =
    tokenize(text).groupBy(identity).map { case (t, xs) => (t, xs.size) }

  /** djb2-xor of the UTF-8 bytes folded into `[0, vocabSize)` — THE hash
    * that defines vocabulary compatibility across the tokenizer
    * ([[hfTokenize]]) and the term-hash sparse embedders
    * ([[graft.operators.SparseSearch.termHashEmbed]]); keep exactly one
    * copy so the deterministic-vocabulary contract can't silently fork. */
  def djb2Bucket(term: String, vocabSize: Int): Int = {
    var h = 5381
    term.getBytes("UTF-8").foreach(b => h = ((h << 5) + h) ^ (b & 0xFF))
    ((h.toLong & 0xFFFFFFFFL) % vocabSize).toInt
  }

  val tokenizeUdf: UserDefinedFunction = udf((t: String) => tokenize(t))
  val tokenCountUdf: UserDefinedFunction = udf((t: String) => tokenize(t).size)

  def tokens(c: Column): Column = tokenizeUdf(c)

  /**
   * Wordpiece-lite token ids, the offline stand-in for
   * `neurondb_hf_tokenize` (`NeuronDB/neurondb--1.0.sql:5117-5466`,
   * `src/onnx/neurondb_tokenizer.c` — an ONNX-backed HF tokenizer):
   * greedy longest-prefix splitting of each word into pieces of at most
   * `maxPiece` chars, each piece hashed into a fixed vocab (djb2 %
   * vocabSize). Deterministic; continuation pieces get the `##` prefix
   * before hashing, like wordpiece.
   */
  def hfTokenize(text: String, vocabSize: Int = 30522, maxPiece: Int = 6): Seq[Int] = {
    def pieceId(piece: String): Int = djb2Bucket(piece, vocabSize)
    tokenize(text).flatMap { word =>
      val pieces = Seq.newBuilder[String]
      var i = 0
      while (i < word.length) {
        val end = math.min(word.length, i + maxPiece)
        val raw = word.substring(i, end)
        pieces += (if (i == 0) raw else "##" + raw)
        i = end
      }
      pieces.result().map(pieceId)
    }
  }

  val hfTokenizeUdf: UserDefinedFunction = udf((t: String) => hfTokenize(t))

  def register(spark: SparkSession): Unit = {
    spark.udf.register("tokenize", tokenizeUdf)
    spark.udf.register("token_count", tokenCountUdf)
    spark.udf.register("hf_tokenize", hfTokenizeUdf)
  }
}
