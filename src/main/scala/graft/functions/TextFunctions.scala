package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

/**
 * Tokenization matching the reference's `bm25_tokenize`
 * (`NeuronDB/src/search/sparse_search.c:448-476`): runs of alphanumeric
 * characters, lowercased; everything else is a separator. This replaces
 * the PG `tsvector` machinery the reference borrows for FTS — stemming is
 * deliberately not replicated (documented divergence, SURVEY §2.6).
 */
object TextFunctions {

  def tokenize(text: String): Seq[String] = {
    if (text == null) return Seq.empty
    val out = Seq.newBuilder[String]
    val sb = new StringBuilder
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      if (Character.isLetterOrDigit(c)) sb.append(Character.toLowerCase(c))
      else if (sb.nonEmpty) { out += sb.toString; sb.clear() }
      i += 1
    }
    if (sb.nonEmpty) out += sb.toString
    out.result()
  }

  def termFreqs(text: String): Map[String, Int] =
    tokenize(text).groupBy(identity).map { case (t, xs) => (t, xs.size) }

  val tokenizeUdf: UserDefinedFunction = udf((t: String) => tokenize(t))
  val tokenCountUdf: UserDefinedFunction = udf((t: String) => tokenize(t).size)

  def tokens(c: Column): Column = tokenizeUdf(c)

  def register(spark: SparkSession): Unit = {
    spark.udf.register("tokenize", tokenizeUdf)
    spark.udf.register("token_count", tokenCountUdf)
  }
}
