package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Long-context evaluation construction — the needle-in-a-haystack
 * builder: splice a retrievable marker sentence into each document at
 * a controlled fractional depth, so a retrieval eval can sweep depth
 * × context-length. The output ships a fingerprint instead of the
 * spliced megabyte (the eval harness regenerates the text from the
 * same deterministic inputs).
 *
 * Reference surface: the reference ships RAG/chunking primitives; the
 * needle splice is the public eval-construction pattern (Kamradt's
 * needle-in-a-haystack harness; Anthropic/GPT long-context reports).
 *
 * Scale shape: a stateless per-row column program — substring +
 * concat + md5, zero UDFs, zero shuffles.
 */
object LongContext {

  /** Splices `needleCol` into `textCol` at `floor(depth * len)`
    * characters, depth in [0, 1] from `depthCol`. Emits the id, the
    * splice position, both lengths, and the md5 fingerprint of the
    * spliced text (lowercase hex — identical in Spark and DuckDB). */
  def insertNeedle(df: DataFrame, idCol: String, textCol: String,
                   needleCol: String, depthCol: String): DataFrame = {
    val text = col(textCol)
    val len = length(text)
    val pos = floor(col(depthCol) * len).cast("int")
    val spliced = concat(
      text.substr(lit(1), pos),
      col(needleCol),
      text.substr(pos + 1, len - pos))
    df.filter(text.isNotNull && col(needleCol).isNotNull &&
        col(depthCol).isNotNull)
      .select(col(idCol),
        pos.cast("long").as("pos"),
        len.cast("long").as("text_len"),
        length(spliced).cast("long").as("total_len"),
        md5(spliced).as("fingerprint"))
  }
}
