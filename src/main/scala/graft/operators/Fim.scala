package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Fill-in-the-middle (FIM) transform — the code-corpus augmentation
 * that teaches infilling: split each document at two points, then
 * render prefix/suffix/middle with sentinel markers in PSM order
 * (prefix, suffix, middle — the model learns to emit the middle after
 * seeing both sides) and SPM order (suffix first).
 *
 * The split points are CALLER policy (columns), not hidden hashing —
 * a pipeline derives them from any deterministic source; the operator
 * only clamps them into [0, len] and orders them. Pure substring
 * algebra: zero UDFs, one stateless scan, no shuffle.
 *
 * Reference surface: the reference ships chunking primitives
 * (`neurondb--1.0.sql` chunk_text); FIM is the training-data
 * extension, public-method work (Bavarian et al. 2022, "Efficient
 * Training of Language Models to Fill in the Middle").
 */
object Fim {

  val PrefixTok = "<|fim_pre|>"
  val SuffixTok = "<|fim_suf|>"
  val MiddleTok = "<|fim_mid|>"

  /** Split `textCol` at character offsets `p1`/`p2` (clamped to
    * [0, len], swapped if out of order) and emit the three spans plus
    * PSM and SPM renders. Offsets are 0-based character counts:
    * prefix = [0, lo), middle = [lo, hi), suffix = [hi, len). */
  def transform(df: DataFrame, idCol: String, textCol: String,
                p1: Column, p2: Column): DataFrame = {
    val len = length(col(textCol))
    // clamp in LONG first — an int cast before the clamp would wrap
    // out-of-range offsets; after clamping the value fits an int
    // because it is bounded by len
    val c1 = greatest(lit(0L), least(p1.cast("long"), len.cast("long")))
      .cast("int")
    val c2 = greatest(lit(0L), least(p2.cast("long"), len.cast("long")))
      .cast("int")
    val lo = least(c1, c2)
    val hi = greatest(c1, c2)
    df.select(col(idCol), col(textCol).as("__t"), lo.as("__lo"), hi.as("__hi"))
      .select(col(idCol),
        col("__lo").cast("long").as("split_lo"),
        col("__hi").cast("long").as("split_hi"),
        col("__t").substr(lit(1), col("__lo")).as("prefix"),
        col("__t").substr(col("__lo") + 1, col("__hi") - col("__lo"))
          .as("middle"),
        col("__t").substr(col("__hi") + 1, length(col("__t")) - col("__hi"))
          .as("suffix"))
      .withColumn("psm", concat(lit(PrefixTok), col("prefix"),
        lit(SuffixTok), col("suffix"), lit(MiddleTok), col("middle")))
      .withColumn("spm", concat(lit(SuffixTok), col("suffix"),
        lit(PrefixTok), col("prefix"), lit(MiddleTok), col("middle")))
  }

  /** T5-style span corruption (Raffel et al. 2020 §3.1.4) with a
    * DETERMINISTIC mask pattern: one single-token mask per `stride`
    * tokens (0-based positions p with p % stride == stride - 2), each
    * replaced in the input render by the sequential sentinel
    * `<extra_id_K>` (K = p div stride) and echoed after the same
    * sentinel in the target render. Fixed-position masking keeps the
    * transform replayable (and oracle-checkable) end to end; a
    * production pipeline seeds positions from a hash instead.
    *
    * Pure token-array algebra — split, indexed transform, filter,
    * join — zero UDFs, one stateless scan, no shuffle. Emits
    * (id, n_tokens, n_masked, input, target). */
  def spanCorrupt(df: DataFrame, idCol: String, textCol: String,
                  stride: Int = 5): DataFrame = {
    require(stride >= 2, s"stride must be >= 2: $stride")
    val toks = filter(split(col(textCol), "[ \t\n\r]+"),
      t => length(t) > 0)
    val masked = (i: Column) => i % stride === stride - 2
    val sentinel = (i: Column) =>
      concat(lit("<extra_id_"),
        ((i - (stride - 2)) / stride).cast("long"), lit(">"))
    val idx = sequence(lit(0), greatest(size(col("__t")) - 1, lit(0)))
    val nonEmpty = size(col("__t")) > 0
    df.filter(col(textCol).isNotNull)
      .select(col(idCol), toks.as("__t"))
      .select(col(idCol),
        size(col("__t")).cast("long").as("n_tokens"),
        size(filter(col("__t"), (_, i) => masked(i))).cast("long")
          .as("n_masked"),
        when(nonEmpty, array_join(zip_with(col("__t"), idx,
          (t, i) => when(masked(i), sentinel(i)).otherwise(t)), " "))
          .otherwise(lit("")).as("input"),
        when(nonEmpty, array_join(flatten(zip_with(col("__t"), idx,
          (t, i) => when(masked(i), array(sentinel(i), t))
            .otherwise(array().cast("array<string>")))), " "))
          .otherwise(lit("")).as("target"))
  }
}
