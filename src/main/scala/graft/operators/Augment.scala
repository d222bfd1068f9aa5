package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.DetRandom.mix64

/**
 * Deterministic corpus augmentation — the objective-side data prep of a
 * training pipeline (BERT/T5-style denoising): token masking whose
 * coin for position i of document d is the splitmix64 stream keyed by
 * (d, i). No RNG state, no seed plumbing, partition-order independent —
 * the same properties as [[Sampling]]'s draws, so an augmented corpus
 * is reproducible months later and the mask pattern is oracle-exact.
 *
 * One scan, no shuffle: the mask decision and the rebuilt text are
 * per-row functions.
 */
object Augment {

  /** u ∈ [0,1) for (docId, pos) from the shared splitmix64 stream. */
  @inline private[operators] def u01(docId: Long, pos: Int): Double =
    (mix64(docId * 131071L + pos) >>> 11).toDouble / 9007199254740992.0 // 2^53

  /** Mask ~`rate` of the `[a-z0-9]+` tokens of `textCol` (each token's
    * coin keyed by (id, position)); returns the frame plus
    * `masked_text` (space-joined canonical form with `<mask>` holes),
    * `n_tokens`, `n_masked`. */
  def tokenMask(df: DataFrame, idCol: String, textCol: String,
                rate: Double): DataFrame = {
    require(rate >= 0.0 && rate <= 1.0, s"rate must be in [0,1]: $rate")
    val maskUdf = udf { (id: Long, text: String) =>
      if (text == null) ("", 0L, 0L)
      else {
        val toks = "[a-z0-9]+".r.findAllIn(text.toLowerCase).toArray
        var masked = 0L
        val out = new Array[String](toks.length)
        var i = 0
        while (i < toks.length) {
          if (u01(id, i) < rate) { out(i) = "<mask>"; masked += 1 }
          else out(i) = toks(i)
          i += 1
        }
        (out.mkString(" "), toks.length.toLong, masked)
      }
    }
    df.withColumn("__m", maskUdf(col(idCol), col(textCol)))
      .withColumn("masked_text", col("__m._1"))
      .withColumn("n_tokens", col("__m._2"))
      .withColumn("n_masked", col("__m._3"))
      .drop("__m")
  }
}
