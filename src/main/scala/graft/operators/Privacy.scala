package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Anonymity auditing — the k-anonymity / l-diversity report a privacy
 * review runs before a dataset with quasi-identifiers ships (Sweeney
 * 2002; Machanavajjhala et al. 2007): every quasi-identifier
 * combination must hide each row among >= k others, and the sensitive
 * attribute within a group must take >= l distinct values or the
 * group leaks it by homogeneity.
 *
 * Reference surface: the reference ships RLS/tenancy isolation; the
 * anonymity audit is the data-release extension, public definitions.
 *
 * Scale shape: ONE two-phase groupBy on the quasi-identifier key with
 * an exact distinct count inside (Spark expands it to a two-level
 * aggregate — still one shuffle family, output |groups| rows).
 */
object Privacy {

  /** Per-quasi-group audit: group size, distinct sensitive values,
    * and the k / l compliance flags. The release decision (suppress or
    * generalize failing groups) is the caller's. */
  def kAnonymity(df: DataFrame, quasiCols: Seq[String], sensitiveCol: String,
                 k: Int, l: Int): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier")
    require(k >= 2 && l >= 1, s"k $k / l $l out of range")
    df.filter(quasiCols.map(col(_).isNotNull).reduce(_ && _))
      .groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        countDistinct(col(sensitiveCol)).as("n_sensitive"))
      .withColumn("k_anonymous", col("n") >= k)
      .withColumn("l_diverse", col("n_sensitive") >= l)
  }
}
