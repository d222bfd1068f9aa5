package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Numeric-column audits for ingest QA — the two classic "is this
 * numeric data trustworthy" checks a pipeline runs before training on
 * telemetry or tabular features:
 *
 *  - Winsorized / trimmed robust statistics (Tukey): cut the decile
 *    tails by exact rank and report both the trimmed mean (tails
 *    dropped) and the winsorized mean (tails clamped to the cut
 *    values) — outlier-robust location without distributional
 *    assumptions.
 *  - Benford first-digit audit (Newcomb 1881/Benford 1938): natural
 *    multiplicative data follows P(d) = log10(1 + 1/d); fabricated or
 *    truncated feeds do not. The chi-square distance from the Benford
 *    curve is the standard fraud/synthetic-data tripwire.
 *
 * Scale note: the exact decile cuts ride one global rank (mirrored
 * verbatim by the oracle); at 100 TB swap in the histogram/t-digest
 * quantile family (`hist_quantile`) for the cut values — the
 * clamp-and-average passes are stateless scans either way. The
 * Benford digits come from integer-cent strings (floor(x*100+0.5)),
 * never from log10 of the value, so digit assignment is engine-exact;
 * only expected shares and chi-square pass through libm (float4).
 */
object RobustStats {

  /** One row: (n, lo_cut, hi_cut, trimmed_mean, winsorized_mean) at
    * the `tailPct` percent tails (exact ranks, id tiebreak). */
  def winsorize(df: DataFrame, valueCol: String, idCol: String,
                tailPct: Int = 10): DataFrame = {
    require(tailPct >= 1 && tailPct < 50, s"tailPct $tailPct")
    val v = col(valueCol).cast("double")
    val ranked = df.select(v.as("v"), col(idCol).as("id"))
      .filter(col("v").isNotNull)
      .withColumn("r", row_number().over(
        Window.orderBy(col("v"), col("id"))).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy()))
    val cut = expr(s"(n * $tailPct) div 100")
    ranked
      .withColumn("k", cut)
      .withColumn("lo", max(when(col("r") === col("k") + 1, col("v")))
        .over(Window.partitionBy()))
      .withColumn("hi", max(when(col("r") === col("n") - col("k"), col("v")))
        .over(Window.partitionBy()))
      .groupBy(col("n"), col("lo"), col("hi"))
      .agg(
        avg(when(col("r") > col("k") && col("r") <= col("n") - col("k"),
          col("v"))).cast("float").as("trimmed_mean"),
        avg(least(greatest(col("v"), col("lo")), col("hi")))
          .cast("float").as("winsorized_mean"))
      .select(col("n"), col("lo").cast("float").as("lo_cut"),
        col("hi").cast("float").as("hi_cut"), col("trimmed_mean"),
        col("winsorized_mean"))
  }

  /** Nine rows (digit 1..9): observed count, observed share, Benford
    * expected share, chi-square contribution, and the total chi-square
    * statistic repeated on every row. Digits come from the integer
    * cents rendering, so assignment is exact; shares/chi2 are float4.
    *
    * Degenerate-input contract (the [[graft.operators.DataValuation
    * .cooksDistance]] convention): with ZERO qualifying rows (every
    * value rounds to &lt;= 0 cents) the shares and chi-square are
    * undefined, and obs_share/contrib/chi2 are emitted as EXPLICIT
    * NULLs behind a `when(n &gt; 0)` guard — never a 0/0 whose NULL
    * semantics the caller has to know (ADVICE r12). */
  def benford(df: DataFrame, valueCol: String): DataFrame = {
    val cents = floor(col(valueCol).cast("double") * 100.0 + 0.5).cast("long")
    val digits = df.select(cents.as("c"))
      .filter(col("c") > 0)
      .select(substring(col("c").cast("string"), 1, 1).cast("long").as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n_obs"))
    val all = digits.sparkSession.range(1, 10).select(col("id").as("digit"))
      .join(digits, Seq("digit"), "left")
      .select(col("digit"), coalesce(col("n_obs"), lit(0L)).as("n_obs"))
    val total = Window.partitionBy()
    val defined = col("n") > 0
    all
      .withColumn("n", sum(col("n_obs")).over(total))
      .withColumn("expected", log10(lit(1.0) + lit(1.0) / col("digit")))
      .withColumn("contrib",
        when(defined,
          (col("n_obs") - col("n") * col("expected")) *
            (col("n_obs") - col("n") * col("expected")) /
            (col("n") * col("expected"))))
      .withColumn("chi2", when(defined, sum(col("contrib")).over(total)))
      .select(col("digit"), col("n_obs"),
        when(defined, (col("n_obs").cast("double") / col("n")).cast("float"))
          .as("obs_share"),
        col("expected").cast("float").as("benford_share"),
        col("contrib").cast("float").as("contrib"),
        col("chi2").cast("float").as("chi2"))
  }
}
