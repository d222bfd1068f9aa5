package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Curriculum ordering — the training-order step between curation and
 * the data loader: curriculum learning feeds easy examples first and
 * hard ones later, while domain INTERLEAVING keeps every batch mixed
 * (a pure difficulty sort would front-load whole domains and wreck the
 * mixture the sampler chose).
 *
 * Method: rank within each domain by the difficulty proxy (ties broken
 * by id for determinism), then stride the domains: the r-th easiest
 * example of domain d lands at global position r·|domains| + idx(d).
 * Consecutive positions cycle through domains; difficulty grows
 * monotonically within every domain's subsequence.
 *
 * Reference surface: the reference ships sampling/order primitives
 * (`neurondb--1.0.sql`); curriculum scheduling is public-method work
 * (Bengio et al.) expressed as ONE per-domain window — no global sort,
 * no single-partition stage, the same discipline as `EpochShuffle`.
 *
 * Scale shape: one shuffle (the domain-partitioned window); the domain
 * index map is collected to the driver and inlined as a map literal in
 * the expression tree — correct for the mixture-sized domain sets
 * curricula use (guarded at 10k; a million-domain column is the wrong
 * input for this operator). Global positions are pure arithmetic, so
 * the order materializes without ever sorting the corpus globally.
 */
object Curriculum {

  /** Adds `cur_rank` (0-based within domain, easy first) and
    * `cur_pos` (the strided global position). */
  def order(df: DataFrame, domainCol: String, difficultyCol: String,
            idCol: String): DataFrame = {
    val domains = df.select(col(domainCol)).distinct().collect()
      .map(_.get(0)).filter(_ != null).map(_.toString).sorted
    require(domains.nonEmpty, "no domains")
    require(domains.length <= 10000,
      s"${domains.length} domains: curriculum striding wants a mixture-sized " +
        "domain set, not a high-cardinality key — bucket the column first")
    val idx = typedLit(domains.zipWithIndex.toMap)
    val w = Window.partitionBy(col(domainCol))
      .orderBy(col(difficultyCol).asc, col(idCol).asc)
    df.filter(col(domainCol).isNotNull)
      .withColumn("cur_rank", (row_number().over(w) - 1).cast("long"))
      .withColumn("cur_pos",
        col("cur_rank") * domains.length + idx(col(domainCol).cast("string")))
  }
}
