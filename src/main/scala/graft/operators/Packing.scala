package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Sequence packing — the concat-and-chunk step of an LLM training-data
 * pipeline: shuffle the corpus into a deterministic seeded order, lay the
 * documents head-to-tail on one global token axis, and cut that axis into
 * fixed-`budget` training sequences. Each document's accounting row says
 * where it landed: global start offset, the first/last sequence it
 * touches, and how many sequences it spans (boundary crossings are where
 * packing loss / cross-document attention masking happens).
 *
 * The reference has no packing operator (its pipelines stop at retrieval);
 * this extends the curation family (dedup → decontaminate → PII → token
 * accounting) to the final layout step, per the north-star brief.
 *
 * Scale shape: the global running sum is the bucket-prefix pattern of
 * [[DistributedRank]] — quantile-bucket the order key (a pure function of
 * the row, so independent recomputations agree), window-cumsum INSIDE each
 * bucket, then add per-bucket token-sum offsets from a tiny (≤ shuffle
 * partitions rows) aggregate joined broadcast. No single-partition window
 * anywhere; at 100 TB this is three streaming scans, and the axis
 * arithmetic is pure integer (exact at any scale, oracle-replayable).
 *
 * Determinism: the order key is `splitmix64(id + seed)` — bijective in the
 * id for a fixed seed, so the order is total without a tiebreak and stable
 * under corpus growth (a new document inserts into the order without
 * moving any existing pair's relative position).
 */
object Packing {

  /** Seeded deterministic shuffle-order key (signed comparison on both
    * engines; the oracle folds its mod-2⁶⁴ value back to BIGINT). */
  def orderKey(idCol: Column, seed: Long): Column = {
    val u = udf((id: Long) => graft.functions.DetRandom.mix64(id + seed))
    u(idCol)
  }

  /**
   * Pack accounting for every document with `tokensCol > 0`.
   *
   * Output: `idCol, tokens, start_pos, first_seq, last_seq, n_seqs` where
   * `start_pos` is the document's offset on the global token axis,
   * `first_seq = start_pos div budget`, `last_seq = (start_pos + tokens
   * - 1) div budget`, and `n_seqs` counts the training sequences the
   * document contributes to.
   */
  def packSequences(df: DataFrame, idCol: String, tokensCol: String,
                    budget: Long, seed: Long): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    val spark = df.sparkSession
    val p = math.max(1, spark.sessionState.conf.numShufflePartitions)
    val base = df
      .select(col(idCol), col(tokensCol).cast("long").as("__tok"))
      .filter(col("__tok") > 0)
      .withColumn("__ord", orderKey(col(idCol), seed))

    // p-1 quantile boundaries of the order key, computed once and closed
    // over. Long→Double narrowing is monotone, so bucket ids stay ordered
    // even where doubles collapse near-equal keys.
    val bounds: Array[Double] =
      if (p == 1) Array.empty
      else base.stat.approxQuantile(
        Array("__ord"), (1 until p).map(_.toDouble / p).toArray, 0.001)(0)
    val uniq = bounds.distinct.sorted
    val bucketUdf = udf { (o: Long) =>
      val d = o.toDouble
      var lo = 0
      var hi = uniq.length
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (d <= uniq(mid)) hi = mid else lo = mid + 1
      }
      lo
    }
    val bucketed = base.withColumn("__b", bucketUdf(col("__ord")))

    // running token sum inside each bucket (partitioned window — never a
    // single-task global sort); (ord, id) is unique so ROWS == RANGE
    val w = Window.partitionBy(col("__b"))
      .orderBy(col("__ord"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = bucketed.withColumn("__lcum", sum(col("__tok")).over(w))

    // per-bucket totals → prefix offsets (tiny non-equi self-join), then
    // broadcast back — the DistributedRank offset pattern with SUM instead
    // of COUNT
    val sums = bucketed.groupBy(col("__b")).agg(sum(col("__tok")).as("__bsum"))
    val offsets = sums.as("a")
      .join(sums.as("b"), col("b.__b") < col("a.__b"), "left")
      .groupBy(col("a.__b").as("__b"))
      .agg(coalesce(sum(col("b.__bsum")), lit(0L)).as("__off"))

    local.join(broadcast(offsets), "__b")
      .withColumn("__cum", col("__off") + col("__lcum"))
      .withColumn("start_pos", col("__cum") - col("__tok"))
      .withColumn("first_seq", expr(s"start_pos div ${budget}L"))
      .withColumn("last_seq", expr(s"(__cum - 1) div ${budget}L"))
      .withColumn("n_seqs", col("last_seq") - col("first_seq") + lit(1L))
      .select(col(idCol), col("__tok").as("tokens"), col("start_pos"),
        col("first_seq"), col("last_seq"), col("n_seqs"))
  }
}
