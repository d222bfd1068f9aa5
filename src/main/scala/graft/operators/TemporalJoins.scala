package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Temporal joins for event pipelines (north-star additions beyond the
 * reference surface, next to [[Dedup]]/[[StreamDedup]]): as-of join and
 * bounded range join. Both are shapes Spark lacks as built-ins and a
 * 100 TB event store needs constantly — and both are expressed here so
 * the pair space never materializes as a cross product.
 *
 * As-of join: one shuffle on the key, then a per-key running `last()`
 * window over the UNION of both sides ordered by time — the classic
 * sort-merge formulation (DuckDB/kdb `ASOF JOIN`, pandas `merge_asof`
 * semantics: latest right row at-or-before each left row). Window
 * partitions are per key, so parallelism tracks key cardinality —
 * no single-partition window.
 *
 * Range join: time-bucket blocking — each right row lands in ONE bucket
 * of width `delta`, each left row probes its own bucket ±1; the
 * inequality predicate runs only inside co-bucketed pairs. Shuffle cost
 * ~3·|L|+|R| rows; pair cost tracks true temporal density, never
 * |L|·|R| (the same blocking idea [[Ivf.join]] applies in vector
 * space).
 */
object TemporalJoins {

  /**
   * Backward as-of join (inclusive): for each left row, the latest right
   * row with the same key and `rTs <= lTs`, else nulls (left-outer).
   * Output: every left column, `asof_ts` (matched right timestamp), and
   * each requested right column prefixed `asof_`.
   * `tolerance`: maximum allowed `lTs − rTs`; older matches null out.
   *
   * `keyCols` must exist on BOTH sides under the same names. Right rows
   * should be unique per (key, ts) — pre-aggregate duplicates first,
   * otherwise the match among equal-ts right rows is unspecified.
   */
  def asofBackward(left: DataFrame, right0: DataFrame, keyCols: Seq[String],
                   lTsCol: String, rTsCol: String, valueCols: Seq[String],
                   tolerance: Option[Double] = None): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    require(!valueCols.contains("ts"),
      "valueCols may not contain 'ts' — it collides with the asof_ts output; alias it first")
    // a null right timestamp can never satisfy rTs <= lTs, but it would
    // sort NULLS FIRST with a non-null payload and become the "match" for
    // left rows that have no true predecessor
    val right = right0.filter(col(rTsCol).isNotNull)
    val leftCols = left.columns.toSeq
    // Union frame: all left columns (nulled on right-side rows except the
    // keys), the event time, a side marker (right sorts before left at
    // equal time → inclusive match), and the right payload as ONE struct
    // so the matched row's fields travel together (a null field inside a
    // matched row stays null instead of falling back to an older row).
    val payload = struct(
      (col(rTsCol).cast("double").as("__mts") +:
        valueCols.map(c => col(c).as(c))): _*)
    val l = left
      .select(leftCols.map(col) ++ Seq(
        col(lTsCol).cast("double").as("__ts"), lit(1).as("__side"),
        lit(null).cast(right.select(payload).schema.head.dataType).as("__p")): _*)
    val r = right
      .select(leftCols.map(c =>
        if (keyCols.contains(c)) col(c)
        else lit(null).cast(left.schema(c).dataType).as(c)) ++ Seq(
        col(rTsCol).cast("double").as("__ts"), lit(0).as("__side"),
        payload.as("__p")): _*)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(r)
      .withColumn("__m", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val inTol = tolerance match {
      case Some(t) => col("__m").isNotNull && (col("__ts") - col("__m.__mts")) <= t
      case None    => col("__m").isNotNull
    }
    carried.select(leftCols.map(col) ++
      (col("__m.__mts") +: valueCols.map(c => col(s"__m.$c")))
        .zip("ts" +: valueCols)
        .map { case (c, name) => when(inTol, c).as(s"asof_$name") }: _*)
  }

  /**
   * Bounded range join: all pairs with equal `keyCol` and
   * `|lTs − rTs| <= delta`. Output: left columns, `r_`-prefixed right
   * columns, `ts_diff` (= lTs − rTs). Blocking: right rows land in
   * bucket floor(ts/delta) exactly once; left rows probe buckets
   * {b−1, b, b+1}. A qualifying pair's bucket distance is at most 1, so
   * it meets in exactly one bucket-equi-join task and is never emitted
   * twice.
   */
  def rangeJoin(left: DataFrame, right: DataFrame, keyCol: String,
                lTsCol: String, rTsCol: String, delta: Double): DataFrame = {
    require(delta > 0, "delta must be positive")
    val l = left
      .withColumn("__lts", col(lTsCol).cast("double"))
      .withColumn("__bucket",
        explode(array(Seq(-1, 0, 1).map(o => floor(col("__lts") / delta) + o): _*)))
    val r = right.select(right.columns.map(c => col(c).as(s"r_$c")).toSeq: _*)
      .withColumn("__rts", col(s"r_$rTsCol").cast("double"))
      .withColumn("__rbucket", floor(col("__rts") / delta))
    l.join(r, l("__bucket") === r("__rbucket") &&
        l(keyCol) === r(s"r_$keyCol") &&
        abs(col("__lts") - col("__rts")) <= delta)
      .withColumn("ts_diff", col("__lts") - col("__rts"))
      .drop("__bucket", "__rbucket", "__lts", "__rts")
  }
}
