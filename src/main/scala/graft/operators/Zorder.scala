package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Z-order (Morton) data layout — the 100 TB TABLE-LAYOUT operator: sort
 * a table by the bit-interleaving of two quantized columns so that
 * file/bucket-level min-max statistics become tight in BOTH dimensions
 * at once, and a 2-D box predicate prunes most buckets at scan time
 * (the Delta/Iceberg `OPTIMIZE ZORDER BY` data-skipping idea; Morton
 * 1966). A single-column sort gives perfect pruning on one dimension
 * and none on the other; z-order trades a little of each for skipping
 * on both.
 *
 * Everything is pure integer arithmetic — range quantization to 16
 * bits per dimension (`((v−lo)·65535) div (hi−lo)`), then the classic
 * shift-or-mask bit spread — so bucket statistics are oracle-exact and
 * the plan is ALL-NATIVE (bitwise ops codegen; no UDF anywhere).
 */
object Zorder {

  private val Masks = Seq(
    (8, 0x00FF00FFL),
    (4, 0x0F0F0F0FL),
    (2, 0x33333333L),
    (1, 0x55555555L))

  /** Spread the low 16 bits of `x` to the even bit positions of a
    * 32-bit word (…b3_b2_b1_b0 → …0b3_0b2_0b1_0b0). */
  def spread16(x: Column): Column =
    Masks.foldLeft(x) { case (c, (sh, m)) =>
      (c.bitwiseOR(shiftleft(c, sh))).bitwiseAND(lit(m))
    }

  /** The same spread as SQL text (parenthesized; BIGINT ops). */
  def spread16Sql(x: String): String =
    Masks.foldLeft(x) { case (c, (sh, m)) =>
      s"((($c) | (($c) << $sh)) & $m)"
    }

  /** 32-bit Morton code of two 16-bit quantized values: a's bits land on
    * the odd positions, b's on the even. */
  def interleave(qa: Column, qb: Column): Column =
    shiftleft(spread16(qa), 1).bitwiseOR(spread16(qb))

  def interleaveSql(qa: String, qb: String): String =
    s"((${spread16Sql(qa)} << 1) | ${spread16Sql(qb)})"

  /** Range quantization of column `vName` in [lo, hi] to [0, 65535] —
    * pure integer div, oracle-exact. Caller guarantees hi > lo. */
  def quantize16(vName: String, lo: Long, hi: Long): Column =
    expr(s"(($vName - ${lo}L) * 65535L) div ${hi - lo}L")

  def quantize16Sql(v: String, lo: String, hi: String): String =
    s"((($v) - ($lo)) * 65535) // (($hi) - ($lo))"

  /** Bucket-statistics table of a z-ordered layout: assign each row the
    * Morton code of (colA, colB) quantized against the table's own
    * min/max, bucket by the code's top bits (`bucket = z >> shift` —
    * the file-boundary stand-in), and emit each bucket's min-max
    * envelope in both dimensions plus its row count: exactly the
    * per-file statistics a lakehouse scan consults for data skipping.
    * Two scans total (one tiny min/max agg, one grouped agg); no sort
    * is needed to MEASURE the layout since bucket-of-row is a pure
    * function of the row. */
  def layoutStats(df: DataFrame, colA: String, colB: String,
                  shift: Int): DataFrame = {
    val r = df.agg(
      min(col(colA)).cast("long"), max(col(colA)).cast("long"),
      min(col(colB)).cast("long"), max(col(colB)).cast("long")).head()
    val (loA, hiA, loB, hiB) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    require(hiA > loA && hiB > loB,
      s"z-order needs non-degenerate ranges: [$loA,$hiA] x [$loB,$hiB]")
    df.select(col(colA).cast("long").as("a"), col(colB).cast("long").as("b"))
      .withColumn("z", interleave(
        quantize16("a", loA, hiA), quantize16("b", loB, hiB)))
      .groupBy(shiftrightunsigned(col("z"), shift).as("bucket"))
      .agg(count(lit(1)).as("n"),
        min(col("a")).as("a_min"), max(col("a")).as("a_max"),
        min(col("b")).as("b_min"), max(col("b")).as("b_max"))
  }

  /** Data-skipping power of a layout's bucket stats against a 2-D box
    * query: the fraction of ROWS whose bucket envelope intersects the
    * box (what a stats-pruned scan must read). Lower is better; 2-D
    * boxes against a single-column sort degenerate to ~the selectivity
    * of that one column. Driver-side over the tiny stats table. */
  def scanFraction(stats: Array[(Long, Long, Long, Long, Long)],
                   aLo: Long, aHi: Long, bLo: Long, bHi: Long): Double = {
    val total = stats.map(_._1).sum.toDouble
    val read = stats.collect {
      case (n, aMin, aMax, bMin, bMax)
        if aMax >= aLo && aMin <= aHi && bMax >= bLo && bMin <= bHi => n
    }.sum.toDouble
    read / total
  }
}
