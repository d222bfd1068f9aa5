package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/**
 * Vector aggregates: element-wise AVG / SUM / MIN / MAX across rows.
 *
 * Mirrors `NeuronDB/src/types/aggregates.c` (state `{dim, count, double
 * sum[]}`, `vector_avg_transfn:41-90`) and the SQL aggregates declared at
 * `NeuronDB/neurondb--1.0.sql:2199-2214`. Contract, as exercised by
 * `NeuronDB/sql/04_aggregates.sql`:
 *   - NULL input vectors are skipped (`:49-55`);
 *   - empty input / all-NULL input yields NULL (`:24-29,103-109`);
 *   - inconsistent dimensions raise (`vector dimensions must be consistent`);
 *   - accumulation in double, float4 truncation only on finish.
 *
 * Implemented as `Aggregator`s so Spark plans them as two-phase
 * partial/merge aggregations — the scalable shape: map-side partials
 * shrink the shuffle to one `(count, double[dim])` row per partition
 * per group, independent of input row count.
 */
object VectorAggregates {

  case class SumBuf(var count: Long, var sums: Array[Double])
  case class ExtremeBuf(var seen: Boolean, var values: Array[Float])

  private def checkDim(buf: Array[Double], v: Seq[Float]): Unit =
    if (buf.length != v.length)
      throw new IllegalArgumentException("vector dimensions must be consistent")

  sealed abstract class SumLike extends Aggregator[Seq[Float], SumBuf, Seq[Float]] {
    def zero: SumBuf = SumBuf(0L, Array.emptyDoubleArray)
    def reduce(b: SumBuf, v: Seq[Float]): SumBuf = {
      if (v == null) b
      else {
        if (b.count == 0L && b.sums.isEmpty) b.sums = new Array[Double](v.length)
        checkDim(b.sums, v)
        var i = 0
        while (i < b.sums.length) { b.sums(i) += v(i); i += 1 }
        b.count += 1
        b
      }
    }
    def merge(x: SumBuf, y: SumBuf): SumBuf = {
      if (y.count == 0L) x
      else if (x.count == 0L) y
      else {
        if (x.sums.length != y.sums.length)
          throw new IllegalArgumentException("vector dimensions must be consistent")
        var i = 0
        while (i < x.sums.length) { x.sums(i) += y.sums(i); i += 1 }
        x.count += y.count
        x
      }
    }
    def bufferEncoder: Encoder[SumBuf] = Encoders.product[SumBuf]
    def outputEncoder: Encoder[Seq[Float]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Float]]()
  }

  /** Element-wise mean; empty -> NULL. */
  object VectorAvg extends SumLike {
    def finish(b: SumBuf): Seq[Float] =
      if (b.count == 0L) null
      else b.sums.map(s => (s / b.count).toFloat).toSeq
  }

  /** Element-wise sum; empty -> NULL. */
  object VectorSum extends SumLike {
    def finish(b: SumBuf): Seq[Float] =
      if (b.count == 0L) null else b.sums.map(_.toFloat).toSeq
  }

  sealed abstract class ExtremeLike(pickFirst: (Float, Float) => Boolean)
      extends Aggregator[Seq[Float], ExtremeBuf, Seq[Float]] {
    def zero: ExtremeBuf = ExtremeBuf(seen = false, Array.emptyFloatArray)
    def reduce(b: ExtremeBuf, v: Seq[Float]): ExtremeBuf = {
      if (v == null) b
      else if (!b.seen) { b.seen = true; b.values = v.toArray; b }
      else {
        if (b.values.length != v.length)
          throw new IllegalArgumentException("vector dimensions must be consistent")
        var i = 0
        while (i < b.values.length) {
          if (pickFirst(v(i), b.values(i))) b.values(i) = v(i)
          i += 1
        }
        b
      }
    }
    def merge(x: ExtremeBuf, y: ExtremeBuf): ExtremeBuf =
      if (!y.seen) x
      else if (!x.seen) y
      else {
        if (x.values.length != y.values.length)
          throw new IllegalArgumentException("vector dimensions must be consistent")
        var i = 0
        while (i < x.values.length) {
          if (pickFirst(y.values(i), x.values(i))) x.values(i) = y.values(i)
          i += 1
        }
        x
      }
    def finish(b: ExtremeBuf): Seq[Float] = if (!b.seen) null else b.values.toSeq
    def bufferEncoder: Encoder[ExtremeBuf] = Encoders.product[ExtremeBuf]
    def outputEncoder: Encoder[Seq[Float]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Float]]()
  }

  /** Element-wise minimum across rows (NeuronDB/sql/04_aggregates.sql:17-22).
    * Total order via Float.compare, NOT primitive `<`: all primitive
    * comparisons against NaN are false, which would make the kept value
    * depend on partition/merge order. Float.compare ranks NaN above every
    * number (Spark SQL's own NaN ordering), so min skips NaN and max
    * prefers it — deterministically, whatever the reduction order. */
  object VectorMin extends ExtremeLike(java.lang.Float.compare(_, _) < 0)
  /** Element-wise maximum across rows; NaN ranks greatest (see VectorMin). */
  object VectorMax extends ExtremeLike(java.lang.Float.compare(_, _) > 0)

  private implicit val seqFloatEnc: Encoder[Seq[Float]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Float]]()

  val vectorAvg = udaf(VectorAvg)
  val vectorSum = udaf(VectorSum)
  val vectorMin = udaf(VectorMin)
  val vectorMax = udaf(VectorMax)

  def vector_avg(c: Column): Column = vectorAvg(c)
  def vector_sum(c: Column): Column = vectorSum(c)
  def vector_min_agg(c: Column): Column = vectorMin(c)
  def vector_max_agg(c: Column): Column = vectorMax(c)

  def register(spark: SparkSession): Unit = {
    spark.udf.register("vector_avg", vectorAvg)
    spark.udf.register("vector_sum_agg", vectorSum)
    spark.udf.register("vector_min_agg", vectorMin)
    spark.udf.register("vector_max_agg", vectorMax)
  }
}
