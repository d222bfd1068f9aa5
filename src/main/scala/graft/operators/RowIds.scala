package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types.LongType

/**
 * Deterministic per-row unique ids.
 *
 * `monotonically_increasing_id()` is nondeterministic under partial stage
 * recomputation (the SPARK-23207 class): when a shuffle-fetch failure
 * recomputes some map tasks, the re-run can assign different ids than the
 * surviving outputs, and anything shuffled on the id downstream silently
 * duplicates or drops rows. `RDD.zipWithIndex` derives the id from
 * (partition index, position within partition) with per-partition offsets
 * pinned by an up-front count job, so a recomputed partition replays the
 * exact ids — as long as the parent recomputes deterministically (file
 * scans and narrow deterministic chains do; partition-internal order
 * directly after a shuffle does not, so materialize first in that case).
 */
object RowIds {

  /** Append a stable unique LONG id column. Costs one extra narrow pass
    * (zipWithIndex's offset job) plus an RDD round-trip — use on the
    * smaller/query side of an operator, not a 100 TB scan. */
  def withStableId(df: DataFrame, name: String): DataFrame = {
    val schema = df.schema.add(name, LongType, nullable = false)
    val rdd = df.rdd.zipWithIndex().map { case (r, i) => Row.fromSeq(r.toSeq :+ i) }
    df.sparkSession.createDataFrame(rdd, schema)
  }
}
