package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Streaming quota admission (§2.1's quota layer at ingest time — the
 * streaming face of `operators.Tenancy`, reference `scan_quota.c`
 * hard enforcement): per-tenant CUMULATIVE row counts held in
 * engine-managed `GroupState` across micro-batches, each arriving row
 * admitted iff its tenant's running total is still under the cap.
 *
 * This is custom state that no windowed aggregate expresses — the
 * count must survive from batch to batch and gate rows mid-batch — so
 * it uses `flatMapGroupsWithState`, the Structured-Streaming primitive
 * for exactly this shape. State size: one long per tenant.
 *
 * Which rows of the boundary batch are admitted follows engine
 * iteration order (nondeterministic), but per-tenant ADMITTED COUNTS
 * are exact: min(total, cap) — the oracle-checkable contract.
 */
object StreamQuota {

  case class Usage(rows: Long)

  /** Output: (tenant, id, admitted). Works on static frames too (one
    * empty-state invocation per tenant — batch parity for tests). */
  def admit(df: DataFrame, tenantCol: String, idCol: String,
            maxRows: Long): Dataset[(String, Long, Boolean)] = {
    require(maxRows >= 0, "maxRows must be non-negative")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(tenantCol).cast("string"), col(idCol).cast("long"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (tenant: String, rows: Iterator[(String, Long)], state: GroupState[Usage]) =>
          var used = state.getOption.map(_.rows).getOrElse(0L)
          val out = rows.map { case (_, id) =>
            used += 1
            (tenant, id, used <= maxRows)
          }.toList // drain before updating state
          state.update(Usage(used))
          out.iterator
      }
  }
}
