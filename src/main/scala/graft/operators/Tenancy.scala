package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Multi-tenant scan wrappers (SURVEY §2.1): row-level security and quota
 * accounting, the Spark shape of the reference's RLS/quota scan layers
 * (`NeuronDB/src/scan/scan_rls.c:79-186` — per-tuple policy filter;
 * `scan_quota.c:48-190` — per-tenant maxVectors/maxStorageBytes with hard
 * enforcement; SQL surface `neurondb--1.0.sql:2972-3022`).
 *
 * The reference evaluates compiled policy expressions per tuple inside the
 * scan; here a policy IS a Catalyst predicate, so "compile into the scan"
 * is literally `filter` — Catalyst pushes the tenant predicate down to the
 * parquet reader (`PushedFilters`), which at 100 TB means tenant-pruned
 * row groups, not post-scan filtering. Quota accounting is one groupBy
 * over the tenant key — a map-side-combined aggregate, no driver loops.
 */
object Tenancy {

  final case class Quota(maxRows: Long = 1000000L, maxBytes: Long = 10240L * 1024 * 1024,
                         enforceHard: Boolean = true)

  final class QuotaExceededException(msg: String) extends RuntimeException(msg)

  /** RLS scan: restrict to one tenant. The predicate participates in
    * pushdown/partition pruning like any scan filter. */
  def rlsScan(df: DataFrame, tenantCol: String, tenantId: Any): DataFrame =
    df.filter(col(tenantCol) === lit(tenantId))

  /** General policy form (`ndb_compile_rls_policies`): every policy
    * predicate must pass — policies AND together. An EMPTY policy list is
    * default-DENY (empty scan), matching PG-style RLS where a table with
    * row security and no applicable policies yields no rows — failing
    * open on a misconfigured tenant would disable isolation silently. */
  def rlsScanPolicies(df: DataFrame, policies: Seq[Column]): DataFrame =
    if (policies.isEmpty) df.filter(lit(false))
    else policies.foldLeft(df)(_ filter _)

  /** Per-tenant usage accounting: row count + payload bytes over the given
    * size-bearing columns (strings/binaries measured, the reference's
    * storage-bytes analog). */
  def usage(df: DataFrame, tenantCol: String, sizeCols: Seq[String]): DataFrame = {
    val bytes =
      if (sizeCols.isEmpty) lit(0L)
      else sizeCols.map(c => coalesce(octet_length(col(c).cast("string")).cast("long"), lit(0L)))
        .reduce(_ + _)
    df.groupBy(col(tenantCol))
      .agg(count(lit(1)).as("n_rows"), sum(bytes).as("n_bytes"))
  }

  /** Hard quota gate (`scan_quota.c` enforceHard): returns the offending
    * tenants' usage; throws when any tenant exceeds the quota and
    * enforcement is hard. The check is one aggregate pass. */
  def enforce(df: DataFrame, tenantCol: String, sizeCols: Seq[String], quota: Quota): DataFrame = {
    val over = usage(df, tenantCol, sizeCols)
      .filter(col("n_rows") > quota.maxRows || col("n_bytes") > quota.maxBytes)
    if (quota.enforceHard) {
      val offenders = over.limit(5).collect()
      if (offenders.nonEmpty) {
        val desc = offenders.map(r => s"${r.get(0)}: rows=${r.getLong(1)} bytes=${r.getLong(2)}")
          .mkString(", ")
        throw new QuotaExceededException(
          s"quota exceeded (maxRows=${quota.maxRows}, maxBytes=${quota.maxBytes}) by: $desc")
      }
    }
    over
  }
}
