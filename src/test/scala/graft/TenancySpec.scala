package graft

import org.apache.spark.sql.functions._
import graft.operators.Tenancy

class TenancySpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val df = Seq(
    (1L, 10L, "aaaa"), (2L, 10L, "bbbb"), (3L, 10L, "cccc"),
    (4L, 20L, "dd"), (5L, 30L, "e"))
    .toDF("id", "tenant", "payload").repartition(3)

  test("rlsScan keeps only the tenant's rows and pushes the predicate to the scan") {
    val out = Tenancy.rlsScan(df, "tenant", 10L)
    assert(out.select("id").as[Long].collect().toSet == Set(1L, 2L, 3L))
    // predicate must be a plain filter Catalyst can push, not a UDF
    assert(out.queryExecution.optimizedPlan.toString.contains("tenant"))
  }

  test("rlsScanPolicies ANDs every policy (ndb_compile_rls_policies semantics)") {
    val out = Tenancy.rlsScanPolicies(df, Seq(col("tenant") === 10L, col("id") > 1L))
    assert(out.select("id").as[Long].collect().toSet == Set(2L, 3L))
  }

  test("rlsScanPolicies with no policies is default-DENY, not full access") {
    assert(Tenancy.rlsScanPolicies(df, Seq.empty).count() == 0)
  }

  test("usage reports per-tenant rows and payload bytes") {
    val u = Tenancy.usage(df, "tenant", Seq("payload"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(u == Map(10L -> ((3L, 12L)), 20L -> ((1L, 2L)), 30L -> ((1L, 1L))))
  }

  test("enforce throws QuotaExceededException naming the offender on hard quotas") {
    val e = intercept[Tenancy.QuotaExceededException] {
      Tenancy.enforce(df, "tenant", Seq("payload"), Tenancy.Quota(maxRows = 2, maxBytes = 1000))
    }
    assert(e.getMessage.contains("10") && e.getMessage.contains("rows=3"))
  }

  test("enforce with soft quotas returns the offenders instead of throwing") {
    val over = Tenancy.enforce(df, "tenant", Seq("payload"),
      Tenancy.Quota(maxRows = 2, maxBytes = 1000, enforceHard = false))
    assert(over.select("tenant").as[Long].collect().toSeq == Seq(10L))
  }
}
