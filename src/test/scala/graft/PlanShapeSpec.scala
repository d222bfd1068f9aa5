package graft

import org.apache.spark.sql.functions._

/** Plan-shape assertions: the scale properties the engine relies on
  * (scan pruning/pushdown, broadcast joins, heap-based top-k) must be
  * visible in the optimized plans, not assumed. */
class PlanShapeSpec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("filter + projection push down to the parquet scan") {
    val df = Tables.read(spark, dir, "lineitem")
      .filter(col("l_quantity") > 30)
      .select("l_orderkey", "l_quantity")
    val scan = df.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PushedFilters") && scan.contains("GreaterThan(l_quantity"),
      s"filter not pushed: $scan")
    assert(scan.contains("ReadSchema") && !scan.contains("l_extendedprice"),
      s"columns not pruned: $scan")
  }

  test("dimension joins broadcast (q2_join)") {
    val plan = planOf(SparkEntry.queries("q2_join")(spark, dir))
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join in: $plan")
    assert(!plan.contains("SortMergeJoin"), s"unexpected shuffle join in: $plan")
  }

  test("kNN top-k avoids global sort at any input size") {
    val plan = planOf(SparkEntry.queries("v_l2_knn")(spark, dir))
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("native distance expressions stay in the plan (no ScalaUDF for hot metrics)") {
    val q = Tables.queryVector(spark, dir, 0L)
    val df = operators.Knn.search(Tables.read(spark, dir, "embeddings"), "embedding", q, 5)
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.contains("vector_l2_distance"), plan)
    assert(!plan.toLowerCase.contains("scalaudf"), s"hot path fell back to UDF: $plan")
  }

  test("aggregation plans two-phase partial/final (map-side combine)") {
    val plan = planOf(SparkEntry.queries("q1_agg")(spark, dir))
    assert(plan.contains("HashAggregate"), plan)
    // partial + final pair: the aggregate operator appears at least twice
    assert("HashAggregate".r.findAllIn(plan).size >= 2, s"no partial aggregation: $plan")
  }

  test("vector aggregates also plan partial/final (ObjectHashAggregate)") {
    val df = Tables.read(spark, dir, "embeddings")
      .groupBy(col("label"))
      .agg(functions.VectorAggregates.vector_avg(col("embedding")))
    val plan = planOf(df)
    assert("ObjectHashAggregate|SortAggregate|HashAggregate".r.findAllIn(plan).size >= 2, plan)
  }
}
