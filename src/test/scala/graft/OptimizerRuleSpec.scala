package graft

import org.apache.spark.sql.functions._
import graft.functions.{GraftFunctions, VectorFunctions => VF}
import graft.plans.GraftOptimizations

class OptimizerRuleSpec extends SparkSpecBase {
  import spark.implicits._

  override def beforeAll(): Unit = {
    super.beforeAll()
    GraftFunctions.registerAll(spark)
    GraftOptimizations.install(spark)
  }

  test("SQL distance UDF calls are promoted to native expressions") {
    Tables.read(spark, "/root/testdata/sf0.001", "embeddings")
      .createOrReplaceTempView("emb_opt")
    val df = spark.sql(
      """SELECT vec_id, vector_l2_distance(embedding,
        |  (SELECT first(embedding) FROM emb_opt WHERE vec_id = 0)) AS d
        |FROM emb_opt""".stripMargin)
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.toLowerCase.contains("scalaudf"), optimized)
    assert(optimized.contains("vector_l2_distance"), optimized)
    // and it still computes the right thing
    val d0 = df.filter($"vec_id" === 0).select("d").as[Double].head()
    assert(d0 == 0.0)
  }

  test("promotion preserves UDF results exactly") {
    val e = Tables.read(spark, "/root/testdata/sf0.001", "embeddings").limit(50)
    val q = Tables.queryVector(spark, "/root/testdata/sf0.001", 5L)
    val viaUdf = e.select($"vec_id", VF.cosineUdf($"embedding", lit(q)).as("d"))
      .as[(Long, Double)].collect().toMap
    val viaExpr = e.select($"vec_id",
      graft.plans.DistanceExpressions.cosine($"embedding", lit(q)).as("d"))
      .as[(Long, Double)].collect().toMap
    assert(viaUdf == viaExpr) // bit-identical, same kernels
  }

  test("non-array or wrong-arity calls are left alone") {
    // vector_norm is single-arg: not in the promotion table, stays a UDF
    val df = spark.sql("SELECT vector_norm(array(3.0F, 4.0F)) AS n")
    assert(df.head().getDouble(0) == 5.0)
  }
}
