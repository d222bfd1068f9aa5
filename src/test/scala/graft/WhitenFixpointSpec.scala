package graft

import org.apache.spark.sql.functions._
import graft.ml.WhitenFixpoint

class WhitenFixpointSpec extends SparkSpecBase {
  import spark.implicits._

  // anisotropic 3-d cloud: x0 dominates, x1 correlated, x2 tiny noise
  private lazy val cloud = (0 until 300).map { i =>
    val a = math.sin(i * 0.7) * 4.0
    val b = a * 0.5 + math.cos(i * 1.3)
    val c = math.sin(i * 2.9) * 0.05
    (i.toLong, Seq(a.toFloat, b.toFloat, c.toFloat))
  }.toDF("id", "vec")

  test("whitened components have ~unit variance and near-zero mean") {
    val w = WhitenFixpoint.whiten(cloud, "id", "vec", k = 2, iters = 15)
    val stats = w.groupBy("pos")
      .agg(avg(col("val")).as("m"), var_pop(col("val")).as("v"))
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2)))
    assert(stats.length == 2)
    stats.foreach { case (pos, m, v) =>
      assert(math.abs(m) < 0.05, s"pos=$pos mean=$m")
      // power iteration at fixed count: variance within 10% of unit
      assert(v > 0.9 && v < 1.1, s"pos=$pos var=$v")
    }
  }

  test("top-2 whitened directions are decorrelated") {
    val w = WhitenFixpoint.whiten(cloud, "id", "vec", k = 2, iters = 15)
    val wide = w.groupBy("id").pivot("pos", Seq(0, 1)).agg(first("val"))
    val corr = wide.stat.corr("0", "1")
    assert(math.abs(corr) < 0.05, s"corr=$corr")
  }

  test("deterministic across runs and repartitionings") {
    val a = WhitenFixpoint.whiten(cloud, "id", "vec", k = 2, iters = 8)
      .orderBy("id", "pos").collect().map(_.getDouble(2)).toSeq
    val b = WhitenFixpoint.whiten(cloud.repartition(7), "id", "vec", k = 2, iters = 8)
      .orderBy("id", "pos").collect().map(_.getDouble(2)).toSeq
    assert(a == b)
  }
}
