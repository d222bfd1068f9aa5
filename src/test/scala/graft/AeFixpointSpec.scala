package graft

import org.apache.spark.sql.functions._
import graft.ml.AeFixpoint

class AeFixpointSpec extends SparkSpecBase {
  import spark.implicits._

  // rank-2 structure in 8-d: reconstructible through a k=2 bottleneck
  private lazy val data = (0 until 150).map { i =>
    val a = math.sin(i * 0.31)
    val b = math.cos(i * 0.17)
    (i.toLong, (0 until 8).map(j => (a * (j + 1) * 0.1 + b * (8 - j) * 0.1).toFloat))
  }.toDF("id", "vec")

  test("training reduces mean reconstruction error") {
    def meanErr(epochs: Int): Double =
      AeFixpoint.score(data, "id", "vec", d = 8, k = 2, epochs = epochs)
        .agg(avg("sq_error")).head().getDouble(0)
    val early = meanErr(1)
    val late = meanErr(20)
    assert(late < early * 0.5, s"epoch-20 error $late !< half of epoch-1 error $early")
  }

  test("deterministic across runs and repartitionings") {
    val a = AeFixpoint.score(data, "id", "vec", epochs = 8)
      .orderBy("id").collect().map(_.getDouble(1)).toSeq
    val b = AeFixpoint.score(data.repartition(7), "id", "vec", epochs = 8)
      .orderBy("id").collect().map(_.getDouble(1)).toSeq
    // unordered gradient sums: equal far below the oracle's round-4
    a.zip(b).foreach { case (x, y) => assert(math.abs(x - y) < 1e-9) }
  }
}
