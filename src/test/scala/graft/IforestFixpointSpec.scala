package graft

import org.apache.spark.sql.functions._
import graft.ml.IforestFixpoint

class IforestFixpointSpec extends SparkSpecBase {
  import spark.implicits._

  // tight 2-d cluster around the origin + 5 far-out planted anomalies
  private lazy val data = {
    val inliers = (0 until 200).map { i =>
      (i.toLong, Seq((math.sin(i * 0.37) * 0.5).toFloat, (math.cos(i * 0.73) * 0.5).toFloat))
    }
    val outliers = (0 until 5).map { i =>
      (1000L + i, Seq(8.0f + i, -7.5f - i))
    }
    (inliers ++ outliers).toDF("id", "vec")
  }

  test("scores are in (0,1) and planted anomalies rank above every inlier") {
    val s = IforestFixpoint.score(data, "id", "vec", numTrees = 20,
        sampleSize = 64, maxDepth = 6)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(s.values.forall(v => v > 0.0 && v < 1.0))
    val worstOutlier = (0 until 5).map(i => s(1000L + i)).min
    val bestInlier = (0 until 200).map(i => s(i.toLong)).max
    assert(worstOutlier > bestInlier,
      s"outlier floor $worstOutlier should exceed inlier ceiling $bestInlier")
  }

  test("deterministic across runs and repartitionings") {
    val a = IforestFixpoint.score(data, "id", "vec")
      .orderBy("id").collect().map(_.getDouble(1)).toSeq
    val b = IforestFixpoint.score(data.repartition(5), "id", "vec")
      .orderBy("id").collect().map(_.getDouble(1)).toSeq
    assert(a == b)
  }
}
