package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Isolation forest anomaly detection (reference `ml_anomaly_detection.c`,
 * SQL `sql/26_ml_new_algorithms.sql:15-55`): random-split trees isolate
 * anomalies in fewer splits; score 2^(−E[path]/c(n)) ∈ (0,1), higher =
 * more anomalous.
 *
 * Shape: trees are built on a driver-side sample (trees are tiny —
 * `sampleSize` rows each), then broadcast; scoring is an embarrassingly
 * parallel map over the full table. Seeded throughout.
 */
object IsolationForest {

  sealed trait Node
  case class Leaf(size: Int) extends Node
  case class Split(dim: Int, threshold: Double, left: Node, right: Node) extends Node

  case class Forest(trees: Seq[Node], sampleSize: Int) {
    private val c = avgPathLength(sampleSize)
    def score(v: Array[Float]): Double = {
      val avgPath = trees.map(t => pathLength(t, v, 0)).sum / trees.size
      math.pow(2.0, -avgPath / c)
    }
  }

  /** c(n) per Liu et al.: c(1)=0, c(2)=1, harmonic form beyond — the raw
    * formula gives c(2)≈0.154 (and c(1)=0 would make every score 0/0). */
  private def avgPathLength(n: Int): Double =
    if (n <= 1) 0.0
    else if (n == 2) 1.0
    else 2.0 * (math.log(n - 1) + 0.5772156649) - 2.0 * (n - 1.0) / n

  private def pathLength(node: Node, v: Array[Float], depth: Int): Double = node match {
    case Leaf(size) => depth + avgPathLength(size)
    case Split(dim, thr, l, r) =>
      if (v(dim) < thr) pathLength(l, v, depth + 1) else pathLength(r, v, depth + 1)
  }

  private def buildTree(data: Array[Array[Float]], depth: Int, maxDepth: Int,
                        rnd: scala.util.Random): Node = {
    if (data.length <= 1 || depth >= maxDepth) Leaf(data.length)
    else {
      val dim = rnd.nextInt(data.head.length)
      val values = data.map(_(dim))
      val lo = values.min; val hi = values.max
      if (lo == hi) Leaf(data.length)
      else {
        val thr = lo + rnd.nextDouble() * (hi - lo)
        val (l, r) = data.partition(_(dim) < thr)
        Split(dim, thr, buildTree(l, depth + 1, maxDepth, rnd),
          buildTree(r, depth + 1, maxDepth, rnd))
      }
    }
  }

  def fit(df: DataFrame, vecCol: String, numTrees: Int = 100,
          sampleSize: Int = 256, seed: Long = 42L): Forest = {
    val sample = df.select(vecCol).limit(sampleSize * 4).collect()
      .map(_.getSeq[Float](0).toArray)
    // with one row c = avgPathLength(1) = 0 and every score is 2^(0/0) = NaN
    require(sample.length >= 2,
      s"isolation forest needs at least 2 rows, got ${sample.length}")
    require(sampleSize >= 2, s"sample_size must be at least 2, got $sampleSize")
    val rnd = new scala.util.Random(seed)
    val maxDepth = math.ceil(math.log(math.min(sampleSize, sample.length).toDouble) /
      math.log(2.0)).toInt
    val trees = (1 to numTrees).map { _ =>
      val sub = Array.fill(math.min(sampleSize, sample.length))(sample(rnd.nextInt(sample.length)))
      buildTree(sub, 0, maxDepth, rnd)
    }
    Forest(trees, math.min(sampleSize, sample.length))
  }

  /** Score every row; anomalies have scores near 1. */
  def score(df: DataFrame, vecCol: String, forest: Forest): DataFrame = {
    val b = df.sparkSession.sparkContext.broadcast(forest)
    val scoreUdf = udf((v: Seq[Float]) => b.value.score(v.toArray))
    df.withColumn("anomaly_score", scoreUdf(col(vecCol)))
  }
}
