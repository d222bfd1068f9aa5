package graft

import org.apache.spark.sql.functions._
import graft.ml.Lof
import graft.operators.{Ivf, Knn}

class LofIvfPersistSpec extends SparkSpecBase {
  import spark.implicits._

  test("LOF: cluster points score ~1, isolated point scores highest") {
    val rnd = new scala.util.Random(7)
    val cluster = Seq.fill(60)((Seq(rnd.nextGaussian().toFloat * 0.2f,
      rnd.nextGaussian().toFloat * 0.2f)))
    val pts = (cluster :+ Seq(8f, 8f)).zipWithIndex.map { case (v, i) => (i.toLong, v) }
    val df = pts.toDF("id", "vec")
    val scores = Lof.score(df, "id", "vec", k = 5)
      .as[(Long, Double)].collect().toMap
    val outlier = scores(60L)
    val inliers = scores.filter(_._1 != 60L).values
    assert(outlier > inliers.max * 2, s"outlier $outlier vs max inlier ${inliers.max}")
    assert(inliers.sum / inliers.size < 1.5)
  }

  test("IVF persisted partitioned-by-cluster prunes at the scan (partition filters)") {
    val emb = Tables.read(spark, "/root/testdata/sf0.001", "embeddings")
    val model = Ivf.build(emb, "embedding", nlists = 8, seed = 42L)
    val tmp = java.nio.file.Files.createTempDirectory("ivf").toString
    Ivf.writePartitioned(model, tmp)
    val loaded = Ivf.loadPartitioned(spark, tmp, "embedding")
    assert(loaded.centroids.length == 8)

    val q = Tables.queryVector(spark, "/root/testdata/sf0.001", 3L)
    // search through the loaded index equals in-memory search
    val inMem = model.search(q, 10, nprobe = 8).select("vec_id").as[Long].collect().toSet
    val onDisk = loaded.search(q, 10, nprobe = 8).select("vec_id").as[Long].collect().toSet
    assert(onDisk == inMem)

    // the probe filter must reach the scan as a partition filter
    val probed = loaded.search(q, 10, nprobe = 2)
    val scan = probed.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PartitionFilters") && scan.contains("cluster_id"),
      s"no partition pruning in scan: $scan")
  }
}
