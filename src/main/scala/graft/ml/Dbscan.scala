package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Knn

/**
 * DBSCAN (reference `ml_dbscan.c:41-120` — recursive region expansion).
 * The recursion is the wrong shape for distributed data (SURVEY §7.4);
 * re-expressed as:
 *   1. eps-neighbor pairs via similarity join (broadcast at test scale;
 *      swap in [[graft.operators.Ivf.join]] cluster blocking for
 *      large×large — same contract, bounded pair generation);
 *   2. core points = neighbor count ≥ minPts (self included, matching the
 *      reference's region query);
 *   3. clusters = connected components of the core-core eps graph —
 *      union-find over the collected core edges (edges are
 *      O(cores · avg-degree), far smaller than the input; a Pregel-style
 *      min-label propagation replaces it beyond driver memory);
 *   4. border points join any core neighbor's cluster (lowest cluster id
 *      for determinism); everything else is noise (-1).
 *
 * Cluster ids are the minimum member core id — stable across runs.
 */
object Dbscan {

  def fit(df: DataFrame, idCol: String, vecCol: String,
          eps: Double, minPts: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._

    val pts = df.select(col(idCol).cast("long").as("id"), col(vecCol).as("vec"))
    val pairs = Knn.vecJoin(pts, pts, "vec", "vec", "l2", threshold = eps)
      .select(col("l_id").as("a"), col("r_id").as("b"))
      .cache()

    val degrees = pairs.groupBy("a").agg(count(lit(1)).as("deg"))
    val cores = degrees.filter(col("deg") >= minPts).select(col("a").as("id"))

    // union-find over core-core edges
    val coreSet = cores.as[Long].collect().toSet
    val coreEdges = pairs
      .filter(col("a") < col("b"))
      .as[(Long, Long)].collect()
      .filter { case (a, b) => coreSet(a) && coreSet(b) }

    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      var c = x
      while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    coreSet.foreach(c => parent(c) = c)
    coreEdges.foreach { case (a, b) =>
      val ra = find(a); val rb = find(b)
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    // normalize to min-id representative
    val clusterOf = coreSet.map(c => c -> find(c)).toMap
    val minRep = clusterOf.groupBy(_._2).map { case (rep, members) =>
      rep -> members.keys.min
    }
    val coreCluster = coreSet.map(c => c -> minRep(clusterOf(c))).toSeq.toDF("id", "cluster")

    // border points: nearest label = min cluster among core neighbors
    val borderCluster = pairs
      .join(coreCluster.withColumnRenamed("id", "b").withColumnRenamed("cluster", "bc"), "b")
      .groupBy(col("a").as("id")).agg(min(col("bc")).as("cluster"))

    pts.select("id")
      .join(coreCluster.withColumnRenamed("cluster", "core_cluster"), Seq("id"), "left")
      .join(borderCluster.withColumnRenamed("cluster", "border_cluster"), Seq("id"), "left")
      .select(col("id"),
        coalesce(col("core_cluster"), col("border_cluster"), lit(-1L)).as("cluster"))
  }
}
