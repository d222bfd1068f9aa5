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
 *      iterative min-label propagation over the edge DataFrame
 *      ([[connectedComponents]]), nothing collected to the driver;
 *   4. border points join any core neighbor's cluster (lowest cluster id
 *      for determinism); everything else is noise (-1).
 *
 * Cluster ids are the minimum member core id — stable across runs.
 */
object Dbscan {

  /**
   * Connected components by min-label propagation: every node starts as
   * its own label; each round takes the min of its label and its
   * neighbors' labels; fixpoint = min node id of the component. Each
   * round is one shuffle join + aggregate; rounds ≤ graph diameter.
   * `localCheckpoint` cuts the growing lineage so round N's plan does not
   * replay rounds 1..N−1.
   *
   * Input: undirected edges (a, b); output: (id, label) for every
   * endpoint. Isolated nodes (no edges) don't appear — callers coalesce
   * to the node's own id.
   */
  def connectedComponents(edges: DataFrame, maxIter: Int = 50): DataFrame = {
    // r16: sym's checkpoint is LAZY — labels reads every sym partition
    // (global distinct), so the ONE eager labels job materializes both
    // pinned states; the eager-eager form paid two jobs for the same
    // blocks (guide §2.4: don't pay a materialization the dataflow
    // doesn't need). Rounds still read sym's cached blocks, not lineage.
    val sym = edges.select(col("a"), col("b"))
      .union(edges.select(col("b").as("a"), col("a").as("b")))
      .distinct()
      .localCheckpoint(false)
    var labels = sym.select(col("a").as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint()
    var changed = 1L
    var i = 0
    while (changed > 0 && i < maxIter) {
      val nbrMin = sym.join(labels, sym("b") === labels("id"))
        .groupBy(sym("a").as("nid")).agg(min("label").as("nbr_label"))
      // r15: LAZY checkpoint — the convergence count is the action that
      // materializes it, so each round costs ONE job (the eager form
      // paid a checkpoint job AND a count job per round). The blocks
      // are cached either way; `labels` below reads them, not lineage.
      val next = labels.join(nbrMin, labels("id") === nbrMin("nid"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nbr_label"), col("label"))).as("label"),
          (coalesce(col("nbr_label"), col("label")) < col("label")).as("chg"))
        .localCheckpoint(false)
      changed = next.filter(col("chg")).count()
      labels = next.select("id", "label")
      i += 1
    }
    if (changed > 0)
      throw new IllegalStateException(s"connectedComponents did not converge in $maxIter rounds")
    labels
  }

  /** `maxIter` bounds min-label propagation rounds (≥ the core graph's
    * diameter); filament-shaped clusters need more than the default. */
  def fit(df: DataFrame, idCol: String, vecCol: String,
          eps: Double, minPts: Int, maxIter: Int = 50): DataFrame = {
    // same loud reject as Dedup.dupGroups: a non-numeric id casts to NULL
    // and the whole pipeline degenerates to NULL-key garbage silently
    val idType = df.schema(idCol).dataType
    require(idType.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"idCol '$idCol' must be numeric, got $idType (hash string ids to longs upstream)")
    val pts = df.select(col(idCol).cast("long").as("id"), col(vecCol).as("vec"))
    val pairs = Knn.vecJoin(pts, pts, "vec", "vec", "l2", threshold = eps)
      .select(col("l_id").as("a"), col("r_id").as("b"))
      .cache()

    val degrees = pairs.groupBy("a").agg(count(lit(1)).as("deg"))
    val cores = degrees.filter(col("deg") >= minPts).select(col("a").as("id")).cache()

    // core-core eps edges (no self loops), components distributed
    val coreEdges = pairs
      .filter(col("a") < col("b"))
      .join(cores.withColumnRenamed("id", "a"), "a")
      .join(cores.withColumnRenamed("id", "b"), "b")
      .select("a", "b")
    val comp = connectedComponents(coreEdges, maxIter)
    // isolated cores (minPts of border neighbors, no core neighbor) keep
    // their own id as the cluster label
    val coreCluster = cores
      .join(comp, Seq("id"), "left")
      .select(col("id"), coalesce(col("label"), col("id")).as("cluster"))

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
