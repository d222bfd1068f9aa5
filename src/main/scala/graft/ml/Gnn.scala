package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorAggregates

/**
 * Graph-neural-network surface (SURVEY §2.10 GNN extras): GraphSAGE
 * neighbor sampling/aggregation and GCN node classification.
 *
 * Reference: `NeuronDB/src/ml/ml_graph_neural_networks.c`
 * (`gcn_train` :136-885 — dense n×n adjacency, 2-layer full-batch GD in
 * C; `graphsage_aggregate` :903-1146 — per-node BFS sampling + mean),
 * SQL surface `sql/26_ml_new_algorithms.sql:100-136`. Graph schema is
 * the reference's: edges(node_id, neighbor_id[, weight]),
 * features(node_id, features).
 *
 * Re-architecture: a dense n×n adjacency matrix cannot exist at 10⁹
 * nodes, so every propagation here is the sparse form — an edge-table
 * join + groupBy(node) aggregation, i.e. one shuffled SpMV per hop,
 * which is exactly how Pregel/GraphX shape the same computation. For
 * training we use the SGC simplification (Wu et al., ICML 2019,
 * "Simplifying Graph Convolutional Networks"): propagate features k
 * hops through the symmetric-normalized adjacency, then fit a logistic
 * model on the propagated features — same task surface (node
 * classification on D^{-1/2}(A+I)D^{-1/2} aggregation, reference
 * :62-134) with the nonlinearities dropped, trained distributed by
 * MLlib instead of single-node C loops.
 */
object Gnn {

  /**
   * `graphsage_aggregate` (ml_graph_neural_networks.c:903-1146),
   * set-oriented: BFS from every seed at once. Per frontier node, up to
   * `nSamples` neighbors; per seed, a flat budget of `nSamples · depth`
   * sampled nodes filled level by level (reference :1002-1057); the
   * pooled MEAN of the samples' feature vectors is the aggregate
   * (:1104-1117; multiset — duplicates count twice, the seed itself may
   * re-enter, exactly as the reference's flat pool does). Nodes without
   * a feature row contribute zero vectors (:1095-1101).
   *
   * Determinism divergence (documented): the reference samples with
   * `ORDER BY random()` un-seeded (:1016); we take the `nSamples`
   * LOWEST neighbor ids so results are reproducible and
   * oracle-checkable. Same cardinalities, same aggregation.
   *
   * Each level is one join frontier→edges (shuffle on node id) + one
   * window per (seed, parent) — frontier-sized, never graph-sized.
   *
   * Returns (node_id, aggregated: array<float>), one row per seed.
   */
  def graphsageAggregate(edges: DataFrame, features: DataFrame, seeds: DataFrame,
                         nSamples: Int = 10, depth: Int = 2): DataFrame = {
    require(nSamples >= 1 && depth >= 1, "n_samples and depth must be positive")
    val cap = nSamples * depth
    val e = edges.select(col("node_id").as("src"), col("neighbor_id").as("nb"))

    // Zero vector for featureless sampled nodes needs the corpus dim.
    val dim = features.select(size(col("features"))).head().getInt(0)

    var frontier = seeds.select(col("node_id").as("seed"),
      col("node_id").as("node"), lit(0L).as("ord"))
    var pool: DataFrame = null // (seed, node, level, ord)
    var level = 1
    while (level <= depth) {
      val perParent = Window.partitionBy(col("seed"), col("ord")).orderBy(col("nb"))
      val perSeed = Window.partitionBy(col("seed")).orderBy(col("ord"), col("nb"))
      var sampled = frontier.join(e, frontier("node") === e("src"))
        .withColumn("r", row_number().over(perParent))
        .filter(col("r") <= nSamples)
        .select(col("seed"), col("nb").as("node"),
          lit(level).as("level"), row_number().over(perSeed).as("ord"))
      if (pool != null) {
        // Remaining per-seed budget truncates this level in sample order.
        val used = pool.groupBy(col("seed").as("u_seed")).agg(count(lit(1)).as("used"))
        sampled = sampled.join(used, sampled("seed") === used("u_seed"), "left")
          .filter(col("ord") <= lit(cap) - coalesce(col("used"), lit(0L)))
          .select("seed", "node", "level", "ord")
      }
      pool = if (pool == null) sampled else pool.unionByName(sampled)
      frontier = sampled.select(col("seed"), col("node"),
        (col("level").cast("long") * cap + col("ord")).as("ord"))
      level += 1
    }

    val zero = array_repeat(lit(0.0f), dim)
    val pooled = pool
      .join(features.select(col("node_id").as("f_node"), col("features")),
        pool("node") === col("f_node"), "left")
      .select(col("seed").as("node_id"), coalesce(col("features"), zero).as("f"))
      .groupBy("node_id")
      .agg(VectorAggregates.vectorAvg(col("f")).as("aggregated"))
    // a seed with no outgoing edges never enters the pool; the contract is
    // one row per seed, so it gets the zero vector (the mean of an empty
    // sample pool, reference :1104-1117) instead of vanishing
    seeds.select(col("node_id")).distinct()
      .join(pooled, Seq("node_id"), "left")
      .select(col("node_id"), coalesce(col("aggregated"), zero).as("aggregated"))
  }

  /**
   * One hop of symmetric-normalized propagation X ← D^{-1/2}(A+I)D^{-1/2}X
   * (reference `normalize_adjacency` :62-92 + `gcn_forward` :94-134),
   * as a sparse edge join instead of a dense matmul. `edges` is treated
   * as undirected (the reference symmetrizes, :272-273) and self-loops
   * are added (:217). Passing `targets` restricts the computation to the
   * k-hop ego-graph that feeds those output nodes — exact, since hop h
   * of a node depends only on its neighbors' hop h−1.
   */
  def sgcPropagate(edges: DataFrame, features: DataFrame, hops: Int = 2,
                   targets: Option[DataFrame] = None,
                   assumeSymmetric: Boolean = false): DataFrame = {
    // `assumeSymmetric` is the caller's contract that `edges` already
    // holds BOTH directions of every edge, with no self-loops, no
    // duplicate edge rows, and unique feature node_ids (duplicates that
    // the dedup path would absorb via distinct() would here silently
    // inflate degrees and weights) — then the
    // reverse-union and the full-graph dedup shuffle both drop out
    // (self-loops are still appended; they cannot collide). At 10⁹ edges
    // the dedup is the single biggest shuffle in this operator, so a
    // caller that materializes edges symmetrically gets it for free.
    val withSelf =
      if (assumeSymmetric)
        edges.select(col("node_id").as("src"), col("neighbor_id").as("dst"))
          .unionByName(features.select(col("node_id").as("src"), col("node_id").as("dst")))
      else
        edges.select(col("node_id").as("src"), col("neighbor_id").as("dst"))
          .unionByName(edges.select(col("neighbor_id").as("src"), col("node_id").as("dst")))
          .unionByName(features.select(col("node_id").as("src"), col("node_id").as("dst")))
          .distinct() // one dedup pass covers symmetrization AND self-loops

    // Ego-graph pushdown: hop h of a node depends only on its neighbors'
    // hop h−1, so with `targets` the needed-node sets walk backwards:
    // needed(hops) = targets, needed(h−1) = N(needed(h)). Self-loops make
    // the sets NESTED (u ∈ N(u)). Degrees stay GLOBAL (normalization is a
    // whole-graph property), but each SpMV shrinks from graph-sized to
    // neighborhood-sized — the difference between propagating 10⁹ nodes
    // and the ~|targets|·deg^hops that feed them.
    val needed: Array[Option[DataFrame]] = {
      val a = Array.fill[Option[DataFrame]](hops + 1)(None)
      targets.foreach { t =>
        a(hops) = Some(t.select(col(t.columns.head).as("__need")).distinct())
        // The propagation loop only reads needed(1)..needed(hops), so the
        // backward walk stops at h = 1 (needed(0) would be dead plan).
        var h = hops - 1
        while (h >= 1) {
          a(h) = a(h + 1).map(n =>
            withSelf.join(n, withSelf("dst") === n("__need"), "left_semi")
              .select(col("src").as("__need")).distinct())
          h -= 1
        }
      }
      a
    }
    val deg = withSelf.groupBy(col("src").as("d_node")).agg(count(lit(1)).as("deg"))
    val norm = withSelf
      .join(deg, col("src") === col("d_node")).drop("d_node")
      .withColumnRenamed("deg", "deg_src")
      .join(deg, col("dst") === col("d_node")).drop("d_node")
      .withColumn("w", lit(1.0) / sqrt(col("deg_src") * col("deg")))
      .select("src", "dst", "w")

    val scaleV = udf { (v: Seq[Float], w: Double) =>
      val out = new Array[Float](v.length)
      var i = 0
      while (i < v.length) { out(i) = (v(i) * w).toFloat; i += 1 }
      out.toSeq
    }
    var x = features.select(col("node_id"), col("features"))
    var h = 0
    while (h < hops) {
      val hopNorm = needed(h + 1) match {
        case Some(n) => norm.join(n, norm("dst") === n("__need"), "left_semi")
        case None    => norm
      }
      x = hopNorm.join(x, hopNorm("src") === x("node_id"))
        .select(col("dst"), scaleV(col("features"), col("w")).as("wf"))
        .groupBy(col("dst").as("node_id"))
        .agg(VectorAggregates.vectorSum(col("wf")).as("features"))
      h += 1
    }
    // hops = 0 is the identity propagation; the loop never restricts the
    // output, so honor `targets` with an explicit semi-join.
    if (hops == 0) needed(0).foreach { n =>
      x = x.join(n, x("node_id") === n("__need"), "left_semi")
    }
    x
  }

  /**
   * `gcn_train` via the SGC reduction: k-hop propagated features into a
   * distributed logistic regression ([[UnifiedApi]]). Returns the
   * trained model; `predict` on propagated features classifies nodes.
   */
  def gcnTrain(edges: DataFrame, features: DataFrame, labels: DataFrame,
               hops: Int = 2, params: Map[String, String] = Map.empty): UnifiedApi.TrainedModel = {
    val propagated = sgcPropagate(edges, features, hops)
    val train = propagated.join(labels.select(col("node_id"), col("label")), "node_id")
    UnifiedApi.train("logistic_regression", train, "features", Some("label"), params)
  }

  /**
   * Deterministic logistic head for the SGC reduction — the
   * oracle-replayable counterpart of [[gcnTrain]]'s MLlib L-BFGS fit:
   * full-batch gradient descent with a FIXED iteration count, zero init,
   * and an appended bias coordinate. Per iteration: broadcast the 65
   * weights, ONE map-side-combined gradient aggregation (d+1 cells),
   * update on the driver — the classic scalable GD shape.
   *
   * Replay contract: per-row dot products fold left-to-right in
   * coordinate order (same as the oracle's `list_reduce`); only the
   * cross-row gradient sums are order-free float adds, so engines agree
   * to ~1e-14 after `iters` rounds — 10 orders below the round-4 output.
   *
   * Returns (node_id, prob) for EVERY feature row (labeled or not).
   */
  def logisticGdFixpoint(features: DataFrame, labels: DataFrame,
                         iters: Int = 10, lr: Double = 0.5): DataFrame = {
    val spark = features.sparkSession
    val withBias = udf((v: Seq[Float]) => {
      val out = new Array[Double](v.length + 1)
      var j = 0
      while (j < v.length) { out(j) = v(j).toDouble; j += 1 }
      out(v.length) = 1.0
      out.toSeq
    })
    val fl = features.select(col("node_id"), withBias(col("features")).as("xs"))
    val train = fl.join(
      labels.select(col("node_id"), col("label").cast("double").as("y")), "node_id")
      .persist()
    try {
      val n = train.count()
      val dim1 = fl.head().getSeq[Double](1).length
      var w = new Array[Double](dim1)
      def probUdf(wts: Array[Double]) = {
        val bw = spark.sparkContext.broadcast(wts)
        udf((xs: Seq[Double]) => {
          val ww = bw.value
          var z = 0.0
          var j = 0
          while (j < ww.length) { z += ww(j) * xs(j); j += 1 }
          1.0 / (1.0 + math.exp(-z))
        })
      }
      for (_ <- 1 to iters) {
        val p = probUdf(w)
        val grads = train
          .select(col("xs"), (col("y") - p(col("xs"))).as("r"))
          .select(col("r"), posexplode(col("xs")).as(Seq("j", "x")))
          .groupBy("j").agg(sum(col("r") * col("x")).as("g"))
          .collect().map(r => (r.getAs[Int]("j"), r.getAs[Double]("g"))).toMap
        w = Array.tabulate(dim1)(j => w(j) + lr * (grads.getOrElse(j, 0.0) / n))
      }
      fl.select(col("node_id"), probUdf(w)(col("xs")).as("prob"))
    } finally train.unpersist()
  }
}
