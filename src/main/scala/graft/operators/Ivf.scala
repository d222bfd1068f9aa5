package graft.operators

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorOps

/**
 * IVF (inverted-file) ANN index, the Spark-native answer to the
 * reference's `ivf` access method (`NeuronDB/src/index/ivf_am.c`:
 * k-means build `:371-376`, nprobe probe `ivfrescan:1440-1505`,
 * defaults nlists=100 / nprobe=10 `:54-55`).
 *
 * Build: MLlib KMeans (k-means|| seeding, explicit seed so results are
 * reproducible — the reference's `rand()` seeding is a documented
 * non-goal, SURVEY §7.4) assigns every row a `cluster_id`. The assigned
 * table is repartitioned by cluster so each posting list is co-located —
 * on a real cluster this would be written bucketed-by-cluster so probes
 * prune at the file level.
 *
 * Search: route the query to the `nprobe` nearest centroids driver-side
 * (tiny argmin over nlists rows), filter the assigned table to those
 * clusters — Catalyst pushes the `cluster_id IN (...)` filter to the scan
 * — then exact top-k over the surviving ~nprobe/nlists fraction of rows.
 * `nprobe = nlists` probes everything, so it must equal brute force
 * exactly (BASELINE.md's recall convention).
 *
 * A single global pointer-chasing HNSW graph is the wrong shape for a
 * distributed scan engine (SURVEY §7.4); IVF covers the batch ANN
 * contract with file-level pruning, and [[Hnsw]] provides the
 * reference's graph index as shard-local graphs for low-latency serving.
 */
object Ivf {

  case class IvfModel(
      centroids: Array[Array[Float]],
      assigned: DataFrame, // original columns + cluster_id
      vecCol: String) {

    /** Nearest-centroid ids for a query, closest first. */
    def route(query: Array[Float], nprobe: Int): Seq[Int] =
      centroids.zipWithIndex
        .map { case (c, i) => (VectorOps.l2(query, c), i) }
        .sortBy(_._1)
        .take(math.max(1, nprobe))
        .map(_._2).toSeq

    /** ANN top-k: probe nprobe posting lists, exact rescore inside them.
      * Routing and the posting lists themselves are L2-k-means; a
      * non-L2 `metric` rescore is legitimate but its recall rides the
      * same nprobe dial as [[Ivf.join]] (measured by `ivf_join_recall`)
      * — only `nprobe = nlists` is metric-independently exact. */
    def search(query: Array[Float], k: Int = 10, nprobe: Int = 10,
               metric: String = "l2"): DataFrame = {
      val probes = route(query, nprobe)
      Knn.search(
        assigned.filter(col("cluster_id").isin(probes: _*)),
        vecCol, query, k, metric)
    }
  }

  /** Persist the index partitioned by (ingest epoch, cluster id):
    * probes prune at the FILE level — `spark.read.parquet(...)
    * .filter(cluster_id IN ...)` reads only the probed clusters'
    * directories under every epoch. This is the on-disk shape the
    * 100 TB deployment uses (SCALING.md); centroids ride along as a
    * tiny side table.
    *
    * The outer `ingest` partition column is the REPLAY-IDEMPOTENCE key
    * of continuous ingestion (VERDICT r14 ask #1): the offline build
    * owns `ingest=base`, and each streaming micro-batch owns
    * `ingest=batch-<batchId>` written with DYNAMIC partition overwrite
    * ([[graft.streaming.StreamIndexIngest.ingestBatch]]) — a
    * crash-replayed micro-batch re-derives the same rows, routes them
    * identically (stateless kernel, fixed centroids), and REPLACES
    * exactly its own partitions instead of appending next to its first
    * attempt, so the loaded index can never hold a vector twice. One
    * scan relation regardless of batch count; a full (static-mode)
    * [[writePartitioned]] folds accumulated epochs back into
    * `ingest=base` — the compaction step, on the same cadence as
    * centroid re-tunes. */
  def writePartitioned(model: IvfModel, path: String): Unit = {
    model.assigned.withColumn("ingest", lit("base")).write.mode("overwrite")
      .partitionBy("ingest", "cluster_id").parquet(s"$path/assigned")
    writeCentroids(model.assigned.sparkSession, model.centroids, s"$path/centroids")
  }

  def loadPartitioned(spark: org.apache.spark.sql.SparkSession, path: String,
                      vecCol: String): IvfModel =
    IvfModel(readCentroids(spark, s"$path/centroids"),
      spark.read.parquet(s"$path/assigned").drop("ingest"), vecCol)

  /** The tiny centroid side table's ONE on-disk schema — shared with
    * [[IvfPq]] so the two layouts cannot drift. */
  private[operators] def writeCentroids(spark: org.apache.spark.sql.SparkSession,
                                        centroids: Array[Array[Float]],
                                        path: String): Unit = {
    import spark.implicits._
    centroids.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("cluster_id", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  private[operators] def readCentroids(spark: org.apache.spark.sql.SparkSession,
                                       path: String): Array[Array[Float]] =
    spark.read.parquet(path)
      .collect().sortBy(_.getInt(0)).map(_.getSeq[Float](1).toArray)

  /** Index diagnostics (`index_statistics`/`index_health`/
    * `index_tune_ivf`/`index_recommend_type`,
    * `neurondb--1.0.sql:2611-2688`; `src/index/index_tuning.c`,
    * `index_validator.c`): posting-list size distribution, imbalance, and
    * an nprobe recommendation targeting the reference tuner's recall band
    * (`src/planner/planner.c:220-233`). */
  def statistics(model: IvfModel): Map[String, Double] = {
    import org.apache.spark.sql.functions._
    val sizes = model.assigned.groupBy("cluster_id").count()
      .agg(min("count"), max("count"), avg("count"), stddev("count"), count(lit(1))).head()
    require(!sizes.isNullAt(0), "index has no assigned rows")
    val nlists = model.centroids.length.toDouble
    Map(
      "nlists" -> nlists,
      "populated_lists" -> sizes.getLong(4).toDouble,
      "min_list_size" -> sizes.getLong(0).toDouble,
      "max_list_size" -> sizes.getLong(1).toDouble,
      "avg_list_size" -> sizes.getDouble(2),
      // stddev is NULL for a single populated list
      "stddev_list_size" -> (if (sizes.isNullAt(3)) 0.0 else sizes.getDouble(3)),
      "imbalance" -> sizes.getLong(1).toDouble / math.max(1.0, sizes.getDouble(2)))
  }

  /**
   * Recall@k-vs-nprobe curve for a batch of queries in ONE distributed
   * pass (the evidence artifact the reference reports for its SIFT bench,
   * `dataset/gen_dataset.py:522`, tuner band `planner.c:220-233`).
   *
   * Identity that makes it single-pass: a member x of query q's TRUE
   * top-k is returned by the IVF probe at width p iff the probe rank of
   * x's posting list for q is ≤ p — any candidate closer than x is also
   * true-closer, so x can never be displaced from the candidate top-k.
   * Hence recall@k(p) = avg over queries of |{x ∈ true-top-k :
   * probeRank(x) ≤ p}| / k, and the WHOLE curve falls out of the true
   * top-k pair table:
   *
   *   1. map-side explode corpus × queries (queries + per-query centroid
   *      orderings broadcast — |Q|·nlists ints, tiny);
   *   2. partition-local k-heaps per query prune the pair stream IN the
   *      scan stage, so the window's shuffle carries at most |Q|·k rows
   *      per input partition — never the |D|·|Q| pair table;
   *   3. window rank per query id → keep rank ≤ k (|Q|·k rows);
   *   4. aggregate `probe_rank ≤ p` per requested p, normalized by the
   *      ACTUAL truth-pair count (a query with fewer than k eligible
   *      rows contributes its real neighbor count, so the exhaustive
   *      probe reads 1.0 even on tiny/excludeSelf corpora).
   *
   * No per-query driver loop, no per-nprobe re-probe.
   */
  def recallCurve(model: IvfModel, queries: Array[(Long, Array[Float])],
                  idCol: String, k: Int = 10,
                  nprobes: Seq[Int] = Seq(1, 2, 4, 8, 12, 16),
                  excludeSelf: Boolean = true): DataFrame = {
    require(queries.nonEmpty, "need at least one query")
    val idType = model.assigned.schema(idCol).dataType
    require(idType.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"idCol '$idCol' must be numeric, got $idType — a non-castable id " +
        "would null out and silently empty the curve")
    val spark = model.assigned.sparkSession
    import spark.implicits._
    val nlists = model.centroids.length
    // per-query probe order of every posting list: probeRank(q)(cluster)
    val probeRank: Map[Long, Array[Int]] = queries.map { case (qid, q) =>
      val order = model.route(q, nlists) // all centroids, closest first
      val rank = new Array[Int](nlists)
      order.zipWithIndex.foreach { case (c, i) => rank(c) = i + 1 }
      qid -> rank
    }.toMap
    val bQ = spark.sparkContext.broadcast(queries)
    val bPr = spark.sparkContext.broadcast(probeRank)
    val pairs = udf { (id: Long, v: Seq[Float], cid: Int) =>
      val x = v.toArray
      bQ.value.flatMap { case (qid, q) =>
        if (excludeSelf && qid == id) None
        else Some((qid, id, VectorOps.l2(q, x), bPr.value(qid)(cid)))
      }.toSeq
    }
    val kk = k
    val pruned = model.assigned
      .select(explode(pairs(col(idCol).cast("long"), col(model.vecCol), col("cluster_id"))).as("p"))
      .select(col("p._1").as("qid"), col("p._2").as("cid"),
        col("p._3").as("dist"), col("p._4").as("prank"))
      .as[(Long, Long, Double, Int)]
      .mapPartitions { it =>
        // local k-heap per qid, max-heap on (dist, cid) so the global
        // (dist, cid)-ordered top-k is preserved exactly
        val heaps = scala.collection.mutable.Map
          .empty[Long, scala.collection.mutable.PriorityQueue[(Double, Long, Int)]]
        it.foreach { case (qid, cid, dist, prank) =>
          val h = heaps.getOrElseUpdate(qid,
            scala.collection.mutable.PriorityQueue
              .empty[(Double, Long, Int)](Ordering.by(t => (t._1, t._2))))
          if (h.size < kk) h.enqueue((dist, cid, prank))
          else if (dist < h.head._1 || (dist == h.head._1 && cid < h.head._2)) {
            h.dequeue(); h.enqueue((dist, cid, prank))
          }
        }
        heaps.iterator.flatMap { case (qid, h) =>
          h.iterator.map { case (d, c, pr) => (qid, c, d, pr) }
        }
      }
      .toDF("qid", "cid", "dist", "prank")
    val topk = pruned
      .withColumn("rk", row_number().over(
        Window.partitionBy("qid").orderBy(col("dist"), col("cid"))))
      .filter(col("rk") <= k)
    nprobes.toDF("nprobe")
      .crossJoin(topk)
      .groupBy("nprobe")
      .agg((sum(when(col("prank") <= col("nprobe"), 1).otherwise(0)) /
        count(lit(1))).as(s"recall_at_$k"))
      .orderBy("nprobe")
  }

  /** Recommend nprobe for a target recall: smallest probe width on the
    * [[recallCurve]] clearing the target (one distributed pass for all
    * widths — replaces the per-nprobe re-probe loop). */
  def recommendNprobe(model: IvfModel, sampleQueries: Seq[Array[Float]],
                      k: Int = 10, targetRecall: Double = 0.9,
                      idCol: String = ""): Int = {
    val nlists = model.centroids.length
    val widths = Iterator.iterate(1)(_ * 2).takeWhile(_ < nlists).toSeq :+ nlists
    val qs = sampleQueries.zipWithIndex.map { case (q, i) => (i.toLong, q) }.toArray
    // default to the first NUMERIC column — columns.head alone is wrong
    // the moment a text/vector column leads the schema (recallCurve
    // rejects non-numeric ids rather than nulling them out)
    val id =
      if (idCol.nonEmpty) idCol
      else model.assigned.schema.fields
        .find(f => f.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType]
          && f.name != "cluster_id")
        .map(_.name)
        .getOrElse(throw new IllegalArgumentException(
          "no numeric id column found; pass idCol explicitly"))
    val curve = recallCurve(model, qs, id, k, widths, excludeSelf = false)
      .collect().map(r => (r.getInt(0), r.getDouble(1)))
    curve.collectFirst { case (p, r) if r >= targetRecall => p }.getOrElse(nlists)
  }

  /** The ONE routing kernel: assign each row its nearest centroid
    * (broadcast, nlists-sized; strict `<` argmin, so ties break to the
    * LOWER cluster id). Shared verbatim by [[insert]], the streaming
    * ingest paths ([[graft.streaming.StreamIndexIngest]]), IVFADC
    * maintenance ([[IvfPq.insert]]), and the `route_health` dial —
    * batch and stream routing cannot diverge because there is exactly
    * one definition. Returns `df` + `cluster_id`. */
  def routeWith(centroids: Array[Array[Float]], df: DataFrame,
                vecCol: String): DataFrame =
    routeWithDist(centroids, df, vecCol).drop("route_dist")

  /** [[routeWith]] exposing the argmin's OWN distance as `route_dist` —
    * the assignment already computes it, so emitting it is free. This is
    * what the per-batch `route_health` emission in
    * [[graft.streaming.StreamIndexIngest]] and the oracled
    * `route_health` dial aggregate (mean routing distance is the drift
    * signal imbalance alone can miss when clusters stay balanced but
    * everything lands FAR from its centroid). */
  def routeWithDist(centroids: Array[Array[Float]], df: DataFrame,
                    vecCol: String): DataFrame = {
    val bc = df.sparkSession.sparkContext.broadcast(centroids)
    val assign = udf((v: Seq[Float]) => {
      val q = v.toArray
      val cs = bc.value
      var best = 0; var bestD = Double.MaxValue; var i = 0
      while (i < cs.length) {
        val d = VectorOps.l2(q, cs(i))
        if (d < bestD) { bestD = d; best = i }
        i += 1
      }
      (best, bestD)
    })
    df.withColumn("__route", assign(col(vecCol)))
      .withColumn("cluster_id", col("__route._1"))
      .withColumn("route_dist", col("__route._2"))
      .drop("__route")
  }

  /** Incremental maintenance (the `ivfinsert` analog): new rows route to
    * their nearest EXISTING centroid via [[routeWith]] and append to that
    * posting list — no refit, no touch of existing rows. On the
    * partitioned layout this is an append of new files into the routed
    * clusters' directories. Centroids drift from the true means as data
    * accumulates; `statistics().imbalance` is the rebuild trigger. */
  def insert(model: IvfModel, df: DataFrame): IvfModel =
    model.copy(assigned = model.assigned
      .unionByName(routeWith(model.centroids, df, model.vecCol))
      .repartition(col("cluster_id")))

  /** Incremental deletion (the DELETE-on-an-indexed-table analog,
    * [[insert]]'s inverse): drop the rows from their posting lists —
    * no refit, no tombstones (Spark rewrites the routed partitions on
    * the next [[writePartitioned]]). Centroids keep their positions,
    * same drift contract as [[insert]]. The literal `isin` suits
    * DML-sized batches; [[deleteBulk]] is the production path for
    * large erasures. */
  def delete(model: IvfModel, idCol: String, ids: Seq[Long]): IvfModel = {
    require(ids.nonEmpty, "empty deletion batch")
    model.copy(assigned =
      model.assigned.filter(!col(idCol).isin(ids: _*)))
  }

  /** Bulk-purge deletion — the GDPR-erasure / corpus-retraction shape
    * of [[delete]]: anti-join the posting lists against an id FRAME,
    * so a million-row erasure set never rides the plan as a literal.
    * Same contract as [[delete]] (no refit, no tombstones, centroids
    * keep their positions; rebuild trigger = `statistics().imbalance`).
    * `ids` must carry a column named `idCol`; Catalyst broadcasts the
    * erasure set when it is small and shuffles both sides on the id
    * otherwise — either way ONE anti-join over the posting lists,
    * never a per-id filter chain. */
  def deleteBulk(model: IvfModel, idCol: String, ids: DataFrame): IvfModel =
    model.copy(assigned = model.assigned
      .join(ids.select(col(idCol)), Seq(idCol), "left_anti"))

  /** Batch index build. nlists/nprobe defaults match ivf_am.c:54-55. */
  def build(df: DataFrame, vecCol: String, nlists: Int = 100, seed: Long = 42L,
            maxIter: Int = 20): IvfModel = {
    val toMl = udf((v: Seq[Float]) => Vectors.dense(v.map(_.toDouble).toArray))
    val featured = df.withColumn("__features", toMl(col(vecCol)))
    val kmeans = new KMeans()
      .setK(nlists).setSeed(seed).setMaxIter(maxIter)
      .setFeaturesCol("__features").setPredictionCol("cluster_id")
    val model = kmeans.fit(featured)
    val assigned = model.transform(featured)
      .drop("__features")
      .repartition(col("cluster_id"))
    val centroids = model.clusterCenters.map(_.toArray.map(_.toFloat))
    IvfModel(centroids, assigned, vecCol)
  }

  /**
   * Cluster-blocked similarity join for large×large inputs: assign both
   * sides to the same centroids, shuffle-join on `cluster_id`, compute
   * distances only within blocks. Trades the O(|L|·|R|) cross product for
   * O(sum of per-cluster products) — the standard IVF blocking scheme.
   *
   * `nprobe` is the right side's multi-probe width: each right row joins
   * its `nprobe` nearest posting lists. nprobe=1 is the cheapest (misses
   * pairs whose members fall in different clusters, recall<1); larger
   * values buy recall linearly in cost; **nprobe = nlists is exhaustive
   * assignment and provably equals the cross join** — that is the
   * oracle-verified configuration, and the recall/cost dial between 1 and
   * nlists is the production setting. A pair is emitted at most once (the
   * left row sits in exactly one posting list).
   *
   * `pairFilter` (r15, guide §1.2): an optional cheap predicate over the
   * joined `l_*`/`r_*` columns evaluated BEFORE the distance kernel. A
   * caller that keeps only `l_id < r_id` pairs would otherwise pay the
   * kernel on every pair and throw half away — Catalyst evaluates the
   * caller's post-hoc filter conjunction distance-first (the inner
   * filter wins the CombineFilters order), so pushing the cheap half
   * here halves the kernel evaluations. Result set is identical: the
   * predicate commutes with the threshold filter.
   *
   * Cosine (r15, guide §1.2): per-SIDE squared norms are hoisted out of
   * the per-PAIR kernel (`normSq` once per left row / once per right row
   * BEFORE the probe explode), and each pair evaluates only the dot
   * product; the combine step is bit-identical to the fused kernel
   * (`DistanceExpressions.cosineFromParts`), so distances — and the
   * oracle hash — are unchanged while per-pair flops drop ~3×.
   */
  def join(model: IvfModel, other: DataFrame, otherVecCol: String,
           metric: String = "l2", threshold: Double, nprobe: Int = 1,
           pairFilter: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    val bCentroids = other.sparkSession.sparkContext.broadcast(model.centroids)
    val p = math.max(1, nprobe)
    val probeUdf = udf((v: Seq[Float]) => {
      val q = v.toArray
      val cs = bCentroids.value
      val ds = Array.tabulate(cs.length)(i => (VectorOps.l2(q, cs(i)), i))
      ds.sortBy(_._1).take(math.min(p, cs.length)).map(_._2).toSeq
    })
    val cosine = metric == "cosine"
    val l0 = model.assigned.select(
      model.assigned.columns.map(c => col(c).as(if (c == "cluster_id") c else s"l_$c")).toSeq: _*)
    val l = if (cosine)
      l0.withColumn("__l_nsq",
        graft.plans.DistanceExpressions.normSq(col(s"l_${model.vecCol}")))
    else l0
    val r0 = if (cosine)
      other.withColumn("__r_nsq",
        graft.plans.DistanceExpressions.normSq(col(otherVecCol)))
    else other
    val rCols = other.columns.map(c => col(c).as(s"r_$c")) ++
      (if (cosine) Seq(col("__r_nsq")) else Nil)
    val r = r0.withColumn("cluster_id", explode(probeUdf(col(otherVecCol))))
      .select((rCols :+ col("cluster_id")).toSeq: _*)
    val joined0 = l.join(r, "cluster_id")
    val joined = pairFilter.map(joined0.filter).getOrElse(joined0)
    val dist =
      if (cosine) graft.plans.DistanceExpressions.cosineFromParts(
        graft.plans.DistanceExpressions.dot(
          col(s"l_${model.vecCol}"), col(s"r_$otherVecCol")),
        col("__l_nsq"), col("__r_nsq"))
      else Knn.distCol(metric)(col(s"l_${model.vecCol}"), col(s"r_$otherVecCol"))
    joined
      .withColumn("distance", dist)
      .filter(col("distance") <= threshold)
      .drop("__l_nsq", "__r_nsq")
  }

  /** Per-cluster covering radius, max over members of d(member, centroid):
    * the bound that makes [[knnJoin]] exact. One tiny aggregate (nlists
    * rows to the driver). */
  def radii(model: IvfModel): Array[Double] = {
    val bc = model.assigned.sparkSession.sparkContext.broadcast(model.centroids)
    val dUdf = udf((v: Seq[Float], cid: Int) => VectorOps.l2(v.toArray, bc.value(cid)))
    val rows = model.assigned
      .select(col("cluster_id"), dUdf(col(model.vecCol), col("cluster_id")).as("d"))
      .groupBy("cluster_id").agg(max("d").as("r"))
      .collect()
    val out = new Array[Double](model.centroids.length)
    rows.foreach(r => out(r.getInt(0)) = r.getDouble(1))
    out
  }

  /**
   * EXACT distributed k-NN join — every query row gets its true k nearest
   * train rows, with no broadcast of the train table (only centroids +
   * radii, nlists-sized, are broadcast). The scale shape for
   * `knn_classify`/`knn_regress`/`vec_join(k)` on large train sides.
   *
   * Two passes, both shuffle joins on `cluster_id`:
   *  1. probe the `initProbes` nearest posting lists → candidate k-th
   *     distance D_k per query (an upper bound on the true k-th distance);
   *  2. probe every cluster whose lower bound d(q,c) − radius(c) ≤ D_k —
   *     by the triangle inequality that set contains ALL true top-k
   *     members — and take the exact top-k inside it.
   *
   * Pruning power tracks the data's cluster structure: tight clusters
   * prune hard, unclusterable high-dim data degrades to a scan of most
   * lists (but never loses exactness). Queries with fewer than k
   * first-pass candidates fall back to probing everything.
   *
   * Output: query columns + `t_`-prefixed train columns + `distance` +
   * `rank` (1..k, ordered by distance then `tieBreak` train columns).
   */
  def knnJoin(model: IvfModel, queries: DataFrame, qVecCol: String, qIdCol: String,
              k: Int, metric: String = "l2", initProbes: Int = 4,
              tieBreak: Seq[String] = Nil): DataFrame = {
    require(metric == "l2" || metric == "euclidean",
      s"knnJoin bounds need a metric space; got $metric (map cosine to normalized-L2 first)")
    val spark = queries.sparkSession
    val bc = spark.sparkContext.broadcast(model.centroids)
    val br = spark.sparkContext.broadcast(radii(model))

    val train = model.assigned.select(
      model.assigned.columns.map(c => col(c).as(if (c == "cluster_id") c else s"t_$c")).toSeq: _*)
    val dist = Knn.distCol(metric)(col(qVecCol), col(s"t_${model.vecCol}"))
    val ord = (col("distance") +: tieBreak.map(c => col(s"t_$c"))).toSeq

    // pass 1: nearest initProbes lists → per-query candidate k-th distance
    val probe1 = udf((v: Seq[Float]) => {
      val q = v.toArray; val cs = bc.value
      val ds = Array.tabulate(cs.length)(i => (VectorOps.l2(q, cs(i)), i))
      ds.sortBy(_._1).take(math.min(math.max(1, initProbes), cs.length)).map(_._2).toSeq
    })
    val cand1 = queries.select(col(qIdCol), col(qVecCol), explode(probe1(col(qVecCol))).as("cluster_id"))
      .join(train, "cluster_id")
      .withColumn("distance", dist)
    val dk = cand1
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col(qIdCol)).orderBy(col("distance"))))
      .filter(col("__rn") === k)
      .select(col(qIdCol), col("distance").as("__dk"))

    // pass 2: every list whose lower bound beats D_k (null D_k → all lists)
    val probe2 = udf((v: Seq[Float], dkv: java.lang.Double) => {
      val q = v.toArray; val cs = bc.value; val rs = br.value
      val bound = if (dkv == null) Double.MaxValue else dkv.doubleValue + 1e-9
      (0 until cs.length).filter(i => VectorOps.l2(q, cs(i)) - rs(i) <= bound)
    })
    queries.join(dk, Seq(qIdCol), "left")
      // keep EVERY query column (labels, weights…), as the output
      // contract promises — callers must not pay a re-join to get them
      .select((queries.columns.map(col) :+
        explode(probe2(col(qVecCol), col("__dk"))).as("cluster_id")).toSeq: _*)
      .join(train, "cluster_id")
      .withColumn("distance", dist)
      .withColumn("rank", row_number().over(
        Window.partitionBy(col(qIdCol)).orderBy(ord: _*)))
      .filter(col("rank") <= k)
      .drop("cluster_id")
  }
}
