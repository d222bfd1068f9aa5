package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorOps

/**
 * HNSW ANN index (`NeuronDB/src/index/hnsw_am.c`, 3,044 LoC: handler
 * `:288`, build defaults m=16 / ef_construction=200 / ef_search=64 /
 * ml=0.36 / 16 levels `:81-85`, `hnswbeginscan:881`, `hnswSearch`
 * ~`:1500-2100`), re-architected for a distributed batch engine as
 * SURVEY §2.1 prescribes: **shard-local graphs, not one global graph**.
 *
 * A single pointer-chasing graph over 10¹¹ vectors cannot exist on one
 * machine, and a cross-machine graph walk would pay a network hop per
 * edge. The shape that survives 100 TB is the one every distributed ANN
 * system uses (e.g. Milvus/Vespa segment indexes): hash-partition the
 * corpus into `numShards` shards, build an independent in-memory HNSW
 * per shard inside `mapPartitions` (zero driver involvement, zero
 * shuffle beyond the initial repartition), persist the adjacency lists
 * as plain rows partitioned by shard, and serve a query by walking all
 * shard graphs in parallel and merging the per-shard top-k — the same
 * scatter-gather contract as [[Knn.search]]'s per-partition heaps.
 * Shards are sized to executor memory (numShards grows with the corpus;
 * each shard's graph is O(rows/numShards · m) edges).
 *
 * Determinism divergence (documented, same policy as IVF's fixed
 * seed): the reference assigns node levels with un-seeded `random()`;
 * we derive the level from a splitmix64 hash of the node id, so builds
 * are reproducible and results oracle-checkable. Insertion order is
 * id-sorted within a shard; all heap orderings tie-break on id.
 *
 * Graded recall contract (BASELINE.md): ef_search within the tuner
 * band [8,256] (`planner.c:225-237`) targeting recall ≥ 0.90; the
 * ef clamp of 100,000 (`hnsw_am.c:938-941`) is enforced in [[search]].
 */
object Hnsw {

  /** Build defaults = `hnsw_am.c:81-85`. */
  case class Params(m: Int = 16, efConstruction: Int = 200,
                    mL: Double = 0.36, maxLevel: Int = 16)

  /** One graph node: per-level adjacency (level 0 at index 0). The whole
    * index is just a DataFrame of these — writable, partition-prunable,
    * no driver-side state. */
  case class Node(shard: Int, id: Long, vec: Seq[Float], nbrs: Seq[Seq[Long]])

  private[operators] def distFn(metric: String): (Array[Float], Array[Float]) => Double =
    metric match {
      case "l2" | "euclidean"     => VectorOps.l2
      case "cosine"               => VectorOps.cosineDistance
      case "ip" | "inner_product" => VectorOps.innerProductDistance
      case other => throw new IllegalArgumentException(s"unknown metric: $other")
    }

  private def mix64(x: Long): Long = {
    var z = x + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Deterministic geometric level: floor(−ln(u)·mL), u ∈ (0,1] hashed
    * from the id (reference draws u from random(), `hnsw_am.c` insert). */
  private[operators] def levelFor(id: Long, p: Params): Int = {
    val u = ((mix64(id) >>> 11).toDouble + 1.0) / (1L << 53).toDouble
    math.min((-math.log(u) * p.mL).toInt, p.maxLevel - 1)
  }

  /** In-memory builder for ONE shard (runs inside a task; never sees
    * more than its shard's rows). Standard Malkov-Yashunin insert:
    * greedy descent above the node's level, ef_construction beam on the
    * levels it joins, closest-m neighbor selection, capped lists
    * (m above level 0, 2m at level 0). */
  private final class Builder(p: Params, dist: (Array[Float], Array[Float]) => Double) {
    val ids = mutable.ArrayBuffer[Long]()
    val vecs = mutable.ArrayBuffer[Array[Float]]()
    val nbrs = mutable.ArrayBuffer[Array[mutable.ArrayBuffer[Int]]]()
    var entry = -1
    var topLevel = -1

    private def d(q: Array[Float], n: Int): Double = dist(q, vecs(n))

    private def greedy(q: Array[Float], ep0: Int, level: Int): Int = {
      var ep = ep0
      var dEp = d(q, ep)
      var improved = true
      while (improved) {
        improved = false
        val ns = nbrs(ep)(level)
        var i = 0
        while (i < ns.length) {
          val c = ns(i)
          val dc = d(q, c)
          if (dc < dEp || (dc == dEp && ids(c) < ids(ep))) {
            ep = c; dEp = dc; improved = true
          }
          i += 1
        }
      }
      ep
    }

    /** Beam search on one level; ascending (dist, id) result. */
    private def searchLayer(q: Array[Float], ep: Int, ef: Int, level: Int): Vector[(Double, Int)] = {
      val visited = mutable.HashSet[Int](ep)
      val cand = mutable.PriorityQueue.empty[(Double, Int)](
        Ordering.by(t => (-t._1, -ids(t._2)))) // pops nearest first
      val res = mutable.PriorityQueue.empty[(Double, Int)](
        Ordering.by(t => (t._1, ids(t._2)))) // pops farthest first
      val d0 = d(q, ep)
      cand.enqueue((d0, ep)); res.enqueue((d0, ep))
      while (cand.nonEmpty) {
        val (dc, c) = cand.dequeue()
        if (dc > res.head._1 && res.size >= ef) { cand.clear() }
        else {
          val ns = nbrs(c)(level)
          var i = 0
          while (i < ns.length) {
            val e = ns(i)
            if (!visited(e)) {
              visited += e
              val de = d(q, e)
              if (res.size < ef || de < res.head._1) {
                cand.enqueue((de, e)); res.enqueue((de, e))
                if (res.size > ef) res.dequeue()
              }
            }
            i += 1
          }
        }
      }
      res.dequeueAll.reverseIterator.toVector // ascending
    }

    private def shrink(u: Int, level: Int, cap: Int): Unit = {
      val v = vecs(u)
      val kept = nbrs(u)(level)
        .map(n => (dist(v, vecs(n)), n))
        .sortBy(t => (t._1, ids(t._2)))
        .take(cap).map(_._2)
      nbrs(u)(level) = kept
    }

    def insert(id: Long, v: Array[Float]): Unit = {
      val lvl = levelFor(id, p)
      val node = ids.length
      ids += id; vecs += v
      nbrs += Array.fill(lvl + 1)(mutable.ArrayBuffer[Int]())
      if (entry < 0) { entry = node; topLevel = lvl; return }
      var ep = entry
      var lc = topLevel
      while (lc > lvl) { ep = greedy(v, ep, lc); lc -= 1 }
      lc = math.min(topLevel, lvl)
      while (lc >= 0) {
        val w = searchLayer(v, ep, p.efConstruction, lc)
        w.take(p.m).foreach { case (_, u) =>
          nbrs(node)(lc) += u
          nbrs(u)(lc) += node
          val cap = if (lc == 0) 2 * p.m else p.m
          if (nbrs(u)(lc).length > cap) shrink(u, lc, cap)
        }
        ep = w.head._2
        lc -= 1
      }
      if (lvl > topLevel) { topLevel = lvl; entry = node }
    }

    def toNodes(shard: Int): Iterator[Node] =
      ids.indices.iterator.map { n =>
        Node(shard, ids(n), vecs(n).toSeq,
          nbrs(n).map(_.map(ids(_).toLong).toSeq).toSeq)
      }
  }

  /**
   * Build the index: one repartition (the only shuffle), then each task
   * builds its shards' graphs independently. A row's shard is the STABLE
   * function `pmod(murmur3(id), numShards)` — not the task's partition
   * index — so [[insert]] can locate and rebuild exactly the shards a
   * batch of new rows touches. Returns the index as a DataFrame of
   * [[Node]] rows — `write`/`load` round-trips it through
   * shard-partitioned parquet so serving reads prune per shard.
   */
  def build(df: DataFrame, idCol: String, vecCol: String, numShards: Int = 32,
            params: Params = Params(), metric: String = "l2"): DataFrame = {
    require(numShards >= 1, "numShards must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val dist = distFn(metric)
    df.select(pmod(hash(col(idCol).cast("long")), lit(numShards)).as("shard"),
        col(idCol).cast("long").as("id"), col(vecCol).as("vec"))
      .repartition(numShards, col("shard"))
      .as[(Int, Long, Seq[Float])]
      .mapPartitions { it =>
        it.toArray.groupBy(_._1).iterator.flatMap { case (shard, rows) =>
          val b = new Builder(params, dist)
          rows.sortBy(_._2) // id-sorted insert: deterministic
            .foreach { case (_, id, v) => b.insert(id, v.toArray) }
          b.toNodes(shard)
        }
      }
      .toDF("shard", "id", "vec", "nbrs")
  }

  /**
   * Incremental maintenance (`hnswinsert`'s batch analog): route new
   * rows to their shards by the same stable hash, rebuild ONLY the
   * touched shards from their existing members plus the new rows, and
   * keep every untouched shard's rows as-is. Because the per-shard build
   * is deterministic and id-sorted, the result is bit-identical to a
   * full rebuild over the union — at the cost of |touched shards| /
   * numShards of the work.
   */
  def insert(index: DataFrame, df: DataFrame, idCol: String, vecCol: String,
             numShards: Int = 32, params: Params = Params(),
             metric: String = "l2"): DataFrame = {
    checkShardLayout(index, numShards)
    val newRows = df.select(col(idCol).cast("long").as("id"), col(vecCol).as("vec"))
      .withColumn("shard", pmod(hash(col("id")), lit(numShards)))
    val touched = newRows.select("shard").distinct()
      .collect().map(_.getInt(0)).toSeq
    val untouched = index.filter(!col("shard").isin(touched: _*))
    // UPSERT: a re-sent id replaces its old row — keeping both would give
    // the shard graph two nodes with one id and ShardGraph.byId would
    // serve a vector the edges weren't built from
    val members = index.filter(col("shard").isin(touched: _*))
      .select(col("id"), col("vec"))
      .join(newRows.select("id"), Seq("id"), "left_anti")
      .unionByName(newRows.select(col("id"), col("vec")))
    val rebuilt = build(members, "id", "vec", numShards, params, metric)
    untouched.select("shard", "id", "vec", "nbrs")
      .unionByName(rebuilt.select("shard", "id", "vec", "nbrs"))
  }

  def write(index: DataFrame, path: String): Unit =
    index.write.mode("overwrite").partitionBy("shard").parquet(path)

  def load(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /**
   * Deletion (the vacuum analog of [[insert]]): rebuild the shards that
   * contain deleted ids from their surviving members; untouched shards
   * keep their rows verbatim. Tombstone-free — the graph never serves a
   * deleted node, and determinism again makes the result bit-identical
   * to a full rebuild without the deleted rows.
   */
  def delete(index: DataFrame, ids: Seq[Long], numShards: Int = 32,
             params: Params = Params(), metric: String = "l2"): DataFrame = {
    if (ids.isEmpty) return index
    checkShardLayout(index, numShards)
    val shards = ids.map(idShard(_, numShards)).distinct
    val untouched = index.filter(!col("shard").isin(shards: _*))
    val members = index.filter(col("shard").isin(shards: _*))
      .filter(!col("id").isin(ids: _*))
      .select(col("id"), col("vec"))
    untouched.select("shard", "id", "vec", "nbrs")
      .unionByName(build(members, "id", "vec", numShards, params, metric)
        .select("shard", "id", "vec", "nbrs"))
  }

  /** Bulk-purge deletion ([[Ivf.deleteBulk]]'s HNSW form, the GDPR-
    * erasure shape): the erasure set arrives as an id FRAME, the
    * affected SHARDS are derived from the manifest ids ACTUALLY
    * PRESENT in the index (one semi-join — r14 advice: a retraction
    * manifest full of stray or already-purged ids must not trigger
    * rebuilds of shards that lose no members; ≤ numShards ints reach
    * the driver, never the ids themselves), survivors of those shards
    * are anti-joined against the frame, and only the affected shards'
    * graphs are rebuilt — untouched shards keep their adjacency
    * verbatim, same contract as [[delete]]. An empty or fully-stale
    * manifest is a no-op.
    *
    * Cost shape: rebuild is O(affected shards × shard size) — a
    * SCATTERED erasure (uniform ids) touches every shard and pays a
    * full-index rebuild, measured as the `hnsw_delete_bulk` cliff in
    * SCALE_BENCH.json; the lazy path ([[searchBatch]]'s `tombstones` +
    * [[compact]]) answers the same erasure with zero immediate rebuild
    * when that cliff is the wrong trade. */
  def deleteBulk(index: DataFrame, ids: DataFrame, numShards: Int = 32,
                 params: Params = Params(), metric: String = "l2"): DataFrame = {
    checkShardLayout(index, numShards)
    val del = ids.select(col(ids.columns.head).cast("long").as("id"))
    val shards = index.select(col("id"))
      .join(del, Seq("id"), "left_semi")
      .select(pmod(hash(col("id")), lit(numShards)).as("shard"))
      .distinct().collect().map(_.getInt(0)).toSeq
    if (shards.isEmpty) return index
    val untouched = index.filter(!col("shard").isin(shards: _*))
    val members = index.filter(col("shard").isin(shards: _*))
      .join(del, Seq("id"), "left_anti")
      .select(col("id"), col("vec"))
    untouched.select("shard", "id", "vec", "nbrs")
      .unionByName(build(members, "id", "vec", numShards, params, metric)
        .select("shard", "id", "vec", "nbrs"))
  }

  /** Collect an erasure-id frame into the broadcastable tombstone set
    * the LAZY deletion path uses. Driver-sized by design: a tombstone
    * set is bounded by [[compact]]'s threshold sweep (shards above
    * `minDeadFraction` rebuild and consume their tombstones), so it
    * stays erasure-batch-sized — millions of longs, not corpus-sized. */
  def tombstoneSet(ids: DataFrame): Set[Long] = {
    val c = ids.columns.head
    ids.select(col(c).cast("long")).distinct()
      .collect().map(_.getLong(0)).toSet
  }

  /** Threshold-triggered compaction of lazily-deleted (tombstoned)
    * shards — the second half of the mark-and-sweep deletion pair:
    * shards whose tombstoned fraction is ≥ `minDeadFraction` rebuild
    * WITHOUT their dead members (bit-identical to [[deleteBulk]] on
    * those shards, because the per-shard build is deterministic);
    * shards below the threshold keep their adjacency verbatim and
    * their tombstones stay active. Returns (compacted index,
    * surviving tombstones). `minDeadFraction = 0.0` compacts every
    * shard holding at least one tombstone — exactly [[deleteBulk]].
    * Driver sees only per-shard (size, dead) counts, ≤ numShards
    * rows. */
  def compact(index: DataFrame, tombstones: DataFrame, numShards: Int = 32,
              params: Params = Params(), metric: String = "l2",
              minDeadFraction: Double = 0.2): (DataFrame, DataFrame) = {
    checkShardLayout(index, numShards)
    // dedup: the same id legitimately arrives in two retraction epochs
    // (a re-submitted request) — counted twice it would inflate both a
    // shard's size and its dead count through the left_outer fan-out
    val del = tombstones
      .select(col(tombstones.columns.head).cast("long").as("id"))
      .distinct()
    val stats = index.select(col("shard"), col("id"))
      .join(del.withColumn("dead", lit(1)), Seq("id"), "left_outer")
      .groupBy("shard")
      .agg(count(lit(1)).as("n"), sum(coalesce(col("dead"), lit(0))).as("d"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    val shards = stats.collect {
      case (s, n, d) if d > 0 && d.toDouble / n >= minDeadFraction => s
    }.toSeq
    if (shards.isEmpty) return (index, del)
    val untouched = index.filter(!col("shard").isin(shards: _*))
    val members = index.filter(col("shard").isin(shards: _*))
      .join(del, Seq("id"), "left_anti")
      .select(col("id"), col("vec"))
    val compacted = untouched.select("shard", "id", "vec", "nbrs")
      .unionByName(build(members, "id", "vec", numShards, params, metric)
        .select("shard", "id", "vec", "nbrs"))
    // tombstones on compacted shards are consumed; the rest stay active
    val surviving = del
      .filter(!pmod(hash(col("id")), lit(numShards)).isin(shards: _*))
    (compacted, surviving)
  }

  /** Maintenance ops must be called with the numShards the index was
    * BUILT with — a mismatch would route new rows mod numShards' while
    * existing shards are mod numShards, mixing two incompatible layouts
    * (duplicated ids in rebuilt shards, orphans in untouched ones) with
    * no error at serve time. The layout is verifiable from the rows
    * themselves, so verify it. */
  private def checkShardLayout(index: DataFrame, numShards: Int): Unit = {
    val bad = index
      .filter(pmod(hash(col("id")), lit(numShards)) =!= col("shard"))
      .limit(1).count()
    require(bad == 0,
      s"index shard layout does not match numShards=$numShards — pass the build-time value")
  }

  /** The stable shard of an id — must mirror the hash used in [[build]]
    * (Catalyst murmur3 over a long, seed 42). */
  private[graft] def idShard(id: Long, numShards: Int): Int = {
    val h = org.apache.spark.sql.catalyst.expressions.Murmur3HashFunction.hash(
      id, org.apache.spark.sql.types.LongType, 42L).toInt
    val m = h % numShards
    if (m < 0) m + numShards else m
  }

  /** Search-time view of one shard rebuilt from its rows. */
  private[graft] final class ShardGraph(nodes: Array[Node],
                                 dist: (Array[Float], Array[Float]) => Double) {
    private val byId = new mutable.HashMap[Long, Node]()
    nodes.foreach(n => byId(n.id) = n)
    private val entry: Node =
      nodes.minBy(n => (-n.nbrs.length, n.id)) // max level, tie → min id
    private def vecOf(id: Long): Array[Float] = byId(id).vec.toArray

    /** `dead` is the LAZY-deletion filter (mark-and-sweep, the classic
      * HNSW answer to deletion): tombstoned nodes still ROUTE — the
      * walk traverses them like any node, preserving graph
      * connectivity — but never enter the result heap. At the
      * exhaustive dial (ef ≥ |shard|) the scan guarantees exactly
      * brute force over the SURVIVORS. At production ef the beam is
      * live-results-sized, so heavily tombstoned shards effectively
      * search a little wider; [[Hnsw.compact]] bounds that overhead by
      * rebuilding shards past a dead-fraction threshold. */
    def search(q: Array[Float], k: Int, ef: Int,
               dead: Long => Boolean = _ => false): Seq[(Long, Double)] = {
      // ef >= |shard| is the documented exhaustive limit (reference ef
      // clamp contract, hnsw_am.c:938-941): make it a GUARANTEE by
      // scanning, not a property contingent on level-0 connectivity —
      // the asymmetric closest-m shrink can in principle orphan a
      // node's inbound edges, and the hnsw_exhaustive oracle family
      // asserts brute-force equality
      if (math.max(ef, k) >= byId.size)
        return nodes.view.filterNot(n => dead(n.id))
          .map(n => (dist(q, n.vec.toArray), n.id))
          .toSeq.sorted.take(k).map { case (d, id) => (id, d) }
      var ep = entry.id
      var dEp = dist(q, vecOf(ep))
      var lc = entry.nbrs.length - 1
      while (lc > 0) { // greedy descent to level 1 (dead nodes may route)
        var improved = true
        while (improved) {
          improved = false
          byId(ep).nbrs(lc).foreach { c =>
            val dc = dist(q, vecOf(c))
            if (dc < dEp || (dc == dEp && c < ep)) { ep = c; dEp = dc; improved = true }
          }
        }
        lc -= 1
      }
      val efK = math.max(ef, k)
      val visited = mutable.HashSet[Long](ep)
      val cand = mutable.PriorityQueue.empty[(Double, Long)](Ordering.by(t => (-t._1, -t._2)))
      val res = mutable.PriorityQueue.empty[(Double, Long)](Ordering.by(identity))
      cand.enqueue((dEp, ep))
      if (!dead(ep)) res.enqueue((dEp, ep))
      while (cand.nonEmpty) {
        val (dc, c) = cand.dequeue()
        if (res.size >= efK && dc > res.head._1) { cand.clear() }
        else byId(c).nbrs(0).foreach { e =>
          if (!visited(e)) {
            visited += e
            val de = dist(q, vecOf(e))
            if (res.size < efK || de < res.head._1) {
              cand.enqueue((de, e))
              if (!dead(e)) {
                res.enqueue((de, e))
                if (res.size > efK) res.dequeue()
              }
            }
          }
        }
      }
      res.dequeueAll.reverseIterator.toSeq // ascending (dist, id)
        .take(k).map { case (d, id) => (id, d) }
    }
  }

  /** Executor-JVM memo of deserialized shard graphs, keyed by (index
    * fingerprint, shard, metric). A ShardGraph is rebuilt from rows on
    * every [[searchBatch]] call otherwise — for a hot serving index the
    * HashMap/entry construction dominates repeat-batch latency. Bounded
    * by per-entry LRU (access-ordered), so one index's overflow evicts
    * the COLDEST entries, never a hot index's shards — no latency cliff
    * on multi-index serving. An index rewrite changes the fingerprint,
    * so stale entries are never served, only aged out. */
  @volatile private[graft] var graphCacheCapacity = 512
  private[graft] val graphCache: java.util.Map[(String, Int, String), ShardGraph] =
    java.util.Collections.synchronizedMap(
      new java.util.LinkedHashMap[(String, Int, String), ShardGraph](64, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[(String, Int, String), ShardGraph]): Boolean =
          size() > graphCacheCapacity
      })
  private[graft] val graphBuilds = new java.util.concurrent.atomic.AtomicLong

  /** Get-or-build without holding the cache lock during construction:
    * a concurrent first-touch of the same shard may build twice, but the
    * graph is a pure function of the rows (bit-identical), so last-write
    * -wins is safe — and unrelated shards are never blocked behind a
    * heavy deserialization. */
  private def cachedGraph(key: (String, Int, String))
                         (mk: => ShardGraph): ShardGraph = {
    val hit = graphCache.get(key) // refreshes LRU recency
    if (hit != null) hit
    else {
      val g = mk
      graphCache.put(key, g)
      g
    }
  }

  /** Content fingerprint of an on-disk index: file names, sizes, mtimes.
    * Cheap (one listing), and any rewrite-in-place changes it. */
  def indexFingerprint(spark: SparkSession, path: String): String = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    var h = 1125899906842597L
    val it = fs.listFiles(p, true)
    while (it.hasNext) {
      val f = it.next()
      h = h * 31 + f.getPath.toString.hashCode
      h = h * 31 + f.getLen
      h = h * 31 + f.getModificationTime
    }
    s"$path@${java.lang.Long.toHexString(h)}"
  }

  /**
   * Batch ANN search: queries broadcast (tiny), every shard graph walked
   * in parallel where its rows live, per-shard top-k merged by one
   * |Q|·k·shards-row window — never a corpus-sized shuffle.
   * Returns (qid, id, distance, rank ≤ k).
   *
   * `cacheKey` (set by [[searchBatchFromDisk]]) memoizes the deserialized
   * per-shard graphs in the executor JVM, so repeated batches against the
   * same index skip graph reconstruction; results are bit-identical
   * either way (the graph is a pure function of the shard's rows).
   *
   * `tombstones` is the LAZY-deletion filter ([[tombstoneSet]]): the
   * set broadcasts with the queries and tombstoned ids are excluded
   * from every shard's result heap while still routing the walk —
   * erasure takes effect at the NEXT query with zero graph rebuild,
   * and [[compact]] reclaims the space later. Because the filter never
   * touches the graph rows, the executor graph cache stays valid
   * across tombstone changes.
   */
  def searchBatch(index: DataFrame, queries: Array[(Long, Array[Float])],
                  k: Int = 10, efSearch: Int = 64, metric: String = "l2",
                  cacheKey: Option[String] = None,
                  tombstones: Set[Long] = Set.empty): DataFrame = {
    require(queries.nonEmpty, "need at least one query")
    val ef = math.min(math.max(efSearch, 1), 100000) // hnsw_am.c:938-941 clamp
    val spark = index.sparkSession
    import spark.implicits._
    val dist = distFn(metric)
    val bq = spark.sparkContext.broadcast(queries)
    val bt = spark.sparkContext.broadcast(tombstones)
    index.select(col("shard"), col("id"), col("vec"), col("nbrs"))
      .repartition(col("shard"))
      .as[Node]
      .mapPartitions { it =>
        it.toArray.groupBy(_.shard).iterator.flatMap { case (shard, ns) =>
          val g = cacheKey match {
            case Some(fp) =>
              cachedGraph((fp, shard, metric)) {
                graphBuilds.incrementAndGet()
                new ShardGraph(ns, dist)
              }
            case None => new ShardGraph(ns, dist)
          }
          val dead: Long => Boolean =
            if (bt.value.isEmpty) _ => false else bt.value.contains
          bq.value.iterator.flatMap { case (qid, q) =>
            g.search(q, k, ef, dead).map { case (id, d) => (qid, id, d) }
          }
        }
      }
      .toDF("qid", "id", "distance")
      .withColumn("rank", row_number().over(
        Window.partitionBy("qid").orderBy(col("distance"), col("id"))))
      .filter(col("rank") <= k)
  }

  /** Serve from a [[write]]-persisted index with the executor graph
    * cache keyed by the on-disk fingerprint: the steady-state low-latency
    * path — first batch builds each shard graph once, later batches walk
    * the memoized graphs. */
  def searchBatchFromDisk(spark: SparkSession, path: String,
                          queries: Array[(Long, Array[Float])],
                          k: Int = 10, efSearch: Int = 64,
                          metric: String = "l2"): DataFrame =
    searchBatch(load(spark, path), queries, k, efSearch, metric,
      Some(indexFingerprint(spark, path)))

  /** Single-query top-k: (id, distance), ascending. */
  def search(index: DataFrame, query: Array[Float], k: Int = 10,
             efSearch: Int = 64, metric: String = "l2"): DataFrame =
    searchBatch(index, Array((0L, query)), k, efSearch, metric)
      .select("id", "distance")

  /** Exact top-k per query in ONE distributed pass (map-side explode of
    * corpus × broadcast queries + window rank) — the truth table for
    * [[recallCurve]] and [[recommendEf]]. */
  private def exactTopK(corpus: DataFrame, idCol: String, vecCol: String,
                        queries: Array[(Long, Array[Float])], k: Int,
                        metric: String): Map[Long, Set[Long]] = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val dist = distFn(metric)
    val bq = spark.sparkContext.broadcast(queries)
    val pairs = udf { (id: Long, v: Seq[Float]) =>
      val x = v.toArray
      bq.value.map { case (qid, q) => (qid, id, dist(q, x)) }.toSeq
    }
    corpus
      .select(explode(pairs(col(idCol).cast("long"), col(vecCol))).as("p"))
      .select(col("p._1").as("qid"), col("p._2").as("id"), col("p._3").as("d"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("qid").orderBy(col("d"), col("id"))))
      .filter(col("rk") <= k)
      .select(col("qid"), col("id")).as[(Long, Long)].collect()
      .groupBy(_._1).map { case (qid, rs) => qid -> rs.map(_._2).toSet }
  }

  /** Recall@k-vs-ef_search curve (the HNSW face of `Ivf.recallCurve`,
    * the tuner-evidence artifact): one exact pass for truth, one
    * [[searchBatch]] pass per ladder step. Returns (ef, recall_at_k). */
  def recallCurve(index: DataFrame, corpus: DataFrame, idCol: String, vecCol: String,
                  queries: Array[(Long, Array[Float])], k: Int = 10,
                  efs: Seq[Int] = Seq(8, 16, 32, 64, 128, 256),
                  metric: String = "l2"): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val truth = exactTopK(corpus, idCol, vecCol, queries, k, metric)
    efs.map(ef => (ef, recallAt(index, queries, truth, k, ef, metric)))
      .toDF("ef_search", s"recall_at_$k")
  }

  /** Measured recall@k of one searchBatch pass against exact truth. The
    * denominator is the TRUTH-SET size sum, not queries·k: a corpus with
    * fewer than k rows has k-truncated truth sets, and dividing by k
    * would cap "recall" below 1.0 for an exhaustive (perfect) search. */
  private def recallAt(index: DataFrame, queries: Array[(Long, Array[Float])],
                       truth: Map[Long, Set[Long]], k: Int, ef: Int,
                       metric: String): Double = {
    val spark = index.sparkSession
    import spark.implicits._
    val got = searchBatch(index, queries, k, ef, metric)
      .select(col("qid"), col("id")).as[(Long, Long)].collect()
      .groupBy(_._1).map { case (qid, rs) => qid -> rs.map(_._2).toSet }
    val denom = math.max(1L, truth.values.map(_.size.toLong).sum).toDouble
    val hits = truth.map { case (qid, t) =>
      (t & got.getOrElse(qid, Set.empty)).size }.sum
    hits / denom
  }

  /**
   * Self-tuning ef_search (`planner.c:220-237` learn_from_query band):
   * walk the doubling ladder inside [8,256], return the smallest ef
   * whose measured recall@k against the exact answer clears the target.
   * One brute-force pass establishes truth for ALL queries; each ladder
   * step is one [[searchBatch]] pass (offline tuner cost, not serve
   * path).
   */
  def recommendEf(index: DataFrame, corpus: DataFrame, idCol: String, vecCol: String,
                  sampleQueries: Array[(Long, Array[Float])], k: Int = 10,
                  targetRecall: Double = 0.9, metric: String = "l2"): Int = {
    val truth = exactTopK(corpus, idCol, vecCol, sampleQueries, k, metric)
    val ladder = Iterator.iterate(8)(_ * 2).takeWhile(_ <= 256).toSeq
    ladder.find(ef =>
      recallAt(index, sampleQueries, truth, k, ef, metric) >= targetRecall
    ).getOrElse(256)
  }
}
