package graft.functions

/**
 * Parsers/renderers for the reference's text formats, used for fixture
 * loading and API compatibility:
 *   - dense `vector`: `'[1.0, 2.0, 3.0]'` — whitespace and scientific
 *     notation tolerated, empty `[]` is an error
 *     (`NeuronDB/sql/01_types_basic.sql:12-31`);
 *   - `vecmap` sparse map `{dim:D, nnz:N, indices:[..], values:[..]}`
 *     (`NeuronDB/neurondb--1.0.sql:124-142`);
 *   - learned-sparse `sparse_vector`
 *     `{vocab_size:30522, model:SPLADE, tokens:[..], weights:[..]}`
 *     (`NeuronDB/src/types/sparse_vector_types.c:37,126-129`);
 *   - `vgraph` `{nodes:N, edges:[[a,b],...]}`
 *     (`NeuronDB/neurondb--1.0.sql:144-162`).
 */
object VectorParsers {

  /** Spark-side sparse vector: same shape as MLlib's SparseVector. */
  case class SparseVec(dim: Int, indices: Array[Int], values: Array[Float])

  /** Learned-sparse vector with a model tag (BM25 | SPLADE | COLBERT). */
  case class LearnedSparse(vocabSize: Int, model: String, tokens: Array[Int], weights: Array[Float])

  case class VGraph(nodes: Int, edges: Array[(Int, Int)])

  /** Parse `'[1, 2.5e-1, 3]'`; empty vector is an error, as in the reference. */
  def parseVector(text: String): Array[Float] = {
    val t = text.trim
    if (!t.startsWith("[") || !t.endsWith("]"))
      throw new IllegalArgumentException(s"malformed vector literal: $text")
    val body = t.substring(1, t.length - 1).trim
    if (body.isEmpty)
      throw new IllegalArgumentException("vector must have at least 1 dimension")
    // limit -1: split drops TRAILING empty segments by default, which
    // would silently accept '[1,2,]' — the reference rejects it
    body.split(",", -1).map { s =>
      val v = s.trim
      if (v.isEmpty) throw new IllegalArgumentException(s"malformed vector literal: $text")
      java.lang.Float.parseFloat(v)
    }
  }

  def renderVector(v: Array[Float]): String =
    v.map(f => if (f == f.toLong.toFloat) f.toLong.toString else f.toString)
      .mkString("[", ",", "]")

  // -- tiny tolerant brace-format reader used by the three struct types ---

  private def extractField(text: String, field: String): Option[String] = {
    val idx = text.indexOf(field)
    if (idx < 0) return None
    var i = text.indexOf(':', idx)
    if (i < 0) return None
    i += 1
    while (i < text.length && text(i).isWhitespace) i += 1
    if (i >= text.length) return None
    if (text(i) == '[') {
      var depth = 0; val sb = new StringBuilder; var j = i
      while (j < text.length) {
        val c = text(j)
        if (c == '[') depth += 1
        if (c == ']') depth -= 1
        sb.append(c)
        if (depth == 0) return Some(sb.toString)
        j += 1
      }
      None
    } else {
      val end = text.indexWhere(c => c == ',' || c == '}', i)
      Some(text.substring(i, if (end < 0) text.length else end).trim.stripPrefix("\"").stripSuffix("\""))
    }
  }

  private def parseIntArray(s: String): Array[Int] = {
    val body = s.trim.stripPrefix("[").stripSuffix("]").trim
    if (body.isEmpty) Array.emptyIntArray else body.split(",", -1).map(_.trim.toInt)
  }

  private def parseFloatArray(s: String): Array[Float] = {
    val body = s.trim.stripPrefix("[").stripSuffix("]").trim
    if (body.isEmpty) Array.emptyFloatArray else body.split(",", -1).map(_.trim.toFloat)
  }

  /** Parse `{dim:5, nnz:2, indices:[0,3], values:[1.5,2.5]}`. */
  def parseVecMap(text: String): SparseVec = {
    val dim = extractField(text, "dim").map(_.toInt)
      .getOrElse(throw new IllegalArgumentException(s"vecmap missing dim: $text"))
    // parse-time, like parseVector's >=1 rule: a non-positive dim would
    // otherwise surface as NegativeArraySizeException deep in sparseToDense
    if (dim < 1)
      throw new IllegalArgumentException(s"vecmap must have at least 1 dimension, got $dim")
    val indices = extractField(text, "indices").map(parseIntArray)
      .getOrElse(throw new IllegalArgumentException(s"vecmap missing indices: $text"))
    val values = extractField(text, "values").map(parseFloatArray)
      .getOrElse(throw new IllegalArgumentException(s"vecmap missing values: $text"))
    if (indices.length != values.length)
      throw new IllegalArgumentException("vecmap indices/values length mismatch")
    if (indices.exists(i => i < 0 || i >= dim))
      throw new IllegalArgumentException("vecmap index out of range")
    SparseVec(dim, indices, values)
  }

  /** Parse `{vocab_size:30522, model:SPLADE, tokens:[100,200], weights:[0.5,0.8]}`. */
  def parseSparseVector(text: String): LearnedSparse = {
    val vocab = extractField(text, "vocab_size").map(_.toInt)
      .getOrElse(throw new IllegalArgumentException(s"sparse_vector missing vocab_size: $text"))
    val model = extractField(text, "model").getOrElse("BM25").toUpperCase
    if (!Set("BM25", "SPLADE", "COLBERT").contains(model))
      throw new IllegalArgumentException(s"unknown sparse_vector model: $model")
    val tokens = extractField(text, "tokens").map(parseIntArray)
      .getOrElse(throw new IllegalArgumentException(s"sparse_vector missing tokens: $text"))
    val weights = extractField(text, "weights").map(parseFloatArray)
      .getOrElse(throw new IllegalArgumentException(s"sparse_vector missing weights: $text"))
    if (tokens.length != weights.length)
      throw new IllegalArgumentException("sparse_vector tokens/weights length mismatch")
    if (vocab < 1)
      throw new IllegalArgumentException(s"sparse_vector vocab_size must be positive, got $vocab")
    // same parse-time range rule as vecmap's indices: out-of-vocab tokens
    // would crash or silently mis-bucket any vocab-indexed consumer
    if (tokens.exists(t => t < 0 || t >= vocab))
      throw new IllegalArgumentException("sparse_vector token id out of vocab range")
    LearnedSparse(vocab, model, tokens, weights)
  }

  /** Parse `{nodes:3, edges:[[0,1],[1,2]]}`; self-loops/multi-edges accepted. */
  def parseVGraph(text: String): VGraph = {
    val nodes = extractField(text, "nodes").map(_.toInt)
      .getOrElse(throw new IllegalArgumentException(s"vgraph missing nodes: $text"))
    val edgesStr = extractField(text, "edges")
      .getOrElse(throw new IllegalArgumentException(s"vgraph missing edges: $text"))
    val pairRe = """\[\s*(-?\d+)\s*,\s*(-?\d+)\s*\]""".r
    val inner = edgesStr.trim.stripPrefix("[").stripSuffix("]")
    val edges = pairRe.findAllMatchIn(inner).map(m => (m.group(1).toInt, m.group(2).toInt)).toArray
    if (edges.exists { case (a, b) => a < 0 || b < 0 || a >= nodes || b >= nodes })
      throw new IllegalArgumentException("vgraph edge endpoint out of range")
    VGraph(nodes, edges)
  }

  /** Per-value graph traversals over the `vgraph` TYPE — the reference's
    * `vgraph_bfs` / `vgraph_dfs` (`NeuronDB/neurondb--1.0.sql` vgraph
    * section) operate on a small in-cell graph value, not a distributed
    * edge table (the distributed analogs are
    * [[graft.operators.GraphAnalytics]]); per-row, deterministic —
    * undirected adjacency, neighbors visited in ascending node order,
    * unreachable nodes omitted. Returns the visit order. */
  def vgraphBfs(g: VGraph, start: Int): Seq[Int] = {
    require(start >= 0 && start < g.nodes, s"start $start out of range")
    val adj = adjacency(g)
    val seen = Array.fill(g.nodes)(false)
    val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    val q = scala.collection.mutable.Queue(start)
    seen(start) = true
    while (q.nonEmpty) {
      val v = q.dequeue()
      out += v
      adj(v).foreach { w => if (!seen(w)) { seen(w) = true; q.enqueue(w) } }
    }
    out.toSeq
  }

  def vgraphDfs(g: VGraph, start: Int): Seq[Int] = {
    require(start >= 0 && start < g.nodes, s"start $start out of range")
    val adj = adjacency(g)
    val seen = Array.fill(g.nodes)(false)
    val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    def go(v: Int): Unit = {
      seen(v) = true
      out += v
      adj(v).foreach { w => if (!seen(w)) go(w) }
    }
    go(start)
    out.toSeq
  }

  /** Per-value PageRank over the `vgraph` TYPE — the reference's
    * `vgraph_pagerank` (distributed analog:
    * [[graft.operators.GraphAnalytics.pagerankInt]]). Integer
    * fixed-point so the oracle replays it exactly: ranks scaled by
    * `scale`, damping 85/100 as rational arithmetic, every division
    * integer (non-negative throughout, so floor ≡ truncate on both
    * engines): r₀ = scale/n; contrib(u) = r(u)/deg(u);
    * r'(v) = (15·(scale/n) + 85·Σ_{u∈N(v)} contrib(u)) / 100.
    * Degree-0 nodes contribute nothing (dangling mass dropped —
    * stated, not hidden). */
  def vgraphPagerankInt(g: VGraph, iters: Int,
                        scale: Long = 1000000L): Array[Long] = {
    require(iters >= 0, s"iters must be non-negative: $iters")
    require(g.nodes > 0, "pagerank needs a non-empty graph")
    val adj = adjacency(g)
    val base = scale / g.nodes
    var r = Array.fill(g.nodes)(base)
    var it = 0
    while (it < iters) {
      val contrib = Array.tabulate(g.nodes)(v =>
        if (adj(v).nonEmpty) r(v) / adj(v).length else 0L)
      r = Array.tabulate(g.nodes) { v =>
        var s = 0L
        adj(v).foreach(u => s += contrib(u))
        (15L * base + 85L * s) / 100L
      }
      it += 1
    }
    r
  }

  /** Per-value community detection over the `vgraph` TYPE — the
    * reference's `vgraph_community_detection`, here as the
    * DETERMINISTIC min-label propagation variant (the same convention
    * as the distributed `Dedup.dupGroups` closure): labels start as
    * node ids, each synchronized round takes the min over self +
    * neighbors; after enough rounds labels equal the connected
    * component's min id, and at any fixed round count the result is
    * replayable in SQL (frequency-based label prop is tie-broken by
    * engine iteration order — not oracle-able). */
  def vgraphCommunities(g: VGraph, iters: Int): Array[Int] = {
    require(iters >= 0, s"iters must be non-negative: $iters")
    val adj = adjacency(g)
    var c = Array.tabulate(g.nodes)(identity)
    var it = 0
    while (it < iters) {
      c = Array.tabulate(g.nodes) { v =>
        var m = c(v)
        adj(v).foreach(u => if (c(u) < m) m = c(u))
        m
      }
      it += 1
    }
    c
  }

  private def adjacency(g: VGraph): Array[Array[Int]] = {
    val b = Array.fill(g.nodes)(scala.collection.mutable.SortedSet.empty[Int])
    g.edges.foreach { case (a, c) => if (a != c) { b(a) += c; b(c) += a } }
    b.map(_.toArray)
  }

  /** Dot product of two learned-sparse vectors by merge-join on tokens
    * (`NeuronDB/neurondb--1.0.sql:6691-6707`). */
  def sparseDot(a: LearnedSparse, b: LearnedSparse): Double = {
    // tokens may be unsorted — and DUPLICATED — in text form; sort once,
    // then merge by runs so a repeated token contributes the product of
    // its per-side weight sums (the join-and-sum semantics of the
    // reference SQL), not just its first pair
    val ai = a.tokens.zip(a.weights).sortBy(_._1)
    val bi = b.tokens.zip(b.weights).sortBy(_._1)
    var i = 0; var j = 0; var sum = 0.0
    while (i < ai.length && j < bi.length) {
      val c = ai(i)._1.compareTo(bi(j)._1)
      if (c == 0) {
        val t = ai(i)._1
        var sa = 0.0
        while (i < ai.length && ai(i)._1 == t) { sa += ai(i)._2.toDouble; i += 1 }
        var sb = 0.0
        while (j < bi.length && bi(j)._1 == t) { sb += bi(j)._2.toDouble; j += 1 }
        sum += sa * sb
      }
      else if (c < 0) i += 1
      else j += 1
    }
    sum
  }

  /** Dense sparse->dense and dense->vecmap casts (NeuronDB/neurondb--1.0.sql:524-532). */
  def sparseToDense(s: SparseVec): Array[Float] = {
    val out = new Array[Float](s.dim)
    var i = 0
    while (i < s.indices.length) { out(s.indices(i)) = s.values(i); i += 1 }
    out
  }

  def denseToSparse(v: Array[Float]): SparseVec = {
    val idx = Array.newBuilder[Int]; val vals = Array.newBuilder[Float]
    var i = 0
    while (i < v.length) { if (v(i) != 0f) { idx += i; vals += v(i) }; i += 1 }
    SparseVec(v.length, idx.result(), vals.result())
  }
}
