package graft

import org.apache.spark.sql.functions._
import graft.functions.{VectorAggregates => VA, VectorParsers => P}

class VectorAggregatesSpec extends SparkSpecBase {
  import spark.implicits._

  test("vector_avg / vector_sum element-wise with NULL skip (sql/04_aggregates.sql:49-55)") {
    val df = Seq(
      (1, Some(Seq(1f, 2f))),
      (1, Some(Seq(3f, 4f))),
      (1, None),
      (2, Some(Seq(10f, 20f)))
    ).toDF("g", "v")
    val rows = df.groupBy($"g").agg(VA.vector_avg($"v").as("avg"), VA.vector_sum($"v").as("sum"))
      .orderBy($"g").collect()
    assert(rows(0).getSeq[Float](1) == Seq(2f, 3f))
    assert(rows(0).getSeq[Float](2) == Seq(4f, 6f))
    assert(rows(1).getSeq[Float](1) == Seq(10f, 20f))
  }

  test("all-NULL group yields NULL (sql/04_aggregates.sql:103-109)") {
    val df = Seq((1, Option.empty[Seq[Float]]), (1, Option.empty[Seq[Float]])).toDF("g", "v")
    val r = df.groupBy($"g").agg(VA.vector_avg($"v").as("avg")).collect()(0)
    assert(r.isNullAt(1))
  }

  test("vector_min/max aggregates element-wise across rows (sql/04_aggregates.sql:17-22)") {
    val df = Seq(Seq(1f, 9f), Seq(5f, 2f), Seq(3f, 3f)).toDF("v")
    val r = df.agg(VA.vector_min_agg($"v").as("mn"), VA.vector_max_agg($"v").as("mx")).collect()(0)
    assert(r.getSeq[Float](0) == Seq(1f, 2f))
    assert(r.getSeq[Float](1) == Seq(5f, 9f))
  }

  test("dimension mismatch raises (aggregates.c:74-79)") {
    val df = Seq(Seq(1f, 2f), Seq(1f, 2f, 3f)).toDF("v")
    val ex = intercept[Exception](df.agg(VA.vector_avg($"v")).collect())
    assert(ex.getMessage.contains("consistent") ||
      Option(ex.getCause).exists(_.getMessage.contains("consistent")))
  }

  test("parsers: dense vector round-trip; empty rejected (sql/01_types_basic.sql:12-31)") {
    assert(P.parseVector("[1.0, 2.5e-1, -3]").toSeq == Seq(1.0f, 0.25f, -3.0f))
    intercept[IllegalArgumentException](P.parseVector("[]"))
    intercept[IllegalArgumentException](P.parseVector("1,2"))
    assert(P.renderVector(Array(1f, 2f)) == "[1,2]")
  }

  test("parsers: vecmap (neurondb--1.0.sql:124-142)") {
    val m = P.parseVecMap("{dim:5, nnz:2, indices:[0,3], values:[1.5,2.5]}")
    assert(m.dim == 5 && m.indices.toSeq == Seq(0, 3) && m.values.toSeq == Seq(1.5f, 2.5f))
    assert(P.sparseToDense(m).toSeq == Seq(1.5f, 0f, 0f, 2.5f, 0f))
    intercept[IllegalArgumentException](P.parseVecMap("{dim:2, indices:[5], values:[1]}"))
  }

  test("parsers: learned sparse_vector (sparse_vector_types.c:37,126-129)") {
    val s = P.parseSparseVector("{vocab_size:30522, model:SPLADE, tokens:[100,200], weights:[0.5,0.8]}")
    assert(s.vocabSize == 30522 && s.model == "SPLADE")
    val t = P.parseSparseVector("{vocab_size:30522, model:BM25, tokens:[200,300], weights:[2.0,1.0]}")
    assert(math.abs(P.sparseDot(s, t) - 0.8 * 2.0) < 1e-6)
    intercept[IllegalArgumentException](
      P.parseSparseVector("{vocab_size:10, model:XX, tokens:[1], weights:[1]}"))
  }

  test("vgraph_bfs / vgraph_dfs: visit orders, self-loops ignored, unreachable omitted") {
    // 0-1, 0-2, 1-3, 2-3 diamond plus isolated 4; self-loop on 1
    val g = P.parseVGraph("{nodes:5, edges:[[0,1],[0,2],[1,3],[2,3],[1,1]]}")
    assert(P.vgraphBfs(g, 0) == Seq(0, 1, 2, 3), "BFS: level order, ascending neighbors")
    assert(P.vgraphDfs(g, 0) == Seq(0, 1, 3, 2), "DFS: depth-first, ascending neighbors")
    assert(P.vgraphBfs(g, 4) == Seq(4), "isolated start visits only itself")
    // undirected: traversal from the far corner reaches everything connected
    assert(P.vgraphBfs(g, 3).toSet == Set(0, 1, 2, 3))
    intercept[IllegalArgumentException](P.vgraphBfs(g, 9))
  }

  test("parsers: vgraph with self-loops (sql/01_types_basic.sql:86-89)") {
    val g = P.parseVGraph("{nodes:3, edges:[[0,1],[1,1],[1,2]]}")
    assert(g.nodes == 3 && g.edges.toSeq == Seq((0, 1), (1, 1), (1, 2)))
    intercept[IllegalArgumentException](P.parseVGraph("{nodes:2, edges:[[0,5]]}"))
  }

  test("dense->sparse cast round-trip") {
    val d = Array(0f, 1.5f, 0f, -2f)
    assert(P.sparseToDense(P.denseToSparse(d)).toSeq == d.toSeq)
  }

  test("vector_min/max treat NaN deterministically regardless of row order") {
    // Float.compare ranks NaN above every number: min skips it, max keeps it
    for (rows <- Seq(Seq(Seq(Float.NaN, 1f), Seq(2f, 2f)),
                     Seq(Seq(2f, 2f), Seq(Float.NaN, 1f)))) {
      val r = rows.toDF("v").coalesce(1)
        .agg(VA.vector_min_agg($"v").as("mn"), VA.vector_max_agg($"v").as("mx")).collect()(0)
      assert(r.getSeq[Float](0)(0) == 2f && r.getSeq[Float](0)(1) == 1f)
      assert(r.getSeq[Float](1)(0).isNaN && r.getSeq[Float](1)(1) == 2f)
    }
  }

  test("vgraph_pagerank: hand-checked fixed-point rounds on a 3-path") {
    // path 0-1-2: deg = 1,2,1; scale 1000, base = 333
    val g = P.parseVGraph("{nodes:3, edges:[[0,1],[1,2]]}")
    // round 1: contrib = 333/1, 333/2=166, 333/1
    // r'(0) = (15*333 + 85*166)/100 = (4995+14110)/100 = 191
    // r'(1) = (4995 + 85*666)/100 = (4995+56610)/100 = 616
    // r'(2) = 191
    assert(P.vgraphPagerankInt(g, 1, scale = 1000L).toSeq == Seq(191L, 616L, 191L))
    // zero iters is the uniform start
    assert(P.vgraphPagerankInt(g, 0, scale = 1000L).toSeq == Seq(333L, 333L, 333L))
    // rank mass stays bounded by scale across rounds
    val r5 = P.vgraphPagerankInt(g, 5)
    assert(r5.sum <= 1000000L && r5.forall(_ > 0))
  }

  test("vgraph_community_detection: min labels spread one hop per round") {
    // two components: 0-1-2 path and 3-4 edge; node 5 isolated
    val g = P.parseVGraph("{nodes:6, edges:[[0,1],[1,2],[3,4]]}")
    assert(P.vgraphCommunities(g, 0).toSeq == Seq(0, 1, 2, 3, 4, 5))
    assert(P.vgraphCommunities(g, 1).toSeq == Seq(0, 0, 1, 3, 3, 5))
    assert(P.vgraphCommunities(g, 2).toSeq == Seq(0, 0, 0, 3, 3, 5))
    // converged: one label per component
    assert(P.vgraphCommunities(g, 10).distinct.sorted.toSeq == Seq(0, 3, 5))
  }

  test("parsers reject trailing commas, non-positive dims, out-of-vocab tokens") {
    intercept[IllegalArgumentException](P.parseVector("[1,2,]"))
    intercept[IllegalArgumentException](P.parseVecMap("{dim:0, indices:[], values:[]}"))
    intercept[IllegalArgumentException](P.parseVecMap("{dim:-5, indices:[], values:[]}"))
    intercept[IllegalArgumentException](P.parseSparseVector(
      "{vocab_size:100, model:BM25, tokens:[-3], weights:[0.5]}"))
    intercept[IllegalArgumentException](P.parseSparseVector(
      "{vocab_size:100, model:BM25, tokens:[250], weights:[0.5]}"))
  }

  test("sparseDot sums duplicate-token runs (join-and-sum, neurondb--1.0.sql:6691-6707)") {
    val a = P.LearnedSparse(10, "BM25", Array(5, 5), Array(1f, 2f))
    val b = P.LearnedSparse(10, "BM25", Array(5), Array(3f))
    assert(P.sparseDot(a, b) == 9.0) // (1+2)*3, not first-pair-only 3
    assert(P.sparseDot(b, a) == 9.0)
  }
}
