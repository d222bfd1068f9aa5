package graft

import graft.ml.{Gnn, UnifiedApi}
import org.apache.spark.sql.functions._

class GnnSpec extends SparkSpecBase {
  import spark.implicits._

  // Path graph 0-1-2-3 plus a hub 0-4; directed edge list (propagation
  // symmetrizes, sampling uses it as given like the reference's scan).
  private lazy val edges = Seq(
    (0, 1), (1, 0), (1, 2), (2, 1), (2, 3), (3, 2), (0, 4), (4, 0)
  ).toDF("node_id", "neighbor_id")

  private lazy val feats = Seq(
    (0, Seq(1f, 0f)), (1, Seq(0f, 1f)), (2, Seq(2f, 2f)), (3, Seq(4f, 0f)), (4, Seq(0f, 8f))
  ).toDF("node_id", "features")

  test("graphsageAggregate depth-1 is the mean of the lowest-id neighbors") {
    val out = Gnn.graphsageAggregate(edges, feats, Seq(1).toDF("node_id"),
        nSamples = 10, depth = 1)
      .collect().map(r => r.getInt(0) -> r.getSeq[Float](1)).toMap
    // neighbors of 1 = {0, 2} → mean((1,0),(2,2)) = (1.5, 1.0)
    assert(out(1) == Seq(1.5f, 1.0f))
  }

  test("graphsageAggregate depth-2 pools both levels as a multiset with the flat cap") {
    val out = Gnn.graphsageAggregate(edges, feats, Seq(0).toDF("node_id"),
        nSamples = 2, depth = 2)
      .collect().map(r => r.getInt(0) -> r.getSeq[Float](1).map(_.toDouble)).toMap
    // level1 from 0: neighbors {1,4} → sample both (≤2). cap = 4, used 2.
    // level2 in order: from 1 → {0,2}; budget 2 → take (0,2); pool =
    // {1,4,0,2} → mean((0,1),(0,8),(1,0),(2,2)) = (0.75, 2.75)
    assert(out(0).zip(Seq(0.75, 2.75)).forall { case (a, b) => math.abs(a - b) < 1e-6 })
  }

  test("graphsageAggregate zero-fills missing feature rows and handles many seeds at once") {
    val sparseFeats = feats.filter($"node_id" =!= 2)
    val out = Gnn.graphsageAggregate(edges, sparseFeats,
        Seq(1, 3).toDF("node_id"), nSamples = 10, depth = 1)
      .collect().map(r => r.getInt(0) -> r.getSeq[Float](1)).toMap
    // node 1: neighbors {0,2}, 2 has no features → mean((1,0),(0,0)) = (0.5,0)
    assert(out(1) == Seq(0.5f, 0.0f))
    // node 3: neighbor {2} only → zeros
    assert(out(3) == Seq(0.0f, 0.0f))
  }

  test("graphsageAggregate emits a zero row for seeds with no outgoing edges") {
    val out = Gnn.graphsageAggregate(edges, feats, Seq(1, 7).toDF("node_id"),
        nSamples = 10, depth = 1)
      .collect().map(r => r.getInt(0) -> r.getSeq[Float](1)).toMap
    // the one-row-per-seed contract: isolated node 7 gets the empty-pool
    // mean (zeros) instead of silently vanishing from the output
    assert(out.keySet == Set(1, 7))
    assert(out(7) == Seq(0.0f, 0.0f))
    assert(out(1) == Seq(1.5f, 1.0f))
  }

  test("sgcPropagate one hop matches hand-computed normalized aggregation") {
    val line = Seq((0, 1), (1, 2)).toDF("node_id", "neighbor_id")
    val f = Seq((0, Seq(1f)), (1, Seq(1f)), (2, Seq(1f))).toDF("node_id", "features")
    val out = Gnn.sgcPropagate(line, f, hops = 1)
      .collect().map(r => r.getInt(0) -> r.getSeq[Float](1).head.toDouble).toMap
    // degrees (with self-loops): d0=2, d1=3, d2=2.
    // x'(0) = 1/d0 + 1/sqrt(d0·d1) = 0.5 + 1/sqrt(6)
    assert(math.abs(out(0) - (0.5 + 1 / math.sqrt(6))) < 1e-6)
    // x'(1) = 1/sqrt(6) + 1/3 + 1/sqrt(6)
    assert(math.abs(out(1) - (2 / math.sqrt(6) + 1.0 / 3)) < 1e-6)
  }

  test("sgcPropagate with targets equals the untargeted result on those nodes") {
    val full = Gnn.sgcPropagate(edges, feats, hops = 2)
      .collect().map(r => r.getInt(0) -> r.getSeq[Float](1)).toMap
    val some = Gnn.sgcPropagate(edges, feats, hops = 2,
        targets = Some(Seq(1, 3).toDF("node_id")))
      .collect().map(r => r.getInt(0) -> r.getSeq[Float](1)).toMap
    // exactly the target rows, each equal to the full propagation up to
    // float accumulation order, which differs across physical plans
    // (global degrees: the ego-graph slice must not change normalization)
    assert(some.keySet == Set(1, 3))
    for (k <- Seq(1, 3); (a, b) <- some(k).zip(full(k)))
      assert(math.abs(a - b) < 1e-6, s"node $k: $a vs $b")
  }

  test("sgcPropagate hops=0 with targets returns only the target feature rows") {
    val out = Gnn.sgcPropagate(edges, feats, hops = 0,
        targets = Some(Seq(1, 3).toDF("node_id")))
      .collect().map(r => r.getInt(0) -> r.getSeq[Float](1)).toMap
    assert(out == Map(1 -> Seq(0f, 1f), 3 -> Seq(4f, 0f)))
  }

  test("sgcPropagate assumeSymmetric matches the dedup path on symmetric input") {
    // the fixture lists both directions of every edge and no self-loops,
    // so the contract flag must be a pure plan optimization
    val full = Gnn.sgcPropagate(edges, feats, hops = 2)
      .collect().map(r => r.getInt(0) -> r.getSeq[Float](1)).toMap
    val fast = Gnn.sgcPropagate(edges, feats, hops = 2, assumeSymmetric = true)
      .collect().map(r => r.getInt(0) -> r.getSeq[Float](1)).toMap
    assert(fast == full)
  }

  test("gcnTrain separates two communities") {
    // Two 4-cliques joined by one bridge edge; features = noisy one-hot of
    // the community, labels on 6 of 8 nodes.
    val cliqueEdges = (for {
      c <- 0 to 1; i <- 0 to 3; j <- 0 to 3 if i < j
    } yield (c * 4 + i, c * 4 + j)) :+ ((3, 4))
    val e = cliqueEdges.toDF("node_id", "neighbor_id")
    val f = (0 to 7).map { n =>
      val c = n / 4
      (n, Seq(if (c == 0) 1f else 0.1f, if (c == 1) 1f else 0.1f, (n % 4) / 10f))
    }.toDF("node_id", "features")
    val labels = Seq((0, 0), (1, 0), (2, 0), (4, 1), (5, 1), (6, 1)).toDF("node_id", "label")
    val tm = Gnn.gcnTrain(e, f, labels, hops = 2)
    val propagated = Gnn.sgcPropagate(e, f, hops = 2)
    val pred = UnifiedApi.predict(tm.modelId, propagated)
      .select(col("node_id"), col("prediction"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    // Held-out nodes 3 and 7 classify with their communities.
    assert(pred(3) == 0.0, s"node 3 → ${pred(3)}")
    assert(pred(7) == 1.0, s"node 7 → ${pred(7)}")
  }

  test("logisticGdFixpoint separates the same communities and is repartition-invariant") {
    val cliqueEdges = (for {
      c <- 0 to 1; i <- 0 to 3; j <- 0 to 3 if i < j
    } yield (c * 4 + i, c * 4 + j)) :+ ((3, 4))
    val e = cliqueEdges.toDF("node_id", "neighbor_id")
    val f = (0 to 7).map { n =>
      val c = n / 4
      (n, Seq(if (c == 0) 1f else 0.1f, if (c == 1) 1f else 0.1f, (n % 4) / 10f))
    }.toDF("node_id", "features")
    val labels = Seq((0, 0), (1, 0), (2, 0), (4, 1), (5, 1), (6, 1)).toDF("node_id", "label")
    val propagated = Gnn.sgcPropagate(e, f, hops = 2)
    val probs = Gnn.logisticGdFixpoint(propagated, labels, iters = 30, lr = 1.0)
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(probs(3) < 0.5, s"node 3 → ${probs(3)}")
    assert(probs(7) > 0.5, s"node 7 → ${probs(7)}")
    val again = Gnn.logisticGdFixpoint(propagated.repartition(5), labels,
        iters = 30, lr = 1.0)
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    // cross-row gradient sums are the one unordered float reduce: equal
    // to well below the oracle's round-4 output
    (0 to 7).foreach(n => assert(math.abs(probs(n) - again(n)) < 1e-9))
  }
}
