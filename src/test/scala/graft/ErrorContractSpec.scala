package graft

import org.apache.spark.sql.functions._
import graft.operators.{Augment, Bpe, Dsir, Sampling, Sharding, Zorder}

/** The round's operators reject bad dials loudly (never silent
  * garbage): the same fail-fast contract the distance kernels pin. */
class ErrorContractSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val docs = Seq((1L, "alpha beta", 10L)).toDF("id", "text", "w")

  test("samplers reject non-positive k / out-of-range rates") {
    intercept[IllegalArgumentException](
      Sampling.weightedReservoir(docs, "id", "w", k = 0))
    intercept[IllegalArgumentException](
      Sampling.weightedReservoirByGroup(docs, "text", "id", "w", k = 0))
    intercept[IllegalArgumentException](
      Augment.tokenMask(docs, "id", "text", rate = 1.5))
  }

  test("trainers and selectors reject bad dials") {
    intercept[IllegalArgumentException](Bpe.train(docs, "text", numMerges = 0))
    intercept[IllegalArgumentException](Bpe.train(docs, "text", 2, minFreq = 0L))
    intercept[IllegalArgumentException](
      Dsir.select(docs, "id", "text", lit(true), k = 0))
    intercept[IllegalArgumentException](
      Dsir.select(docs, "id", "text", lit(true), k = 5, buckets = 1))
  }

  test("layout operators reject degenerate configs") {
    intercept[IllegalArgumentException](
      Sharding.assignShards(docs, col("w"), col("id"), numShards = 0))
    intercept[IllegalArgumentException](
      Zorder.layoutStats(Seq((1L, 2L), (1L, 3L)).toDF("a", "b"), "a", "b", 22))
    intercept[IllegalArgumentException](
      graft.operators.Dedup.lshPlan(spark, numHashes = 1, targetJaccard = 0.8))
    intercept[IllegalArgumentException](
      graft.operators.Dedup.lshPlan(spark, numHashes = 64, targetJaccard = 1.0))
  }

  test("phash/vgraph reject malformed inputs") {
    intercept[IllegalArgumentException](
      graft.operators.Multimodal.phash15(Array.fill(63)(0)))
    val g = graft.functions.VectorParsers.parseVGraph("{nodes:2, edges:[[0,1]]}")
    intercept[IllegalArgumentException](graft.functions.VectorParsers.vgraphBfs(g, 5))
  }
}
