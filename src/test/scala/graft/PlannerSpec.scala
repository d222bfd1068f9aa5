package graft

import org.apache.spark.sql.functions._
import graft.plans.AutoTune
import graft.operators.{DataManagement, Ivf}

class PlannerSpec extends SparkSpecBase {
  import spark.implicits._

  test("routeQuery: cost-based ANN vs exact (planner.c:49-91 semantics, not heuristics)") {
    assert(AutoTune.routeQuery(rowCount = 1000, dim = 512, k = 10) == "exact")
    assert(AutoTune.routeQuery(rowCount = 10000000, dim = 512, k = 10) == "ann")
    assert(AutoTune.routeQuery(rowCount = 10000000, dim = 64, k = 10) == "ann")
    assert(AutoTune.routeQuery(rowCount = 500000, dim = 64, k = 10) == "exact")
  }

  test("scalePrecision thresholds (planner.c:368-451)") {
    assert(AutoTune.scalePrecision(0.9, 0.95) == "int8")
    assert(AutoTune.scalePrecision(0.1, 0.80) == "int8")
    assert(AutoTune.scalePrecision(0.7, 0.95) == "fp16")
    assert(AutoTune.scalePrecision(0.1, 0.87) == "fp16")
    assert(AutoTune.scalePrecision(0.1, 0.95) == "fp32")
  }

  test("tuner widens nprobe under low recall, narrows when slow above band (planner.c:220-237)") {
    val t = new AutoTune.Tuner(nlists = 32)
    val q = "SELECT ... ORDER BY emb <-> q LIMIT 10"
    val widened = t.observe(q, nprobe = 4, recall = 0.7, latencyMs = 20)
    assert(widened > 4)
    assert(t.nprobeFor(q) == widened)
    val narrowed = t.observe(q, nprobe = 16, recall = 0.995, latencyMs = 150)
    assert(narrowed < 16)
    // in-band: no change
    assert(t.observe(q, nprobe = 8, recall = 0.95, latencyMs = 50) == 8)
    // clamps
    assert(t.observe(q, nprobe = 32, recall = 0.5, latencyMs = 10) == 32)
  }

  test("tuner persists learned params (neurondb_query_history analog)") {
    val t = new AutoTune.Tuner(nlists = 16)
    t.observe("q1", 4, 0.5, 10)
    val tmp = java.nio.file.Files.createTempDirectory("tuner").toString
    t.save(spark, tmp)
    val t2 = new AutoTune.Tuner(nlists = 16)
    t2.load(spark, tmp)
    assert(t2.nprobeFor("q1") == t.nprobeFor("q1"))
  }

  test("load-observe-save round-trip accumulates history instead of truncating it") {
    val tmp = java.nio.file.Files.createTempDirectory("tuner2").toString
    val t = new AutoTune.Tuner(nlists = 16)
    (1 to 5).foreach(i => t.observe(s"q$i", 4, 0.5, 10))
    t.save(spark, tmp)
    val t2 = new AutoTune.Tuner(nlists = 16)
    t2.load(spark, tmp)
    t2.observe("q6", 4, 0.5, 10)
    t2.save(spark, tmp) // overwrites both files — must carry the prior 5
    assert(spark.read.parquet(s"$tmp/query_history").count() == 6)
  }

  test("tuner widens when BOTH recall and latency are out of band (correctness first)") {
    val t = new AutoTune.Tuner(nlists = 32)
    // under-recalling AND slow: narrowing would trade correctness for speed
    assert(t.observe("q", 8, recall = 0.5, latencyMs = 500) > 8)
  }

  test("snapshot / timeTravel versions (vector_time_travel)") {
    val tmp = java.nio.file.Files.createTempDirectory("tt").toString + "/tbl"
    val v0 = DataManagement.snapshot(Seq((1L, "a")).toDF("id", "x"), tmp)
    val v1 = DataManagement.snapshot(Seq((1L, "a"), (2L, "b")).toDF("id", "x"), tmp)
    assert(v0 == 0L && v1 == 1L)
    assert(DataManagement.timeTravel(spark, tmp, Some(0L)).count() == 1)
    assert(DataManagement.timeTravel(spark, tmp).count() == 2) // latest
    intercept[IllegalArgumentException](DataManagement.timeTravel(spark, tmp, Some(9L)))
  }

  test("snapshotDiff: added/removed/changed only, unchanged rows absent") {
    val oldV = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "p")
    val newV = Seq((2L, "b"), (3L, "c2"), (4L, "d")).toDF("id", "p")
    val out = DataManagement.snapshotDiff(oldV, newV, "id", "p")
      .as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "removed", 3L -> "changed", 4L -> "added"))
  }

  test("vacuum drops null/empty vectors and duplicates") {
    val df = Seq(
      (1L, Some(Seq(1f, 2f))), (1L, Some(Seq(1f, 2f))),
      (2L, None), (3L, Some(Seq.empty[Float]))).toDF("id", "v")
    assert(DataManagement.vacuumVectors(df, "v").count() == 1)
  }

  test("cold-tier compression quantizes old rows only") {
    val df = Seq((1L, Seq(0.5f, -1f), 10.0), (2L, Seq(0.5f, -1f), 100.0)).toDF("id", "v", "age")
    val out = DataManagement.compressColdTier(df, "v", "age", cutoff = 50.0)
    val rows = out.orderBy("id").collect()
    assert(rows(0).getAs[String]("tier") == "hot" && rows(0).getSeq[Float](1) != null)
    assert(rows(1).getAs[String]("tier") == "cold" && rows(1).isNullAt(1)
      && rows(1).getAs[Array[Byte]]("cold_payload") != null)
  }

  test("index statistics + nprobe recommendation hit the recall target") {
    val emb = Tables.read(spark, "/root/testdata/sf0.001", "embeddings")
    val model = Ivf.build(emb, "embedding", nlists = 8, seed = 42L)
    val stats = Ivf.statistics(model)
    assert(stats("nlists") == 8.0 && stats("populated_lists") <= 8.0)
    assert(stats("min_list_size") >= 1.0 && stats("imbalance") >= 1.0)
    val queries = Seq(3L, 77L).map(Tables.queryVector(spark, "/root/testdata/sf0.001", _))
    val np = Ivf.recommendNprobe(model, queries, k = 10, targetRecall = 0.9)
    assert(np >= 1 && np <= 8)
  }
}
