package graft

import org.apache.spark.sql.functions._
import graft.operators.{IvfPq, Knn}

class IvfPqSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val emb = Tables.read(spark, "/root/testdata/sf0.001", "embeddings").cache()
  private lazy val model = IvfPq.build(emb, "vec_id", "embedding", nlists = 8, m = 8)

  test("exhaustive probes + full rerank pool equal brute force exactly") {
    val q = Tables.queryVector(spark, "/root/testdata/sf0.001", 7L)
    val exact = Knn.search(emb, "embedding", q, k = 10, tieBreak = Seq("vec_id"))
      .select("vec_id").as[Long].collect().toSeq
    val adc = IvfPq.search(model, q, k = 10, nprobe = 8, rerankPool = 1000)
      .select("vec_id").as[Long].collect().toSeq
    assert(adc == exact)
  }

  test("reduced probes + small pool stay in the recall band (>=0.90 mean)") {
    val recalls = Seq(1L, 33L, 99L, 200L, 404L).map { qid =>
      val q = Tables.queryVector(spark, "/root/testdata/sf0.001", qid)
      val exact = Knn.search(emb, "embedding", q, k = 10).select("vec_id").as[Long].collect().toSet
      val got = IvfPq.search(model, q, k = 10, nprobe = 4, rerankPool = 64)
        .select("vec_id").as[Long].collect().toSet
      (exact & got).size.toDouble / exact.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.90, s"mean recall $mean, per-query $recalls")
  }

  test("search output is deterministic and ascending by exact distance") {
    val q = Tables.queryVector(spark, "/root/testdata/sf0.001", 42L)
    val a = IvfPq.search(model, q, k = 10).select("vec_id").as[Long].collect().toSeq
    val b = IvfPq.search(model, q, k = 10).select("vec_id").as[Long].collect().toSeq
    assert(a == b)
    val dists = IvfPq.search(model, q, k = 10).select("distance").as[Double].collect()
    assert(dists.sameElements(dists.sorted))
  }

  test("insert encodes with the EXISTING codebook; delete purges codes too") {
    val base = IvfPq.build(emb.filter($"vec_id" < 300), "vec_id", "embedding",
      nlists = 8, m = 8)
    val grown = IvfPq.insert(base, emb.filter($"vec_id" >= 300 && $"vec_id" < 350))
    assert(grown.encoded.count() == 350 && grown.ivf.assigned.count() == 350)
    // the codebook object is UNCHANGED (no refit) — same reference
    assert(grown.codebook eq base.codebook)
    // exhaustive dial over the maintained index == brute force over 350
    val q = Tables.queryVector(spark, "/root/testdata/sf0.001", 320L)
    val exact = Knn.search(emb.filter($"vec_id" < 350), "embedding", q, k = 5,
      tieBreak = Seq("vec_id")).select("vec_id").as[Long].collect()
    val got = IvfPq.search(grown, q, k = 5, nprobe = 8, rerankPool = 350)
      .select("vec_id").as[Long].collect()
    assert(got.sameElements(exact))
    // delete the inserted rows: back to the base corpus exactly
    val purged = IvfPq.delete(grown, (300L until 350L).toSeq)
    assert(purged.encoded.count() == 300 && purged.ivf.assigned.count() == 300)
    intercept[IllegalArgumentException](IvfPq.delete(grown, Nil))
  }

  test("deleteBulk purges BOTH tables via one anti-join each") {
    val base = IvfPq.build(emb.filter($"vec_id" < 300), "vec_id", "embedding",
      nlists = 8, m = 8)
    val grown = IvfPq.insert(base, emb.filter($"vec_id" >= 300 && $"vec_id" < 350))
    val erasure = emb.filter($"vec_id" >= 300 && $"vec_id" < 350)
      .select($"vec_id")
    val purged = IvfPq.deleteBulk(grown, erasure)
    // raw posting lists AND the code table both drop to the base corpus
    // — a surviving code row would resurrect the vector through the ADC
    // candidate scan
    assert(purged.encoded.count() == 300 && purged.ivf.assigned.count() == 300)
    val q = Tables.queryVector(spark, "/root/testdata/sf0.001", 320L)
    val exact = Knn.search(emb.filter($"vec_id" < 300), "embedding", q, k = 5,
      tieBreak = Seq("vec_id")).select("vec_id").as[Long].collect()
    val got = IvfPq.search(purged, q, k = 5, nprobe = 8, rerankPool = 300)
      .select("vec_id").as[Long].collect()
    assert(got.sameElements(exact))
    // anti-join-shaped (Catalyst pushes it through the insert Union —
    // one join per branch), never a per-id literal IN chain
    val plan = purged.encoded.queryExecution.optimizedPlan.toString
    assert("(?i)leftanti".r.findAllIn(plan).nonEmpty, plan)
    assert(!plan.contains("vec_id IN ("), plan)
  }
}
