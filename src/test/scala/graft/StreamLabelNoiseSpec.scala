package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.{DataValuation, Ivf}
import graft.streaming.StreamLabelNoise

/** Ingest-time label-noise invariants: batch parity of the per-batch
  * scorer, flagging of a planted mislabel against the fixed index, and
  * two-micro-batch continuity (batch boundaries never change scores —
  * the stream_frontier-style continuity pin, except here the contract
  * is statelessness rather than carried state). */
class StreamLabelNoiseSpec extends SparkSpecBase {

  import spark.implicits._

  /** Reference corpus: two tight clusters at x=0 (label 0) and x=100
    * (label 1), 12 points each. */
  private def reference = (0 until 24).map { i =>
    val x = (if (i < 12) 0f else 100f) + i * 0.01f
    (i.toLong, Array(x, 0f, 0f, 0f), if (i < 12) 0 else 1)
  }.toDF("vec_id", "embedding", "label")

  private def model = Ivf.build(reference, "embedding", nlists = 2, seed = 1L)

  test("static scoring flags a mislabeled arrival, clears clean ones") {
    val arrivals = Seq(
      (100L, Array(0.05f, 0f, 0f, 0f), 0),  // cluster A, correct label
      (101L, Array(0.06f, 0f, 0f, 0f), 1),  // cluster A, WRONG label
      (102L, Array(100.05f, 0f, 0f, 0f), 1) // cluster B, correct label
    ).toDF("vec_id", "embedding", "label")
    val out = StreamLabelNoise.scoreBatch(model, arrivals, "vec_id",
      "embedding", "label", k = 5).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getBoolean(3)))).toMap
    assert(out(100L) == ((5L, false)), out(100L).toString)
    assert(out(101L) == ((0L, true)), out(101L).toString)
    assert(out(102L) == ((5L, false)))
  }

  test("a re-ingested duplicate sees its indexed twin (no self-exclusion)") {
    // identical vector to reference id 3 but the OPPOSITE label: every
    // one of its neighbors (including the twin) disagrees -> suspect
    val dup = Seq((999L, Array(0.03f, 0f, 0f, 0f), 1))
      .toDF("vec_id", "embedding", "label")
    val r = StreamLabelNoise.scoreBatch(model, dup, "vec_id", "embedding",
      "label", k = 5).collect().head
    assert(r.getLong(2) == 0L && r.getBoolean(3))
  }

  test("two micro-batches produce exactly the rows one batch would") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val b1 = Seq((100L, Array(0.05f, 0f, 0f, 0f), 0),
      (101L, Array(0.06f, 0f, 0f, 0f), 1))
    val b2 = Seq((102L, Array(100.05f, 0f, 0f, 0f), 1),
      (103L, Array(100.06f, 0f, 0f, 0f), 0))
    val m = model
    val mem = MemoryStream[(Long, Array[Float], Int)]
    val out = java.nio.file.Files.createTempDirectory("sln_spec_").toString
    val q = StreamLabelNoise.run(m,
      mem.toDF().toDF("vec_id", "embedding", "label"),
      "vec_id", "embedding", "label", k = 5,
      s"$out/res", s"$out/ckpt", trigger = Trigger.ProcessingTime(0))
    try {
      mem.addData(b1: _*)
      q.processAllAvailable()
      // batch 1's rows are already on disk before batch 2 arrives
      val mid = spark.read.parquet(s"$out/res")
      assert(mid.count() == 2L)
      mem.addData(b2: _*)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.read.parquet(s"$out/res").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .sortBy(_._1)
    val oneShot = StreamLabelNoise.scoreBatch(m,
      (b1 ++ b2).toDF("vec_id", "embedding", "label"),
      "vec_id", "embedding", "label", k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .sortBy(_._1)
    assert(streamed.toSeq == oneShot.toSeq)
    assert(streamed.map(_._1).toSeq == Seq(100L, 101L, 102L, 103L))
  }

  test("agreement semantics match the batch audit on a shared fixture") {
    // score the reference against itself: scoreBatch keeps the self
    // match (rank 1, distance 0), the batch audit excludes it — so
    // with the same k the streaming agree is the batch agree + 1 for
    // clean points whose (k+1)-th neighbor is also same-label
    val batchAudit = DataValuation.labelNoiseKnn(model, reference,
      "vec_id", "embedding", "label", k = 5).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val streamAudit = StreamLabelNoise.scoreBatch(model, reference,
      "vec_id", "embedding", "label", k = 6).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    // every point is clean here, so each k=6 self-inclusive score is
    // exactly the k=5 self-exclusive score + 1
    reference.collect().map(_.getLong(0)).foreach { id =>
      assert(streamAudit(id) == batchAudit(id) + 1L, s"id $id")
    }
  }
}
