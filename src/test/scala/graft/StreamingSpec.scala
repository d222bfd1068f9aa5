package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.{EventStream, JobQueue, StreamDedup}

class StreamingSpec extends SparkSpecBase {
  import spark.implicits._

  test("job queue dispatches embed/rerank/http_call per type (worker_queue.c:444-499)") {
    val jobs = Seq(
      (1L, "embed", """{"text":"hello world","model":"m1"}""", "t1"),
      (2L, "rerank", """{"query":"hello","doc":"hello"}""", "t1"),
      (3L, "http_call", """{"url":"http://x"}""", "t1"),
      (4L, "bogus", "{}", "t1")
    ).toDF("job_id", "job_type", "payload", "tenant_id")
    val out = JobQueue.processBatch(jobs).collect().map(r =>
      r.getAs[Long]("job_id") -> r.getAs[String]("status")).toMap
    assert(out == Map(1L -> "completed", 2L -> "completed", 3L -> "skipped", 4L -> "failed"))
    val embedRow = JobQueue.processBatch(jobs).filter($"job_id" === 1).head()
    assert(embedRow.getSeq[Float](embedRow.fieldIndex("embedding")).length == 384)
    val rerankRow = JobQueue.processBatch(jobs).filter($"job_id" === 2).head()
    assert(math.abs(rerankRow.getAs[Double]("score") - 1.0) < 1e-9) // identical q/doc
  }

  test("jobs with missing required payload fields fail instead of completing with garbage") {
    val jobs = Seq(
      (1L, "rerank", """{"doc":"only doc"}""", "t1"),  // no $.query
      (2L, "embed", """{"model":"m"}""", "t1"),         // no $.text
      (3L, "rerank", """{"query":"q","doc":"d"}""", "t1")
    ).toDF("job_id", "job_type", "payload", "tenant_id")
    val out = JobQueue.processBatch(jobs).collect()
      .map(r => r.getAs[Long]("job_id") ->
        ((r.getAs[String]("status"), r.isNullAt(r.fieldIndex("score"))))).toMap
    // without the gate, job 1 would 'complete' at the maximum score 1.0
    // (embed("") vs embed("") similarity) and job 2 would persist embed("")
    assert(out(1L) == (("failed", true)))
    assert(out(2L)._1 == "failed")
    assert(out(3L)._1 == "completed" && !out(3L)._2)
  }

  test("job queue runs end-to-end as a stream via foreachBatch") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, String, String)]
    mem.addData((10L, "embed", """{"text":"abc"}""", "t1"), (11L, "http_call", "{}", "t1"))
    val tmp = java.nio.file.Files.createTempDirectory("jobq").toString
    val q = JobQueue.run(
      mem.toDF.toDF("job_id", "job_type", "payload", "tenant_id"),
      s"$tmp/out", s"$tmp/ckpt")
    q.awaitTermination(30000)
    val out = spark.read.parquet(s"$tmp/out")
    assert(out.count() == 2)
    assert(out.filter($"status" === "completed").count() == 1)
  }

  test("windowed counts with watermark over event stream") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String, Double)]
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    mem.addData((ts(0), "click", 1.0), (ts(10), "click", 3.0), (ts(10), "view", 5.0))
    val counts = EventStream.windowedCounts(
      mem.toDF.toDF("ts", "event_type", "value"), "ts", "event_type", "1 hour", "2 hours")
    val query = counts.writeStream.outputMode("complete").format("memory")
      .queryName("win_counts").start()
    query.processAllAvailable()
    val rows = spark.sql("SELECT event_type, n, avg_value FROM win_counts")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    query.stop()
    assert(rows("click") == ((2L, 2.0)) && rows("view") == ((1L, 5.0)))
  }

  test("windowed counts also works on static frames (batch parity)") {
    val df = Seq(
      (java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), "click", 2.0),
      (java.sql.Timestamp.valueOf("2024-01-01 11:30:00"), "click", 4.0)
    ).toDF("ts", "event_type", "value")
    val out = EventStream.windowedCounts(df, "ts", "event_type", "1 hour", "2 hours")
    assert(out.count() == 2) // two different hour windows
  }

  test("session windows merge touching windows and split only past the gap") {
    val df = Seq(
      (java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1L, 1.0),
      (java.sql.Timestamp.valueOf("2024-01-01 10:30:00"), 1L, 2.0), // exactly 30m: MERGES (touching)
      (java.sql.Timestamp.valueOf("2024-01-01 11:01:00"), 1L, 4.0), // 31m: new session
      (java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 2L, 8.0)
    ).toDF("ts", "user_id", "value")
    val out = EventStream.sessionCounts(df, "ts", "user_id", gap = "30 minutes")
      .select($"user_id", $"n", $"sum_value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(out == Set((1L, 2L, 3.0), (1L, 1L, 4.0), (2L, 1L, 8.0)))
  }

  test("session windows run as a real stream with watermark") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Long, Double)]
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    mem.addData((ts(0), 1L, 1.0), (ts(10), 1L, 2.0), (ts(50), 1L, 4.0))
    val agg = EventStream.sessionCounts(
      mem.toDF.toDF("ts", "user_id", "value"), "ts", "user_id", "30 minutes", "2 hours")
    val q = agg.writeStream.outputMode("complete").format("memory")
      .queryName("sess_sink").start()
    q.processAllAvailable()
    q.stop()
    val rows = spark.sql("SELECT n, sum_value FROM sess_sink")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(rows == Set((2L, 3.0), (1L, 4.0)))
  }

  test("stream dedup keeps one row per key across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, String)]
    mem.addData(("click", "a"), ("click", "a"), ("view", "b"))
    val deduped = StreamDedup.dedupKeys(
      mem.toDF.toDF("event_type", "props"), Seq("event_type", "props"))
    val q = deduped.writeStream.outputMode("append").format("memory")
      .queryName("sd_sink").start()
    q.processAllAvailable()
    mem.addData(("click", "a"), ("view", "c")) // "click/a" already seen in batch 1
    q.processAllAvailable()
    q.stop()
    val rows = spark.sql("SELECT event_type, props FROM sd_sink")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(rows == Set(("click", "a"), ("view", "b"), ("view", "c")))
  }

  test("watermark-bounded stream dedup drops repeats inside the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String)]
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    mem.addData((ts(0), "k1"), (ts(5), "k1"), (ts(1), "k2"))
    val deduped = StreamDedup.dedupKeys(
      mem.toDF.toDF("ts", "key"), Seq("key"), tsCol = Some("ts"), watermark = "1 hour")
    val q = deduped.writeStream.outputMode("append").format("memory")
      .queryName("sdw_sink").start()
    q.processAllAvailable()
    q.stop()
    val rows = spark.sql("SELECT key FROM sdw_sink").collect().map(_.getString(0)).toSeq
    assert(rows.sorted == Seq("k1", "k2"))
  }

  test("stream-stream time-bounded join matches across micro-batches and bounds") {
    implicit val sqlCtx = spark.sqlContext
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val views = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val clicks = MemoryStream[(Long, Long, java.sql.Timestamp)]
    views.addData((1L, 7L, ts(0)), (2L, 8L, ts(0)))
    val joined = EventStream.timeBoundedJoin(
      views.toDF.toDF("l_id", "key", "l_ts"),
      clicks.toDF.toDF("r_id", "key", "r_ts"),
      bound = "30 minutes", watermark = "2 hours")
    val q = joined.writeStream.outputMode("append").format("memory")
      .queryName("ssj_sink").start()
    q.processAllAvailable()
    // click for view 1 inside the bound (later micro-batch: state joins
    // across batches); click for view 2 outside the bound; wrong-key click
    clicks.addData((10L, 7L, ts(10)), (11L, 8L, ts(45)), (12L, 9L, ts(5)))
    q.processAllAvailable()
    q.stop()
    val rows = spark.sql("SELECT l_id, r_id FROM ssj_sink")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows == Set((1L, 10L)))
  }

  test("stream quota carries cumulative usage across micro-batches (GroupState)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Long)]
    mem.addData(("a", 1L), ("a", 2L), ("a", 3L), ("b", 10L))
    val admitted = graft.streaming.StreamQuota.admit(
      mem.toDF.toDF("tenant", "id"), "tenant", "id", maxRows = 4)
    val q = admitted.toDF("tenant", "id", "admitted")
      .writeStream.outputMode("append").format("memory").queryName("quota_sink").start()
    q.processAllAvailable()
    mem.addData(("a", 4L), ("a", 5L), ("a", 6L)) // only ONE more fits tenant a's cap
    q.processAllAvailable()
    q.stop()
    val byTenant = spark.sql("SELECT tenant, count(*) FILTER (WHERE admitted) AS ok, count(*) AS n FROM quota_sink GROUP BY tenant")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(byTenant("a") == ((4L, 6L)), s"cap not enforced across batches: $byTenant")
    assert(byTenant("b") == ((1L, 1L)))
  }

  test("stream quota batch parity: admitted counts are min(total, cap)") {
    val df = (1L to 10L).map(i => (s"t${i % 2}", i)).toDF("tenant", "id")
    val out = graft.streaming.StreamQuota.admit(df, "tenant", "id", maxRows = 3)
      .toDF("tenant", "id", "admitted")
      .groupBy("tenant").agg(sum(when($"admitted", 1).otherwise(0)).as("ok"))
      .as[(String, Long)].collect().toMap
    assert(out == Map("t0" -> 3L, "t1" -> 3L))
  }

  test("stream dedup batch parity: static frame gives plain distinct") {
    val df = Seq(("a", "x"), ("a", "x"), ("b", "y")).toDF("event_type", "props")
    val out = StreamDedup.dedupKeys(df, Seq("event_type", "props")).collect()
    assert(out.length == 2)
  }

  test("simhash near-dup key: word order collapses, different bags do not") {
    // simhash is a tf-weighted BAG fingerprint: reordering words leaves
    // the signature unchanged (the near-dup class stream_neardup keys
    // on), while a changed bag moves bits
    val a = graft.operators.Dedup.simhash("the quick brown fox jumps high")
    val b = graft.operators.Dedup.simhash("high jumps fox brown quick the")
    val c = graft.operators.Dedup.simhash("a completely different sentence here")
    assert(a == b && a != c)
    val df = Seq(
      ("the quick brown fox jumps high", 1L),
      ("high jumps fox brown quick the", 2L),
      ("a completely different sentence here", 3L)).toDF("text", "id")
      .select(udf((t: String) => graft.operators.Dedup.simhash(t)).apply($"text").as("sig"))
    val out = StreamDedup.dedupKeys(df, Seq("sig")).collect()
    assert(out.length == 2, "reordered twin must collapse to one signature")
  }
}
