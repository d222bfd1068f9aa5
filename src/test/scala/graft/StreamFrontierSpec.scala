package graft

import graft.operators.CrawlFrontier
import graft.streaming.StreamFrontier

/** Stateful-frontier invariants: batch parity with the window-based
  * scheduler (no cap), cross-invocation sequence continuity, and
  * lane agreement with the md5 convention. */
class StreamFrontierSpec extends SparkSpecBase {

  import spark.implicits._

  private def frontier(ids: Range) = ids.map { i =>
    (s"http://h${i % 3}.test/p$i", s"h${i % 3}.test", (i % 5).toLong)
  }.toDF("url", "host", "priority")

  test("static-frame run equals the batch window scheduler (no cap)") {
    val streamed = StreamFrontier.schedule(frontier(0 until 30), "url", "host",
      "priority", delayMs = 700L)
      .toDF("url", "host", "slot", "seq", "scheduled_ms").collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3), r.getLong(4))).sortBy(_._1)
    val batch = CrawlFrontier.schedule(frontier(0 until 30), "url", "host",
      "priority", delayMs = 700L, maxPerHost = 1000)
      .select("url", "slot", "seq", "scheduled_ms").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).sortBy(_._1)
    assert(streamed.toSeq == batch.toSeq)
  }

  test("sequence continuity ACROSS micro-batches: state carries the spacing") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(String, String, Long)]
    val sched = StreamFrontier.schedule(
      mem.toDF().toDF("url", "host", "priority"), "url", "host", "priority", 700L)
      .toDF("url", "host", "slot", "seq", "scheduled_ms")
    val name = "sf_continuity_sink"
    spark.streams.active.filter(q => Option(q.name).contains(name)).foreach(_.stop())
    val q = sched.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      mem.addData(("u1", "hx.test", 5L), ("u2", "hx.test", 1L))
      q.processAllAvailable()
      mem.addData(("u3", "hx.test", 9L)) // later batch, HIGHER priority
      q.processAllAvailable()
      val rows = spark.table(name).collect()
        .map(r => r.getString(0) -> r.getLong(4)).toMap
      // batch 1 assigns 0 and 700 by priority; batch 2 CONTINUES at 1400
      // even though u3's priority beats both earlier urls
      assert(rows == Map("u1" -> 0L, "u2" -> 700L, "u3" -> 1400L), rows.toString)
    } finally q.stop()
  }

  test("lanes agree with the md5-prefix convention, at 16 and non-16 slots") {
    for (slots <- Seq(16, 40)) {
      val rows = StreamFrontier.schedule(frontier(0 until 9), "url", "host",
        "priority", slots = slots)
        .toDF("url", "host", "slot", "seq", "scheduled_ms")
        .select("host", "slot").distinct().collect()
      val expected = CrawlFrontier.schedule(frontier(0 until 9), "url", "host",
        "priority", slots = slots).select("host", "slot").distinct().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      rows.foreach(r => assert(expected(r.getString(0)) == r.getLong(1),
        s"lane mismatch for ${r.getString(0)} at slots=$slots"))
    }
  }
}
