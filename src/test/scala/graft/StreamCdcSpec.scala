package graft

import graft.streaming.StreamCdc
import org.apache.spark.sql.functions._

/** CDC-materialization invariants: latest-version-wins per key,
  * tombstones stay visible until the caller filters them, and state
  * carries ACROSS micro-batches in complete mode (a later batch's
  * higher version overrides, a stale version does not). */
class StreamCdcSpec extends SparkSpecBase {

  import spark.implicits._

  test("batch semantics: max version wins, tombstone visible") {
    val log = Seq(
      (1L, 10L, "u", 1.0), (1L, 12L, "u", 2.0), (1L, 11L, "u", 9.0),
      (2L, 5L, "u", 3.0), (2L, 7L, "d", 0.0)
    ).toDF("k", "ver", "op", "v")
    val out = StreamCdc.latest(log, "k", "ver", "op", "v")
      .collect().map(r => r.getAs[Long]("k") ->
        (r.getAs[Long]("last_version"), r.getAs[String]("last_op"),
          r.getAs[Double]("last_value"))).toMap
    assert(out(1L) == ((12L, "u", 2.0))) // version 12 beats late-arriving 11
    assert(out(2L) == ((7L, "d", 0.0)))  // tombstone surfaces as last op
  }

  test("scd2: validity intervals chain, only the open non-tombstone is current") {
    val log = Seq(
      (1L, 10L, "u", 1.0), (1L, 12L, "u", 2.0), (1L, 11L, "u", 9.0),
      (2L, 5L, "u", 3.0), (2L, 7L, "d", 0.0)
    ).toDF("k", "ver", "op", "v")
    val out = StreamCdc.scd2(log, "k", "ver", "op", "v")
      .collect().map(r => (r.getAs[Long]("k"), r.getAs[Long]("valid_from")) ->
        (Option(r.get(r.fieldIndex("valid_to"))).map(_.toString.toLong),
          r.getAs[Boolean]("is_current"))).toMap
    assert(out((1L, 10L)) == ((Some(11L), false)))
    assert(out((1L, 11L)) == ((Some(12L), false)))
    assert(out((1L, 12L)) == ((None, true)))
    assert(out((2L, 5L)) == ((Some(7L), false)))
    assert(out((2L, 7L)) == ((None, false))) // tombstone is never current
  }

  test("streaming complete mode: later batches override, stale ones don't") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Long, String, Double)]
    val latest = StreamCdc.latest(
      mem.toDF().toDF("k", "ver", "op", "v"), "k", "ver", "op", "v")
    val name = "cdc_spec_sink"
    spark.streams.active.filter(q => Option(q.name).contains(name))
      .foreach(_.stop())
    val q = latest.writeStream.format("memory").queryName(name)
      .outputMode("complete").start()
    try {
      mem.addData((1L, 10L, "u", 1.0), (2L, 20L, "u", 2.0))
      q.processAllAvailable()
      mem.addData((1L, 11L, "u", 5.0), (2L, 3L, "u", 99.0)) // 3 is stale
      q.processAllAvailable()
      val out = spark.table(name).collect()
        .map(r => r.getAs[Long]("k") ->
          (r.getAs[Long]("last_version"), r.getAs[Double]("last_value")))
        .toMap
      assert(out(1L) == ((11L, 5.0)))  // batch-2 update applied
      assert(out(2L) == ((20L, 2.0)))  // stale batch-2 version ignored
    } finally q.stop()
  }
}
