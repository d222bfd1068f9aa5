package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Contracts of the shared table readers (ADVICE r8): the LONG-ts
  * epoch-nanos assumption is magnitude-checked against live fixtures, and
  * a non-UTC session fails fast instead of shifting timestamps. */
class TablesSpec extends SparkSpecBase {
  private val dir = "/root/testdata/sf0.001"

  test("tsUs lands in the plausible epoch-micros band for every fixture scale") {
    // 2000-01-01 .. 2100-01-01 in epoch micros; a LONG column holding plain
    // epoch-MICROS misread as nanos would land 1000x below this band.
    val lo = 946684800000000L
    val hi = 4102444800000000L
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val ev = Tables.read(spark, sf, "events")
      val r = ev.agg(
        min(Tables.tsUs(ev.schema)).as("lo"),
        max(Tables.tsUs(ev.schema)).as("hi")).head()
      assert(r.getLong(0) >= lo && r.getLong(1) <= hi,
        s"$sf ts_us out of band: ${r.getLong(0)}..${r.getLong(1)} " +
          "(LONG ts misinterpreted? tsUs assumes LONG = epoch-nanos)")
    }
  }

  test("tsUs(schema) and tsUs(df) agree; LONG dispatch divides by 1000") {
    val ev = Tables.read(spark, dir, "events")
    val a = ev.select(Tables.tsUs(ev.schema).as("t")).head().getLong(0)
    val b = ev.select(Tables.tsUs(ev).as("t")).head().getLong(0)
    assert(a == b)
    val nanos = spark.range(1).select(lit(1700000000123456789L).as("ts"))
    assert(nanos.schema("ts").dataType == LongType)
    assert(nanos.select(Tables.tsUs(nanos.schema).as("t")).head().getLong(0)
      == 1700000000123456L)
  }

  test("Tables.read fails fast when the session timezone is not UTC") {
    val tzKey = "spark.sql.session.timeZone"
    spark.conf.set(tzKey, "America/New_York")
    try {
      val e = intercept[IllegalArgumentException](Tables.read(spark, dir, "events"))
      assert(e.getMessage.contains("UTC"))
    } finally spark.conf.set(tzKey, "UTC")
  }
}
