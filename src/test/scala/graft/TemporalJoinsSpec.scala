package graft

import org.apache.spark.sql.functions._
import graft.operators.TemporalJoins

class TemporalJoinsSpec extends SparkSpecBase {
  import spark.implicits._

  test("asof backward matches the latest right row at-or-before each left row") {
    val left = Seq((1L, "a", 10.0), (2L, "a", 25.0), (3L, "b", 5.0), (4L, "c", 50.0))
      .toDF("id", "k", "ts")
    val right = Seq(("a", 9.0, 100.0), ("a", 20.0, 200.0), ("a", 30.0, 300.0),
      ("b", 5.0, 400.0)).toDF("k", "ts", "v")
    val out = TemporalJoins.asofBackward(left, right, Seq("k"), "ts", "ts", Seq("v"))
      .select($"id", $"asof_ts", $"asof_v").collect()
      .map(r => r.getLong(0) -> (Option(r.get(1)), Option(r.get(2)))).toMap
    assert(out(1L) == ((Some(9.0), Some(100.0))))   // latest <= 10 is 9
    assert(out(2L) == ((Some(20.0), Some(200.0))))  // 25 → 20, not 30
    assert(out(3L) == ((Some(5.0), Some(400.0))))   // inclusive at equal ts
    assert(out(4L) == ((None, None)))               // key c has no right rows
  }

  test("asof tolerance nulls out matches older than the bound") {
    val left = Seq((1L, "a", 100.0)).toDF("id", "k", "ts")
    val right = Seq(("a", 10.0, 7.0)).toDF("k", "ts", "v")
    val hit = TemporalJoins.asofBackward(left, right, Seq("k"), "ts", "ts", Seq("v"),
      tolerance = Some(90.0)).select($"asof_v").head()
    val miss = TemporalJoins.asofBackward(left, right, Seq("k"), "ts", "ts", Seq("v"),
      tolerance = Some(89.0)).select($"asof_v").head()
    assert(hit.getDouble(0) == 7.0 && miss.isNullAt(0))
  }

  test("asof null value inside the matched row stays null (no fallback to older rows)") {
    val left = Seq((1L, "a", 30.0)).toDF("id", "k", "ts")
    val right = Seq(("a", 10.0, Some(5.0)), ("a", 20.0, Option.empty[Double]))
      .toDF("k", "ts", "v")
    val row = TemporalJoins.asofBackward(left, right, Seq("k"), "ts", "ts", Seq("v"))
      .select($"asof_ts", $"asof_v").head()
    assert(row.getDouble(0) == 20.0 && row.isNullAt(1))
  }

  test("asof ignores null right timestamps; rejects a 'ts' value column") {
    val left = Seq((1L, "a", 5.0)).toDF("id", "k", "ts")
    // the null-ts right row sorts NULLS FIRST and would otherwise become
    // the match for a left row with no true predecessor
    val right = Seq(("a", Option.empty[Double], 999.0), ("a", Some(10.0), 100.0))
      .toDF("k", "ts", "v")
    val out = TemporalJoins.asofBackward(left, right, Seq("k"), "ts", "ts", Seq("v")).head()
    assert(out.isNullAt(out.fieldIndex("asof_ts")) && out.isNullAt(out.fieldIndex("asof_v")))
    intercept[IllegalArgumentException](
      TemporalJoins.asofBackward(left, right, Seq("k"), "ts", "ts", Seq("ts", "v")))
  }

  test("range join emits each qualifying pair exactly once, across bucket borders") {
    // delta = 10; ts pairs straddle bucket boundaries both ways
    val l = Seq((1L, "a", 9.0), (2L, "a", 11.0), (3L, "a", 29.0), (4L, "b", 9.0))
      .toDF("id", "k", "ts")
    val r = Seq((10L, "a", 10.0), (11L, "a", 21.0), (12L, "b", 40.0))
      .toDF("rid", "k", "ts")
    val out = TemporalJoins.rangeJoin(l, r, "k", "ts", "ts", 10.0)
      .select($"id", $"r_rid", $"ts_diff").collect()
      .map(row => (row.getLong(0), row.getLong(1), row.getDouble(2)))
    val pairs = out.map(t => (t._1, t._2)).toSet
    assert(out.length == pairs.size, "no duplicate pairs")
    assert(pairs == Set((1L, 10L), (2L, 10L), (2L, 11L), (3L, 11L)))
    assert(out.find(t => t._1 == 1L && t._2 == 10L).get._3 == -1.0)
  }

  test("range join equals the brute-force theta join on events") {
    val raw = Tables.read(spark, "/root/testdata/sf0.001", "events")
    val ev = raw
      .select(col("event_id"), col("user_id"), Tables.tsUs(raw.schema).cast("double").as("ts_us"))
    val blocked = TemporalJoins.rangeJoin(ev, ev, "user_id", "ts_us", "ts_us", 3.6e9)
      .filter(col("event_id") < col("r_event_id"))
      .select(col("event_id"), col("r_event_id"))
      .as[(Long, Long)].collect().toSet
    val brute = ev.as("a").join(ev.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("a.event_id") < col("b.event_id") &&
          abs(col("a.ts_us") - col("b.ts_us")) <= 3.6e9)
      .select(col("a.event_id"), col("b.event_id"))
      .as[(Long, Long)].collect().toSet
    assert(blocked == brute && blocked.nonEmpty)
  }
}
