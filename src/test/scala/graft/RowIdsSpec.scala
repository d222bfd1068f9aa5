package graft

import graft.operators.RowIds
import org.apache.spark.sql.functions._

class RowIdsSpec extends SparkSpecBase {
  import spark.implicits._

  test("withStableId: ids are unique, dense, and schema-appended") {
    val df = (1 to 100).map(i => (i.toLong, s"v$i")).toDF("k", "v").repartition(7)
    val out = RowIds.withStableId(df, "__id")
    assert(out.columns.toSeq == Seq("k", "v", "__id"))
    val ids = out.select("__id").as[Long].collect().sorted
    assert(ids.toSeq == (0L until 100L))
  }

  test("withStableId: row->id assignment replays identically across evaluations") {
    // the property monotonically_increasing_id lacks (SPARK-23207 class):
    // evaluating the SAME plan twice must give every row the same id,
    // because a recomputed map task replays the same partition contents
    val df = (1 to 500).map(i => (i.toLong, i % 13)).toDF("k", "m").repartition(11)
    def snap() = RowIds.withStableId(df, "__id")
      .collect().map(r => (r.getLong(0), r.getLong(2))).sorted.toSeq
    assert(snap() == snap())
  }

  test("withStableId: duplicate rows each keep their own id (no value collapse)") {
    val df = (1 to 50).map(_ => ("dup", 1)).toDF("a", "b")
    val out = RowIds.withStableId(df, "__id")
    assert(out.select("__id").distinct().count() == 50)
  }
}
