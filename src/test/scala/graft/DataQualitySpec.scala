package graft

import graft.operators.DataQuality
import graft.operators.DataQuality.RowCheck
import org.apache.spark.sql.functions._

/** Constraint-audit ground truths: fused row checks count the right
  * violations, composite-key uniqueness counts duplicates, the FK
  * check counts orphans, and all-pass constraints report pass. */
class DataQualitySpec extends SparkSpecBase {

  import spark.implicits._

  test("row checks, uniqueness, and FK orphans in one report") {
    val df = Seq(
      (1L, 1L, 10.0), (1L, 1L, -5.0), // dup key (1,1); -5 out of range
      (2L, 1L, 60.0),                 // 60 out of range; k=2 is an orphan
      (1L, 2L, 20.0)
    ).toDF("k", "ln", "q")
    val parent = Seq(1L).toDF("pk")
    val out = DataQuality.audit(df,
      Seq(RowCheck("not_null(q)", col("q").isNull),
        RowCheck("range(q,0,50)", col("q") < 0 || col("q") > 50)),
      uniqueKey = Seq("k", "ln"),
      fk = Some(("k", parent, "pk")))
      .collect().map(r => r.getAs[String]("check_name") ->
        (r.getAs[Long]("n_checked"), r.getAs[Long]("n_violations"),
          r.getAs[Boolean]("pass"))).toMap
    assert(out("not_null(q)") == ((4L, 0L, true)))
    assert(out("range(q,0,50)") == ((4L, 2L, false)))
    assert(out("unique(k,ln)") == ((4L, 1L, false)))
    assert(out("fk(k -> pk)") == ((4L, 1L, false)))
  }

  test("a null predicate value counts as no violation") {
    val df = Seq[(java.lang.Long, java.lang.Double)]((1L, null))
      .toDF("k", "q")
    val out = DataQuality.audit(df,
      Seq(RowCheck("range(q,0,50)", col("q") < 0 || col("q") > 50)))
      .collect().head
    assert(out.getAs[Long]("n_violations") == 0L)
  }

  test("refuses an empty constraint set") {
    val df = Seq((1L, 1.0)).toDF("k", "q")
    intercept[IllegalArgumentException] {
      DataQuality.audit(df, Nil)
    }
  }
}
