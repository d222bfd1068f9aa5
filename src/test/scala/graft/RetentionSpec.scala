package graft

import graft.operators.Retention

/** Retention-triangle invariants: cohorts key on the first-seen epoch
  * week, offset 0 is always 1.0, later offsets count distinct active
  * users, and multiple same-week events count once. */
class RetentionSpec extends SparkSpecBase {

  import spark.implicits._

  private val W = 7L * 86400L * 1000000L // one epoch week in micros

  test("a two-cohort triangle with 50% week-1 retention") {
    val rows = Seq(
      // cohort week 0: users 1, 2; only user 1 returns in week 1
      (1L, 10L), (2L, 20L), (1L, W + 5L), (1L, W + 6L), // dup same week
      // cohort week 1: user 3
      (3L, W + 100L)
    ).toDF("u", "us")
    val out = Retention.cohorts(rows, "u", "us")
      .collect().map(r => (r.getAs[Long]("cohort_week"),
        r.getAs[Long]("week_offset")) ->
        (r.getAs[Long]("n_active"), r.getAs[Long]("n_cohort"),
          r.getAs[Double]("retention"))).toMap
    assert(out((0L, 0L)) == ((2L, 2L, 1.0)))
    assert(out((0L, 1L)) == ((1L, 2L, 0.5))) // dup week-1 events count once
    assert(out((1L, 0L)) == ((1L, 1L, 1.0)))
    assert(out.size == 3)
  }
}
