package graft

import graft.operators.Sessionize

/** Sessionization ground truths: a gap strictly over the threshold
  * opens a new session, a gap exactly at it does not, users are
  * independent, and the (ts, id) tiebreak keeps the order total. */
class SessionizeSpec extends SparkSpecBase {

  import spark.implicits._

  private val M = 60000000L // one minute in micros

  private def run(rows: Seq[(Long, Long, Long)], gapMin: Int = 1) =
    Sessionize.gapSessions(rows.toDF("u", "id", "us"),
      "u", "us", "id", gapMin)
      .collect()
      .map(r => (r.getAs[Long]("u"), r.getAs[Long]("session_idx")) ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("start_us"),
          r.getAs[Long]("duration_us"))).toMap

  test("a gap over the threshold splits; one exactly at it does not") {
    val out = run(Seq(
      (7L, 1L, 0L), (7L, 2L, M),          // gap == 1 min: same session
      (7L, 3L, 2 * M + 1)))                // gap M+1 > 1 min: new session
    assert(out((7L, 1L)) == ((2L, 0L, M)))
    assert(out((7L, 2L)) == ((1L, 2 * M + 1, 0L)))
  }

  test("users sessionize independently") {
    val out = run(Seq((1L, 1L, 0L), (2L, 2L, 0L), (1L, 3L, 10 * M)))
    assert(out((1L, 1L))._1 == 1L && out((1L, 2L))._1 == 1L)
    assert(out((2L, 1L))._1 == 1L)
  }

  test("simultaneous events break ties on id and stay in one session") {
    val out = run(Seq((1L, 2L, 0L), (1L, 1L, 0L), (1L, 3L, 0L)))
    assert(out((1L, 1L)) == ((3L, 0L, 0L)))
  }
}
