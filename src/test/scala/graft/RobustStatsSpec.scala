package graft

import graft.operators.RobustStats

class RobustStatsSpec extends SparkSpecBase {
  import spark.implicits._

  test("winsorize: a gross outlier moves the mean but not the robust stats") {
    // values 1..10 with id; 10% tails cut rank 1 and rank 10
    val df = (1 to 10).map(i =>
      (i.toLong, if (i == 10) 1000.0 else i.toDouble)).toDF("id", "v")
    val r = RobustStats.winsorize(df, "v", "id", tailPct = 10).collect().head
    assert(r.getLong(0) == 10)
    assert(r.getFloat(1) == 2f && r.getFloat(2) == 9f) // lo/hi cuts
    // trimmed: mean of 2..9 = 5.5; winsorized: (2 + 2..9 + 9)/10 = 5.5
    assert(r.getFloat(3) == 5.5f && r.getFloat(4) == 5.5f)
    // the raw mean would have been 104.5 — the audit is outlier-proof
  }

  test("benford: a perfect benford-ish digit stream scores near-zero chi2") {
    // synthesize counts proportional to log10(1+1/d) out of 10000
    val rows = (1 to 9).flatMap { d =>
      val n = math.round(10000 * math.log10(1.0 + 1.0 / d)).toInt
      Seq.fill(n)(d * 1.11) // value whose cents leading digit is d
    }
    val out = RobustStats.benford(rows.toDF("value"), "value").collect()
    assert(out.length == 9)
    val chi2 = out.head.getFloat(5)
    assert(chi2 < 1.0f, s"chi2 $chi2 should be tiny for Benford data")
    // uniform digits, by contrast, light up the statistic
    val uni = RobustStats.benford(
      (1 to 9).flatMap(d => Seq.fill(1000)(d * 1.11)).toDF("value"), "value")
      .collect().head.getFloat(5)
    assert(uni > 100f, s"uniform chi2 $uni should be large")
  }

  test("benford: zero qualifying rows emit explicit NULL stats, never 0/0") {
    // every value rounds to <= 0 cents -> no digits at all: the 9 rows
    // still come back, counts are 0, and obs_share/contrib/chi2 are
    // EXPLICIT NULLs (the cooksDistance when-guard convention) while
    // the data-free benford_share column stays populated
    val out = RobustStats.benford(
      Seq(0.004, 0.0, -3.5).toDF("value"), "value").collect()
    assert(out.length == 9)
    assert(out.forall(_.getLong(1) == 0L))
    assert(out.forall(r => r.isNullAt(2) && r.isNullAt(4) && r.isNullAt(5)))
    assert(out.forall(r => !r.isNullAt(3)))
  }

  test("benford: digit extraction is decimal-exact, no log10 on values") {
    // 0.99 -> 99 cents -> digit 9; 1.0 -> 100 -> 1; 0.01 -> 1 -> 1
    val out = RobustStats.benford(
      Seq(0.99, 1.0, 0.01).toDF("value"), "value").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(9L) == 1L && out(1L) == 2L, out.toString)
  }
}
