package graft

import org.scalatest.funsuite.AnyFunSuite

/**
 * Pins the bench OUTPUT CONTRACT, not timings.
 *
 * The round driver records only the last 2000 characters of the bench
 * run's output; sbt appends its own ~90-char success line after our JSON
 * line. Round 8's full-precision line outgrew that window and truncated
 * the headline total out of the recorded artifact. This spec computes the
 * worst-case line length from the actual headline list (4-decimal times
 * can reach 7 chars pre-decimal only if a query took > 99 s — we budget
 * 8 chars per number; the spread map is capped at 10 entries in Bench)
 * and fails the build if the headline list grows past the budget.
 */
class BenchShapeSpec extends AnyFunSuite {

  test("every headline name is a registered query") {
    val missing = Bench.headline.filterNot(SparkEntry.queries.contains)
    assert(missing.isEmpty, s"headline names not in SparkEntry.queries: $missing")
  }

  // Since r11 Bench emits TWO self-contained JSON lines: a compact META
  // line (spread/calib) first, then the MAIN line (total + per-query
  // seconds) LAST. The main line must always sit whole inside the
  // driver's 2000-char tail (sbt appends ~90 chars after it); the meta
  // line should ALSO fit so spread/calib survive, but it is emitted
  // first precisely so it is the part sacrificed if the window fills.

  test("worst-case MAIN bench line fits the driver's 2000-char tail") {
    val numBudget = 6 // "12.34" + sign slack; queries are seconds-scale, 2-dp
    val queriesLen = Bench.headline.map(n => n.length + 2 + 1 + numBudget).sum + 2
    val header = 120 // {"metric":"total","value":NNN.NNN,"unit":"sec","queries": ... ,"runs":N,"sf":"<path>"}
    val worstMain = header + queriesLen
    assert(worstMain < 1880,
      s"worst-case MAIN bench line $worstMain chars; trim the headline list or the number " +
        "format (driver tail keeps only the last 2000 chars and sbt appends ~90 more)")
  }

  test("worst-case META + MAIN bench lines fit the tail together") {
    val numBudget = 6
    val queriesLen = Bench.headline.map(n => n.length + 2 + 1 + numBudget).sum + 2
    val worstMain = 120 + queriesLen
    // spread_pct carries one integer (<= "99," = spreadPctBudget chars)
    // per headline query, array-aligned with the queries key order
    val spreadLen = Bench.headline.length * Bench.spreadPctBudget + 2
    val metaHeader = 110 // {"metric":"bench_meta","runs":N,"spread_pct":...,"calib_sec":{...}}
    val worstBoth = worstMain + metaHeader + spreadLen + 2 /* newlines */
    assert(worstBoth < 1900,
      s"worst-case META+MAIN bench output $worstBoth chars; the meta line would truncate " +
        "in the driver tail — trim the headline, the spread format, or number formats")
  }
}
