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

  test("worst-case bench JSON line fits the driver's 2000-char tail") {
    val numBudget = 7 // "12.345" + sign slack; queries are seconds-scale, 3-dp
    val queriesLen = Bench.headline.map(n => n.length + 2 + 1 + numBudget).sum + 2
    val spreadLen = Bench.headline.sortBy(-_.length).take(10)
      .map(n => n.length + 2 + 1 + numBudget).sum + 2
    val header = 200 // {"metric":"total","value":...,"unit":"sec", keys, calib, sf path
    val worst = header + queriesLen + spreadLen
    // available window: 2000-char driver tail − ~90-char sbt success
    // line − ~30 slack ⇒ ~1880. The estimate above is itself worst-case
    // (8 chars/number; the r10 line measured 1657 actual vs 1806
    // estimated), so 1880 still guards with real margin — the next
    // couple of headline additions trip this before the driver window
    // truncates anything.
    assert(worst < 1880,
      s"worst-case bench line $worst chars; trim the headline list or the number format " +
        "(driver tail keeps only the last 2000 chars and sbt appends ~90 more)")
  }
}
