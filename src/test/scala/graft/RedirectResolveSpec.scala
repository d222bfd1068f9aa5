package graft

import graft.operators.RedirectResolve

/** Redirect-resolution invariants: exact hop counts on chains, the
  * terminal fixpoint, loop and too-deep refusal with the semantic
  * `(src, maxHops, false)` contract, duplicate-edge determinism, and
  * the corpus-side left join for never-redirecting URLs. */
class RedirectResolveSpec extends SparkSpecBase {

  import spark.implicits._

  private def edges(rows: (String, String)*) =
    rows.toDF("src", "dst")

  private def mapOf(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getAs[String]("src") ->
      ((r.getAs[String]("final_url"), r.getAs[Long]("hops"),
        r.getAs[Boolean]("resolved")))).toMap

  test("chains resolve to the terminal with exact hop counts") {
    val m = mapOf(RedirectResolve.resolveMap(
      edges("a" -> "b", "b" -> "c", "c" -> "d"), "src", "dst", maxHops = 8))
    assert(m("a") == (("d", 3L, true)))
    assert(m("b") == (("d", 2L, true)))
    assert(m("c") == (("d", 1L, true)))
  }

  test("a chain of length exactly maxHops resolves; one deeper refuses") {
    val chain = (0 until 9).map(i => s"u$i" -> s"u${i + 1}")
    val m = mapOf(RedirectResolve.resolveMap(
      edges(chain: _*), "src", "dst", maxHops = 8))
    assert(m("u1") == (("u9", 8L, true)))  // 8 hops: at the cap
    assert(m("u0") == (("u0", 8L, false))) // 9 hops: refused, stays put
  }

  test("non-power-of-two cap: length-6 chain refused at maxHops=5") {
    val chain = (0 until 6).map(i => s"u$i" -> s"u${i + 1}")
    val m = mapOf(RedirectResolve.resolveMap(
      edges(chain: _*), "src", "dst", maxHops = 5))
    assert(m("u0") == (("u0", 5L, false)))
    assert(m("u1") == (("u6", 5L, true)))
  }

  test("loops and self-loops are refused, not followed") {
    val m = mapOf(RedirectResolve.resolveMap(
      edges("a" -> "b", "b" -> "a", "s" -> "s", "in" -> "a"),
      "src", "dst", maxHops = 8))
    assert(m("a") == (("a", 8L, false)))
    assert(m("b") == (("b", 8L, false)))
    assert(m("s") == (("s", 8L, false)))
    assert(m("in") == (("in", 8L, false))) // feeds a loop -> also refused
  }

  test("duplicate src edges keep the lexicographically first dst") {
    val m = mapOf(RedirectResolve.resolveMap(
      edges("a" -> "z", "a" -> "b"), "src", "dst", maxHops = 4))
    assert(m("a") == (("b", 1L, true)))
  }

  test("resolve: never-redirecting URLs map to themselves with 0 hops") {
    val urls = Seq("a", "c", "plain").toDF("url")
    val out = RedirectResolve.resolve(urls, "url",
      edges("a" -> "b", "b" -> "c"), "src", "dst", maxHops = 8)
      .collect().map(r => r.getAs[String]("url") ->
        ((r.getAs[String]("final_url"), r.getAs[Long]("hops"),
          r.getAs[Boolean]("resolved")))).toMap
    assert(out("a") == (("c", 2L, true)))
    assert(out("c") == (("c", 0L, true)))     // a terminal, not a key
    assert(out("plain") == (("plain", 0L, true)))
  }

  test("the map composes in log rounds: plan has no cartesian product") {
    val chain = (0 until 50).map(i => s"u$i" -> s"u${i + 1}")
    val plan = RedirectResolve.resolveMap(edges(chain: _*), "src", "dst",
      maxHops = 64).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }
}
