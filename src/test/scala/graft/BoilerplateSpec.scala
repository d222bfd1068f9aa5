package graft

import org.apache.spark.sql.functions._
import graft.operators.Boilerplate

/** Link-density extractor invariants: length gate, density gate,
  * multi-tag block splitting, and a plan with no UDFs. */
class BoilerplateSpec extends SparkSpecBase {

  import spark.implicits._

  private def statsOf(html: String): (Long, Long, Long, Long) = {
    val r = Seq(html).toDF("html")
      .select(Boilerplate.blockStats(col("html")).as("s"))
      .select($"s.n_blocks", $"s.n_kept", $"s.kept_chars", $"s.link_chars")
      .head()
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
  }

  test("long low-link blocks survive; short and link-dense blocks do not") {
    val html = "<div><a href=\"/x\">Home</a> <a href=\"/y\">About us</a></div>" +
      "<p>" + ("content word " * 5) + "</p>" + // 64 visible chars, kept
      "<li><a href=\"/t\">tag</a></li>" + // short AND dense
      "<footer><a href=\"/p\">a very long anchor text here</a> plus a tail</footer>"
    val (nb, nk, kc, lc) = statsOf(html)
    assert(nb == 4)
    assert(nk == 1)
    assert(kc == ("content word " * 5).trim.length)
    assert(lc == "Home".length + "About us".length + "tag".length +
      "a very long anchor text here".length)
  }

  test("density gate: a LONG but link-heavy block is boilerplate") {
    // 40 visible chars, 20 of them anchor text -> 3*20 >= 40, dropped
    val dense = "<p><a href=\"/q\">aaaaaaaaaaaaaaaaaaaa</a>bbbbbbbbbbbbbbbbbbbb</p>"
    assert(statsOf(dense)._2 == 0)
    // same length, 13 anchor chars -> 3*13 < 40, kept
    val ok = "<p><a href=\"/q\">aaaaaaaaaaaaa</a>bbbbbbbbbbbbbbbbbbbbbbbbbbb</p>"
    assert(statsOf(ok)._2 == 1)
  }

  test("nested inline tags in an anchor label count their VISIBLE chars") {
    // old single-level regex saw <a ...><b>... and extracted nothing;
    // the label's visible length must drive the density gate.
    val dense = "<p><a href='/q'><b>aaaaaaaaaa</b><i>aaaaaaaaaa</i></a>" +
      "bbbbbbbbbbbbbbbbbbbb</p>" // 40 visible, 20 anchor -> dropped
    val (_, nk, _, lc) = statsOf(dense)
    assert(nk == 0)
    assert(lc == 20)
    val ok = "<p><a href='/q'><b>aaaaa</b>aaaaaaaa</a>" +
      "bbbbbbbbbbbbbbbbbbbbbbbbbbb</p>" // 40 visible, 13 anchor -> kept
    assert(statsOf(ok)._2 == 1)
  }

  test("all block-closing tags split; headings and table cells count") {
    val html = "<h2>" + ("heading words here " * 2) + "</h2>" +
      "<td>" + ("cell content words " * 2) + "</td>" +
      "<section>" + ("section body text " * 2) + "</section>"
    val (nb, nk, _, _) = statsOf(html)
    assert(nb == 3 && nk == 3)
  }

  test("extractContent joins kept blocks with newlines, in order") {
    val html = "<p>" + ("first paragraph words " * 2) + "</p>" +
      "<div><a href=\"/n\">navnav</a></div>" +
      "<p>" + ("second paragraph words " * 2) + "</p>"
    val got = Seq(html).toDF("html")
      .select(Boilerplate.extractContent(col("html")).as("c")).head().getString(0)
    assert(got == ("first paragraph words " * 2).trim + "\n" +
      ("second paragraph words " * 2).trim)
  }

  test("the operator compiles to pure expressions — no UDF in the plan") {
    val df = Seq("<p>x</p>").toDF("html")
      .select(Boilerplate.blockStats(col("html")).as("s"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.toLowerCase.contains("udf"),
      s"plan contains a UDF:\n$plan")
  }
}
