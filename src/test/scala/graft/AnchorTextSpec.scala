package graft

import org.apache.spark.sql.functions._
import graft.operators.AnchorText

/** Anchor-extraction invariants: (href, text) pairing, textless
  * anchors voting, empty-href dropped, UDF-free plan, one shuffle. */
class AnchorTextSpec extends SparkSpecBase {

  import spark.implicits._

  test("hrefs pair with their own texts, in document order") {
    val html = "<a href=\"/a\">first</a> gap <A HREF=\"/b\" class=\"x\">second</A>" +
      "<a href=\"/c\"></a><a href=\"\">no target</a>"
    val rows = Seq((1L, html)).toDF("id", "html")
      .select(explode(AnchorText.anchors(col("html"))).as("a"))
      .select($"a.href", $"a.text").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    assert(rows == Seq(("/a", "first"), ("/b", "second"), ("/c", ""), ("", "no target")))
  }

  test("single-quoted and unquoted hrefs extract, with non-empty labels") {
    val html = "<a href='/sq'>single quoted</a>" +
      "<a href=/uq>unquoted</a>" +
      "<a href = '/spaced'>spaced equals</a>" +
      "<a href=\"/dq\">double quoted</a>"
    val rows = Seq((1L, html)).toDF("id", "html")
      .select(explode(AnchorText.anchors(col("html"))).as("a"))
      .select($"a.href", $"a.text").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    assert(rows == Seq(("/sq", "single quoted"), ("/uq", "unquoted"),
      ("/spaced", "spaced equals"), ("/dq", "double quoted")))
  }

  test("nested inline tags inside the anchor keep their visible label") {
    val html = "<a href=\"/b\"><b>bold</b> and <i>italic</i> label</a>" +
      "<a href=\"/img\"><img src=\"x.png\"/></a>" +
      "<a href=\"/multi\">line one\nline two</a>"
    val rows = Seq((1L, html)).toDF("id", "html")
      .select(explode(AnchorText.anchors(col("html"))).as("a"))
      .select($"a.href", $"a.text").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    assert(rows == Seq(("/b", "bold and italic label"),
      ("/img", ""), ("/multi", "line one\nline two")))
  }

  test("pathological pages degrade, never crash: unclosed and nested anchors") {
    val html = "<a href=\"/open\">never closed " + // no </a> -> dropped
      "<a href='/ok'>fine</a>" + // non-greedy: the open anchor swallows up to HERE
      "<p>tail</p><a href=\"/last\">end</a>"
    val rows = Seq((1L, html)).toDF("id", "html")
      .select(explode(AnchorText.anchors(col("html"))).as("a"))
      .select($"a.href", $"a.text").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    // the unclosed anchor matches through the nested one's </a>; its
    // label is the tag-stripped span — degraded but deterministic —
    // and the trailing well-formed anchor still extracts cleanly
    assert(rows == Seq(("/open", "never closed fine"), ("/last", "end")))
  }

  test("aggregation counts anchors, distinct sources, and label chars per target") {
    val df = Seq(
      (1L, "<a href=\"/t\">good page</a><a href=\"/t\">nice</a>"),
      (2L, "<a href=\"/t\">good page</a><a href=\"/u\"></a>"),
      (3L, "<a href=\"\">dropped</a>")).toDF("id", "html")
    val out = AnchorText.aggregateByTarget(df, "id", "html").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4))).toMap
    assert(out("/t") == ((3L, 2L, (9 + 4 + 9).toLong, "good page")))
    assert(out("/u") == ((1L, 1L, 0L, "")))
    assert(!out.contains(""))
  }

  test("the extraction is UDF-free and the plan shuffles once") {
    val df = Seq((1L, "<a href=\"/x\">y</a>")).toDF("id", "html")
    val agg = AnchorText.aggregateByTarget(df, "id", "html")
    val opt = agg.queryExecution.optimizedPlan.toString
    assert(!opt.toLowerCase.contains("scalaudf"), s"UDF leaked:\n$opt")
    val exec = agg.queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(exec).length <= 2, // partial/final agg pair
      s"extra shuffles:\n$exec")
  }
}
