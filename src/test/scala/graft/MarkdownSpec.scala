package graft

import org.apache.spark.sql.functions.col
import graft.functions.TextAnalysis.Markdown

/** Markdown.strip contract: fenced code drops, inline code keeps,
  * links/images keep their text, line decorations strip, emphasis
  * unwraps, prose survives verbatim. */
class MarkdownSpec extends SparkSpecBase {

  private def strip(md: String): String = {
    import spark.implicits._
    Seq(md).toDF("t").select(Markdown.strip(col("t")).as("s"))
      .head().getString(0)
  }

  test("fenced code content is dropped; inline code content kept") {
    assert(strip("before\n```\nsecret code\n```\nafter `kept` end") ==
      "before after kept end")
  }

  test("links and images reduce to their anchor/alt text") {
    assert(strip("See [docs here](http://x/y?z=1) and ![a chart](img.png).") ==
      "See docs here and a chart.")
  }

  test("headers, quotes, bullets, ordered lists, hr, setext all strip") {
    val md = "# Big Title\n\n> wise words\n\n- one\n* two\n+ three\n2. four\n\n---\n\nTitle2\n===\n\ndone"
    assert(strip(md) == "Big Title wise words one two three four Title2 done")
  }

  test("emphasis unwraps but mid-word underscores survive lines without pairs") {
    assert(strip("a *bold* and _ital_ and **very** word") == "a bold and ital and very word")
    assert(strip("snake_case alone stays") == "snake_case alone stays")
  }

  test("plain prose passes through collapsed") {
    assert(strip("  plain\ttext\nwith   space  ") == "plain text with space")
  }
}
