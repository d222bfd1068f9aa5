package graft

import graft.operators.CodeStats

/** Line-shape ground truths for the code-corpus quality gates: comment
  * markers (`//` and `#`, leading-space tolerant), blank vs
  * whitespace-only lines, indentation counting, and the length stats. */
class CodeStatsSpec extends SparkSpecBase {

  import spark.implicits._

  private def statsOf(code: String) =
    CodeStats.lineStats(Seq((1L, code)).toDF("id", "code"), "id", "code")
      .collect().head

  test("counts comments, blanks, and indents on a hand-built snippet") {
    val code = Seq(
      "fn main() {",     // 11 chars, no indent
      "    // setup",    // comment, indented
      "",                // blank
      "# shell style",   // comment, no indent
      "   ",             // whitespace-only: blank, NOT indented content
      "    let x = 1;",  // indented
      "}").mkString("\n")
    val r = statsOf(code)
    assert(r.getAs[Long]("n_lines") == 7L)
    assert(r.getAs[Long]("n_comment") == 2L)
    assert(r.getAs[Long]("n_blank") == 2L)
    // indent_frac counts lines with leading space AND content: the
    // comment at line 2 and the let at line 6, not the "   " line
    assert(math.abs(r.getAs[Float]("indent_frac") - 2f / 7) < 1e-6)
    assert(r.getAs[Long]("max_line_len") == 14L)
  }

  test("a single line with no newline is one line") {
    val r = statsOf("x = 1")
    assert(r.getAs[Long]("n_lines") == 1L)
    assert(r.getAs[Long]("max_line_len") == 5L)
    assert(r.getAs[Float]("mean_line_len") == 5f)
    assert(r.getAs[Long]("n_comment") == 0L)
  }

  test("a comment marker mid-line does not count the line as a comment") {
    val r = statsOf("let u = a // b\n// real comment")
    assert(r.getAs[Long]("n_comment") == 1L)
  }
}
