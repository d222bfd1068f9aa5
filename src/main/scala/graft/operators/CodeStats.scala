package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Source-code shape statistics — the line-level quality heuristics a
 * code-corpus curation pass filters on before code enters a training
 * mix (the StarCoder/Stack-style gates: pathological line lengths,
 * comment density, blank and indentation ratios). Text quality scoring
 * ([[graft.functions.TextAnalysis]]) reads prose; code wants
 * line-structure signals instead.
 *
 * Reference surface: the reference scores documents via its quality
 * UDFs; line-shape gating is the code-corpus extension, public-method
 * work (Kocetkov et al. 2022, The Stack; Li et al. 2023, StarCoder
 * data filters).
 *
 * Scale shape: a stateless per-row column program — split once, then
 * pure array algebra (size / filter / aggregate); zero UDFs, zero
 * shuffles. A 100 TB code corpus scans in one pass with every metric
 * inside whole-stage codegen.
 */
object CodeStats {

  /** True when the line's first non-space content opens a `//` or `#`
    * comment (the two markers covering the C-family and script-family
    * corpora this gate targets; a language-aware pass would dispatch
    * on the file extension upstream). */
  private def isComment(l: Column): Column = {
    val t = ltrim(l)
    t.startsWith("//") || t.startsWith("#")
  }

  /** Per-document line-shape statistics over `textCol` split on
    * newlines: line count, max/mean line length, and the comment /
    * blank / indented line fractions. Means and fractions emit float4
    * (the cross-engine convention); counts stay exact longs. */
  def lineStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val lines = split(col(textCol), "\n")
    val nLines = size(lines).cast("long")
    val lenSum = aggregate(lines, lit(0L), (acc, l) => acc + length(l))
    val nComment = size(filter(lines, isComment(_))).cast("long")
    val nBlank = size(filter(lines, l => length(trim(l)) === 0)).cast("long")
    val nIndent = size(filter(lines,
      l => l.startsWith(" ") && length(trim(l)) > 0)).cast("long")
    df.filter(col(textCol).isNotNull)
      .select(col(idCol),
        nLines.as("n_lines"),
        array_max(transform(lines, l => length(l))).cast("long")
          .as("max_line_len"),
        (lenSum.cast("double") / nLines).cast("float").as("mean_line_len"),
        nComment.as("n_comment"),
        nBlank.as("n_blank"),
        (nComment.cast("double") / nLines).cast("float").as("comment_frac"),
        (nBlank.cast("double") / nLines).cast("float").as("blank_frac"),
        (nIndent.cast("double") / nLines).cast("float").as("indent_frac"))
  }
}
