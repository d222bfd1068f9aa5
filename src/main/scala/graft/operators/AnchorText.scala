package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Anchor-text aggregation — the classic web-graph labeling signal: the
 * words OTHER pages use to link to a URL describe it better than its
 * own content (the original web-search insight), and a training
 * pipeline wants them as per-target labels for retrieval and
 * classification data.
 *
 * Composed entirely from codegen'd expressions (regexp over the page,
 * transform to (href, text) structs, explode, one groupBy on the
 * target) — zero UDFs, so the oracle replays the identical algebra.
 *
 * Real-crawl HTML robustness: hrefs may be double-quoted,
 * single-quoted, or unquoted, and anchor labels routinely carry nested
 * inline markup (`<a href=x><b>bold</b> label</a>`). Extraction first
 * NORMALIZES href quoting to the double-quoted form (two
 * `regexp_replace` passes, still codegen'd), then captures the anchor
 * innerHTML non-greedily up to the closing tag and strips nested tags
 * from the label — so all three quoting forms and tag-nested labels
 * yield their visible text instead of silently dropping.
 *
 * Reference surface: the reference consumes crawled corpora; anchor
 * aggregation is public web-search method re-expressed Spark-first.
 *
 * Scale shape: ONE shuffle (the per-target aggregation) after a pure
 * scan-stage extraction; anchor structs are tiny relative to pages, so
 * the shuffle moves labels, not documents.
 */
object AnchorText {

  /** innerHTML captured non-greedily ((?s) so labels may span lines);
    * runs over quote-NORMALIZED html, so one double-quote form suffices. */
  private val AnchorRe = "(?is)<a\\b[^>]*href=\"([^\"]*)\"[^>]*>(.*?)</a>"
  private val TagRe = "<[^>]*>"

  /** Rewrite single-quoted and unquoted href values to the
    * double-quoted form so one extraction regex covers all three
    * attribute syntaxes HTML parsers accept. */
  def normalizeHrefQuotes(html: Column): Column =
    regexp_replace(
      regexp_replace(html, "(?i)\\bhref\\s*=\\s*'([^']*)'", "href=\"$1\""),
      "(?i)\\bhref\\s*=\\s*([^\\s>\"'][^\\s>]*)", "href=\"$1\"")

  /** array<struct<href,text>> of one page's anchors (trimmed,
    * tag-stripped text; textless anchors kept — their href still votes
    * for popularity). */
  def anchors(html: Column): Column = {
    val n = normalizeHrefQuotes(html)
    zip_with(
      regexp_extract_all(n, lit(AnchorRe), lit(1)),
      regexp_extract_all(n, lit(AnchorRe), lit(2)),
      (h, t) => struct(h.as("href"),
        trim(regexp_replace(t, TagRe, "")).as("text")))
  }

  /** Per-target label table: anchor count, distinct source count, the
    * total label characters, and the lexicographically first label
    * (deterministic representative). `df` carries one page per row. */
  def aggregateByTarget(df: DataFrame, idCol: String, htmlCol: String): DataFrame =
    df.select(col(idCol).as("src"), explode(anchors(col(htmlCol))).as("a"))
      .select(col("src"), col("a.href").as("target"), col("a.text").as("text"))
      .filter(col("target") =!= "")
      .groupBy(col("target"))
      .agg(count(lit(1)).as("n_anchors"),
        countDistinct(col("src")).as("n_sources"),
        sum(length(col("text"))).cast("long").as("label_chars"),
        min(col("text")).as("first_label"))
}
