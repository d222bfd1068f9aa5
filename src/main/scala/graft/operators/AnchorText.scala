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
 * Reference surface: the reference consumes crawled corpora; anchor
 * aggregation is public web-search method re-expressed Spark-first.
 *
 * Scale shape: ONE shuffle (the per-target aggregation) after a pure
 * scan-stage extraction; anchor structs are tiny relative to pages, so
 * the shuffle moves labels, not documents.
 */
object AnchorText {

  private val AnchorRe = "(?i)<a[^>]*href=\"([^\"]*)\"[^>]*>([^<]*)</a>"

  /** array<struct<href,text>> of one page's anchors (trimmed text;
    * textless anchors kept — their href still votes for popularity). */
  def anchors(html: Column): Column =
    zip_with(
      regexp_extract_all(html, lit(AnchorRe), lit(1)),
      regexp_extract_all(html, lit(AnchorRe), lit(2)),
      (h, t) => struct(h.as("href"), trim(t).as("text")))

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
