package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Boilerplate removal / main-content extraction — the step between raw
 * crawl HTML and every text-quality operator downstream: navigation
 * bars, tag clouds, and footers dominate small pages by byte count,
 * and training on them teaches a model to emit link lists.
 *
 * Method: the public block-level link-density heuristic (the core of
 * jusText/boilerpipe-family extractors): split the page into blocks at
 * block-element boundaries, strip tags, and keep a block iff it is
 * LONG enough (≥ `minChars` visible characters) and NOT link-dense
 * (anchor text strictly under one third of visible text). Short
 * blocks and link-heavy blocks of any length are boilerplate.
 *
 * Reference surface: the reference's ingest pipeline consumes
 * pre-extracted text (`NeuronDB/src/ml/ml_multimodal.c` treats
 * documents as opaque payloads); extraction itself is public-method
 * work, composed here entirely from codegen'd Catalyst expressions —
 * split/regexp_replace/regexp_extract_all/filter/aggregate — so the
 * whole operator stays inside WholeStageCodegen with ZERO UDFs and a
 * DuckDB oracle can replay it closed-form.
 *
 * Scale shape: stateless per-row expression chain; no shuffle, no
 * collected state — a pure scan-stage rewrite at 100 TB.
 */
object Boilerplate {

  private val BlockClose = "(?i)</(?:p|div|li|h[1-6]|footer|header|nav|section|article|td)>"
  private val Tag = "<[^>]*>"

  /** innerHTML non-greedy up to the closing tag, so anchors whose
    * labels carry nested inline markup (`<a><b>x</b> y</a>`) still
    * contribute their visible text; nested tags are stripped before
    * counting. */
  private val AnchorText = "(?is)<a\\b[^>]*>(.*?)</a>"

  /** visible text of one block (tags stripped, trimmed). */
  private def visible(block: Column): Column =
    trim(regexp_replace(block, Tag, ""))

  /** total anchor-text characters of one block — a sum of per-anchor
    * visible lengths (no concatenated-string materialization). */
  private def linkChars(block: Column): Column =
    aggregate(
      regexp_extract_all(block, lit(AnchorText), lit(1)),
      lit(0L), (acc, x) => acc + length(regexp_replace(x, Tag, "")))

  /** Blocks of an HTML column: split at closing block tags, dropping
    * chunks with no visible text. */
  def blocks(html: Column): Column =
    filter(split(html, BlockClose), b => length(visible(b)) > 0)

  /** Struct(n_blocks, n_kept, kept_chars, link_chars) — the density
    * classifier's bookkeeping over one page. */
  def blockStats(html: Column, minChars: Int = 30): Column = {
    val bs = blocks(html)
    val kept = filter(bs, b =>
      length(visible(b)) >= minChars && linkChars(b) * 3 < length(visible(b)))
    struct(
      size(bs).cast("long").as("n_blocks"),
      size(kept).cast("long").as("n_kept"),
      aggregate(kept, lit(0L), (acc, b) => acc + length(visible(b))).as("kept_chars"),
      aggregate(bs, lit(0L), (acc, b) => acc + linkChars(b)).as("link_chars"))
  }

  /** The extracted main content: kept blocks' visible text joined with
    * single newlines — what downstream quality/dedup operators see. */
  def extractContent(html: Column, minChars: Int = 30): Column =
    array_join(
      transform(
        filter(blocks(html), b =>
          length(visible(b)) >= minChars && linkChars(b) * 3 < length(visible(b))),
        visible(_)),
      "\n")
}
