package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * HLS playlist parsing (RFC 8216) — the index format video pipelines
 * crawl before they ever touch a segment: MEDIA playlists pair
 * `#EXTINF:<duration>` tags with the following URI line, MASTER
 * playlists pair `#EXT-X-STREAM-INF:BANDWIDTH=...` variants with
 * theirs. One ordered `aggregate` fold over the line array carries the
 * pending-tag state — zero UDFs, stateless scan, no shuffle (the
 * [[Chat.toolTrace]] pattern).
 *
 * Durations fold in document order, so the engine's sequential adds
 * and an oracle's closed-form sum agree exactly whenever the fixture
 * durations are dyadic; real-world playlists should read
 * `total_duration` as float anyway.
 *
 * Reference surface: the reference ingests video as opaque bytes
 * (`ml_multimodal.c`); playlist indexing is the crawl-side extension,
 * public-spec work.
 */
object Hls {

  private val stateType =
    "struct<pend:double,nseg:bigint,tot:double,nvar:bigint,maxbw:bigint>"

  /** Parse playlists in `textCol`. Output per row: kind
    * ("master"/"media"/"invalid"), n_segments, total_duration (sum of
    * EXTINF durations, double), target_duration, n_variants,
    * max_bandwidth. */
  def parse(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val lines = split(col(textCol), "\\r?\\n")
    // pend = -1.0 means "no EXTINF pending" — a segment with a LEGAL
    // zero duration (#EXTINF:0, integer-duration playlists) must still
    // count, so zero cannot double as the sentinel
    val folded = aggregate(lines,
      expr(s"CAST(struct(-1.0D, 0, 0.0D, 0, 0) AS $stateType)"),
      (acc, line0) => {
        val line = trim(line0)
        val extinf = line.startsWith("#EXTINF:")
        val streaminf = line.startsWith("#EXT-X-STREAM-INF:")
        val uri = !line.startsWith("#") && length(line) > 0
        val pending = acc.getField("pend") >= 0
        // regexp_extract yields "" on no match — null it BEFORE the cast
        // (ANSI mode refuses ''-to-number); a malformed duration reads 0.
        // Numeric matches are BOUNDED with a boundary lookahead (the
        // HtmlMeta colspan convention): an unbounded [0-9]+ would let a
        // hostile 20-digit bandwidth throw the whole scan through the
        // ANSI bigint cast, and [0-9.]+ would match "1.2.3" straight
        // into an ANSI double-cast error — both now simply fail the
        // match and read as 0. The INTEGER part keeps its strict 9-digit
        // bound (a longer one fails the match entirely — that is the
        // hostile case), but extra FRACTION digits are legitimate muxer
        // output (some emit microsecond-precision durations), so the
        // fractional alternative rejects only a following DOT (the
        // "1.2.3" malformation stays 0) and a long fraction is
        // TRUNCATED at 9 digits rather than zeroed (ADVICE r13).
        val dur = coalesce(
          nullif(regexp_extract(line,
            "^#EXTINF:([0-9]{1,9}\\.[0-9]{1,9}(?!\\.)|[0-9]{1,9}(?![0-9.]))", 1),
            lit("")).cast("double"), lit(0.0))
        val bw = coalesce(
          nullif(regexp_extract(line, "BANDWIDTH=([0-9]{1,15})(?![0-9])", 1),
            lit(""))
            .cast("bigint"), lit(0L))
        struct(
          when(extinf, dur).when(uri, lit(-1.0))
            .otherwise(acc.getField("pend")).as("pend"),
          (acc.getField("nseg") +
            when(uri && pending, 1L).otherwise(0L)).as("nseg"),
          (acc.getField("tot") +
            when(uri && pending, acc.getField("pend"))
              .otherwise(0.0)).as("tot"),
          (acc.getField("nvar") + when(streaminf, 1L).otherwise(0L)).as("nvar"),
          when(streaminf, greatest(acc.getField("maxbw"), bw))
            .otherwise(acc.getField("maxbw")).as("maxbw"))
      })
    // null playlists are invalid, not empty-media (three-valued NOT
    // would skip the invalid branch on null)
    val header = coalesce(trim(element_at(lines, 1)) === "#EXTM3U", lit(false))
    // (?m) anchors the tag to its own line — the substring inside a
    // comment or URI must not read as the target duration
    val target = coalesce(
      nullif(regexp_extract(col(textCol),
        "(?m)^#EXT-X-TARGETDURATION:([0-9]{1,9})(?![0-9])", 1),
        lit("")).cast("bigint"), lit(0L))
    df.select(col(idCol),
      when(!header, lit("invalid"))
        .when(folded.getField("nvar") > 0, lit("master"))
        .otherwise(lit("media")).as("kind"),
      when(header, folded.getField("nseg")).otherwise(lit(0L)).as("n_segments"),
      when(header, folded.getField("tot")).otherwise(lit(0.0))
        .as("total_duration"),
      when(header, target).otherwise(lit(0L)).as("target_duration"),
      when(header, folded.getField("nvar")).otherwise(lit(0L)).as("n_variants"),
      when(header, folded.getField("maxbw")).otherwise(lit(0L))
        .as("max_bandwidth"))
  }
}
