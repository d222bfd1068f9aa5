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
    val folded = aggregate(lines,
      expr(s"CAST(struct(0.0D, 0, 0.0D, 0, 0) AS $stateType)"),
      (acc, line0) => {
        val line = trim(line0)
        val extinf = line.startsWith("#EXTINF:")
        val streaminf = line.startsWith("#EXT-X-STREAM-INF:")
        val uri = !line.startsWith("#") && length(line) > 0
        // regexp_extract yields "" on no match — null it BEFORE the cast
        // (ANSI mode refuses ''-to-number)
        val dur = coalesce(
          nullif(regexp_extract(line, "^#EXTINF:([0-9.]+)", 1), lit(""))
            .cast("double"), lit(0.0))
        val bw = coalesce(
          nullif(regexp_extract(line, "BANDWIDTH=([0-9]+)", 1), lit(""))
            .cast("bigint"), lit(0L))
        struct(
          when(extinf, dur).when(uri, lit(0.0))
            .otherwise(acc.getField("pend")).as("pend"),
          (acc.getField("nseg") +
            when(uri && acc.getField("pend") > 0, 1L).otherwise(0L)).as("nseg"),
          (acc.getField("tot") +
            when(uri && acc.getField("pend") > 0, acc.getField("pend"))
              .otherwise(0.0)).as("tot"),
          (acc.getField("nvar") + when(streaminf, 1L).otherwise(0L)).as("nvar"),
          when(streaminf, greatest(acc.getField("maxbw"), bw))
            .otherwise(acc.getField("maxbw")).as("maxbw"))
      })
    val header = trim(element_at(lines, 1)) === "#EXTM3U"
    val target = coalesce(
      nullif(regexp_extract(col(textCol), "#EXT-X-TARGETDURATION:([0-9]+)", 1),
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
