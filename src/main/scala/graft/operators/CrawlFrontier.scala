package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Crawl-frontier politeness scheduling — the step between URL discovery
 * (`html_links`, `sitemap_parse`, `robots_filter`) and fetching: a
 * polite crawler never hits one host more often than its crawl delay,
 * yet must keep thousands of fetcher slots busy across millions of
 * hosts. The classic frontier design (Mercator-style host queues):
 *
 *  - every URL's HOST is assigned to one of `slots` fetcher lanes by a
 *    stable content hash, so one host's requests serialize on one lane
 *    and per-host ordering needs no cross-lane coordination;
 *  - within a host, URLs rank by priority (then URL for determinism),
 *    capped at `maxPerHost` per cycle so no single host starves a lane;
 *  - the k-th fetch of a host is scheduled k·delayMs after the cycle
 *    start — politeness as pure arithmetic, no clock state.
 *
 * Reference surface: the reference consumes crawled corpora
 * (`NeuronDB/src/ml/ml_multimodal.c` ingest); the scheduling discipline
 * is public crawler-architecture work re-expressed as ONE window over
 * a host-partitioned shuffle.
 *
 * The hash is the repo's md5-prefix convention (`Sampling.hashSample`):
 * the host's first md5 hex digit picks among 16 lane groups, rendering
 * identically in DuckDB so the oracle replays EXACT assignments. Scale
 * shape: one shuffle on host (the window), everything else codegen'd
 * expressions; lanes stay balanced because hosts spread by hash, and a
 * skewed host is bounded by `maxPerHost` per cycle.
 */
object CrawlFrontier {

  /** Schedule one fetch cycle. Output adds: `slot` (fetcher lane),
    * `seq` (position in the host's queue, 0-based), `scheduled_ms`
    * (politeness offset from cycle start). Rows beyond `maxPerHost`
    * per host wait for the next cycle (dropped here). */
  def schedule(frontier: DataFrame, urlCol: String, hostCol: String,
               priorityCol: String, delayMs: Long = 1000L,
               maxPerHost: Int = 5): DataFrame = {
    require(delayMs > 0 && maxPerHost > 0, "need positive delay and cap")
    val w = Window.partitionBy(col(hostCol))
      .orderBy(col(priorityCol).desc, col(urlCol).asc)
    frontier
      .withColumn("slot",
        conv(substring(md5(col(hostCol)), 1, 1), 16, 10).cast("long"))
      .withColumn("seq", (row_number().over(w) - 1).cast("long"))
      .filter(col("seq") < maxPerHost)
      .withColumn("scheduled_ms", col("seq") * delayMs)
  }

  /** Per-lane load summary for capacity planning: URLs and distinct
    * hosts per slot, and the lane's makespan (max politeness offset). */
  def laneLoad(scheduled: DataFrame, hostCol: String): DataFrame =
    scheduled.groupBy(col("slot"))
      .agg(count(lit(1)).as("n_urls"),
        countDistinct(col(hostCol)).as("n_hosts"),
        max(col("scheduled_ms")).as("makespan_ms"))
}
