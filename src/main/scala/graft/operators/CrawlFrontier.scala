package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
 * the host's first md5 hex digits pick among `slots` lanes — at the
 * default 16 that is exactly the first digit, and for any slot count
 * the same `substr(md5(host), …)` arithmetic renders identically in
 * DuckDB so the oracle replays EXACT assignments. Scale shape: one
 * shuffle on host (the window), everything else codegen'd expressions;
 * lanes stay balanced because hosts spread by hash, and a skewed host
 * is bounded by `maxPerHost` per cycle.
 */
object CrawlFrontier {

  /** Hex digits of md5 prefix needed for `slots` lanes: the smallest k
    * with 16^k ≥ slots, plus one more when 16^k is not a multiple of
    * slots (caps the modulo bias below 1/16 relative). k = 1 at the
    * default slots = 16, preserving the one-digit convention. */
  def laneDigits(slots: Int): Int = {
    require(slots >= 1 && slots <= (1 << 20), s"slots out of range: $slots")
    val k = Iterator.from(1).find(i => math.pow(16, i) >= slots).get
    if (BigInt(16).pow(k) % slots == 0) k else k + 1
  }

  /** Lane of one host as a Column — first `laneDigits` md5 hex digits
    * mod slots; replayable in DuckDB with strpos/substr arithmetic. */
  def laneExpr(host: Column, slots: Int): Column =
    conv(substring(md5(host), 1, laneDigits(slots)), 16, 10)
      .cast("long") % slots

  /** The identical assignment JVM-side, for stateful streaming code
    * (`streaming.StreamFrontier`) that hashes outside Catalyst. */
  def laneOf(host: String, slots: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(host.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, laneDigits(slots)), 16) % slots
  }

  /** Schedule one fetch cycle. Output adds: `slot` (fetcher lane,
    * 0 until `slots`), `seq` (position in the host's queue, 0-based),
    * `scheduled_ms` (politeness offset from cycle start). Rows beyond
    * `maxPerHost` per host wait for the next cycle (dropped here). */
  def schedule(frontier: DataFrame, urlCol: String, hostCol: String,
               priorityCol: String, delayMs: Long = 1000L,
               maxPerHost: Int = 5, slots: Int = 16): DataFrame = {
    require(delayMs > 0 && maxPerHost > 0, "need positive delay and cap")
    val w = Window.partitionBy(col(hostCol))
      .orderBy(col(priorityCol).desc, col(urlCol).asc)
    frontier
      .withColumn("slot", laneExpr(col(hostCol), slots))
      .withColumn("seq", (row_number().over(w) - 1).cast("long"))
      .filter(col("seq") < maxPerHost)
      .withColumn("scheduled_ms", col("seq") * delayMs)
  }

  /** Schedule with a PER-HOST politeness delay (e.g. each host's
    * robots.txt Crawl-delay via `Robots.crawlDelayMs`, joined onto the
    * frontier as `delayMsCol`): the k-th fetch of a host waits
    * k · its own delay. Same one-shuffle shape as [[schedule]]; rows
    * with a null/non-positive delay get `defaultDelayMs`. */
  def scheduleWithDelays(frontier: DataFrame, urlCol: String, hostCol: String,
                         priorityCol: String, delayMsCol: String,
                         defaultDelayMs: Long = 1000L,
                         maxPerHost: Int = 5, slots: Int = 16): DataFrame = {
    require(defaultDelayMs > 0 && maxPerHost > 0, "need positive delay and cap")
    val w = Window.partitionBy(col(hostCol))
      .orderBy(col(priorityCol).desc, col(urlCol).asc)
    val delay = when(col(delayMsCol).isNotNull && col(delayMsCol) > 0,
      col(delayMsCol).cast("long")).otherwise(defaultDelayMs)
    frontier
      .withColumn("slot", laneExpr(col(hostCol), slots))
      .withColumn("seq", (row_number().over(w) - 1).cast("long"))
      .filter(col("seq") < maxPerHost)
      .withColumn("scheduled_ms", col("seq") * delay)
  }

  /** Per-lane load summary for capacity planning: URLs and distinct
    * hosts per slot, and the lane's makespan (max politeness offset). */
  def laneLoad(scheduled: DataFrame, hostCol: String): DataFrame =
    scheduled.groupBy(col("slot"))
      .agg(count(lit(1)).as("n_urls"),
        countDistinct(col(hostCol)).as("n_hosts"),
        max(col("scheduled_ms")).as("makespan_ms"))
}
