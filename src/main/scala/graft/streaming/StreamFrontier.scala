package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Streaming crawl-frontier politeness — the INGEST-TIME face of
 * `operators.CrawlFrontier`: discovered URLs arrive as a stream, and
 * each host's fetch slots must stay spaced by the crawl delay ACROSS
 * micro-batches, which windowed aggregates cannot express — the
 * per-host next-sequence counter must survive from batch to batch.
 * `flatMapGroupsWithState` holds exactly that: one long per host.
 *
 * Within one group invocation, arrivals sort by (priority desc, url)
 * so the assignment is deterministic; across invocations the state
 * counter carries continuity — the k-th URL a host has EVER scheduled
 * fetches at k·delayMs. Lane assignment reuses the md5-prefix
 * convention so the batch sibling and the oracle replay it exactly.
 *
 * Scale shape: stateful stream with one counter per host, the same
 * bounded-state contract as `StreamQuota`/`StreamDedup`.
 */
object StreamFrontier {

  case class HostSeq(next: Long)

  /** Output: (url, host, slot, seq, scheduledMs). Works on static
    * frames too (batch parity: one empty-state invocation per host).
    * `slots` follows the batch scheduler's md5-prefix lane convention
    * exactly (`CrawlFrontier.laneOf`). */
  def schedule(df: DataFrame, urlCol: String, hostCol: String,
               priorityCol: String, delayMs: Long = 1000L,
               slots: Int = 16): Dataset[(String, String, Long, Long, Long)] = {
    require(delayMs > 0, "need a positive delay")
    graft.operators.CrawlFrontier.laneDigits(slots) // validate slots range up front
    val spark = df.sparkSession
    import spark.implicits._
    // UTF-8 byte order for the URL tie-break — JVM String order is
    // UTF-16 code units, which diverges from Spark's UTF8String /
    // DuckDB collation for non-BMP text (the r11 temperatureMixture
    // lesson); and priority descends via Ordering.reverse, not -pri
    // (negation overflows Long.MinValue).
    val utf8Order: Ordering[String] = (a: String, b: String) =>
      java.util.Arrays.compareUnsigned(a.getBytes("UTF-8"), b.getBytes("UTF-8"))
    val byPriThenUrl: Ordering[(Long, String)] =
      Ordering.Tuple2(Ordering.Long.reverse, utf8Order)
    df.filter(col(hostCol).isNotNull && col(urlCol).isNotNull &&
        col(priorityCol).isNotNull) // null rows have no host queue to join
      .select(col(hostCol).cast("string"), col(urlCol).cast("string"),
        col(priorityCol).cast("long"))
      .as[(String, String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (host: String, rows: Iterator[(String, String, Long)],
         state: GroupState[HostSeq]) =>
          val slot = graft.operators.CrawlFrontier.laneOf(host, slots)
          var next = state.getOption.map(_.next).getOrElse(0L)
          val ordered = rows.toSeq
            .sortBy { case (_, url, pri) => (pri, url) }(byPriThenUrl)
          val out = ordered.map { case (_, url, _) =>
            val seq = next
            next += 1
            (url, host, slot, seq, seq * delayMs)
          }
          state.update(HostSeq(next))
          out.iterator
      }
  }
}
