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
    * frames too (batch parity: one empty-state invocation per host). */
  def schedule(df: DataFrame, urlCol: String, hostCol: String,
               priorityCol: String, delayMs: Long = 1000L): Dataset[(String, String, Long, Long, Long)] = {
    require(delayMs > 0, "need a positive delay")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(hostCol).cast("string"), col(urlCol).cast("string"),
        col(priorityCol).cast("long"))
      .as[(String, String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (host: String, rows: Iterator[(String, String, Long)],
         state: GroupState[HostSeq]) =>
          val md = java.security.MessageDigest.getInstance("MD5")
          val hex = md.digest(host.getBytes("UTF-8"))
          val slot = ((hex(0) >> 4) & 0x0f).toLong
          var next = state.getOption.map(_.next).getOrElse(0L)
          val ordered = rows.toSeq.sortBy { case (_, url, pri) => (-pri, url) }
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
