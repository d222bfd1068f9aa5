package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.functions.Embeddings
import graft.operators.Rerank

/**
 * Streaming job processor (SURVEY §2.11): the Spark-native form of the
 * reference's `neuranq` background worker polling `neurondb.job_queue`
 * (`NeuronDB/src/worker/worker_queue.c:299-360`; job types embed |
 * rerank | cache_refresh | http_call `:444-499`; queue DDL
 * `neurondb--1.0.sql:3160-3177`).
 *
 * Shape: the queue is a stream (file source / Kafka in production;
 * MemoryStream in tests), `foreachBatch` dispatches per job type and
 * appends results — at-least-once, like the reference's poller with
 * `max_retries`. Watermark-based windowed aggregation over the `events`
 * stream is exposed in [[EventStream]].
 */
object JobQueue {

  /** Batch dispatcher — also usable directly on a static DataFrame.
    * Input: (job_id, job_type, payload, tenant_id). Output adds
    * status + result columns. */
  def processBatch(batch: DataFrame): DataFrame = {
    val embedResult = Embeddings.embedTextUdf(
      get_json_object(col("payload"), "$.text"),
      coalesce(get_json_object(col("payload"), "$.model"), lit("all-MiniLM-L6-v2")))
    // honors $.model exactly like the embed branch; the scorer is the
    // shared Rerank.pairScore, not a second copy. A scorer exception maps
    // to NULL, not 0.0: a zero score is a legitimate result, and the
    // status below must be able to mark the job failed (→ retryable)
    // rather than persisting a wrong "completed" score.
    val rerankUdf = udf((query: String, doc: String, model: String) =>
      try Some(Rerank.pairScore(query, doc, model))
      catch { case _: Exception => None })
    val qField = get_json_object(col("payload"), "$.query")
    val dField = get_json_object(col("payload"), "$.doc")
    val tField = get_json_object(col("payload"), "$.text")
    val rerankResult = rerankUdf(qField, dField,
      coalesce(get_json_object(col("payload"), "$.model"), lit("all-MiniLM-L6-v2")))

    // Required-field presence gates the result AND the status: the
    // fallback embedder treats a null text as "", so without the gate a
    // payload missing $.query/$.doc would "complete" with the maximum
    // possible score (embed("") vs embed("") similarity = 1.0) and a
    // missing $.text would persist the embedding of "" — garbage results
    // indistinguishable from real ones, never retried.
    batch
      .withColumn("embedding",
        when(col("job_type") === "embed" && tField.isNotNull, embedResult)
          .otherwise(lit(null)))
      .withColumn("score",
        when(col("job_type") === "rerank" && qField.isNotNull && dField.isNotNull,
          rerankResult).otherwise(lit(null).cast("double")))
      .withColumn("status",
        when(col("job_type") === "rerank",
          when(col("score").isNotNull, lit("completed")).otherwise(lit("failed")))
          .when(col("job_type") === "embed",
            when(col("embedding").isNotNull, lit("completed")).otherwise(lit("failed")))
          .when(col("job_type") === "cache_refresh", lit("completed"))
          .when(col("job_type") === "http_call", lit("skipped")) // zero-egress: never dispatched
          .otherwise(lit("failed")))
  }

  /** Run the queue as a stream: one `foreachBatch` sink appending
    * processed jobs to `outPath`. */
  def run(jobs: DataFrame, outPath: String, checkpoint: String): StreamingQuery =
    jobs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        processBatch(batch).write.mode("append").parquet(outPath)
      }
      .start()
}

/** Dedup-at-ingest for streaming pipelines — the streaming face of the
  * batch dedup family (`operators.Dedup`): exact key dedup with
  * engine-managed state, the shape a 100 TB training-data feed uses to
  * drop repeats before they ever land. State is bounded by the event-time
  * watermark when a timestamp column is supplied
  * (`dropDuplicatesWithinWatermark`); without one, state grows with the
  * distinct-key count (the key should then be a fingerprint, 8-16 bytes
  * per entry, as in `Dedup.fingerprintDedup`). */
object StreamDedup {

  /** Distinct key rows, first occurrence wins. Works on static frames
    * too (plain dropDuplicates — batch parity for the oracle gate). */
  def dedupKeys(df: DataFrame, keyCols: Seq[String],
                tsCol: Option[String] = None,
                watermark: String = "12 hours"): DataFrame = {
    val keyed = df.select(keyCols.map(col).toSeq: _*)
    (tsCol, df.isStreaming) match {
      case (Some(ts), true) =>
        df.withColumn("__ts", col(ts).cast("timestamp"))
          .withWatermark("__ts", watermark)
          .dropDuplicatesWithinWatermark(keyCols)
          .select(keyCols.map(col).toSeq: _*)
      case (_, true)  => keyed.dropDuplicates(keyCols)
      case (_, false) => keyed.dropDuplicates(keyCols)
    }
  }
}

/** Watermarked windowed aggregation over an event stream — the
  * Structured-Streaming counterpart of exposing `events` as a stream
  * (SURVEY §2.11: watermarks/session windows are Spark built-ins). */
object EventStream {

  /** Per-type event counts + mean of `valueCol` in tumbling windows;
    * late data beyond the watermark is dropped by the engine. Works on
    * static frames too. */
  def windowedCounts(events: DataFrame, tsCol: String, typeCol: String,
                     windowDur: String = "1 hour",
                     watermark: String = "2 hours",
                     valueCol: String = "value"): DataFrame = {
    val withTs = events.withColumn("__ts", col(tsCol).cast("timestamp"))
    val streaming = withTs.isStreaming
    val base = if (streaming) withTs.withWatermark("__ts", watermark) else withTs
    base.groupBy(window(col("__ts"), windowDur), col(typeCol))
      .agg(count(lit(1)).as("n"), avg(col(valueCol)).as("avg_value"))
  }

  /**
   * Stream-stream time-bounded inner join — the canonical
   * impression×click attribution shape of a training-data pipeline:
   * right events join left events with the same key when they land
   * within `(0, bound]` after them. Both sides carry watermarks, so the
   * engine evicts join state once `watermark + bound` passes — state is
   * O(in-flight window), never O(stream). Works on static frames too
   * (plain join — batch parity for the oracle gate).
   *
   * Columns: left must carry (`l_id`, `key`, `l_ts`); right (`r_id`,
   * `key`, `r_ts`). Returns (l_id, r_id, lag_us).
   */
  def timeBoundedJoin(left: DataFrame, right: DataFrame,
                      bound: String = "1 hour",
                      watermark: String = "12 hours"): DataFrame = {
    val l = if (left.isStreaming) left.withWatermark("l_ts", watermark) else left
    val r = if (right.isStreaming) right.withWatermark("r_ts", watermark) else right
    l.join(r.withColumnRenamed("key", "r_key"),
        col("key") === col("r_key") &&
          col("r_ts") > col("l_ts") &&
          col("r_ts") <= col("l_ts") + expr(s"INTERVAL $bound"))
      .select(col("l_id"), col("r_id"),
        (unix_micros(col("r_ts")) - unix_micros(col("l_ts"))).as("lag_us"))
  }

  /** Gap-based session windows per key (`session_window` — dynamic
    * windows that extend while events arrive within `gap` of the last
    * one; a new session starts when the gap is reached). Works on static
    * frames too, which is what the oracle gate compares against a
    * gaps-and-islands SQL formulation. */
  def sessionCounts(events: DataFrame, tsCol: String, keyCol: String,
                    gap: String = "30 minutes",
                    watermark: String = "2 hours",
                    valueCol: String = "value"): DataFrame = {
    val withTs = events.withColumn("__ts", col(tsCol).cast("timestamp"))
    val base = if (withTs.isStreaming) withTs.withWatermark("__ts", watermark) else withTs
    base.groupBy(session_window(col("__ts"), gap), col(keyCol))
      .agg(count(lit(1)).as("n"), sum(col(valueCol)).as("sum_value"))
  }
}
