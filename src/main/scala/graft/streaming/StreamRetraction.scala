package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.{Hnsw, Ivf, IvfPq}

/**
 * Streaming retraction — the erasure half of continuous index
 * maintenance, composing r15's two results ([[StreamIndexIngest]]'s
 * replay-idempotent epoch layout + the lazy-tombstone erasure trade
 * SCALE_BENCH measured) into the production shape: a CONTINUOUS
 * retraction feed (GDPR erasure requests, moderation takedowns,
 * opt-outs) against a served vector index.
 *
 * Neither eager shape survives that feed at scale: `Ivf.deleteBulk`
 * rewrites the affected posting partitions per call, and
 * `Hnsw.deleteBulk` on a scattered manifest pays a full-graph rebuild
 * that grows with INDEX size (43× at 100× — the measured cliff), so a
 * trickle of retractions forces perpetual rebuilds. Here a retraction
 * micro-batch writes ONLY its own id frame as a tombstone epoch —
 * `tombstones/ingest=batch-<batchId>` under the index root, dynamic
 * partition overwrite, the SAME replay-idempotence contract as data
 * ingest (a crash-replayed batch re-derives the same ids and replaces
 * exactly its own epoch). The reference's erasure shape is the same
 * mark-then-sweep pair riding PG's MVCC: deletes leave dead tuples
 * that scans skip, and `ambulkdelete`/`amvacuumcleanup` sweep them
 * later (`NeuronDB/src/index/ivf_am.c:1173,1360`,
 * `hnsw_am.c:545`) — tombstone epochs + [[compactIvf]] re-express
 * that on immutable parquet. Cost per batch is
 * O(|retraction batch|) ids — KILOBYTES — independent of index size,
 * and the posting/code/graph files are never touched.
 *
 * Serving pays one anti-join against the accumulated tombstones
 * (bounded by the compaction cadence, so broadcast-sized): the
 * serving view IS the oracled bulk-purge kernel applied lazily —
 * [[servingIvf]] = `Ivf.deleteBulk(loaded, tombstones)` as a plan,
 * not a rewrite; [[servingPq]] purges BOTH tables through
 * `IvfPq.deleteBulk`; HNSW serves through `searchBatch(tombstones=)`
 * ([[tombstoneSet]]), the lazy path whose recall-at-production-ef is
 * spec-pinned. [[compact]] folds: one static `writePartitioned`
 * rewrite of the purged index (epochs AND tombstones collapse into
 * `ingest=base`), then the tombstone subtree is dropped. Crash-safe
 * by idempotence — a crash between rewrite and drop re-applies
 * tombstones whose rows are already gone, and an anti-join with no
 * matches is a no-op.
 */
object StreamRetraction {

  /** Write one micro-batch of erasure ids as its own tombstone epoch.
    * The frame's FIRST column is the id (any integral type; stored as
    * long), matching the [[graft.operators.Ivf.deleteBulk]] manifest
    * convention. Replay-idempotent: dynamic overwrite keyed by the
    * checkpointed `batchId`. `coalesce(1)` is file hygiene — an id
    * frame is kilobytes; one file per epoch keeps the tombstone scan's
    * listing at one file per batch. An EMPTY micro-batch (offset-only
    * trigger, replayed empty range) writes nothing: a file-less epoch
    * would still create the `tombstones` directory and a parquet read
    * over zero files cannot infer a schema. */
  def retractBatch(ids: DataFrame, indexPath: String, batchId: Long): Unit = {
    val frame = ids.select(col(ids.columns.head).cast("long").as("id"))
    if (frame.isEmpty) return
    frame.withColumn("ingest", lit(s"batch-$batchId"))
      .coalesce(1)
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("ingest")
      .parquet(s"$indexPath/tombstones")
  }

  /** All accumulated tombstone epochs as ONE scan relation (column
    * `id`), DEDUPLICATED — the same id legitimately arrives in two
    * epochs (a re-submitted erasure request), and every consumer
    * (serving anti-join, [[tombstoneSet]], [[health]],
    * `Hnsw.compact`'s per-shard stats) must count it once. Empty frame
    * if no retraction has landed yet; the explicit schema keeps the
    * read total even over a directory with no data files. */
  def readTombstones(spark: SparkSession, indexPath: String): DataFrame = {
    val path = new org.apache.hadoop.fs.Path(s"$indexPath/tombstones")
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(path))
      spark.read.schema("id LONG, ingest STRING").parquet(path.toString)
        .select(col("id")).distinct()
    else spark.range(0).select(col("id"))
  }

  /** The served IVF view: load the partitioned index and apply the
    * accumulated tombstones as a LAZY anti-join — the oracled
    * [[graft.operators.Ivf.deleteBulk]] kernel as a plan, no rewrite.
    * Probes keep pruning at the file level; the anti-join broadcasts
    * while compaction keeps the tombstone set small. */
  def servingIvf(spark: SparkSession, indexPath: String, vecCol: String,
                 idCol: String): Ivf.IvfModel =
    Ivf.deleteBulk(Ivf.loadPartitioned(spark, indexPath, vecCol), idCol,
      readTombstones(spark, indexPath).select(col("id").as(idCol)))

  /** [[servingIvf]]'s IVFADC form: the anti-join purges BOTH tables
    * the index keeps (codes and raw rows) through
    * [[graft.operators.IvfPq.deleteBulk]] — a code row surviving its
    * raw row would resurrect the erased id through the ADC candidate
    * scan. */
  def servingPq(spark: SparkSession, indexPath: String, vecCol: String,
                idCol: String): IvfPq.IvfPqModel =
    IvfPq.deleteBulk(IvfPq.loadPartitioned(spark, indexPath, vecCol, idCol),
      readTombstones(spark, indexPath).select(col("id").as(idCol)))

  /** The accumulated tombstones as the broadcastable set
    * [[graft.operators.Hnsw.searchBatch]] filters at serve time (the
    * lazy erasure path). Driver-sized by the compaction cadence, same
    * bound as [[graft.operators.Hnsw.tombstoneSet]]. */
  def tombstoneSet(spark: SparkSession, indexPath: String): Set[Long] =
    Hnsw.tombstoneSet(readTombstones(spark, indexPath))

  /** The compaction-trigger dial — [[StreamIndexIngest]]'s
    * `route_health` sibling for the erasure side: one row of
    * (index_rows, tombstones, dead_fraction) read from the index
    * path. `dead_fraction` is what a pipeline alerts on and what
    * schedules [[compactIvf]] (the global form of
    * [[graft.operators.Hnsw.compact]]'s per-shard `minDeadFraction`);
    * `tombstones` also bounds the serving anti-join's broadcast side,
    * so the dial doubles as the serve-cost guard. Two counts and a
    * division — cheap enough to run per retraction batch. Ids are
    * deduplicated by [[readTombstones]]; STRAY ids (never indexed, or
    * already folded by a prior compact) still count, which biases
    * `dead_fraction` upward — the conservative direction: the dial
    * can only trigger compaction EARLY, and compaction consumes the
    * strays. */
  def health(spark: SparkSession, indexPath: String,
             vecCol: String): DataFrame = {
    val base = Ivf.loadPartitioned(spark, indexPath, vecCol).assigned
      .agg(count(lit(1)).as("index_rows"))
    val tombs = readTombstones(spark, indexPath)
      .agg(count(lit(1)).as("tombstones"))
    base.crossJoin(tombs)
      .select(col("index_rows"), col("tombstones"),
        (col("tombstones") / col("index_rows")).cast("float")
          .as("dead_fraction"))
  }

  /** Fold the tombstones into the base: ONE static-mode
    * `writePartitioned` rewrite of the PURGED index (ingest epochs and
    * tombstones both collapse into `ingest=base`), then drop the
    * tombstone subtree. Runs on the maintenance cadence (the same one
    * that re-tunes centroids — MAINT_DRIFT.json calibrates it), NOT
    * per retraction. Crash between rewrite and drop is benign: the
    * surviving tombstones anti-join rows that no longer exist. */
  def compactIvf(spark: SparkSession, indexPath: String, vecCol: String,
                 idCol: String): Unit = {
    val purged = servingIvf(spark, indexPath, vecCol, idCol)
    swapInCompacted(spark, indexPath, "assigned", purged.assigned)
    dropTombstones(spark, indexPath)
  }

  /** [[compactIvf]]'s IVFADC form. Only the encoded table hits disk —
    * `IvfPq.writePartitioned` reconstructs the raw view from it on
    * load — and the anti-join already purged it, so one swap covers
    * both serve paths. */
  def compactPq(spark: SparkSession, indexPath: String, vecCol: String,
                idCol: String): Unit = {
    val purged = servingPq(spark, indexPath, vecCol, idCol)
    swapInCompacted(spark, indexPath, "encoded", purged.encoded)
    dropTombstones(spark, indexPath)
  }

  /** Sibling-directory compaction swap: the purged table is written to
    * `<table>.compacting` (the plan READS the live directory, so an
    * in-place overwrite would consume its own input — Spark refuses
    * or corrupts), then two renames swap it in. No row ever touches
    * the driver, at any index size. The crash windows are explicit
    * and recoverable by inspection: a crash before the first rename
    * leaves the live table untouched (`.compacting` is garbage to
    * delete); between the renames, the index is the `.old` directory
    * (rename it back); after, only cleanup remains — and because
    * tombstones are dropped LAST, every window replays to the same
    * serving view (re-applying tombstones over purged rows is a
    * no-op). */
  private def swapInCompacted(spark: SparkSession, indexPath: String,
                              table: String, purged: DataFrame): Unit = {
    val live = new org.apache.hadoop.fs.Path(s"$indexPath/$table")
    val next = new org.apache.hadoop.fs.Path(s"$indexPath/$table.compacting")
    val old = new org.apache.hadoop.fs.Path(s"$indexPath/$table.old")
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    purged.withColumn("ingest", lit("base"))
      .repartition(col("cluster_id"))
      .write.mode("overwrite")
      .partitionBy("ingest", "cluster_id")
      .parquet(next.toString)
    fs.delete(old, true)
    require(fs.rename(live, old), s"compaction swap: cannot retire $live")
    require(fs.rename(next, live), s"compaction swap: cannot promote $next")
    fs.delete(old, true)
  }

  private def dropTombstones(spark: SparkSession, indexPath: String): Unit = {
    val path = new org.apache.hadoop.fs.Path(s"$indexPath/tombstones")
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(path, true)
  }

  /** Run the continuous retraction feed: each arriving micro-batch of
    * ids lands as its own tombstone epoch under the checkpointed batch
    * id. The index stays serveable throughout — a reader building the
    * serving view between batches sees the prefix-of-the-stream
    * erasure state. One writer stream per index path, the same
    * contract (and the same checkpoint-enforced uniqueness) as
    * [[StreamIndexIngest.run]]. */
  def run(stream: DataFrame, indexPath: String, checkpoint: String,
          trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        retractBatch(batch, indexPath, batchId)
      }
      .start()
}
