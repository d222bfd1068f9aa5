package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.{Hnsw, Ivf, IvfPq}
import graft.streaming.StreamRetraction

/** Continuous-erasure invariants (r15, the retraction face of the
  * maintenance pair): a retraction micro-batch lands ONLY its own
  * tombstone epoch (no posting file touched), the serving view equals
  * the oracled eager purge (`deleteBulk`) at every prefix of the
  * stream, a crash-replayed batch is a structural no-op, and
  * compaction folds tombstones into the base such that the reloaded
  * index equals the purged one and re-applying surviving tombstones
  * is harmless. */
class StreamRetractionSpec extends SparkSpecBase {

  import spark.implicits._

  private lazy val emb =
    Tables.read(spark, "/root/testdata/sf0.001", "embeddings").cache()

  private def idPairs(m: Ivf.IvfModel): Seq[(Long, Int)] = m.assigned
    .select($"vec_id".cast("long"), $"cluster_id".cast("int"))
    .as[(Long, Int)].collect().sortBy(identity).toSeq

  test("two retraction micro-batches == one batch == direct deleteBulk") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val full = Ivf.build(emb, "embedding", nlists = 8, seed = 42L)
    val root = java.nio.file.Files.createTempDirectory("srt_spec_").toString
    Ivf.writePartitioned(full, s"$root/ivf")

    val erased = (0L until 60L).toSeq
    val mem = MemoryStream[Long]
    val q = StreamRetraction.run(mem.toDF().toDF("vec_id"), s"$root/ivf",
      s"$root/ckpt", trigger = Trigger.ProcessingTime(0))
    try {
      mem.addData(erased.take(25): _*)
      q.processAllAvailable()
      // serve-between-batches: the view reflects the stream PREFIX
      val mid = StreamRetraction.servingIvf(spark, s"$root/ivf",
        "embedding", "vec_id")
      assert(idPairs(mid) ==
        idPairs(Ivf.deleteBulk(full, "vec_id", erased.take(25).toDF("vec_id"))))
      mem.addData(erased.drop(25): _*)
      q.processAllAvailable()
    } finally q.stop()

    // posting files untouched: the raw (pre-anti-join) load still
    // holds every row; only the serving view subtracts
    assert(Ivf.loadPartitioned(spark, s"$root/ivf", "embedding")
      .assigned.count() == emb.count())
    val served = StreamRetraction.servingIvf(spark, s"$root/ivf",
      "embedding", "vec_id")
    assert(idPairs(served) ==
      idPairs(Ivf.deleteBulk(full, "vec_id", erased.toDF("vec_id"))))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }

  test("replaying a retraction batchId is a no-op") {
    val full = Ivf.build(emb, "embedding", nlists = 8, seed = 42L)
    val root = java.nio.file.Files.createTempDirectory("srt_rp_").toString
    Ivf.writePartitioned(full, s"$root/ivf")
    StreamRetraction.retractBatch((0L until 30L).toDF("vec_id"),
      s"$root/ivf", batchId = 7L)
    val once = StreamRetraction.readTombstones(spark, s"$root/ivf")
      .as[Long].collect().sorted.toSeq
    // the crash-replay: same ids, same epoch — replaces, never appends
    StreamRetraction.retractBatch((0L until 30L).toDF("vec_id"),
      s"$root/ivf", batchId = 7L)
    val twice = StreamRetraction.readTombstones(spark, s"$root/ivf")
      .as[Long].collect().sorted.toSeq
    assert(twice == once && twice.size == 30)
    // a DISTINCT batch accumulates
    StreamRetraction.retractBatch((30L until 40L).toDF("vec_id"),
      s"$root/ivf", batchId = 8L)
    assert(StreamRetraction.readTombstones(spark, s"$root/ivf").count() == 40)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }

  test("empty retraction batch is a no-op; duplicate ids across epochs count once") {
    val full = Ivf.build(emb, "embedding", nlists = 8, seed = 42L)
    val root = java.nio.file.Files.createTempDirectory("srt_edge_").toString
    Ivf.writePartitioned(full, s"$root/ivf")
    // an EMPTY micro-batch (offset-only trigger) must not create a
    // file-less tombstones dir that breaks every subsequent read
    StreamRetraction.retractBatch(spark.range(0).toDF("vec_id"),
      s"$root/ivf", batchId = 0L)
    assert(StreamRetraction.readTombstones(spark, s"$root/ivf").count() == 0)
    assert(idPairs(StreamRetraction.servingIvf(spark, s"$root/ivf",
      "embedding", "vec_id")) == idPairs(full))
    // the same id re-submitted in a later epoch counts ONCE everywhere
    StreamRetraction.retractBatch((0L until 20L).toDF("vec_id"),
      s"$root/ivf", batchId = 1L)
    StreamRetraction.retractBatch((10L until 30L).toDF("vec_id"),
      s"$root/ivf", batchId = 2L)
    assert(StreamRetraction.readTombstones(spark, s"$root/ivf").count() == 30)
    val h = StreamRetraction.health(spark, s"$root/ivf", "embedding")
      .head()
    assert(h.getLong(1) == 30L, s"health must dedup: $h")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }

  test("no tombstones yet: serving view == full index") {
    val full = Ivf.build(emb, "embedding", nlists = 8, seed = 42L)
    val root = java.nio.file.Files.createTempDirectory("srt_empty_").toString
    Ivf.writePartitioned(full, s"$root/ivf")
    val served = StreamRetraction.servingIvf(spark, s"$root/ivf",
      "embedding", "vec_id")
    assert(idPairs(served) == idPairs(full))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }

  test("compactIvf folds tombstones into the base; re-apply is harmless") {
    val full = Ivf.build(emb, "embedding", nlists = 8, seed = 42L)
    val root = java.nio.file.Files.createTempDirectory("srt_cmp_").toString
    Ivf.writePartitioned(full, s"$root/ivf")
    StreamRetraction.retractBatch((0L until 50L).toDF("vec_id"),
      s"$root/ivf", batchId = 0L)
    val expect =
      idPairs(Ivf.deleteBulk(full, "vec_id", (0L until 50L).toDF("vec_id")))

    StreamRetraction.compactIvf(spark, s"$root/ivf", "embedding", "vec_id")
    // tombstone subtree dropped, base rewritten purged
    assert(StreamRetraction.readTombstones(spark, s"$root/ivf").count() == 0)
    assert(idPairs(Ivf.loadPartitioned(spark, s"$root/ivf", "embedding"))
      == expect)
    // serving after compact is unchanged (anti-join of nothing)
    assert(idPairs(StreamRetraction.servingIvf(spark, s"$root/ivf",
      "embedding", "vec_id")) == expect)
    // crash-between-rewrite-and-drop simulation: re-applying the SAME
    // tombstones against the already-purged base is a no-op
    StreamRetraction.retractBatch((0L until 50L).toDF("vec_id"),
      s"$root/ivf", batchId = 0L)
    assert(idPairs(StreamRetraction.servingIvf(spark, s"$root/ivf",
      "embedding", "vec_id")) == expect)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }

  test("compactPq purges BOTH tables and the reloaded serve equals eager") {
    val full = IvfPq.build(emb, "vec_id", "embedding",
      nlists = 8, m = 8, seed = 42L)
    val root = java.nio.file.Files.createTempDirectory("srt_pq_").toString
    IvfPq.writePartitioned(full, s"$root/ivfpq")
    StreamRetraction.retractBatch((0L until 40L).toDF("vec_id"),
      s"$root/ivfpq", batchId = 0L)
    StreamRetraction.compactPq(spark, s"$root/ivfpq", "embedding", "vec_id")
    assert(StreamRetraction.readTombstones(spark, s"$root/ivfpq").count() == 0)
    val reloaded = IvfPq.loadPartitioned(spark, s"$root/ivfpq",
      "embedding", "vec_id")
    val eager = IvfPq.deleteBulk(full, (0L until 40L).toDF("vec_id"))
    assert(reloaded.encoded.count() == eager.encoded.count())
    assert(reloaded.ivf.assigned.filter($"vec_id" < 40).count() == 0)
    // serve equality at the exhaustive dial
    val q = emb.filter($"vec_id" === 77L)
      .select($"embedding").head().getSeq[Float](0).toArray
    def top(m: IvfPq.IvfPqModel) = IvfPq.search(m, q, k = 5, nprobe = 8,
        rerankPool = m.encoded.count().toInt)
      .select($"vec_id".cast("long")).as[Long].collect().toSeq
    assert(top(reloaded) == top(eager))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }

  test("ingest and retraction streams compose on one index path") {
    // the production pipeline runs BOTH maintenance streams against
    // the same served index: ingest owns assigned/ingest=batch-*,
    // retraction owns tombstones/ingest=batch-* — disjoint subtrees,
    // so neither can clobber the other's epochs, and the serving view
    // is (base ∪ ingested) minus erased
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val decoys = emb.filter($"vec_id" < 30)
      .withColumn("vec_id", $"vec_id" + 5000000L)
    val base = Ivf.build(emb.filter($"vec_id" < 300).unionByName(decoys),
      "embedding", nlists = 8, seed = 42L)
    val root = java.nio.file.Files.createTempDirectory("srt_both_").toString
    Ivf.writePartitioned(base, s"$root/ivf")

    val arrivals = emb.filter($"vec_id" >= 300 && $"vec_id" < 380)
      .select($"vec_id", $"embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq
    val ingestMem = MemoryStream[(Long, Array[Float])]
    val retractMem = MemoryStream[Long]
    val qi = graft.streaming.StreamIndexIngest.run(base.centroids,
      ingestMem.toDF().toDF("vec_id", "embedding"), "embedding",
      s"$root/ivf", s"$root/ckpt_in", trigger = Trigger.ProcessingTime(0))
    val qr = StreamRetraction.run(retractMem.toDF().toDF("vec_id"),
      s"$root/ivf", s"$root/ckpt_rt", trigger = Trigger.ProcessingTime(0))
    try {
      ingestMem.addData(arrivals.take(40): _*)
      retractMem.addData((0L until 15L).map(_ + 5000000L): _*)
      qi.processAllAvailable(); qr.processAllAvailable()
      ingestMem.addData(arrivals.drop(40): _*)
      retractMem.addData((15L until 30L).map(_ + 5000000L): _*)
      qi.processAllAvailable(); qr.processAllAvailable()
    } finally { qi.stop(); qr.stop() }

    val served = StreamRetraction.servingIvf(spark, s"$root/ivf",
      "embedding", "vec_id")
    val ids = served.assigned.select($"vec_id".cast("long"))
      .as[Long].collect().toSet
    assert(ids == (0L until 380L).toSet) // base+ingested, decoys gone
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }

  test("hnsw tombstoneSet from accumulated epochs feeds the lazy serve") {
    val decoys = emb.filter($"vec_id" < 20)
      .withColumn("vec_id", $"vec_id" + 5000000L)
    val withDecoys = Hnsw.build(emb.unionByName(decoys),
      "vec_id", "embedding", numShards = 4)
    val root = java.nio.file.Files.createTempDirectory("srt_hn_").toString
    StreamRetraction.retractBatch(
      (0L until 10L).map(_ + 5000000L).toDF("vec_id"), s"$root/hnsw", 0L)
    StreamRetraction.retractBatch(
      (10L until 20L).map(_ + 5000000L).toDF("vec_id"), s"$root/hnsw", 1L)
    val tombs = StreamRetraction.tombstoneSet(spark, s"$root/hnsw")
    assert(tombs == (0L until 20L).map(_ + 5000000L).toSet)
    val q = emb.filter($"vec_id" === 3L)
      .select($"embedding").head().getSeq[Float](0).toArray
    val got = Hnsw.searchBatch(withDecoys, Array((3L, q)), k = 10,
        efSearch = 100000, tombstones = tombs)
      .select($"id".cast("long")).as[Long].collect().toSet
    // no erased decoy is ever served; its original twin is
    assert(got.intersect(tombs).isEmpty && got.contains(3L))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }
}
