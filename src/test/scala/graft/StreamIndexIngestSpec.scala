package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.{Ivf, Knn}
import graft.streaming.StreamIndexIngest

/** Continuous-ingest invariants (the r13 verdict ask): batch-boundary
  * invariance (two micro-batches land exactly the rows one batch
  * would), serve-while-ingesting (the index is consistent between
  * batches), file-level layout (appends land INSIDE the routed
  * clusters' directories), and the end contract — the maintained
  * index answers an exhaustive probe exactly like brute force over
  * the full corpus, i.e. like a rebuilt index. */
class StreamIndexIngestSpec extends SparkSpecBase {

  import spark.implicits._

  private lazy val emb =
    Tables.read(spark, "/root/testdata/sf0.001", "embeddings").cache()

  test("two micro-batches ingest exactly what one batch (and a rebuild) would") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = Ivf.build(emb.filter($"vec_id" < 300), "embedding",
      nlists = 8, seed = 42L)
    val root = java.nio.file.Files.createTempDirectory("sii_spec_").toString
    Ivf.writePartitioned(base, s"$root/ivf")

    val arrivals = emb.filter($"vec_id" >= 300 && $"vec_id" < 400)
      .select($"vec_id", $"embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).sortBy(_._1)
    val (b1, b2) = arrivals.splitAt(40)
    val mem = MemoryStream[(Long, Array[Float])]
    val q = StreamIndexIngest.run(base.centroids,
      mem.toDF().toDF("vec_id", "embedding"), "embedding",
      s"$root/ivf", s"$root/ckpt", trigger = Trigger.ProcessingTime(0))
    try {
      mem.addData(b1.toSeq: _*)
      q.processAllAvailable()
      // serve-while-ingesting: a reader between batches sees a
      // consistent prefix-of-the-stream index
      val mid = Ivf.loadPartitioned(spark, s"$root/ivf", "embedding")
      assert(mid.assigned.count() == 340)
      mem.addData(b2.toSeq: _*)
      q.processAllAvailable()
    } finally q.stop()

    val served = Ivf.loadPartitioned(spark, s"$root/ivf", "embedding")
    assert(served.assigned.count() == 400)

    // batch-boundary invariance: the streamed index holds EXACTLY the
    // (id, cluster) assignments a single-batch Ivf.insert would produce
    val oneShot = Ivf.insert(base,
      emb.filter($"vec_id" >= 300 && $"vec_id" < 400))
    def pairs(m: Ivf.IvfModel) = m.assigned
      .select($"vec_id".cast("long"), $"cluster_id".cast("int"))
      .as[(Long, Int)].collect().sortBy(identity).toSeq
    assert(pairs(served) == pairs(oneShot))

    // end contract: exhaustive probe over the maintained index ==
    // brute force over the full corpus == a rebuilt index's probe
    val qv = Tables.queryVector(spark, "/root/testdata/sf0.001", 350L)
    val exact = Knn.search(emb.filter($"vec_id" < 400), "embedding", qv,
        k = 10, tieBreak = Seq("vec_id"))
      .select("vec_id").as[Long].collect().toSeq
    val got = served.search(qv, k = 10, nprobe = 8)
      .select("vec_id").as[Long].collect().toSeq
    assert(got == exact)
    val rebuilt = Ivf.build(emb.filter($"vec_id" < 400), "embedding",
        nlists = 8, seed = 42L)
      .search(qv, k = 10, nprobe = 8)
      .select("vec_id").as[Long].collect().toSeq
    assert(got == rebuilt)

    // file-level layout: each micro-batch owns its own ingest=batch-<id>
    // epoch partition whose children are cluster_id=* directories
    // (probes keep pruning at the file level, and a replayed batch
    // dynamic-overwrites its own partitions instead of appending)
    val epochDirs = new java.io.File(s"$root/ivf/assigned").listFiles()
      .filter(_.isDirectory).sortBy(_.getName)
    assert(epochDirs.map(_.getName).toSeq ==
      Seq("ingest=base", "ingest=batch-0", "ingest=batch-1"))
    epochDirs.foreach { b =>
      val clusters = b.listFiles().filter(_.isDirectory).map(_.getName)
      assert(clusters.nonEmpty && clusters.forall(_.startsWith("cluster_id=")),
        clusters.toSeq)
    }
  }

  test("IVFADC streaming ingest: two micro-batches equal one-shot insert") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.operators.IvfPq
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = IvfPq.build(emb.filter($"vec_id" < 300), "vec_id", "embedding",
      nlists = 8, m = 8, seed = 42L)
    val root = java.nio.file.Files.createTempDirectory("spq_spec_").toString
    IvfPq.writePartitioned(base, s"$root/ivfpq")
    val arrivals = emb.filter($"vec_id" >= 300 && $"vec_id" < 380)
      .select($"vec_id", $"embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).sortBy(_._1)
    val (b1, b2) = arrivals.splitAt(30)
    val mem = MemoryStream[(Long, Array[Float])]
    val q = StreamIndexIngest.runPq(base.ivf.centroids, base.codebook,
      mem.toDF().toDF("vec_id", "embedding"), "embedding",
      s"$root/ivfpq", s"$root/ckpt",
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    try {
      mem.addData(b1.toSeq: _*); q.processAllAvailable()
      mem.addData(b2.toSeq: _*); q.processAllAvailable()
    } finally q.stop()
    val served = IvfPq.loadPartitioned(spark, s"$root/ivfpq",
      "embedding", "vec_id")
    assert(served.encoded.count() == 380)
    // streamed codes == one-shot IvfPq.insert codes, id for id
    val oneShot = IvfPq.insert(base,
      emb.filter($"vec_id" >= 300 && $"vec_id" < 380))
    def codes(df: org.apache.spark.sql.DataFrame) = df
      .select($"vec_id".cast("long"), $"cluster_id".cast("int"),
        $"pq_codes".cast("string"))
      .as[(Long, Int, String)].collect().sortBy(_._1).toSeq
    assert(codes(served.encoded) == codes(oneShot.encoded))
    // exhaustive ADC -> rerank over the maintained code table == brute
    // force over the full corpus
    val qv = Tables.queryVector(spark, "/root/testdata/sf0.001", 350L)
    val exact = Knn.search(emb.filter($"vec_id" < 380), "embedding", qv,
        k = 10, tieBreak = Seq("vec_id"))
      .select("vec_id").as[Long].collect().toSeq
    val got = IvfPq.search(served, qv, k = 10, nprobe = 8, rerankPool = 380)
      .select("vec_id").as[Long].collect().toSeq
    assert(got == exact)
  }

  test("ingestBatch routes with the FIXED centroids (no refit)") {
    val base = Ivf.build(emb.filter($"vec_id" < 200), "embedding",
      nlists = 8, seed = 42L)
    val root = java.nio.file.Files.createTempDirectory("sii_route_").toString
    Ivf.writePartitioned(base, s"$root/ivf")
    StreamIndexIngest.ingestBatch(base.centroids, "embedding",
      emb.filter($"vec_id" >= 200 && $"vec_id" < 260), s"$root/ivf", 0L)
    val served = Ivf.loadPartitioned(spark, s"$root/ivf", "embedding")
    // every appended row sits in its argmin-nearest EXISTING centroid's
    // posting list — a drifted/refit centroid set would misplace some
    val bad = served.assigned.filter($"vec_id" >= 200).collect().count { r =>
      val v = r.getSeq[Float](r.fieldIndex("embedding")).toArray
      val best = base.centroids.zipWithIndex
        .minBy { case (c, i) =>
          (graft.functions.VectorOps.l2(v, c), i) }._2
      r.getAs[Int]("cluster_id") != best
    }
    assert(bad == 0)
    // centroid side table is untouched by ingest
    assert(Ivf.loadPartitioned(spark, s"$root/ivf", "embedding")
      .centroids.map(_.toSeq) sameElements base.centroids.map(_.toSeq))
  }

  test("one ingested batch appends at most ONE file per routed cluster") {
    // file hygiene at scale: without the pre-write repartition a
    // 200-task batch against nlists=1000 would append up to 200k tiny
    // files PER BATCH; co-locating clusters caps it at <= nlists
    val base = Ivf.build(emb.filter($"vec_id" < 200), "embedding",
      nlists = 8, seed = 42L)
    val root = java.nio.file.Files.createTempDirectory("sii_files_").toString
    StreamIndexIngest.ingestBatch(base.centroids, "embedding",
      emb.filter($"vec_id" >= 200 && $"vec_id" < 300).repartition(16),
      root, 0L)
    val dirs = new java.io.File(s"$root/assigned/ingest=batch-0").listFiles()
      .filter(_.isDirectory)
    assert(dirs.nonEmpty)
    dirs.foreach { d =>
      val n = d.listFiles().count(_.getName.endsWith(".parquet"))
      assert(n <= 1, s"${d.getName}: $n files from one batch")
    }
  }

  test("replaying a batchId is a no-op: same-batch-twice == once (IVF)") {
    // the crash-replay window of every parquet foreachBatch sink: the
    // batch wrote, the checkpoint commit didn't land, the source
    // replays the SAME epoch. The overwrite-keyed subtree makes the
    // second write rewrite the first — the loaded index must be
    // IDENTICAL, not doubled (a duplicated vector corrupts kNN output,
    // not just storage).
    val base = Ivf.build(emb.filter($"vec_id" < 300), "embedding",
      nlists = 8, seed = 42L)
    val root = java.nio.file.Files.createTempDirectory("sii_replay_").toString
    Ivf.writePartitioned(base, s"$root/ivf")
    val batch = emb.filter($"vec_id" >= 300 && $"vec_id" < 400)
    StreamIndexIngest.ingestBatch(base.centroids, "embedding", batch,
      s"$root/ivf", batchId = 7L)
    def snapshot() = Ivf.loadPartitioned(spark, s"$root/ivf", "embedding")
      .assigned.select($"vec_id".cast("long"), $"cluster_id".cast("int"))
      .as[(Long, Int)].collect().sortBy(identity).toSeq
    val once = snapshot()
    assert(once.size == 400 && once.map(_._1).distinct.size == 400)
    // replay the SAME epoch
    StreamIndexIngest.ingestBatch(base.centroids, "embedding", batch,
      s"$root/ivf", batchId = 7L)
    assert(snapshot() == once)
    // and the served answer is still brute-force exact at the
    // exhaustive dial after the replay
    val qv = Tables.queryVector(spark, "/root/testdata/sf0.001", 350L)
    val exact = Knn.search(emb.filter($"vec_id" < 400), "embedding", qv,
        k = 10, tieBreak = Seq("vec_id"))
      .select("vec_id").as[Long].collect().toSeq
    val got = Ivf.loadPartitioned(spark, s"$root/ivf", "embedding")
      .search(qv, k = 10, nprobe = 8)
      .select("vec_id").as[Long].collect().toSeq
    assert(got == exact)
  }

  test("replaying a batchId is a no-op for the IVFADC code table too") {
    import graft.operators.IvfPq
    val base = IvfPq.build(emb.filter($"vec_id" < 300), "vec_id",
      "embedding", nlists = 8, m = 8, seed = 42L)
    val root = java.nio.file.Files.createTempDirectory("spq_replay_").toString
    IvfPq.writePartitioned(base, s"$root/ivfpq")
    val batch = emb.filter($"vec_id" >= 300 && $"vec_id" < 380)
    def snapshot() = IvfPq.loadPartitioned(spark, s"$root/ivfpq",
        "embedding", "vec_id")
      .encoded.select($"vec_id".cast("long"), $"cluster_id".cast("int"),
        $"pq_codes".cast("string"))
      .as[(Long, Int, String)].collect().sortBy(_._1).toSeq
    StreamIndexIngest.ingestBatchPq(base.ivf.centroids, base.codebook,
      "embedding", batch, s"$root/ivfpq", batchId = 3L)
    val once = snapshot()
    assert(once.size == 380 && once.map(_._1).distinct.size == 380)
    StreamIndexIngest.ingestBatchPq(base.ivf.centroids, base.codebook,
      "embedding", batch, s"$root/ivfpq", batchId = 3L)
    assert(snapshot() == once)
  }

  test("distinct batchIds accumulate; duplicate batchIds never double-count") {
    val base = Ivf.build(emb.filter($"vec_id" < 300), "embedding",
      nlists = 8, seed = 42L)
    val root = java.nio.file.Files.createTempDirectory("sii_ids_").toString
    Ivf.writePartitioned(base, s"$root/ivf")
    StreamIndexIngest.ingestBatch(base.centroids, "embedding",
      emb.filter($"vec_id" >= 300 && $"vec_id" < 340), s"$root/ivf", 0L)
    StreamIndexIngest.ingestBatch(base.centroids, "embedding",
      emb.filter($"vec_id" >= 340 && $"vec_id" < 400), s"$root/ivf", 1L)
    assert(Ivf.loadPartitioned(spark, s"$root/ivf", "embedding")
      .assigned.count() == 400)
    StreamIndexIngest.ingestBatch(base.centroids, "embedding",
      emb.filter($"vec_id" >= 340 && $"vec_id" < 400), s"$root/ivf", 1L)
    assert(Ivf.loadPartitioned(spark, s"$root/ivf", "embedding")
      .assigned.count() == 400)
  }

  test("per-batch route_health rows: continuity across two micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = Ivf.build(emb.filter($"vec_id" < 300), "embedding",
      nlists = 8, seed = 42L)
    val root = java.nio.file.Files.createTempDirectory("sii_rh_").toString
    Ivf.writePartitioned(base, s"$root/ivf")
    val arrivals = emb.filter($"vec_id" >= 300 && $"vec_id" < 400)
      .select($"vec_id", $"embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).sortBy(_._1)
    val (b1, b2) = arrivals.splitAt(40)
    val mem = MemoryStream[(Long, Array[Float])]
    val q = StreamIndexIngest.run(base.centroids,
      mem.toDF().toDF("vec_id", "embedding"), "embedding",
      s"$root/ivf", s"$root/ckpt",
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    try {
      mem.addData(b1.toSeq: _*); q.processAllAvailable()
      mem.addData(b2.toSeq: _*); q.processAllAvailable()
    } finally q.stop()
    val health = StreamIndexIngest.readRouteHealth(spark, s"$root/ivf")
      .select($"batch_id".cast("long"), $"n_rows".cast("long"),
        $"populated_lists".cast("long"), $"imbalance".cast("float"),
        $"mean_dist".cast("double"))
      .as[(Long, Long, Long, Float, Double)].collect().sortBy(_._1).toSeq
    assert(health.map(_._1) == Seq(0L, 1L))
    assert(health.map(_._2) == Seq(40L, 60L))
    health.foreach { case (_, n, lists, imb, md) =>
      assert(lists >= 1 && lists <= 8)
      assert(imb >= 1.0f - 1e-6f) // max/avg >= 1 by construction
      assert(md > 0.0 && md.isFinite)
    }
    // the dial is the ORACLED expression: batch-1 mean_dist equals
    // avg(route_dist) of the same rows through the shared kernel
    val expect = Ivf.routeWithDist(base.centroids,
        b1.toSeq.toDF("vec_id", "embedding"), "embedding")
      .agg(org.apache.spark.sql.functions.round(
        org.apache.spark.sql.functions.avg($"route_dist"), 6))
      .head().getDouble(0)
    assert(health.head._5 == expect)
  }
}
