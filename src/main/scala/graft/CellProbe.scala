package graft

import org.apache.spark.sql.functions._

/** ScaleBench single-CELL variance probe (the ScaleBench analog of
  * [[QueryProbe]]): rebuild ONE scale rung's inputs with the exact
  * ScaleBench expansion, then time one cell N times in a single JVM,
  * printing per-run wall seconds + GC time. This is the adjudication
  * tool for 100× watch cells — it separates "the cell's plan got
  * slower" (every run high, low GC) from "the suite's heap was noisy"
  * (first run high, GC-dominated) without paying a full 61-row suite
  * per data point. Usage:
  * `runMain graft.CellProbe <cell> [sfDir] [scale] [runs]` —
  * cells: knn_join_exact, ivf_blocked_join, index_ingest, stream_retract,
  * hnsw_serve_tombstoned,
  * image_neardup, label_noise_audit, knn_scan_topk. */
object CellProbe {
  import ScaleBench.expandEmb

  def main(args: Array[String]): Unit = {
    val cell = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val scale = if (args.length > 2) args(2).toInt else 100
    val runs = if (args.length > 3) args(3).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = Sessions.localMeasurement(cpus)
    import scala.jdk.CollectionConverters._
    def gcMs: Long = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum

    val emb0 = Tables.read(spark, sfDir, "embeddings")
    val emb = expandEmb(emb0, scale).cache()
    println(s"expanded rows=${emb.count()}")
    lazy val model = {
      val m = operators.Ivf.build(emb, "embedding", nlists = 100)
      m.assigned.cache().count()
      m
    }
    lazy val knnQueries = {
      val q = emb.filter(col("vec_id") < 500)
        .select(col("vec_id").as("qid"), col("embedding")).cache()
      q.count() // ScaleBench caches+counts the query side untimed too
      q
    }
    lazy val hnswIdx = {
      val ix = operators.Hnsw.build(emb, "vec_id", "embedding",
        numShards = 32).cache()
      ix.count()
      ix
    }
    lazy val scanQueries: Array[Array[Float]] =
      emb0.filter(col("vec_id") < 16)
        .select(col("vec_id"), col("embedding")).collect()
        .sortBy(_.getLong(0))
        .map(_.getSeq[Float](1).toArray)
    lazy val labeled = emb.withColumn("label",
      pmod(col("vec_id"), lit(10)).cast("int"))
    lazy val auditModel = {
      val m = operators.Ivf.build(labeled, "embedding", nlists = 100)
      m.assigned.cache().count()
      m
    }

    // Force every cell's FIXTURES (model/cache builds — untimed in the
    // ScaleBench cells too) before the loop: without this the lazy
    // model materializes inside run 0's timed region and every
    // model-dependent cell reads "first run high" even on a clean
    // heap, which is precisely the signal this probe adjudicates.
    cell match {
      case "knn_join_exact" => model; knnQueries
      case "ivf_blocked_join" | "index_ingest" | "stream_retract" => model
      case "hnsw_serve_tombstoned" => hnswIdx
      case "label_noise_audit" => auditModel
      case "knn_scan_topk" => scanQueries
      case _ => ()
    }

    var i = 0
    while (i < runs) {
      val g0 = gcMs
      val t0 = System.nanoTime()
      val n: Long = cell match {
        case "knn_join_exact" =>
          operators.Ivf.knnJoin(model, knnQueries, "embedding", "qid",
            k = 10, metric = "l2").count()
        case "ivf_blocked_join" =>
          operators.Ivf.join(model, emb, "embedding",
            metric = "cosine", threshold = 0.02, nprobe = 1).count()
        case "index_ingest" =>
          val dir = java.nio.file.Files
            .createTempDirectory("graft_cellprobe_").toString
          operators.Ivf.writePartitioned(model, dir)
          val batch = emb0
            .select((col("vec_id") + 50000000L).as("vec_id"), col("embedding"))
          val t = System.nanoTime()
          streaming.StreamIndexIngest.ingestBatch(
            model.centroids, "embedding", batch, dir, batchId = 0L)
          val sec = (System.nanoTime() - t) / 1e9
          println(f"  ingest_only sec=$sec%.3f")
          org.apache.commons.io.FileUtils.deleteDirectory(
            new java.io.File(dir))
          batch.count()
        case "stream_retract" =>
          // the retraction-path cost claims: epoch write flat in index
          // size; serving anti-join overhead vs the raw serve
          val dir = java.nio.file.Files
            .createTempDirectory("graft_cp_retract_").toString
          operators.Ivf.writePartitioned(model, dir)
          val t1 = System.nanoTime()
          streaming.StreamRetraction.retractBatch(
            emb.filter(col("vec_id") < 200).select(col("vec_id")),
            dir, batchId = 0L)
          println(f"  retract_sec=${(System.nanoTime() - t1) / 1e9}%.3f")
          val q = emb.filter(col("vec_id") === 500L)
            .select(col("embedding")).head().getSeq[Float](0).toArray
          val t2 = System.nanoTime()
          val nT = streaming.StreamRetraction
            .servingIvf(spark, dir, "embedding", "vec_id")
            .search(q, k = 10, nprobe = 10).count()
          println(f"  serve_tomb_sec=${(System.nanoTime() - t2) / 1e9}%.3f")
          val t3 = System.nanoTime()
          val nR = operators.Ivf.loadPartitioned(spark, dir, "embedding")
            .search(q, k = 10, nprobe = 10).count()
          println(f"  serve_raw_sec=${(System.nanoTime() - t3) / 1e9}%.3f")
          org.apache.commons.io.FileUtils.deleteDirectory(
            new java.io.File(dir))
          nT + nR
        case "hnsw_serve_tombstoned" =>
          // serve cost at the compaction threshold: 20% of ids dead
          // (the minDeadFraction=0.2 worst case — the most tombstones
          // a shard carries before compact rebuilds it), 16 queries at
          // production ef, vs the same serve with no tombstones
          val idx = hnswIdx
          val qs = emb.filter(col("vec_id") < 16)
            .select(col("vec_id"), col("embedding")).collect()
            .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
          val dead = emb.select(col("vec_id")).limit((
            emb.count() / 5).toInt)
          val t0c = System.nanoTime()
          val tombs = operators.Hnsw.tombstoneSet(dead)
          println(f"  tombset_collect_sec=${(System.nanoTime() - t0c) / 1e9}%.3f")
          val t1 = System.nanoTime()
          val nT = operators.Hnsw.searchBatch(idx, qs, k = 10,
            efSearch = 64, tombstones = tombs).count()
          println(f"  serve_tomb20_sec=${(System.nanoTime() - t1) / 1e9}%.3f")
          val t2 = System.nanoTime()
          val nC = operators.Hnsw.searchBatch(idx, qs, k = 10,
            efSearch = 64).count()
          println(f"  serve_clean_sec=${(System.nanoTime() - t2) / 1e9}%.3f")
          nT + nC
        case "image_neardup" =>
          val pngUdf = udf((v: Seq[Float]) =>
            operators.Multimodal.encodePng8x8(v.map(x =>
              math.max(0L, math.min(255L,
                math.floor((x.toDouble + 1.0) * 127.5 + 0.5).toLong)).toInt)
              .toArray))
          val media = emb.select(col("vec_id"),
            pngUdf(col("embedding")).as("payload"))
          val sigs = operators.Multimodal.decodeImages(media, includePixels = false)
            .select(col("vec_id"), col("img_ahash"))
          operators.Dedup.hammingBandPairs(sigs, "vec_id", "img_ahash", 8)
            .count()
        case "label_noise_audit" =>
          // auditModel is built OUTSIDE the suite cell's timing too
          operators.DataValuation.labelNoiseKnn(
            auditModel, labeled.filter(col("vec_id") < 500), "vec_id",
            "embedding", "label", k = 10).count()
        case "span_dedup_bloom" =>
          // spanDedup's coverage join with a SPARSE flagged side — the
          // regime the r16 Bloom prefilter targets (ScaleBench's own
          // span_dedup row is the saturated opposite, where the
          // selectivity gate correctly refuses the filter). Variants
          // rewrite every token with a variant suffix, so grams are
          // unique across variants; only variants 0/1 share the base
          // text — flagged ≈ the base gram set, tiny vs the stream.
          // Runs the SAME operator twice per run: gate forced open
          // (bloom) vs forced shut (plain r15 shape); both sub-times
          // print, the cell returns both row counts.
          val docs0 = Tables.read(spark, sfDir, "documents")
            .select(col("doc_id").cast("long").as("base_id"), col("text"))
          val docsB = docs0
            .withColumn("r", explode(lit((0 until scale).toArray)))
            .select((col("base_id") + col("r").cast("long") * 1000000L).as("doc_id"),
              when(col("r") < 2, col("text"))
                .otherwise(regexp_replace(col("text"), lit("(\\S+)"),
                  concat(lit("$1v"), col("r")))).as("text"))
            .cache()
          docsB.count()
          def runSpan(): Long = operators.Dedup.spanDedup(
              docsB, "doc_id", "text", n = 8, minDocs = 2, hashGrams = true)
            .agg(sum(length(col("clean_text"))), sum(col("removed_tokens")))
            .head().getLong(1)
          spark.conf.set("spark.graft.spanDedup.bloomMinInputBytes",
            Long.MaxValue.toString)
          val tP = System.nanoTime()
          val remPlain = runSpan()
          println(f"  plain_sec=${(System.nanoTime() - tP) / 1e9}%.3f removed=$remPlain%d")
          spark.conf.set("spark.graft.spanDedup.bloomMinInputBytes", "0")
          val tB = System.nanoTime()
          val remBloom = runSpan()
          println(f"  bloom_sec=${(System.nanoTime() - tB) / 1e9}%.3f removed=$remBloom%d")
          spark.conf.unset("spark.graft.spanDedup.bloomMinInputBytes")
          docsB.unpersist()
          require(remPlain == remBloom,
            s"bloom path diverged: $remPlain vs $remBloom")
          remPlain + remBloom
        case "line_dedup_split" =>
          // r16 adjudication of r15's "Not yet optimized" #4: lineDedup's
          // lineage runs split() over the corpus 3× (flagged aggregate,
          // boilerIdx join, rebuild). Is a persist-once of the split
          // arrays worth its memory at the 100× tier? Runs BOTH per run:
          // the shipped operator vs an inline persist-once variant with
          // identical algebra.
          val docs0 = Tables.read(spark, sfDir, "documents")
            .select(col("doc_id").cast("long").as("base_id"), col("text"))
          val docsB = docs0
            .withColumn("r", explode(lit((0 until scale).toArray)))
            .select((col("base_id") + col("r").cast("long") * 1000000L).as("doc_id"),
              concat(col("text"), lit("\nuniq"), col("r")).as("text"))
            .cache()
          docsB.count()
          def aggOf(df: org.apache.spark.sql.DataFrame): Long =
            df.agg(sum(length(col("clean_text"))), sum(col("removed_lines")))
              .head().getLong(1)
          val tP = System.nanoTime()
          val remPlain = aggOf(operators.Dedup.lineDedup(docsB, "doc_id", "text", 3))
          println(f"  plain_sec=${(System.nanoTime() - tP) / 1e9}%.3f removed=$remPlain%d")
          val tC = System.nanoTime()
          val ls = docsB.select(col("doc_id"), split(col("text"), "\n").as("__ls"))
            .filter(col("__ls").isNotNull).persist()
          val remCached = try {
            val lines = ls.select(col("doc_id"),
              posexplode(col("__ls")).as(Seq("idx", "line")))
            val flagged = lines.groupBy("line")
              .agg(countDistinct(col("doc_id")).as("__df"))
              .filter(col("__df") >= 3).select("line")
            val boilerIdx = lines.join(flagged, "line")
              .groupBy(col("doc_id")).agg(collect_list(col("idx")).as("__bi"))
            aggOf(ls.join(boilerIdx, Seq("doc_id"), "left")
              .select(col("doc_id"),
                concat_ws("\n", expr("""transform(
                  array_except(sequence(0, size(__ls) - 1), coalesce(__bi, array())),
                  i -> element_at(__ls, i + 1))""")).as("clean_text"),
                expr("CAST(coalesce(size(__bi), 0) AS BIGINT)").as("removed_lines"),
                expr("CAST(size(__ls) AS BIGINT)").as("total_lines")))
          } finally ls.unpersist()
          println(f"  split_once_sec=${(System.nanoTime() - tC) / 1e9}%.3f removed=$remCached%d")
          docsB.unpersist()
          require(remPlain == remCached,
            s"persist-once variant diverged: $remPlain vs $remCached")
          remPlain + remCached
        case "knn_scan_topk" =>
          // v_l2_knn's exact plan family at scale (r16, VERDICT r15 ask
          // #3): brute-force TakeOrderedAndProject scan, one L2 kernel
          // per (query × corpus row) — kernel-dominated by design. 16
          // sequential serves per run so the per-run kernel-evaluation
          // count (16 × rows) dwarfs job overhead.
          var total = 0L
          for (q <- scanQueries)
            total += operators.Knn.search(emb, "embedding", q, k = 10,
              metric = "l2").count()
          total
        case other => sys.error(s"unknown cell $other")
      }
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"run=$i%2d sec=$sec%.3f gc_ms=${gcMs - g0}%d rows=$n%d")
      i += 1
    }
    spark.stop()
  }
}
