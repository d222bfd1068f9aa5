package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Evidence artifact: wall-clock growth of the shuffle-bound operator
 * families when the corpus grows 10× (the question the 100 TB design
 * hangs on — RECALL_SCALE.json is the accuracy face, this is the cost
 * face). Deterministic hash-expansion of the sf fixtures (NOT used by
 * any correctness query); each op timed at 1× and 10×, ratio reported.
 *
 * Document replicas append one token, so they stay near-duplicates of
 * their base — the 10× corpus has 10-deep dup groups, exercising the
 * LSH candidate path at realistic dup density (cost should track that
 * density, never |D|²).
 */
object ScaleBench {

  import graft.functions.DetRandom.{mix64, unoise}

  /** The sf fixtures are single parquet files (one split); a real corpus
    * at these sizes arrives as many splits. Hash-repartition the expanded
    * tables by id so per-row work parallelizes the way a multi-split scan
    * would — without this, every "per-row, shuffle-free" op is secretly
    * single-core at 100× and the growth curves measure the artifact. */
  private def spread(df: DataFrame, byCol: String): DataFrame = {
    val p = math.max(1, df.sparkSession.sessionState.conf.numShufflePartitions)
    df.repartition(p, col(byCol))
  }

  private def expandDocs(docs: DataFrame, s: Int): DataFrame =
    spread(docs.select(col("doc_id").cast("long").as("base_id"), col("text"))
      .withColumn("r", explode(lit((0 until s).toArray)))
      .select((col("base_id") + col("r").cast("long") * 1000000L).as("doc_id"),
        when(col("r") === 0, col("text"))
          .otherwise(concat(col("text"), lit(" rep"), col("r"))).as("text")),
      "doc_id")

  private[graft] def expandEmb(emb: DataFrame, s: Int): DataFrame = {
    val jitter = udf((id: Long, r: Int, v: Seq[Float]) => {
      val out = new Array[Float](v.length)
      val key = id * 1000003L + r * 7919L
      var j = 0
      while (j < v.length) { out(j) = v(j) + 0.02f * unoise(key + j); j += 1 }
      out.toSeq
    })
    spread(emb.select(col("vec_id").cast("long").as("base_id"), col("embedding"))
      .withColumn("r", explode(lit((0 until s).toArray)))
      .select((col("base_id") + col("r").cast("long") * 1000000L).as("vec_id"),
        jitter(col("base_id"), col("r"), col("embedding")).as("embedding")),
      "vec_id")
  }

  private def expandEvents(ev: DataFrame, s: Int): DataFrame =
    spread(ev.select(col("event_id").cast("long").as("base_id"), col("ts"),
        col("user_id").cast("long").as("base_user"), col("event_type"), col("value"))
      .withColumn("r", explode(lit((0 until s).toArray)))
      .select((col("base_id") + col("r").cast("long") * 10000000L).as("event_id"),
        col("ts"), (col("base_user") + col("r").cast("long") * 100000L).as("user_id"),
        col("event_type"), col("value")),
      "event_id")

  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outPath = if (args.length > 1) args(1) else "SCALE_BENCH.json"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = Sessions.localMeasurement(cpus)

    val docs0 = Tables.read(spark, sfDir, "documents")
    val emb0 = Tables.read(spark, sfDir, "embeddings")
    val ev0 = Tables.read(spark, sfDir, "events")

    // (op, rows, seconds, extra per-scale stats appended to the JSON row)
    def opsAt(s: Int): Seq[(String, Long, Double, Seq[(String, Double)])] = {
      val docs = expandDocs(docs0, s).cache(); docs.count()
      val emb = expandEmb(emb0, s).cache(); emb.count()
      val ev = expandEvents(ev0, s).cache(); ev.count()
      val out = Seq.newBuilder[(String, Long, Double, Seq[(String, Double)])]
      def add(op: String, rows: Long, sec: Double,
              extra: Seq[(String, Double)] = Nil): Unit =
        out += ((op, rows, sec, extra))

      val (n1, t1) = time(operators.Dedup.fingerprintDedup(docs, "doc_id", "text").count())
      add("fingerprint_dedup", n1, t1)
      val (n2, t2) = time(operators.Dedup.minhashLshPairs(docs, "doc_id", "text",
        numHashes = 64, bands = 16, jaccardThreshold = 0.8).count())
      add("minhash_lsh_pairs", n2, t2)
      val qUdf = udf((t: String) => functions.TextAnalysis.qualityScore(t))
      // time the aggregate via head(); report the SCANNED cardinality, not
      // the aggregate's single output row, so rows_1x/rows_10x are
      // comparable with the other ops
      val (_, t3) = time(docs.select(avg(qUdf(col("text")))).head())
      add("text_quality_scan", docs.count(), t3)

      // Eval-set decontamination: a FIXED benchmark (every 50th BASE doc
      // — the eval suite does not grow with the corpus) against the
      // scaled corpus. The benchmark grams broadcast, so cost should
      // track the corpus scan; flagged count grows with the expanded
      // copies of benchmark docs.
      val bench = docs0.filter(col("doc_id") % 50 === 0)
      val (nDec, tDec) = time(operators.Dedup.decontaminate(
        docs, bench, "doc_id", "text").filter(col("contaminated")).count())
      add("decontaminate", docs.count(), tDec, Seq(("flagged", nDec.toDouble)))

      // Semantic decontamination at scale: a FIXED eval embedding set
      // (every 53rd BASE vector) broadcast against the scaled corpus.
      // The corpus streams through the broadcast nested-loop + map-side
      // max without shuffling, so cost should track |corpus|·|eval|
      // scan work linearly in the corpus.
      val evalVecs = emb0.filter(col("vec_id") % 53 === 0)
      val (nSd, tSd) = time(operators.Dedup.semanticDecontam(
          emb, evalVecs, "vec_id", "embedding", tau = 0.35)
        .filter(col("contaminated")).count())
      add("semantic_decontam", emb.count(), tSd,
        Seq(("flagged", nSd.toDouble)))

      // Registrable-domain extraction at scale: the PSL candidate
      // explode + broadcast rule joins + per-id groupBy over hosts
      // derived from the scaled corpus — stateless per row, one
      // shuffle, so the curve should be linear in rows.
      val pslRules = {
        import spark.implicits._
        Seq("com", "co.uk", "uk", "io", "github.io", "*.ck", "!www.ck")
          .toDF("rule")
      }
      val hosts = docs.select(col("doc_id"),
        concat(lit("h"), col("doc_id") % 1000, lit("."),
          when(col("doc_id") % 3 === 0, lit("example.com"))
            .when(col("doc_id") % 3 === 1, lit("shop.co.uk"))
            .otherwise(lit("bar.ck"))).as("host"))
      val (nPsl, tPsl) = time(operators.Psl.registrable(
        hosts, "doc_id", "host", pslRules).count())
      add("registrable_domain", nPsl, tPsl)

      // Batch sessionization at scale: one user-key shuffle shared by
      // the lag window, the running index, and the rollup; replicas
      // introduce NEW users, so groups multiply and the curve should
      // stay linear in events (no per-user blowup).
      val evUs = ev.select(col("user_id"), col("event_id"),
        Tables.tsUs(ev).as("us"))
      val (nSes, tSes) = time(operators.Sessionize.gapSessions(
        evUs, "user_id", "us", "event_id", gapMinutes = 1440).count())
      add("sessionize", ev.count(), tSes, Seq(("sessions", nSes.toDouble)))

      // Memorization audit at scale: a FIXED candidate set (base-doc
      // suffixes) against the GROWING corpus gram set — the corpus
      // side dominates (distinct + gram join), so cost should track
      // the corpus scan; novel counts stay flat (the fixed candidates
      // find their grams in the base copies regardless of replicas).
      val memCands = docs0.filter(col("doc_id") % 7 === 0)
        .select(col("doc_id"),
          concat(expr("substring(text, 6)"), lit(" zqx"), col("doc_id"))
            .as("gen"))
      val (nNov, tNov) = time(operators.Memorization.ngramNovelty(
          memCands, docs, "doc_id", "gen", "text", n = 3)
        .agg(sum(col("n_novel"))).head().getLong(0))
      add("ngram_novelty", docs.count(), tNov, Seq(("novel", nNov.toDouble)))

      // Heaps fit at scale: one explode + first-doc groupBy over the
      // growing corpus, a 64-bucket rollup, fixed-size output — the
      // cost should track the token scan.
      val (_, tHp) = time(operators.CorpusStats.heapsFit(
        docs, "doc_id", "text", buckets = 64).head())
      add("heaps_fit", docs.count(), tHp)

      val (model, t4) = time {
        val m = operators.Ivf.build(emb, "embedding", nlists = 100)
        m.assigned.cache().count()
        m
      }
      add("ivf_build", emb.count(), t4)

      // r14: streaming route-and-append ingest. The claim under test is
      // O(batch) INDEPENDENT of index size: a FIXED batch (the raw sf
      // rows, re-idd) ingests into the partitioned index built over the
      // GROWING corpus — the time column should stay ~flat as the index
      // grows 100×, because ingest touches one centroid broadcast, a
      // stateless map over the batch, and an append of |batch| rows.
      val ingestDir = java.nio.file.Files
        .createTempDirectory("graft_sb_ingest_").toString
      operators.Ivf.writePartitioned(model, ingestDir)
      val ingestBatch = emb0
        .select((col("vec_id") + 50000000L).as("vec_id"), col("embedding"))
      val (_, tIxIng) = time(streaming.StreamIndexIngest.ingestBatch(
        model.centroids, "embedding", ingestBatch, ingestDir, batchId = 0L))
      add("index_ingest", ingestBatch.count(), tIxIng)
      // the dir holds a full index copy per scale — don't let three
      // scales × two solo runs accumulate it in /tmp (r14 advice)
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(ingestDir))

      val (n5, t5) = time(operators.Ivf.join(model, emb, "embedding",
        metric = "cosine", threshold = 0.02, nprobe = 1).count())
      add("ivf_blocked_join", n5, t5)

      // Exact large×large kNN join (the flagship two-pass triangle-
      // inequality operator, Ivf.knnJoin): a FIXED 500-query set against
      // the growing corpus, k=10. Cost at scale rides pass-2 pruning, so
      // the avg posting-list count a query actually probes (out of 100)
      // is reported alongside the time — the "how much of the corpus did
      // the bound touch" number the 100 TB design hangs on.
      val queries = emb.filter(col("vec_id") < 500)
        .select(col("vec_id").as("qid"), col("embedding")).cache()
      val nQueries = queries.count()
      val (joined, t6a) = time {
        val j = operators.Ivf.knnJoin(model, queries, "embedding", "qid",
          k = 10, metric = "l2").cache()
        j.count()
        j
      }
      val probed = {
        val bc = spark.sparkContext.broadcast(model.centroids)
        val br = spark.sparkContext.broadcast(operators.Ivf.radii(model))
        val dkPerQ = joined.groupBy("qid").agg(max("distance").as("dk"))
        val listsUdf = udf((v: Seq[Float], dk: Double) => {
          val q = v.toArray; val cs = bc.value; val rs = br.value
          (0 until cs.length).count(i =>
            functions.VectorOps.l2(q, cs(i)) - rs(i) <= dk + 1e-9)
        })
        queries.join(dkPerQ, "qid")
          .select(avg(listsUdf(col("embedding"), col("dk"))))
          .head().getDouble(0)
      }
      add("knn_join_exact", nQueries * 10, t6a,
        Seq(("avg_lists_probed", probed)))
      joined.unpersist(); queries.unpersist()

      // Incremental HNSW maintenance: time inserting a FIXED 1000-row
      // batch into a numShards=32 index over the scaled corpus. The
      // touched-shard rebuild makes the cost ~|touched|·(shard size), so
      // the curve should track corpus growth linearly — the evidence row
      // for the hnsw_insert_exact path's scale story.
      val hnswIdx = operators.Hnsw.build(emb, "vec_id", "embedding",
        numShards = 32).cache()
      hnswIdx.count()
      val batch = emb.filter(col("vec_id") < 1000)
        .select((col("vec_id") + 90000000L).as("vec_id"), col("embedding"))
      val nBatch = batch.count()
      val (_, t7) = time(operators.Hnsw.insert(hnswIdx, batch,
        "vec_id", "embedding", numShards = 32).count())
      add("hnsw_insert_batch", nBatch, t7,
        Seq(("index_rows", emb.count().toDouble)))
      // r15: the scattered-erasure cliff vs the lazy path. A FIXED
      // 200-id erasure set of hash-scattered base ids touches ~every
      // one of the 32 shards, so deleteBulk pays ~a full-graph rebuild
      // no matter how small the erasure — the sec column should grow
      // linearly with index size (the cliff). The tombstone path
      // answers the SAME erasure with zero rebuild: its cost is the
      // erasure-to-serveable latency (collect the id set + a 16-query
      // ef=64 serve over the tombstoned index), which should stay
      // ~flat — compact() pays the rebuild later, only for shards
      // past the dead-fraction threshold.
      val erasure = emb.filter(col("vec_id") < 200).select(col("vec_id"))
      val nErase = erasure.count()
      val (_, tHdb) = time(operators.Hnsw.deleteBulk(hnswIdx, erasure,
        numShards = 32).count())
      add("hnsw_delete_bulk", nErase, tHdb,
        Seq(("index_rows", emb.count().toDouble)))
      val eraseQs = emb.filter(col("vec_id") >= 1000 && col("vec_id") < 1016)
        .select(col("vec_id"), col("embedding")).collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      val (_, tHlz) = time {
        val tombs = operators.Hnsw.tombstoneSet(erasure)
        operators.Hnsw.searchBatch(hnswIdx, eraseQs, k = 10, efSearch = 64,
          tombstones = tombs).count()
      }
      add("hnsw_delete_lazy", nErase, tHlz,
        Seq(("index_rows", emb.count().toDouble)))
      hnswIdx.unpersist()
      // Streaming ingest at scale: the STATEFUL dedup-at-ingest shape
      // (file source → dropDuplicates on the row key → noop sink,
      // Trigger.AvailableNow) over the expanded events — the one family
      // whose 100 TB cost is state-store-bound rather than shuffle- or
      // scan-bound. Keying on the unique event_id makes state grow
      // linearly with the corpus, so the curve shows what the state
      // backend does to throughput as rows/sec, reported alongside.
      locally {
        import org.apache.spark.sql.streaming.Trigger
        val streamDir = java.nio.file.Files
          .createTempDirectory(s"scale_stream_${s}x_").toString
        ev.write.mode("overwrite").parquet(streamDir)
        val nEv = ev.count()
        val schema = spark.read.parquet(streamDir).schema
        val (_, tS) = time {
          val stream = spark.readStream.schema(schema).parquet(streamDir)
          val q = streaming.StreamDedup.dedupKeys(stream, Seq("event_id"))
            .writeStream.format("noop")
            .option("checkpointLocation", s"$streamDir/_ckpt")
            .trigger(Trigger.AvailableNow()).start()
          q.awaitTermination()
        }
        add("stream_dedup_ingest", nEv, tS,
          Seq(("rows_per_sec", nEv / math.max(tS, 1e-9))))
        org.apache.commons.io.FileUtils.deleteDirectory(
          new java.io.File(streamDir))
      }
      // Sequence packing: seeded order + bucket-prefix global cumsum +
      // span arithmetic over the expanded docs — the cumsum family's
      // cost face (approxQuantile pass + windowed cumsum + tiny offsets)
      val toks = docs.select(col("doc_id"),
        graft.functions.TextAnalysis.bpeTokenCountUdf(col("text")).as("toks"))
      val (nP, tP) = time(operators.Packing.packSequences(
        toks, "doc_id", "toks", budget = 4096L, seed = 42L).count())
      add("pack_sequences", nP, tP)

      // Duplicated-span removal at the scale dial (hashGrams=true: 8-byte
      // keys on the gram shuffle). The expanded corpus is 10-deep
      // near-identical copies, so flagged-gram density is high — the
      // worst realistic case for the coverage join.
      // (aggregate over clean_text/removed so the ORDERED REBUILD is
      // actually executed — a bare count() lets Catalyst skip it; the
      // text_quality_scan lesson. rows = input cardinality.)
      val (spRemoved, tSp) = time(operators.Dedup.spanDedup(
          docs, "doc_id", "text", n = 8, minDocs = 2, hashGrams = true)
        .agg(sum(length(col("clean_text"))), sum(col("removed_tokens")))
        .head().getLong(1))
      add("span_dedup", docs.count(), tSp,
        Seq(("removed_tokens", spRemoved.toDouble)))

      // SemDeDup with k centroids ∝ corpus size (the paper's recipe —
      // cluster population stays ~constant, so within-cluster pair cost
      // per row stays flat and total cost tracks the corpus, not |D|²).
      // Centroids: the k smallest base vec_ids.
      val kCents = 8 * s
      val cents = emb0.orderBy("vec_id").limit(kCents)
        .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      val (nSem, tSem) = time(operators.Dedup.semDedup(
          emb, "vec_id", "embedding", cents, "cid", "cvec",
          maxCosineDistance = 0.02)
        .filter(col("keeper")).count())
      add("semdedup", emb.count(), tSem,
        Seq(("keepers", nSem.toDouble), ("centroids", kCents.toDouble)))

      // Classifier training cost face: epochs × (broadcast + one (d+1)-cell
      // aggregation) over the growing corpus — should be linear in rows.
      val (_, tQc) = time(ml.QualityClf.trainScore(
        docs, "doc_id", "text", col("doc_id") % 2 === 0,
        d = 64, epochs = 4, lr = 4.0).count())
      add("quality_clf_train", docs.count(), tQc)

      // Corpus-stats sketches: the KMV distinct estimate's bounded state
      // (≤ k longs per group crosses the shuffle) vs the exact
      // countDistinct sibling that expands + shuffles the distinct-token
      // universe — the gap is the sketch's value at scale. CMS likewise:
      // one mergeable d×w grid vs the full term-frequency table.
      // (expanded docs carry no lang column — a 5-way doc_id residue
      // stands in as the group key; the cost shape is identical)
      val toksS = docs.select((col("doc_id") % 5).as("grp"),
          explode(regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"), lit(0))).as("t"))
        .withColumn("u", operators.Sketches.djb2Udf(col("t")))
      val (nK, tK) = time(operators.Sketches.kmvDistinct(toksS, "grp", "u", 64).count())
      val (_, tKexact) = time(
        toksS.groupBy("grp").agg(countDistinct(col("u"))).count())
      add("kmv_distinct", nK, tK, Seq(("exact_countdistinct_sec", tKexact)))
      val (nCm, tCm) = time(operators.Sketches.cmsTopK(
        toksS.select(col("t").as("term")), "term", 20).count())
      add("cms_topk", nCm, tCm)
      // HLL: the constant-state sibling — 256 register bytes per group
      // regardless of scale, vs KMV's k-mins (both dwarfed by the exact
      // expand; the sketch rows should track the token scan).
      val (nHl, tHl) = time(operators.Sketches.hllDistinct(toksS, "grp", "u", 8).count())
      add("hll_distinct", nHl, tHl)

      // BPE training: phase 1 (the word-count shuffle) grows with the
      // corpus; the 10 merge rounds run on the compacted DISTINCT-word
      // vocabulary, which replicated text leaves nearly unchanged — so
      // total cost should converge to the scan cost as s grows. The
      // distinct-word count rides along to show the compaction.
      val (nWords, tBpe) = time {
        val (_, w) = operators.Bpe.train(docs, "text", 10)
        w.count()
      }
      add("bpe_train", docs.count(), tBpe,
        Seq(("distinct_words", nWords.toDouble)))

      // Z-order layout stats: two scans + a 1024-group aggregate — the
      // lakehouse OPTIMIZE costing face; should be scan-bound flat.
      val (nZb, tZo) = time(operators.Zorder.layoutStats(
        ev.select(col("event_id"), col("user_id")),
        "event_id", "user_id", shift = 22).count())
      add("zorder_layout", ev.count(), tZo, Seq(("buckets", nZb.toDouble)))

      // Weighted reservoir: one scan + TakeOrderedAndProject top-100 —
      // the cheapest possible weighted-draw shape; flat per row.
      val (_, tWr) = time(operators.Sampling.weightedReservoir(
        docs.select(col("doc_id"), length(col("text")).cast("long").as("w")),
        "doc_id", "w", k = 100).count())
      add("weighted_reservoir", docs.count(), tWr)

      // Incremental ingestion dedup: a FIXED 500-doc batch (the base
      // corpus) checked against the GROWING catalog — the daily-crawl
      // cost face. Both signals are banded/hashed joins, so cost should
      // track the catalog scan, never batch x catalog.
      val (nInc, tInc) = time(operators.Dedup.incrementalDedup(
          docs, docs0.select(col("doc_id"), col("text")), "doc_id", "text",
          numHashes = 64, bands = 16, jaccardThreshold = 0.8)
        .filter(col("exact_dup") || col("near_of").isNotNull).count())
      add("incremental_dedup", docs.count(), tInc,
        Seq(("batch_flagged", nInc.toDouble)))

      // Multimodal near-dup: PNG round-trip fingerprints + banded Hamming
      // self-join over the natural corpus (no plants — measures the
      // fingerprint scan + band-key shuffle, with near-zero pair output).
      val pngUdf = udf((v: Seq[Float]) =>
        operators.Multimodal.encodePng8x8(v.map(x =>
          math.max(0L, math.min(255L,
            math.floor((x.toDouble + 1.0) * 127.5 + 0.5).toLong)).toInt).toArray))
      val (nIm, tIm) = time {
        val media = emb.select(col("vec_id"), pngUdf(col("embedding")).as("payload"))
        val sigs = operators.Multimodal.decodeImages(media, includePixels = false)
          .select(col("vec_id"), col("img_ahash"))
        operators.Dedup.hammingBandPairs(sigs, "vec_id", "img_ahash", 8).count()
      }
      add("image_neardup", emb.count(), tIm, Seq(("pairs", nIm.toDouble)))

      // Audio near-dup (r11): the WAV-round-trip energy-delta
      // fingerprint + the same banded Hamming join. The banded join is
      // shared with image_neardup, but the per-row fingerprint UDF
      // (1024-sample synth + WAV encode + decode + 64-frame energies)
      // dominates and deserves its own curve — stateless map, so
      // scan-bound flat is the contract.
      val (nAu, tAu) = time {
        val wavUdf = udf((id: Long) => {
          val xs = new Array[Short](1024)
          var i = 0
          while (i < 1024) {
            val raw = ((id * 31 + 7) * ((i.toLong * i) % 65536) +
              (id * 17 + 3) * i + id) % 65536
            xs(i) = ((raw % 65536) - 32768).toShort
            i += 1
          }
          operators.Multimodal.encodeWavPcm16(xs, 8000, 1)
        })
        val fpUdf = udf((payload: Array[Byte]) =>
          operators.Multimodal.decodeWavSamples(payload).map {
            case (_, xs) => operators.Multimodal.audioFingerprint(xs)
          })
        val sigs = docs.select(col("doc_id"), fpUdf(wavUdf(col("doc_id"))).as("fp"))
        operators.Dedup.hammingBandPairs(sigs, "doc_id", "fp", maxHamming = 10).count()
      }
      add("audio_neardup", docs.count(), tAu, Seq(("pairs", nAu.toDouble)))

      // Video near-dup (r11): Y4M round-trip + spatio-temporal block
      // hash + banded join; the 8-frame 16×8 synth/encode/decode UDF is
      // the cost driver. Same stateless-map contract.
      val (nVi, tVi) = time {
        val mkV = udf((id: Long) => {
          val frames = (0 until 8).map { f =>
            (Array.tabulate[Byte](128) { i =>
              val k = f * 128L + i
              val raw = ((id * 97 + 13) * ((k * k) % 1048573) +
                (id * 57 + 7) * k + id) % 1048573 % 256
              (raw % 256).toByte
            },
              Array.tabulate[Byte](32)(c => ((id * 7 + c * 3 + f * 5 + 1) % 256).toByte),
              Array.tabulate[Byte](32)(c => ((id * 5 + c * 7 + f * 3 + 2) % 256).toByte))
          }
          operators.Y4m.encodeY4m(16, 8, frames)
        })
        val fpUdf = udf((payload: Array[Byte]) =>
          operators.Y4m.decodeY4m(payload).map { case (m, fs) =>
            operators.Y4m.blockhashFingerprint(m, fs)
          })
        val sigs = docs.select(col("doc_id"), fpUdf(mkV(col("doc_id"))).as("fp"))
        operators.Dedup.hammingBandPairs(sigs, "doc_id", "fp", maxHamming = 12).count()
      }
      add("video_neardup", docs.count(), tVi, Seq(("pairs", nVi.toDouble)))

      // Kneser-Ney corpus LM scoring (r11): one corpus shuffle to the
      // bigram-count table (localCheckpointed — B's count() no longer
      // re-executes the corpus scan), marginals at distinct-bigram cost,
      // then the scoring join. Replicated text compacts to a near-
      // constant distinct-bigram table, so cost should converge to the
      // tokenize scan + the (growing) scoring join.
      val (nKn, tKn) = time(operators.LmFilter.scoreCorpusKn(
          docs, "doc_id", "text")
        .agg(sum(col("n_bigrams"))).head().getLong(0))
      add("lm_score_kn", docs.count(), tKn, Seq(("bigrams", nKn.toDouble)))

      // Temperature-mixture quotas (r11): a tiny collected domain table
      // + one partitioned window over the corpus — no global sort. The
      // window's per-domain rank is the only super-linear risk; domain
      // count is fixed (5), so per-domain partitions grow linearly.
      val (nTm, tTm) = time(operators.Sampling.temperatureMixture(
          docs.select(col("doc_id"), (col("doc_id") % 5).cast("string").as("domain")),
          "domain", "doc_id", budget = 1000L)
        .agg(sum(col("n_sel"))).head().getLong(0))
      add("temperature_mixture", docs.count(), tTm,
        Seq(("selected", nTm.toDouble)))

      // Graph analytics: 3-regular expander over the vector ids (edges
      // linear in n — the knn-graph shape without the n² build), timing
      // the iterated SpMV rounds (join on src + groupBy on dst) that
      // pagerank/label-prop/SGC share.
      val nV = emb.count()
      val ring = emb.select(col("vec_id"))
        .select(col("vec_id").as("src"),
          explode(array(lit(1L), lit(7L), lit(31L))).as("step"))
        .select(col("src"), pmod(col("src") * 31 + col("step"), lit(nV)).as("dst"))
        .filter(col("src") =!= col("dst"))
      val (nPr, tPr) = time(operators.GraphAnalytics.pagerankInt(ring, 3).count())
      add("graph_pagerank", nPr, tPr)

      // Media-codec ingest scan (r10 families): per-row WARC .warc.gz
      // encode→decode→extract over the expanded corpus — the shape all
      // four new codecs share (stateless map, no shuffle). Should be
      // scan-bound flat like text_quality_scan; if this curve bends, a
      // codec is secretly quadratic in payload or the scan lost its
      // parallelism.
      val (nWm, tWarc) = time {
        val mkW = udf((id: Long, text: String) => operators.Warc.encodeWarcGz(Seq(
          operators.Warc.WarcRecord("response", s"<urn:uuid:$id>",
            s"http://crawl.invalid/$id",
            (if (text == null) "" else text).getBytes("UTF-8")))))
        val shards = docs.select(col("doc_id"), mkW(col("doc_id"), col("text")).as("payload"))
        operators.Warc.extractResponses(shards, "doc_id", "payload")
          .agg(sum(col("content_bytes"))).head().getLong(0)
      }
      add("warc_codec_scan", docs.count(), tWarc,
        Seq(("content_bytes", nWm.toDouble)))

      // GIF codec ingest scan (r10): per-row animated-GIF LZW
      // encode→decode→stats — the entropy-coded sibling of
      // warc_codec_scan; same stateless-map contract, so the curve
      // should stay scan-bound flat.
      val (nGif, tGif) = time {
        val mkG = udf((id: Long) => operators.Gif.encodeGif(operators.Gif.GifImage(
          8, 8, operators.Gif.fixturePalette16,
          (0 until 2).map(f => operators.Gif.GifFrame(f, f % 2 == 0,
            operators.Gif.fixtureIndices(id, f))))))
        val wsumG = udf((p: Array[Byte]) =>
          operators.Gif.decodeGif(p).map(operators.Gif.gifStats(_)._6).getOrElse(-1L))
        docs.select(wsumG(mkG(col("doc_id"))).as("w"))
          .agg(sum(col("w"))).head().getLong(0)
      }
      add("gif_codec_scan", docs.count(), tGif,
        Seq(("wsum_total", nGif.toDouble)))

      // QOI codec ingest scan (r11): per-row truecolor encode→decode→
      // stats — hash-table + delta-op coding instead of an entropy
      // coder; same stateless-map contract, so the curve should stay
      // scan-bound flat.
      val (nQoi, tQoi) = time {
        val mkQ = udf((id: Long) => operators.Qoi.encodeQoi(operators.Qoi.QoiImage(
          8, 8, 4, 0, operators.Qoi.fixturePixels(id))))
        val wsumQ = udf((p: Array[Byte]) =>
          operators.Qoi.decodeQoi(p).map(operators.Qoi.qoiStats(_)._5).getOrElse(-1L))
        docs.select(wsumQ(mkQ(col("doc_id"))).as("w"))
          .agg(sum(col("w"))).head().getLong(0)
      }
      add("qoi_codec_scan", docs.count(), tQoi,
        Seq(("wsum_total", nQoi.toDouble)))

      // TIFF codec ingest scan (r11): per-row IFD-walk decode with the
      // endian/compression/strip dials the oracle fixture cycles; same
      // stateless-map contract.
      val (nTif, tTif) = time {
        val mkT = udf((id: Long) => {
          val (spp, px) = operators.Tiff.fixturePixels(id)
          operators.Tiff.encodeTiff(operators.Tiff.TiffImage(8, 8, spp, px),
            bigEndian = id % 2 == 1, packBits = id % 3 == 0,
            rowsPerStrip = 1 + (id % 3).toInt)
        })
        val wsumT = udf((p: Array[Byte]) =>
          operators.Tiff.decodeTiff(p).map(operators.Tiff.tiffStats(_)._4).getOrElse(-1L))
        docs.select(wsumT(mkT(col("doc_id"))).as("w"))
          .agg(sum(col("w"))).head().getLong(0)
      }
      add("tiff_codec_scan", docs.count(), tTif,
        Seq(("wsum_total", nTif.toDouble)))

      // TGA codec ingest scan (r11): per-row origin-flip + BGR(A) +
      // RLE decode with the oracle fixture's dials; same contract.
      val (nTga, tTga) = time {
        val mkG2 = udf((id: Long) => operators.Tga.encodeTga(
          operators.Tga.TgaImage(8, 8, id % 2 == 1, operators.Tga.fixturePixels(id)),
          rle = id % 3 == 0, topDown = id % 4 < 2))
        val wsumG2 = udf((p: Array[Byte]) =>
          operators.Tga.decodeTga(p).map(operators.Tga.tgaStats(_)._5).getOrElse(-1L))
        docs.select(wsumG2(mkG2(col("doc_id"))).as("w"))
          .agg(sum(col("w"))).head().getLong(0)
      }
      add("tga_codec_scan", docs.count(), tTga,
        Seq(("wsum_total", nTga.toDouble)))

      // Transparent decompression gate (r11 continuation): per-row
      // detect+decode across the 8-codec ladder; stateless map, so the
      // curve should stay scan-bound.
      val (nDcp, tDcp) = time {
        val mkP = udf((id: Long, text: String) => {
          val t = (if (text == null) "" else text).getBytes("UTF-8")
          (id % 8).toInt match {
            case 0 =>
              val bos = new java.io.ByteArrayOutputStream()
              val gz = new java.util.zip.GZIPOutputStream(bos)
              gz.write(t); gz.close(); bos.toByteArray
            case 3 =>
              val bos = new java.io.ByteArrayOutputStream()
              val z = new com.github.luben.zstd.ZstdOutputStream(bos)
              z.write(t); z.close(); bos.toByteArray
            case 5 =>
              val bos = new java.io.ByteArrayOutputStream()
              val b = new org.apache.commons.compress.compressors.bzip2.BZip2CompressorOutputStream(bos)
              b.write(t); b.close(); bos.toByteArray
            case _ => Array[Byte](0x07) ++ t
          }
        })
        val rd = udf((p: Array[Byte]) =>
          operators.Decompress.auto(p).map(_._2.length.toLong).getOrElse(-1L))
        docs.select(rd(mkP(col("doc_id"), col("text"))).as("n"))
          .agg(sum(col("n"))).head().getLong(0)
      }
      add("decompress_scan", docs.count(), tDcp,
        Seq(("plain_bytes", nDcp.toDouble)))

      // Boilerplate extraction (r11 continuation): zero-UDF expression
      // chain; pure codegen scan, flat per row.
      val (nBp, tBp) = time {
        val html = concat(lit("<div><a href=\"/h\">Home</a> nav bar</div><p>"),
          col("text"), lit("</p><footer><a href=\"/p\">links links links</a> x</footer>"))
        docs.select(operators.Boilerplate.blockStats(html).as("s"))
          .agg(sum(col("s.kept_chars"))).head().getLong(0)
      }
      add("boilerplate_scan", docs.count(), tBp,
        Seq(("kept_chars", nBp.toDouble)))

      // Crawl-frontier scheduling (r11 continuation): ONE host-window
      // shuffle; cost should track rows, not hosts.
      val (nCf, tCf) = time {
        val frontier = docs.select(
          concat(lit("h"), col("doc_id") % 500, lit(".test")).as("host"),
          concat(lit("http://h"), col("doc_id") % 500, lit(".test/p"), col("doc_id")).as("url"),
          (col("doc_id") % 7).as("priority"))
        operators.CrawlFrontier.schedule(frontier, "url", "host", "priority",
          delayMs = 1000L, maxPerHost = 1000000)
          .agg(sum(col("scheduled_ms"))).head().getLong(0)
      }
      add("frontier_schedule", docs.count(), tCf,
        Seq(("sched_ms_sum", nCf.toDouble)))

      // JPEG codec ingest scan (r11 continuation): per-row baseline
      // T.81 encode→Huffman-decode→IDCT→stats on the flat-block
      // exactness dial (24x16 grayscale, six blocks); the entropy-coded
      // sibling of the other image rows, same stateless-map contract.
      val (nJpg, tJpg) = time {
        val mkJ = udf((id: Long) => {
          val px = Array.tabulate(24 * 16) { i =>
            val bi = (i / 24 / 8) * 3 + (i % 24) / 8
            (128 + 2 * (((id * 7 + bi * 13) % 50) - 25)).toInt
          }
          operators.Jpeg.encodeJpeg(operators.Jpeg.JpegImage(24, 16, 1, px))
        })
        val wsumJ = udf((p: Array[Byte]) =>
          operators.Jpeg.decodeJpeg(p).map { d =>
            var s = 0L; var i = 0
            while (i < d.pixels.length) { s += (i + 1).toLong * d.pixels(i); i += 1 }
            s
          }.getOrElse(-1L))
        docs.select(wsumJ(mkJ(col("doc_id"))).as("w"))
          .agg(sum(col("w"))).head().getLong(0)
      }
      add("jpeg_codec_scan", docs.count(), tJpg,
        Seq(("wsum_total", nJpg.toDouble)))

      // ZIP shard ingest scan (r11 continuation): per-row PKZIP
      // encode→central-directory decode→extract with a deflated text
      // entry; the container sibling of warc_codec_scan (DEFLATE is
      // stdlib both ways), same stateless-map contract.
      val (nZip, tZip) = time {
        val mkZ = udf((id: Long, text: String) => operators.Zip.encodeZip(Seq(
          operators.Zip.Entry("doc.txt",
            (if (text == null) "" else text).getBytes("UTF-8"), method = 8,
            descriptor = id % 2 == 0))))
        val shards = docs.select(col("doc_id"), mkZ(col("doc_id"), col("text")).as("payload"))
        operators.Zip.extractEntries(shards, "doc_id", "payload")
          .agg(sum(col("content_bytes"))).head().getLong(0)
      }
      add("zip_codec_scan", docs.count(), tZip,
        Seq(("content_bytes", nZip.toDouble)))

      // EXIF embed→scrub→parse scan (r11 continuation): one template
      // JPEG (driver-built, closure-captured) gets a per-row APP1 with
      // GPS, is GPS-scrubbed through the generic re-layout, and
      // re-parsed; cost is pure metadata re-layout per row — flat.
      val baseJpeg = {
        val img = new java.awt.image.BufferedImage(16, 16,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "jpg", bos)
        bos.toByteArray
      }
      val (nEx, tEx) = time {
        val run = udf((id: Long) => {
          import operators.Exif
          val d = Exif.ExifData(bigEndian = id % 2 == 0,
            ifd0 = Vector(Exif.ascii("Cam" + (id % 7)).copy(tag = 0x010f),
              Exif.short(1 + id % 8).copy(tag = 0x0112)),
            exifIfd = Vector(Exif.short(100 * (1 + id % 16)).copy(tag = 0x8827)),
            gpsIfd = Vector(Exif.ascii("N").copy(tag = 0x0001),
              Exif.rational((id % 90, 1L), (id % 60, 1L), (id % 6000, 100L)).copy(tag = 0x0002)))
          val scrubbed = Exif.scrubGps(Exif.embedExif(baseJpeg, d))
          Exif.parseExif(scrubbed).flatMap(p => Exif.numValue(p.ifd0, 0x0112)).getOrElse(-1L)
        })
        docs.select(run(col("doc_id")).as("o")).agg(sum(col("o"))).head().getLong(0)
      }
      add("exif_codec_scan", docs.count(), tEx,
        Seq(("orient_total", nEx.toDouble)))

      // Subtitle track round-trip scan (r11 continuation): words →
      // SRT/VTT cue tracks → real parse → cue count; stateless per-row
      // string codec, flat per row.
      val (nSub, tSub) = time {
        val run = udf((id: Long, text: String) => {
          import operators.Subtitles
          val ws = (if (text == null) "" else text).split("\\s+").filter(_.nonEmpty)
          val cues = ws.grouped(5).zipWithIndex.map { case (g, i) =>
            Subtitles.Cue(i + 1, i * 2000L, i * 2000L + 1500L, g.mkString(" "))
          }.toSeq
          val track = if (id % 2 == 0) Subtitles.encodeSrt(cues)
            else Subtitles.encodeVtt(cues)
          Subtitles.parse(track).map(_.length.toLong).getOrElse(-1L)
        })
        docs.select(run(col("doc_id"), col("text")).as("c"))
          .agg(sum(col("c"))).head().getLong(0)
      }
      add("subtitle_scan", docs.count(), tSub, Seq(("cues", nSub.toDouble)))

      // Markdown strip scan (r11 continuation): the ALL-NATIVE regexp
      // chain — no UDF anywhere, whole-stage codegen end to end; the
      // per-row cost is the regex engine itself.
      val (nMd, tMd) = time(
        docs.select(functions.TextAnalysis.Markdown.strip(
            concat(lit("# T\n\n- a\n\n```\nx\n```\n\n"), col("text"))).as("s"))
          .agg(sum(length(col("s")))).head().getLong(0))
      add("markdown_strip_scan", docs.count(), tMd,
        Seq(("chars_total", nMd.toDouble)))

      // PDF extract scan (r11 continuation): per-row encode (Flate +
      // classic xref) → full decode (xref walk, inflate, escape
      // resolution); stateless map, scan-bound flat like the other
      // container codecs.
      val (nPdf, tPdf) = time {
        val run = udf((id: Long, text: String) => {
          import operators.Pdf
          val toks = (if (text == null) "" else text).split("\\s+").filter(_.nonEmpty)
          val pg = Pdf.Page(toks.grouped(8).map(_.mkString(" ")).toSeq)
          Pdf.decodePdfText(Pdf.encodePdf(Seq(pg)))
            .map(_.head.length.toLong).getOrElse(-1L)
        })
        docs.select(run(col("doc_id"), col("text")).as("c"))
          .agg(sum(col("c"))).head().getLong(0)
      }
      add("pdf_codec_scan", docs.count(), tPdf,
        Seq(("chars_total", nPdf.toDouble)))

      // WebP/VP8L codec scan (r11 continuation): per-row truecolor
      // encode (canonical prefix codes + transforms) → decode → stats;
      // the entropy-coded image sibling of gif_codec_scan.
      val (nWp, tWp) = time {
        val mkW2 = udf((id: Long) => operators.Vp8l.encodeWebp(
          Array.tabulate(64)(i => 0xff000000 | (((id.toInt * 31 + i * 7) % 256) << 8)),
          8, 8, operators.Vp8l.Vp8lConfig(
            subtractGreen = id % 2 == 0, cacheBits = (id % 3).toInt * 2)))
        val wsumW = udf((p: Array[Byte]) =>
          operators.Vp8l.decodeWebp(p).map(operators.Vp8l.webpStats(_)._7).getOrElse(-1L))
        docs.select(wsumW(mkW2(col("doc_id"))).as("w"))
          .agg(sum(col("w"))).head().getLong(0)
      }
      add("webp_codec_scan", docs.count(), tWp,
        Seq(("wsum_total", nWp.toDouble)))

      // Native PNG codec scan (r11 continuation): per-row filter +
      // deflate encode → chunk-walk decode; the zlib sibling of
      // webp_codec_scan, same stateless-map contract.
      val (nPg, tPg) = time {
        val mkP = udf((id: Long) => operators.Png.encodePng(
          operators.Png.PngImage(8, 8, if (id % 2 == 0) 2 else 6,
            Array.tabulate(64)(i => 0xff000000 | (((id.toInt * 31 + i * 7) % 256) << 8))),
          filterMode = if (id % 3 == 0) -2 else -1))
        val wsumP = udf((p: Array[Byte]) =>
          operators.Png.decodePng(p).map(operators.Png.pngStats(_)._8).getOrElse(-1L))
        docs.select(wsumP(mkP(col("doc_id"))).as("w"))
          .agg(sum(col("w"))).head().getLong(0)
      }
      add("png_codec_scan", docs.count(), tPg,
        Seq(("wsum_total", nPg.toDouble)))

      // TFRecord shard scan (r11 continuation): per-row tf.Example
      // protobuf encode → masked-CRC32C framing → decode; the
      // ML-native sibling of warc_codec_scan, same stateless contract.
      val (nTf, tTf2) = time {
        val mkT2 = udf((id: Long, text: String) => {
          import operators.Tfrecord._
          operators.Tfrecord.encodeShard(Seq(Map(
            "text" -> BytesV(Seq((if (text == null) "" else text).getBytes("UTF-8"))),
            "id" -> IntsV(Seq(id)))))
        })
        val rdT = udf((p: Array[Byte]) =>
          operators.Tfrecord.decodeShard(p).map(_.head("text") match {
            case operators.Tfrecord.BytesV(vs) => vs.head.length.toLong
            case _ => -1L
          }).getOrElse(-1L))
        docs.select(rdT(mkT2(col("doc_id"), col("text"))).as("b"))
          .agg(sum(col("b"))).head().getLong(0)
      }
      add("tfrecord_codec_scan", docs.count(), tTf2,
        Seq(("text_bytes", nTf.toDouble)))

      // Unigram Viterbi segmentation: per-row O(len · maxPieceLen) DP
      // with a broadcast-size vocab map — zero shuffle; flat per row.
      val (nUni, tUni) = time(operators.Unigram.segmentStats(
          docs, "doc_id", "text", maxChars = 64)
        .agg(sum(col("score")), sum(col("n_tokens"))).head().getLong(1))
      add("unigram_encode", docs.count(), tUni,
        Seq(("tokens", nUni.toDouble)))

      // Per-epoch shuffled order: DistributedRank over a splitmix64 key
      // (quantiles + bucket windows + prefix offsets — no single-task
      // sort). sum(pos) = n(n+1)/2 doubles as an exactness check.
      val (posSum, tEp) = time(operators.EpochShuffle.order(
          docs.select(col("doc_id")), "doc_id", epoch = 0, seed = 42L)
        .agg(sum(col("pos"))).head().getLong(0))
      val nDocsEp = docs.count()
      require(posSum == nDocsEp * (nDocsEp + 1) / 2,
        s"epoch_shuffle rank sum $posSum != ${nDocsEp * (nDocsEp + 1) / 2}")
      add("epoch_shuffle", nDocsEp, tEp)

      // Rank-derived shard layout: the DistributedRank writer face —
      // quantile bucketing + per-bucket windows + tiny prefix offsets.
      // Cost should track the two key scans; there is no single-task
      // global sort anywhere to blow up at 100x.
      val (nSh, tSh) = time(operators.Sharding.shardLayout(
        docs, length(col("text")).cast("long"), col("doc_id"),
        numShards = 32).count())
      add("shard_layout", docs.count(), tSh, Seq(("shards", nSh.toDouble)))

      // Ingest pipeline composition (the ingest_pipeline flagship):
      // FIXED daily batch (base-corpus-sized; 1/3 near-dups of the
      // catalog, 1/3 exact copies, 1/3 fresh) against the GROWING
      // catalog -> keepers -> rank-derived 4-shard manifest. Composed
      // cost should be its parts' sum (catalog-sliced LSH + rank scans
      // on the batch-sized keeper set) with no cross-term.
      val ingBatch = docs0.select((col("doc_id") + 500000000L).as("doc_id"),
        when(col("doc_id") % 3 === 0, concat(col("text"), lit(" fresh")))
          .otherwise(when(col("doc_id") % 3 === 1, col("text"))
            .otherwise(concat(lit("zq "), reverse(col("text"))))).as("text"))
      val (nIng, tIng) = time {
        val dec = operators.Dedup.incrementalDedup(
          docs, ingBatch, "doc_id", "text",
          numHashes = 64, bands = 16, jaccardThreshold = 0.8)
        val keepers = dec.filter(!col("exact_dup") && col("near_of").isNull)
          .select(col("doc_id")).join(ingBatch, "doc_id")
        operators.Sharding.shardLayout(keepers,
          length(col("text")).cast("long"), col("doc_id"), numShards = 4)
          .agg(sum(col("n"))).head().getLong(0)
      }
      add("ingest_pipeline", docs.count(), tIng,
        Seq(("batch_kept", nIng.toDouble)))

      // BPE at the PRODUCTION dial: numMerges=1000 via the driver-side
      // trainer (constant Spark jobs — one count, one collect, one
      // parallelize — vs 2000 sequential jobs for the distributed
      // trainer at this budget). Cost should converge to the word-count
      // shuffle as the corpus grows; the in-memory merge loop rides the
      // near-constant DISTINCT-word vocabulary.
      val (nBpeL, tBpeL) = time {
        val (ms, w) = operators.Bpe.trainLocal(docs, "text", numMerges = 1000)
        w.count() + ms.length
      }
      add("bpe_train_local_1000", docs.count(), tBpeL,
        Seq(("merges_plus_words", nBpeL.toDouble)))

      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), Tables.tsUs(ev).cast("double").as("lts"),
          col("event_id"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), Tables.tsUs(ev).cast("double").as("rts"),
          col("event_id").as("click_id"))
      val (n6, t6) = time(operators.TemporalJoins.asofBackward(views, clicks,
        Seq("user_id"), "lts", "rts", Seq("click_id")).count())
      add("asof_join", n6, t6)

      // Data valuation at scale — the two curation-layer curves:
      // KNN-Shapley keeps a FIXED 3-probe set against the growing train
      // side (one broadcast + one rank window per probe, so the cost is
      // the per-probe sort of |train|); the label-noise audit keeps a
      // FIXED 500-example slice against the growing corpus through the
      // exact two-pass knnJoin (cost rides pass-2 pruning, never
      // |slice|·|N|). The audit's index build stays OUTSIDE the timer —
      // the offline-build convention ivf_build already prices.
      // Per-document graph family at scale: TextRank keywords build a
      // co-occurrence graph PER DOC and iterate integer pagerank over
      // (doc, word) keys — corpus-parallel, so the curve should be
      // linear in documents (graphs are vocabulary-sized, never pooled).
      val (nTrk, tTrk) = time(operators.TextRank.keywords(
        docs, "doc_id", "text", k = 3).count())
      add("textrank_keywords", nTrk, tTrk)

      // r13: table-cell extraction is a stateless per-page regexp scan
      // (posexplode over <table>/<tr> blocks + a transform/aggregate per
      // row) — the curve should be linear in pages, zero shuffles.
      // r14: the fixture carries a rowspan so the priced scan includes
      // the per-table layout fold (carry + start-column assignment).
      // stream_label_noise is NOT re-rowed: its per-batch scorer IS the
      // label_noise_audit knnJoin plan family already priced below (the
      // gif_codec_scan precedent for shared plan families).
      val tblHtml = concat(
        lit("<table><tr><th rowspan=2>r</th><th colspan='2'>h</th>" +
          "<th>c</th></tr><tr><td>v <i>"),
        col("doc_id") % 5, lit("</i></td><td colspan=2>w</td></tr></table>"))
      val (nHtc, tHtc) = time(operators.HtmlMeta.tableCells(
        docs.select(col("doc_id"), tblHtml.as("html")), "doc_id", "html")
        .count())
      add("html_table_cells", nHtc, tHtc)

      val labeled = emb.withColumn("label",
        pmod(col("vec_id"), lit(10)).cast("int"))
      val (nShp, tShp) = time(operators.DataValuation.knnShapley(
        labeled.filter(col("vec_id") >= 3), labeled.filter(col("vec_id") < 3),
        "vec_id", "embedding", "label", k = 10).count())
      add("knn_shapley", nShp, tShp)
      val auditModel = {
        val m = operators.Ivf.build(labeled, "embedding", nlists = 100)
        m.assigned.cache().count()
        m
      }
      val (nLn, tLn) = time(operators.DataValuation.labelNoiseKnn(
        auditModel, labeled.filter(col("vec_id") < 500), "vec_id",
        "embedding", "label", k = 10).count())
      add("label_noise_audit", nLn, tLn)
      auditModel.assigned.unpersist()

      model.assigned.unpersist(); docs.unpersist(); emb.unpersist(); ev.unpersist()
      out.result()
    }

    // scales: 1x/10x/100x by default (100x: 500k docs / 200k vectors /
    // ~2M events — the cost face of RECALL_SCALE's 100x row). Override
    // via args(2) = "1,10".
    val scales = if (args.length > 2) args(2).split(",").map(_.trim.toInt).toSeq
                 else Seq(1, 10, 100)
    // One discarded warmup pass at the base scale before anything is
    // recorded: the 1x pass otherwise absorbs all JIT/codegen/first-use
    // cost, and since it is every ratio's DENOMINATOR, that startup noise
    // moved the reported multipliers 2-4x between otherwise-identical
    // runs (minhash 1x measured 2.5 s vs 7.2 s solo-to-solo). Warmed,
    // the ratios measure scaling, not warmup.
    opsAt(scales.head)
    val results = scales.map(s => opsAt(s))
    val lines = results.head.indices.map { i =>
      val op = results.head(i)._1
      val cells = scales.zip(results.map(_(i))).map { case (s, (_, r, t, extra)) =>
        val extras = extra.map { case (k, v) =>
          s""","${k}_${s}x":${functions.DetRandom.fmt(v, 3)}"""
        }.mkString
        s""""rows_${s}x":$r,"sec_${s}x":${functions.DetRandom.fmt(t, 3)}$extras"""
      }
      // ratios are vs the FIRST scale in the list; the key names the
      // baseline explicitly so a non-1x-first override can't mislabel
      val base = results.head(i)._3
      val ratios = scales.tail.zip(results.tail.map(_(i))).map {
        case (s, (_, _, t, _)) =>
          s""""time_ratio_${s}x_vs_${scales.head}x":${functions.DetRandom.fmt(t / base, 2)}"""
      }
      s"""{"op":"$op",${(cells ++ ratios).mkString(",")}}"""
    }
    val out = lines.mkString("[\n", ",\n", "\n]\n")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), out)
    println(out)
    spark.stop()
  }
}
