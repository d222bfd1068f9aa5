package graft

import org.apache.spark.sql.functions._
import graft.functions.{Embeddings, TextFunctions, VectorParsers}
import graft.operators.{Bm25, Hybrid, Rerank, SparseSearch}

class SearchSpec extends SparkSpecBase {
  import spark.implicits._

  test("tokenize matches bm25_tokenize semantics (sparse_search.c:448-476)") {
    assert(TextFunctions.tokenize("Hello, World! 42x") == Seq("hello", "world", "42x"))
    assert(TextFunctions.tokenize("") == Seq.empty)
    assert(TextFunctions.tokenize(null) == Seq.empty)
  }

  test("pairScore: empty query or doc -> 0; fixed-constant idf (sparse_search.c:544-585)") {
    assert(Bm25.pairScore("", "some doc") == 0.0)
    assert(Bm25.pairScore("query", "") == 0.0)
    // single-term query, term present once in a 4-token doc
    val idf = math.log(900.5 / 100.5)
    val expected = idf * (1.0 * 2.5) / (1.0 + 1.5 * (0.25 + 0.75 * 4.0 / 100.0))
    assert(math.abs(Bm25.pairScore("spark", "spark is a engine") - expected) < 1e-12)
  }

  test("corpus BM25 ranks term-bearing docs first") {
    val docs = Seq(
      (1L, "spark spark spark engine"),
      (2L, "spark engine"),
      (3L, "database index btree"),
      (4L, "spark")).toDF("id", "text")
    val idx = Bm25.buildIndex(docs, "id", "text")
    val scores = idx.score("spark").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(!scores.contains(3L))
    assert(scores(1L) > scores(2L)) // higher tf wins (similar dl)
  }

  test("rrfScalar (neurondb--1.0.sql:6808-6818)") {
    assert(math.abs(Hybrid.rrfScalar(1, 2) - (1.0 / 61 + 1.0 / 62)) < 1e-12)
  }

  test("MMR: lambda=1 is pure relevance; diversification avoids duplicates (ml_mmr.c:75-236)") {
    val q = Array(1f, 0f)
    val cands = Seq(
      1L -> Array(1f, 0f),  // identical to query
      2L -> Array(1f, 0f),  // exact duplicate of 1
      3L -> Array(0f, 1f))  // orthogonal
    val pure = Rerank.mmr(q, cands, lambda = 1.0, k = 3).map(_._1)
    assert(pure.head == 1L && pure(1) == 2L)
    // at lambda=0.3 the duplicate's redundancy (1.0) outweighs its
    // relevance: 0.3*1 - 0.7*1 = -0.4 < 0.3*0 - 0.7*0 = 0 for the
    // orthogonal candidate
    val diverse = Rerank.mmr(q, cands, lambda = 0.3, k = 2).map(_._1)
    assert(diverse == Seq(1L, 3L))
  }

  test("diverseSearch returns k diversified rows") {
    val emb = Tables.read(spark, "/root/testdata/sf0.001", "embeddings")
    val q = Tables.queryVector(spark, "/root/testdata/sf0.001", 3L)
    val out = Rerank.diverseSearch(emb, "vec_id", "embedding", q, lambda = 0.5, k = 5)
    assert(out.count() == 5)
    assert(out.select("vec_id").as[Long].collect().contains(3L))
  }

  test("crossEncoder is deterministic and self-ranks the query text first") {
    val docs = Seq((1L, "alpha beta gamma"), (2L, "totally different words"),
      (3L, "the exact query text")).toDF("id", "text")
    val out1 = Rerank.crossEncoder(docs, "id", "text", "the exact query text").collect()
    val out2 = Rerank.crossEncoder(docs, "id", "text", "the exact query text").collect()
    assert(out1.map(_.getLong(0)).toSeq == out2.map(_.getLong(0)).toSeq)
    assert(out1.head.getLong(0) == 3L) // identical text => cosine sim 1
  }

  test("sparse posting-list search finds docs sharing query tokens") {
    val docs = Seq((1L, "spark shuffle join"), (2L, "spark scan"), (3L, "unrelated prose here"))
      .toDF("doc_id", "text")
    val corpus = SparseSearch.embedCorpus(docs, "doc_id", "text")
    val postings = SparseSearch.buildIndex(corpus, "doc_id", "sp_tokens", "sp_weights")
    val q = SparseSearch.termHashEmbed("spark join")
    val hits = postings.transform(p => SparseSearch.search(p, q, 3)).collect()
    assert(hits.head.getLong(0) == 1L) // shares both tokens
    assert(!hits.map(_.getLong(0)).contains(3L))
  }

  test("denseSparseSearch outer-joins and weights both channels") {
    val dense = Seq((1L, 0.9), (2L, 0.5)).toDF("id", "ds")
    val sparse = Seq((2L, 1.0), (3L, 0.8)).toDF("id", "ss")
    val fused = Hybrid.denseSparseSearch(dense, sparse, "id", "ds", "ss", 0.5, 0.5, 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(math.abs(fused(2L) - 0.75) < 1e-12)
    assert(math.abs(fused(1L) - 0.45) < 1e-12)
    assert(math.abs(fused(3L) - 0.40) < 1e-12)
  }

  test("embedding cache: stable size under repeated refresh, null texts skipped, keys injective") {
    import graft.operators.Rag
    val spark2 = spark
    import spark2.implicits._
    val empty = Seq.empty[(String, String, String, Seq[Float])]
      .toDF("cache_key", "model_name", "text", "embedding")
    val texts = Seq(Some("alpha"), Some("beta"), None).toDF("t")
    val c1 = Rag.refreshEmbeddingCache(empty, texts, "t", "m")
    assert(c1.count() == 2) // null text never cached
    // refresh with the same texts must be a no-op, not append-forever
    val c2 = Rag.refreshEmbeddingCache(c1, texts, "t", "m")
    assert(c2.count() == 2)
    // length-prefixed key: ("image:clip", "t") and ("image", "clip:t") differ
    val k1 = Rag.refreshEmbeddingCache(empty, Seq("t").toDF("t"), "t", "image:clip")
      .select("cache_key").head().getString(0)
    val k2 = Rag.refreshEmbeddingCache(empty, Seq("clip:t").toDF("t"), "t", "image")
      .select("cache_key").head().getString(0)
    assert(k1 != k2)
  }

  test("twoStage rescore returns exact top-k despite coarse first stage") {
    val emb = Tables.read(spark, "/root/testdata/sf0.001", "embeddings")
      .withColumn("coarse", col("embedding")) // identity 'quantization'
    val q = Tables.queryVector(spark, "/root/testdata/sf0.001", 11L)
    val exact = operators.Knn.search(emb, "embedding", q, 5).select("vec_id").as[Long].collect().toSet
    val staged = Rerank.twoStage(emb, "vec_id", "embedding", "coarse", q, q, 5)
      .select("vec_id").as[Long].collect().toSet
    assert(staged == exact)
  }
}
