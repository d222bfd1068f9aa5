package graft

import org.apache.spark.sql.functions._

class MetricsSpec extends SparkSpecBase {
  import spark.implicits._

  test("executor-side increments merge into the driver counter") {
    Metrics.reset()
    val acc = Metrics.counter(spark, "rows_scanned")
    val before = acc.value.longValue
    spark.range(100).repartition(4).map { x => acc.add(1); x }.count()
    assert(acc.value.longValue - before == 100)
  }

  test("stats() has the pg_stat_neurondb shape and timed() feeds it") {
    Metrics.reset()
    Metrics.timed(spark) { spark.range(10).count() }
    Metrics.timed(spark) { spark.range(10).count() }
    val row = Metrics.stats(spark).collect().head
    assert(Metrics.stats(spark).columns.toSeq == Seq("vectors_indexed",
      "queries_total", "cache_hits", "cache_misses", "avg_query_time_ms"))
    assert(row.getAs[Long]("queries_total") == 2L)
    assert(row.getAs[Float]("avg_query_time_ms") > 0.0f)
  }

  test("knn search bumps queries_total") {
    Metrics.reset()
    val df = Seq((1L, Seq(0f, 0f)), (2L, Seq(1f, 1f))).toDF("id", "vec")
    operators.Knn.search(df, "vec", Array(0f, 0f), k = 1).collect()
    assert(Metrics.counter(spark, Metrics.QueriesTotal).value.longValue == 1L)
  }

  test("timed() under a custom name does not pollute avg_query_time_ms") {
    Metrics.reset()
    Metrics.timed(spark, Metrics.VectorsIndexed) { Thread.sleep(300) } // an index build
    Metrics.timed(spark) { 1 + 1 }                                     // a trivial query
    val row = Metrics.stats(spark).collect().head
    assert(row.getAs[Long]("queries_total") == 1L)
    // the 300ms build must not be averaged into the (sub-ms) query time
    assert(row.getAs[Float]("avg_query_time_ms") < 150.0f)
    // the custom timer exists under its own name
    assert(Metrics.prometheusText.contains("graft_vectors_indexed_seconds"))
  }

  test("json helpers match literal top-level keys, dots and all") {
    import graft.functions.Json
    val df = Seq("""{"a":{"b":"nested"},"a.b":"literal"}""").toDF("meta")
    assert(df.select(Json.get($"meta", "a.b")).head().getString(0) == "literal")
    assert(df.filter(Json.contains($"meta", Map("a.b" -> "literal"))).count() == 1)
    assert(df.filter(Json.contains($"meta", Map("a.b" -> "nested"))).count() == 0)
    // quote-containing keys can't be expressed in a get_json_object
    // bracket path (escapes unsupported) — reject loudly, never NULL
    intercept[IllegalArgumentException](Json.get($"meta", "o'brien"))
  }

  test("prometheusText renders HELP/TYPE exposition lines and reset zeroes") {
    Metrics.reset()
    Metrics.inc(spark, Metrics.CacheHits, 5)
    val text = Metrics.prometheusText
    assert(text.contains("# HELP graft_cache_hits"))
    assert(text.contains("# TYPE graft_cache_hits counter"))
    assert(text.contains("graft_cache_hits 5"))
    Metrics.reset()
    assert(Metrics.prometheusText.contains("graft_cache_hits 0"))
  }
}
