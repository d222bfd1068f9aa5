package graft

import org.apache.spark.sql.functions._
import graft.operators.Dsir

class DsirSpec extends SparkSpecBase {
  import spark.implicits._

  test("dsir select ranks target-vocabulary docs above off-domain docs") {
    // target domain speaks "alpha beta gamma"; off-domain speaks "rock stone pebble"
    val docs = ((1L to 20L).map(i => (i, "alpha beta gamma alpha beta", true)) ++
      (21L to 40L).map(i => (i, "rock stone pebble rock stone", false)) ++
      // the candidates under test: one target-like, one off-domain-like
      Seq((100L, "alpha gamma beta alpha", false),
          (101L, "stone rock pebble stone", false)))
      .toDF("id", "text", "is_t")
    val out = Dsir.select(docs, "id", "text", col("is_t"), k = 25)
      .select("id", "score_int").as[(Long, Long)].collect().toMap
    assert(out.contains(100L), "target-like doc must be selected")
    val targetLike = out(100L)
    assert(out.get(101L).forall(_ < targetLike),
      s"off-domain doc must score below the target-like one: $out")
    assert(targetLike > 0, "target-vocab doc must be net target-enriched")
  }

  test("dsir select is deterministic and partition-invariant") {
    val docs = (1L to 300L)
      .map(i => (i, s"w${i % 17} w${i % 5} w${i % 29} tail", i % 3 == 0))
      .toDF("id", "text", "is_t")
    val a = Dsir.select(docs, "id", "text", col("is_t"), 40)
      .select("id").as[Long].collect().toSeq
    val b = Dsir.select(docs.repartition(11), "id", "text", col("is_t"), 40)
      .select("id").as[Long].collect().toSeq
    assert(a == b)
  }
}
