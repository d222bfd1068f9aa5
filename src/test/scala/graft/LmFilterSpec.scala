package graft

import org.apache.spark.sql.functions._
import graft.operators.LmFilter

/** Bigram-LM perplexity filter: closed-form check of the add-k counts,
  * the short-doc edge, determinism, and the no-cartesian plan shape. */
class LmFilterSpec extends SparkSpecBase {
  import spark.implicits._

  test("scores match the closed-form add-k bigram model") {
    // d1 = [a b a b], d2 = [a b c], d3 = [z] (vocab contributor, no bigrams)
    val docs = Seq((1L, "a b a b"), (2L, "a b c"), (3L, "z")).toDF("id", "text")
    val got = LmFilter.scoreCorpus(docs, "id", "text", k = 0.5)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Double])))).toMap
    // c12: (a,b)=3 (b,a)=1 (b,c)=1; c1: a=3 b=2; V=4 (a,b,c,z)
    val pAB = math.log(3.5 / (3 + 0.5 * 4))
    val pBA = math.log(1.5 / (2 + 0.5 * 4))
    val pBC = math.log(1.5 / (2 + 0.5 * 4))
    assert(got(1L)._1 == 3L && math.abs(got(1L)._2.get - (pAB + pBA + pAB) / 3) < 1e-12)
    assert(got(2L)._1 == 2L && math.abs(got(2L)._2.get - (pAB + pBC) / 2) < 1e-12)
    assert(got(3L) == ((0L, None)), "sub-2-token docs score (0, null)")
  }

  test("repeated boilerplate scores higher than scrambled text (the filter signal)") {
    val base = "the quick brown fox jumps over the lazy dog"
    val docs = (1L to 20L).map(i => (i, base)) :+
      (99L, "dog the over quick lazy jumps fox brown the")
    val out = LmFilter.scoreCorpus(docs.toDF("id", "text"), "id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out(1L) > out(99L),
      s"corpus-typical transitions must outscore scrambled: ${out(1L)} vs ${out(99L)}")
  }

  test("KN scores match the closed-form discount + continuation model") {
    // d1 = [a b a b], d2 = [a b c], d3 = [q a]
    // c12: (a,b)=3 (b,a)=1 (b,c)=1 (q,a)=1; B=4
    // ctx: a (c1=3, n1f=1), b (c1=2, n1f=2), q (c1=1, n1f=1)
    // cont: b n1b=1, a n1b=2, c n1b=1
    val docs = Seq((1L, "a b a b"), (2L, "a b c"), (3L, "q a")).toDF("id", "text")
    val got = LmFilter.scoreCorpusKn(docs, "id", "text", discount = 0.75)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2)))).toMap
    val pAB = math.log((3 - 0.75) / 3 + 0.75 * 1 / 3.0 * (1 / 4.0)) // 0.8125
    val pBA = math.log((1 - 0.75) / 2 + 0.75 * 2 / 2.0 * (2 / 4.0)) // 0.5
    val pBC = math.log((1 - 0.75) / 2 + 0.75 * 2 / 2.0 * (1 / 4.0)) // 0.3125
    val pQA = math.log((1 - 0.75) / 1 + 0.75 * 1 / 1.0 * (2 / 4.0)) // 0.625
    assert(got(1L)._1 == 3L && math.abs(got(1L)._2 - (pAB + pBA + pAB) / 3) < 1e-12)
    assert(got(2L)._1 == 2L && math.abs(got(2L)._2 - (pAB + pBC) / 2) < 1e-12)
    assert(got(3L)._1 == 1L && math.abs(got(3L)._2 - pQA) < 1e-12)
    // the Kneser-Ney effect: same (c12, c1, n1f), but `a` continues after
    // more distinct contexts than `c`, so P(a|b) > P(c|b)
    assert(pBA > pBC)
  }

  test("deterministic and no cartesian stage") {
    val docs = Tables.read(spark, "/root/testdata/sf0.001", "documents")
    val a = LmFilter.scoreCorpus(docs, "doc_id", "text")
      .select(col("doc_id"), col("avg_logp").cast("float"))
      .collect().map(r => (r.getLong(0), r.getFloat(1))).toSet
    val b = LmFilter.scoreCorpus(docs, "doc_id", "text")
      .select(col("doc_id"), col("avg_logp").cast("float"))
      .collect().map(r => (r.getLong(0), r.getFloat(1))).toSet
    assert(a == b)
    val plan = LmFilter.scoreCorpus(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), s"pair space in: $plan")
  }
}
