package graft

import org.apache.spark.sql.functions._
import graft.operators.Augment

class AugmentSpec extends SparkSpecBase {
  import spark.implicits._

  test("tokenMask: deterministic, partition-invariant, rate-calibrated") {
    val docs = (1L to 200L)
      .map(i => (i, (1 to 50).map(j => s"w$j").mkString(" ")))
      .toDF("id", "text")
    val a = Augment.tokenMask(docs, "id", "text", 0.15)
      .select("id", "masked_text").as[(Long, String)].collect().sortBy(_._1).toSeq
    val b = Augment.tokenMask(docs.repartition(13), "id", "text", 0.15)
      .select("id", "masked_text").as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(a == b)
    val stats = Augment.tokenMask(docs, "id", "text", 0.15)
      .agg(sum("n_masked"), sum("n_tokens")).head()
    val rate = stats.getLong(0).toDouble / stats.getLong(1)
    assert(math.abs(rate - 0.15) < 0.02, s"empirical mask rate $rate")
  }

  test("tokenMask edges: rate 0 masks nothing, rate 1 masks everything") {
    val docs = Seq((7L, "alpha beta gamma")).toDF("id", "text")
    val none = Augment.tokenMask(docs, "id", "text", 0.0).head()
    assert(none.getAs[String]("masked_text") == "alpha beta gamma" &&
      none.getAs[Long]("n_masked") == 0L)
    val all = Augment.tokenMask(docs, "id", "text", 1.0).head()
    assert(all.getAs[String]("masked_text") == "<mask> <mask> <mask>" &&
      all.getAs[Long]("n_masked") == 3L)
  }

  test("tokenMask: the mask pattern differs across docs (coin keyed by id)") {
    val text = (1 to 40).map(j => s"w$j").mkString(" ")
    val out = Augment.tokenMask(
      Seq((1L, text), (2L, text)).toDF("id", "text"), "id", "text", 0.3)
      .select("masked_text").as[String].collect()
    assert(out(0) != out(1), "same text, different ids must draw different coins")
  }
}
