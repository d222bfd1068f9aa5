package graft

import org.apache.spark.sql.functions._
import graft.ml.QualityClf

/**
 * The `quality_clf` oracle pins the training algebra bit-for-bit against
 * DuckDB; what it CANNOT show on the driver's synthetic corpus is that
 * the trainer learns (that corpus draws every lang's text from one
 * vocabulary, so its labels are unlearnable by construction). This spec
 * supplies the learning evidence on fixtures with real signal.
 */
class QualityClfSpec extends SparkSpecBase {
  import spark.implicits._

  // Disjoint vocabularies: class 1 speaks {alpha beta gamma}, class 0
  // speaks {omega sigma tau}. A working discriminative trainer must
  // reach accuracy 1.0; a bias-only one (the failure mode of too-few
  // epochs at lr→0) cannot beat the class prior.
  private def fixture = Seq(
    (1L, "alpha beta alpha gamma beta", 1),
    (2L, "beta beta gamma alpha", 1),
    (3L, "gamma alpha alpha beta gamma", 1),
    (4L, "omega sigma tau omega", 0),
    (5L, "tau tau sigma omega sigma", 0),
    (6L, "sigma omega tau tau omega", 0),
    (7L, "alpha gamma beta beta", 1),
    (8L, "omega tau sigma sigma", 0)
  ).toDF("doc_id", "text", "y")

  test("separates disjoint-vocabulary classes perfectly") {
    val out = QualityClf.trainScore(fixture, "doc_id", "text", col("y") === 1,
      d = 16, epochs = 24, lr = 8.0).collect()
    val acc = out.count(r => (r.getFloat(2) >= 0.5f) == (r.getLong(1) == 1L)).toDouble / out.length
    assert(acc == 1.0, s"expected perfect separation, got $acc")
    // scores are well-separated, not hovering at the boundary
    val pos = out.filter(_.getLong(1) == 1L).map(_.getFloat(2))
    val neg = out.filter(_.getLong(1) == 0L).map(_.getFloat(2))
    assert(pos.min > neg.max + 0.2f,
      s"margin too thin: pos.min=${pos.min} neg.max=${neg.max}")
  }

  test("is deterministic run-to-run") {
    def run() = QualityClf.trainScore(fixture, "doc_id", "text", col("y") === 1,
      d = 16, epochs = 8, lr = 4.0)
      .collect().map(r => (r.getLong(0), r.getFloat(2))).sortBy(_._1).toSeq
    assert(run() == run())
  }

  test("empty and null docs get the bias-only score, not NaN") {
    val df = Seq((1L, "alpha beta", 1), (2L, "", 0), (3L, null: String, 0))
      .toDF("doc_id", "text", "y")
    val out = QualityClf.trainScore(df, "doc_id", "text", col("y") === 1,
      d = 8, epochs = 4, lr = 1.0)
      .collect().map(r => r.getLong(0) -> r.getFloat(2)).toMap
    assert(!out.values.exists(_.isNaN))
    // both featureless docs collapse to the same sigmoid(bias)
    assert(out(2L) == out(3L))
  }
}
