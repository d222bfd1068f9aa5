package graft

import graft.operators.EvalConstruct

/** MCQ position-assignment invariants: determinism, slot range,
  * letter mapping, near-uniformity over many questions, and seed
  * sensitivity. */
class EvalConstructSpec extends SparkSpecBase {

  import spark.implicits._

  test("slots are deterministic, in range, and letter-mapped") {
    val df = (0L until 100L).toDF("qid")
    val out = EvalConstruct.mcqShuffle(df, "qid", nOptions = 4)
      .collect().map(r => r.getAs[Long]("qid") ->
        (r.getAs[Long]("correct_pos"), r.getAs[String]("letter"))).toMap
    assert(out.size == 100)
    out.values.foreach { case (p, l) =>
      assert(p >= 0 && p < 4)
      assert(l == ('A' + p.toInt).toChar.toString)
    }
    // replay equals the scalar path
    (0L until 100L).foreach { q =>
      assert(out(q)._1 == EvalConstruct.slot(q, 4, 42L).toLong)
    }
  }

  test("positions are near-uniform over 4000 questions") {
    val hist = (0L until 4000L).map(EvalConstruct.slot(_, 4, 42L))
      .groupBy(identity).view.mapValues(_.size).toMap
    assert(hist.keySet == Set(0, 1, 2, 3))
    hist.values.foreach(n => assert(n > 850 && n < 1150, s"skewed: $hist"))
  }

  test("a different seed produces a different assignment") {
    val a = (0L until 64L).map(EvalConstruct.slot(_, 4, 42L))
    val b = (0L until 64L).map(EvalConstruct.slot(_, 4, 43L))
    assert(a != b)
  }
}
