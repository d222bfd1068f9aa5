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

  test("bootstrap CI: constant metric collapses the interval to the mean") {
    val df = (0L until 50L).map(i => (i, 7L)).toDF("id", "score")
    val r = EvalConstruct.bootstrapMeanCi(df, "id", "score", b = 40)
      .collect().head
    assert(r.getAs[Long]("n") == 50L)
    assert(r.getAs[Double]("mean") == 7.0)
    assert(r.getAs[Double]("ci_lo") == 7.0)
    assert(r.getAs[Double]("ci_hi") == 7.0)
  }

  test("bootstrap CI: interval brackets the mean and is deterministic") {
    val df = (0L until 100L).map(i => (i, i % 10)).toDF("id", "score")
    val run1 = EvalConstruct.bootstrapMeanCi(df, "id", "score", b = 200)
      .collect().head
    val run2 = EvalConstruct.bootstrapMeanCi(df, "id", "score", b = 200)
      .collect().head
    assert(run1 == run2)
    assert(run1.getAs[Double]("mean") == 4.5)
    assert(run1.getAs[Double]("ci_lo") < 4.5 &&
      run1.getAs[Double]("ci_hi") > 4.5)
    // the 95% band for a mean of 100 uniform draws is tight
    assert(run1.getAs[Double]("ci_hi") - run1.getAs[Double]("ci_lo") < 1.5)
  }

  test("conformal: k = ceil((n+1)*0.9), qhat is the k-th smallest") {
    import graft.operators.EvalConstruct.conformalThreshold
    // cal scores 1..9: k = ceil(10*0.9) = 9 -> qhat = 9.0
    val cal = (1L to 9L).map(i => (i, i.toDouble)).toDF("id", "score")
    val test = Seq((100L, 5.0), (101L, 9.0), (102L, 10.0), (103L, 2.0))
      .toDF("id", "score")
    val r = conformalThreshold(cal, test, "score", "id").collect().head
    assert(r.getAs[Long]("n_cal") == 9L)
    assert(r.getAs[Long]("k") == 9L)
    assert(r.getAs[Double]("qhat") == 9.0)
    assert(r.getAs[Long]("n_test") == 4L)
    assert(r.getAs[Double]("coverage") == 0.75) // 10.0 escapes
  }

  test("conformal: refuses a calibration set too small for the coverage") {
    import graft.operators.EvalConstruct.conformalThreshold
    val cal = Seq((1L, 1.0)).toDF("id", "score") // k = ceil(2*0.9) = 2 > 1
    val test = Seq((2L, 1.0)).toDF("id", "score")
    intercept[IllegalArgumentException] {
      conformalThreshold(cal, test, "score", "id")
    }
  }

  test("BH step-up: the textbook threshold walk rejects up to k*") {
    import graft.operators.EvalConstruct.benjaminiHochberg
    // m = 10, q = 1/10 -> thresholds k*0.01; p = 0.005, 0.015, 0.029
    // qualify at ranks 1 and 3 (0.015 > 0.02? no: rank2 thresh 0.02 --
    // 0.015 <= 0.02 qualifies too); k* = 3, everything above rejected
    val ps = Seq(0.005, 0.015, 0.029, 0.5, 0.6, 0.7, 0.8, 0.9, 0.95, 0.99)
    val df = ps.zipWithIndex.map { case (p, i) => (i.toLong, p) }
      .toDF("id", "p")
    val out = benjaminiHochberg(df, "id", "p", 1, 10)
      .collect().map(r => r.getAs[Long]("rank") ->
        r.getAs[Boolean]("rejected")).toMap
    assert((1L to 3L).forall(out(_)))
    assert((4L to 10L).forall(!out(_)))
  }

  test("BH: nothing qualifies, nothing rejected") {
    import graft.operators.EvalConstruct.benjaminiHochberg
    val df = Seq((1L, 0.5), (2L, 0.9)).toDF("id", "p")
    val out = benjaminiHochberg(df, "id", "p").collect()
    assert(out.forall(!_.getAs[Boolean]("rejected")))
  }

  test("bootstrap CI: b must be a positive multiple of 40") {
    val df = Seq((1L, 1L)).toDF("id", "score")
    intercept[IllegalArgumentException] {
      EvalConstruct.bootstrapMeanCi(df, "id", "score", b = 100)
    }
  }
}
