package graft

import graft.operators.Curriculum

/** Curriculum-order invariants: monotone difficulty within each
  * domain, domain striding (consecutive positions cycle domains),
  * position uniqueness, and a single-shuffle plan. */
class CurriculumSpec extends SparkSpecBase {

  import spark.implicits._

  private def corpus = Seq.tabulate(40) { i =>
    (i.toLong, s"d${i % 4}", ((i * 37) % 100).toLong)
  }.toDF("id", "domain", "difficulty")

  test("difficulty is monotone within every domain subsequence") {
    val rows = Curriculum.order(corpus, "domain", "difficulty", "id")
      .orderBy("cur_pos").collect()
    for (d <- Seq("d0", "d1", "d2", "d3")) {
      val diffs = rows.filter(_.getAs[String]("domain") == d)
        .map(_.getAs[Long]("difficulty")).toSeq
      assert(diffs == diffs.sorted, s"domain $d not easy-first")
    }
  }

  test("consecutive global positions cycle through the domains") {
    val rows = Curriculum.order(corpus, "domain", "difficulty", "id")
      .orderBy("cur_pos").collect()
    assert(rows.map(_.getAs[Long]("cur_pos")).toSeq == (0L until 40L))
    val cycle = rows.take(8).map(_.getAs[String]("domain")).toSeq
    assert(cycle == Seq("d0", "d1", "d2", "d3", "d0", "d1", "d2", "d3"))
  }

  test("uneven domains keep positions unique (holes, never collisions)") {
    val uneven = Seq.tabulate(10)(i => (i.toLong, if (i < 7) "a" else "b", i.toLong))
      .toDF("id", "domain", "difficulty")
    val pos = Curriculum.order(uneven, "domain", "difficulty", "id")
      .collect().map(_.getAs[Long]("cur_pos")).toSeq
    assert(pos.distinct.length == pos.length)
  }

  test("one shuffle: the domain window, nothing global") {
    val plan = Curriculum.order(corpus, "domain", "difficulty", "id")
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).length == 1, s"plan:\n$plan")
  }
}
