package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Ivf, Knn}
import graft.ml.Extras

/** The blocked (no-broadcast-of-data) scale paths must reproduce the
  * brute-force results: multi-probe Ivf.join at nprobe=nlists equals the
  * cross join, knnJoin's radius bound is exact at any probe width, and the
  * blocked classifier matches the broadcast one. */
class BlockedJoinSpec extends SparkSpecBase {
  import spark.implicits._

  private val dim = 8
  private lazy val vecs = {
    val rnd = new scala.util.Random(7)
    // 6 well-separated anchor points + jittered members → clusterable data
    val anchors = Array.fill(6)(Array.fill(dim)(rnd.nextGaussian().toFloat * 5f))
    (0 until 240).map { i =>
      val a = anchors(i % 6)
      (i.toLong, a.map(x => x + rnd.nextGaussian().toFloat * 0.3f), (i % 3).toLong)
    }
  }
  private lazy val df = vecs.toDF("id", "vec", "label").repartition(7).cache()

  test("Ivf.join with exhaustive probes equals the cross join exactly") {
    val model = Ivf.build(df, "vec", nlists = 6)
    val threshold = 2.0
    val blocked = Ivf.join(model, df, "vec", "l2", threshold, nprobe = 6)
      .filter(col("l_id") < col("r_id"))
      .select(col("l_id"), col("r_id")).as[(Long, Long)].collect().toSet
    val exact = df.select(col("id").as("a_id"), col("vec").as("a_vec"))
      .join(broadcast(df.select(col("id").as("b_id"), col("vec").as("b_vec"))),
        col("a_id") < col("b_id"))
      .withColumn("d", Knn.distCol("l2")(col("a_vec"), col("b_vec")))
      .filter(col("d") <= threshold)
      .select(col("a_id"), col("b_id")).as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty, "test data must produce pairs")
    assert(blocked == exact)
  }

  test("Ivf.join recall grows with nprobe and pairs are always a subset of exact") {
    val model = Ivf.build(df, "vec", nlists = 6)
    val exact = Ivf.join(model, df, "vec", "l2", 2.0, nprobe = 6)
      .filter(col("l_id") < col("r_id"))
      .select(col("l_id"), col("r_id")).as[(Long, Long)].collect().toSet
    val recalls = Seq(1, 3, 6).map { np =>
      val got = Ivf.join(model, df, "vec", "l2", 2.0, nprobe = np)
        .filter(col("l_id") < col("r_id"))
        .select(col("l_id"), col("r_id")).as[(Long, Long)].collect().toSet
      assert(got.subsetOf(exact), s"nprobe=$np produced a non-exact pair")
      got.size.toDouble / exact.size
    }
    assert(recalls == recalls.sorted, "recall must be monotone in nprobe")
    assert(recalls.last == 1.0)
  }

  test("knnJoin is exact at every initProbes width (radius bound)") {
    val model = Ivf.build(df, "vec", nlists = 6)
    val queries = df.filter(col("id") < 40).select(col("id").as("qid"), col("vec"))
    val brute = queries.collect().map { r =>
      val q = r.getSeq[Float](1).toArray
      val top = vecs.map { case (id, v, _) => (id, graft.functions.VectorOps.l2(q, v)) }
        .sortBy { case (id, d) => (d, id) }.take(5).map(_._1).toSeq
      r.getLong(0) -> top
    }.toMap
    for (ip <- Seq(1, 2, 6)) {
      val got = Ivf.knnJoin(model, queries, "vec", "qid", k = 5, initProbes = ip,
          tieBreak = Seq("id"))
        .select(col("qid"), col("t_id"), col("rank"))
        .collect().groupBy(_.getLong(0))
        .map { case (q, rows) => q -> rows.sortBy(_.getInt(2)).map(_.getLong(1)).toSeq }
      assert(got == brute, s"initProbes=$ip diverged from brute force")
    }
  }

  test("knnJoin carries every query-side column through to the output") {
    val model = Ivf.build(df, "vec", nlists = 4)
    val queries = df.filter(col("id") < 10)
      .select(col("id").as("qid"), col("vec"),
        lit("payload").as("extra"), (col("id") * 2).as("weight"))
    val out = Ivf.knnJoin(model, queries, "vec", "qid", k = 3, tieBreak = Seq("id"))
    assert(Seq("extra", "weight").forall(out.columns.contains),
      s"query columns dropped: ${out.columns.mkString(",")}")
    val row = out.filter(col("qid") === 0).head()
    assert(row.getAs[String]("extra") == "payload" && row.getAs[Long]("weight") == 0L)
  }

  test("recallCurve normalizes by actual truth pairs: exhaustive probe reads 1.0 on a tiny corpus") {
    // 6 rows, k=10 > eligible neighbors (excludeSelf): the old nq*k
    // denominator capped recall at 5/10 even when probing every list
    val tiny = vecs.take(6).toSeq.toDF("id", "vec", "label")
    val model = Ivf.build(tiny, "vec", nlists = 2)
    val qs = tiny.collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val curve = Ivf.recallCurve(model, qs, "id", k = 10, nprobes = Seq(1, 2))
      .collect().map(r => (r.getInt(0), r.getDouble(1))).toMap
    assert(curve(2) == 1.0, s"exhaustive probe must read 1.0, got ${curve(2)}")
  }

  test("blocked knnClassify matches the broadcast path and never broadcasts the train data") {
    val test = df.filter(col("id") < 40)
    val broadcastPath = Extras.knnClassify(df, test, "vec", "label", k = 5, idCol = "id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val blocked = Extras.knnClassifyBlocked(df, test, "vec", "label", k = 5, idCol = "id",
      nlists = 6)
    val plan = blocked.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      "blocked path must not plan a broadcast/cartesian product of the train table")
    val got = blocked.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == broadcastPath)
  }

  test("fingerprintDedup keeps exactly the exact-dedup keepers") {
    val docs = Seq(
      (1L, "alpha"), (2L, "alpha"), (3L, "beta"), (4L, "gamma"), (5L, "beta"), (6L, "delta"))
      .toDF("id", "text").repartition(3)
    val a = Dedup.fingerprintDedup(docs, "id", "text").select("id").as[Long].collect().toSet
    val b = Dedup.exactDedup(docs, "id", "text").select("id").as[Long].collect().toSet
    assert(a == b && a == Set(1L, 3L, 4L, 6L))
  }
}
