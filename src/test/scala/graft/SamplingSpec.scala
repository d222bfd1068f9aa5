package graft

import org.apache.spark.sql.functions._
import graft.operators.Sampling

class SamplingSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val ev = Tables.read(spark, "/root/testdata/sf0.001", "events").cache()

  test("hash sample is deterministic and close to the asked fraction") {
    val a = Sampling.hashSample(ev, "event_id", 0.2).select("event_id").as[Long].collect().toSet
    val b = Sampling.hashSample(ev, "event_id", 0.2).select("event_id").as[Long].collect().toSet
    assert(a == b)
    val frac = a.size.toDouble / ev.count()
    assert(frac > 0.1 && frac < 0.3, s"fraction $frac far from 0.2")
  }

  test("sample membership is monotone in the fraction (stable under widening)") {
    val small = Sampling.hashSample(ev, "event_id", 0.1).select("event_id").as[Long].collect().toSet
    val big = Sampling.hashSample(ev, "event_id", 0.3).select("event_id").as[Long].collect().toSet
    assert(small.subsetOf(big))
  }

  test("split is a disjoint cover in the asked proportions") {
    val Seq(train, valid, test) = Sampling.split(ev, "event_id", Seq(0.8, 0.1, 0.1))
    val t = train.select("event_id").as[Long].collect().toSet
    val v = valid.select("event_id").as[Long].collect().toSet
    val s = test.select("event_id").as[Long].collect().toSet
    assert((t & v).isEmpty && (t & s).isEmpty && (v & s).isEmpty)
    assert(t.size + v.size + s.size == ev.count())
    assert(t.size > v.size && t.size > s.size)
  }

  test("fraction 1.0 is the exact identity; drift-summing fractions split without crashing") {
    // the 8-hex-digit threshold saturates at "ffffffff"; a strict < there
    // would drop keys whose md5 coord is exactly "ffffffff"
    assert(Sampling.hashSample(ev, "event_id", 1.0).count() == ev.count())
    // 0.55+0.34+0.11 accumulates to 1.0000000000000002 — must not throw,
    // and must still cover every row exactly once
    val parts = Sampling.split(ev, "event_id", Seq(0.55, 0.34, 0.11))
    assert(parts.map(_.count()).sum == ev.count())
  }

  test("mixture sample: whole copies exact, fractional copies near the dial, w=0 and absent domains drop") {
    val out = Sampling.mixtureSample(ev, "event_type", "event_id",
      Map("view" -> 0.25, "click" -> 2.5, "purchase" -> 1.0, "signup" -> 0.0)).cache()
    val base = ev.groupBy("event_type").count().as[(String, Long)].collect().toMap
    val got = out.groupBy("event_type").count().as[(String, Long)].collect().toMap
    // purchase at w=1.0 is the exact identity
    assert(got("purchase") == base("purchase"))
    // click at 2.5: two whole copies guaranteed, fractional half near 0.5
    val clickRatio = got("click").toDouble / base("click")
    assert(clickRatio >= 2.0 && (clickRatio - 2.5).abs < 0.25, s"click ratio $clickRatio")
    // rep column: whole copies are rep 0/1, fractional survivors rep 2
    val reps = out.filter($"event_type" === "click").groupBy("rep").count()
      .as[(Long, Long)].collect().toMap
    assert(reps(0L) == base("click") && reps(1L) == base("click") && reps(2L) < base("click"))
    // view at 0.25 downsampled near the dial
    val viewRatio = got("view").toDouble / base("view")
    assert((viewRatio - 0.25).abs < 0.15, s"view ratio $viewRatio")
    // weight 0 and unlisted domains vanish
    assert(!got.contains("signup") && !got.contains("error"))
    // deterministic: same spec, same rows
    val again = Sampling.mixtureSample(ev, "event_type", "event_id",
      Map("view" -> 0.25, "click" -> 2.5, "purchase" -> 1.0, "signup" -> 0.0))
      .select("event_id", "rep").as[(Long, Long)].collect().toSet
    assert(again == out.select("event_id", "rep").as[(Long, Long)].collect().toSet)
    out.unpersist()
  }

  test("stratified take returns exactly n per stratum, deterministically") {
    val out = Sampling.stratifiedTake(ev, Seq("event_type"), "event_id", n = 7)
    val counts = out.groupBy("event_type").count().as[(String, Long)].collect().toMap
    assert(counts.values.forall(_ == 7L) && counts.size == 5)
    val again = Sampling.stratifiedTake(ev, Seq("event_type"), "event_id", n = 7)
      .select("event_id").as[Long].collect().toSet
    assert(again == out.select("event_id").as[Long].collect().toSet)
  }

  test("systematic sample: exactly k copies, proportional, deterministic") {
    import spark.implicits._
    val df = (1L to 200L).map(i => (i, 10L + (i % 7) * 5L)).toDF("id", "w")
    val out = Sampling.systematicSample(df, "id", "w", k = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.map(_._3).sum == 50L, "total copies must be exactly k")
    assert(out.forall(_._3 > 0))
    // a heavy row gets its guaranteed floor(k*w/W) copies
    val W = (1L to 200L).map(i => 10L + (i % 7) * 5L).sum
    val heavy = Sampling.systematicSample(
      df.union(Seq((999L, W)).toDF("id", "w")), "id", "w", k = 50).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(heavy(999L) >= 50L * W / (2L * W), "heavy row must appear")
    // deterministic across runs
    val again = Sampling.systematicSample(df, "id", "w", k = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
  }

  test("systematic sample: zero/negative weights are excluded, k=1 picks the midpoint") {
    import spark.implicits._
    val df = Seq((1L, 0L), (2L, 10L), (3L, -5L), (4L, 10L)).toDF("id", "w")
    val out = Sampling.systematicSample(df, "id", "w", k = 1)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    // axis = [0,10) for id 2, [10,20) for id 4; midpoint t=10 lands in id 4
    assert(out.toSeq == Seq((4L, 1L)))
  }

  test("weighted reservoir: deterministic, partition-invariant, shard top-ks merge") {
    import spark.implicits._
    val rows = (1L to 800L).map(i => (i, 1L + (i % 13)))
    val df = rows.toDF("id", "w")
    val pick = Sampling.weightedReservoir(df, "id", "w", k = 50)
      .collect().map(r => (r.getLong(0), r.getFloat(2))).sortBy(_._1).toSeq
    // same result from a different partitioning (pure function of content)
    val again = Sampling.weightedReservoir(df.repartition(17), "id", "w", k = 50)
      .collect().map(r => (r.getLong(0), r.getFloat(2))).sortBy(_._1).toSeq
    assert(pick == again)
    // shard top-ks merge losslessly: top-50 of (top-50(left) U top-50(right))
    val (l, r) = rows.splitAt(357)
    val merged = Sampling.weightedReservoir(
      Sampling.weightedReservoir(l.toDF("id", "w"), "id", "w", 50)
        .select(col("id"), col("weight").as("w"))
        .union(Sampling.weightedReservoir(r.toDF("id", "w"), "id", "w", 50)
          .select(col("id"), col("weight").as("w"))),
      "id", "w", k = 50)
      .collect().map(x => (x.getLong(0), x.getFloat(2))).sortBy(_._1).toSeq
    assert(merged == pick, "shard-merged reservoir must equal the global draw")
  }

  test("group reservoir: independent per-group draws, each group's global twin") {
    import spark.implicits._
    val rows = (1L to 600L).map(i => (s"g${i % 3}", i, 1L + (i % 11)))
    val df = rows.toDF("g", "id", "w")
    val grouped = Sampling.weightedReservoirByGroup(df, "g", "id", "w", k = 15)
      .select("g", "id").as[(String, Long)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    assert(grouped.keySet == Set("g0", "g1", "g2"))
    assert(grouped.values.forall(_.size == 15))
    // each group's draw equals the GLOBAL reservoir run on that group alone
    for (g <- Seq("g0", "g1", "g2")) {
      val solo = Sampling.weightedReservoir(
        rows.filter(_._1 == g).map(t => (t._2, t._3)).toDF("id", "w"),
        "id", "w", k = 15).select("id").as[Long].collect().toSet
      assert(solo == grouped(g), s"group $g must match its global twin")
    }
  }

  test("weighted reservoir: inclusion tracks weight; zero weights excluded") {
    import spark.implicits._
    // two strata: ids 1..300 weight 1, ids 301..600 weight 30
    val df = ((1L to 300L).map((_, 1L)) ++ (301L to 600L).map((_, 30L))).toDF("id", "w")
    val got = Sampling.weightedReservoir(df, "id", "w", k = 100)
      .collect().map(_.getLong(0))
    val heavy = got.count(_ > 300L)
    assert(heavy > 80, s"heavy stratum should dominate the draw, got $heavy/100")
    val withZero = Sampling.weightedReservoir(
      df.union(Seq((999L, 0L)).toDF("id", "w")), "id", "w", k = 601)
      .collect().map(_.getLong(0))
    assert(!withZero.contains(999L) && withZero.length == 600)
  }

  test("temperatureMixture: quotas sum to budget exactly") {
    val df = (0 until 900).map(i =>
      (i.toLong, if (i < 600) "big" else if (i < 850) "mid" else "tiny"))
      .toDF("id", "dom")
    val out = Sampling.temperatureMixture(df, "dom", "id", budget = 100L)
      .collect().map(r => (r.getAs[String]("dom"), r.getAs[Long]("quota"),
        r.getAs[Long]("n_sel"), r.getAs[Long]("n_docs"))).sortBy(_._1)
    assert(out.map(_._2).sum == 100L, s"quotas ${out.toSeq}")
    assert(out.forall { case (_, q, s, n) => s == math.min(q, n) })
  }

  test("temperatureMixture: tau=1/2 upweights small domains vs proportional") {
    val df = (0 until 1100).map(i =>
      (i.toLong, if (i < 1000) "big" else "small")).toDF("id", "dom")
    val out = Sampling.temperatureMixture(df, "dom", "id", budget = 110L)
      .collect().map(r => (r.getAs[String]("dom"), r.getAs[Long]("quota"))).toMap
    // proportional would give small 10; sqrt scaling gives ~110*10/(100+10)/... :
    // s_big = 1024*sqrt(1000) ~ 32381, s_small = 1024*10 = 10240 ->
    // small quota ~ 110 * 10240 / 42621 ~ 26
    assert(out("small") > 15L, s"small quota ${out("small")} not upweighted")
    assert(out("big") + out("small") == 110L)
  }

  test("temperatureMixture: over-sized quota is capped, visible as n_sel < quota") {
    val df = (0 until 7).map(i => (i.toLong, if (i < 2) "tiny" else "big"))
      .toDF("id", "dom")
    val out = Sampling.temperatureMixture(df, "dom", "id", budget = 6L)
      .collect().map(r => (r.getAs[String]("dom"), r.getAs[Long]("quota"),
        r.getAs[Long]("n_sel"))).sortBy(_._1)
    val tiny = out.find(_._1 == "tiny").get
    assert(tiny._2 >= 2L || tiny._3 == math.min(tiny._2, 2L))
    out.foreach { case (d, q, s) =>
      val n = if (d == "tiny") 2L else 5L
      assert(s == math.min(q, n), s"$d: n_sel $s quota $q")
    }
  }

  test("temperatureMixture: deterministic membership (id_sum stable)") {
    val df = (0 until 500).map(i => (i.toLong, s"d${i % 3}")).toDF("id", "dom")
    val a = Sampling.temperatureMixture(df, "dom", "id", 60L)
      .collect().map(r => (r.getString(0), r.getAs[Long]("id_sum"))).sortBy(_._1).toSeq
    val b = Sampling.temperatureMixture(df, "dom", "id", 60L)
      .collect().map(r => (r.getString(0), r.getAs[Long]("id_sum"))).sortBy(_._1).toSeq
    assert(a == b)
  }
}
