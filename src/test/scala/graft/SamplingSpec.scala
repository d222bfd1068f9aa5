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
}
