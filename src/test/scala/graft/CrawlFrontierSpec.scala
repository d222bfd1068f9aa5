package graft

import org.apache.spark.sql.functions._
import graft.operators.CrawlFrontier

/** Frontier-scheduler invariants: per-host politeness spacing, the
  * per-cycle host cap, priority-then-url ordering, lane stability
  * (same host, same slot), and a single-shuffle plan. */
class CrawlFrontierSpec extends SparkSpecBase {

  import spark.implicits._

  private def frontier(n: Int, hosts: Int) =
    (0 until n).map { i =>
      (s"http://h${i % hosts}.test/p$i", s"h${i % hosts}.test", i % 3)
    }.toDF("url", "host", "priority")

  test("per-host fetches are spaced by the crawl delay, capped per cycle") {
    val out = CrawlFrontier.schedule(frontier(40, 4), "url", "host", "priority",
      delayMs = 2000L, maxPerHost = 5).collect()
    assert(out.length == 4 * 5) // 10 per host capped at 5
    val byHost = out.groupBy(_.getAs[String]("host"))
    for ((_, rows) <- byHost) {
      val offs = rows.map(_.getAs[Long]("scheduled_ms")).sorted
      assert(offs.toSeq == Seq(0L, 2000L, 4000L, 6000L, 8000L))
    }
  }

  test("within a host, higher priority fetches first; URLs break ties") {
    val df = Seq(
      ("http://a.test/low", "a.test", 1),
      ("http://a.test/hi2", "a.test", 9),
      ("http://a.test/hi1", "a.test", 9)).toDF("url", "host", "priority")
    val rows = CrawlFrontier.schedule(df, "url", "host", "priority")
      .orderBy("seq").collect()
    assert(rows.map(_.getAs[String]("url")).toSeq ==
      Seq("http://a.test/hi1", "http://a.test/hi2", "http://a.test/low"))
  }

  test("a host always lands on the same lane; lanes spread across hosts") {
    val out = CrawlFrontier.schedule(frontier(200, 40), "url", "host", "priority")
      .select("host", "slot").distinct().collect()
    // one slot per host
    assert(out.groupBy(_.getString(0)).forall(_._2.length == 1))
    // 40 hosts should hit a healthy spread of the 16 lanes
    assert(out.map(_.getLong(1)).distinct.length >= 8)
    assert(out.forall(r => r.getLong(1) >= 0 && r.getLong(1) < 16))
  }

  test("non-16 slot counts: lanes stay in range, stable, and spread") {
    val out = CrawlFrontier.schedule(frontier(300, 60), "url", "host", "priority",
      slots = 40).select("host", "slot").distinct().collect()
    assert(out.groupBy(_.getString(0)).forall(_._2.length == 1)) // stable
    assert(out.forall(r => r.getLong(1) >= 0 && r.getLong(1) < 40))
    assert(out.map(_.getLong(1)).distinct.length >= 15) // 60 hosts spread
    // laneLoad works over the widened lane space too
    val load = CrawlFrontier.laneLoad(
      CrawlFrontier.schedule(frontier(40, 4), "url", "host", "priority",
        slots = 40), "host").collect()
    assert(load.map(_.getAs[Long]("n_urls")).sum == 20)
  }

  test("laneOf (JVM) equals laneExpr (Catalyst) for several slot counts") {
    val hosts = (0 until 50).map(i => s"h$i.test")
    for (slots <- Seq(1, 7, 16, 40, 256, 1000)) {
      val cols = hosts.toDF("host")
        .select(col("host"), CrawlFrontier.laneExpr(col("host"), slots).as("lane"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      hosts.foreach { h =>
        assert(cols(h) == CrawlFrontier.laneOf(h, slots),
          s"divergence for $h at slots=$slots")
      }
    }
  }

  test("slots=16 keeps the historical one-digit assignment") {
    // the first md5 hex digit IS the lane at the default slot count
    val h = "stable-host.test"
    val firstDigit = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(h.getBytes("UTF-8")).map(b => f"$b%02x").mkString
        .substring(0, 1), 16)
    assert(CrawlFrontier.laneOf(h, 16) == firstDigit)
  }

  test("per-host delays: each host spaces by its OWN delay; null falls back") {
    val df = Seq(
      ("http://slow.test/a", "slow.test", 1, 5000L),
      ("http://slow.test/b", "slow.test", 1, 5000L),
      ("http://fast.test/a", "fast.test", 1, 250L),
      ("http://fast.test/b", "fast.test", 1, 250L),
      ("http://none.test/a", "none.test", 1, -1L), // non-positive -> default
      ("http://none.test/b", "none.test", 1, -1L))
      .toDF("url", "host", "priority", "delay_ms")
    val out = CrawlFrontier.scheduleWithDelays(df, "url", "host", "priority",
      "delay_ms", defaultDelayMs = 900L).collect()
      .map(r => (r.getAs[String]("url"), r.getAs[Long]("scheduled_ms"))).toMap
    assert(out("http://slow.test/b") == 5000L)
    assert(out("http://fast.test/b") == 250L)
    assert(out("http://none.test/b") == 900L)
    assert(Seq("http://slow.test/a", "http://fast.test/a", "http://none.test/a")
      .forall(out(_) == 0L))
  }

  test("laneLoad reports per-lane urls, hosts, and makespan") {
    val sched = CrawlFrontier.schedule(frontier(40, 4), "url", "host", "priority",
      delayMs = 1000L, maxPerHost = 5)
    val load = CrawlFrontier.laneLoad(sched, "host").collect()
    assert(load.map(_.getAs[Long]("n_urls")).sum == 20)
    assert(load.forall(_.getAs[Long]("makespan_ms") == 4000L))
  }

  test("the plan shuffles ONCE (the host window) and nothing else") {
    val plan = CrawlFrontier.schedule(frontier(40, 4), "url", "host", "priority")
      .queryExecution.executedPlan.toString
    val shuffles = "Exchange".r.findAllIn(plan).length
    assert(shuffles == 1, s"expected 1 shuffle, saw $shuffles:\n$plan")
  }

  test("robots sitemap discovery: case, comments, decoy fields, document order") {
    import graft.operators.Robots
    val robots = Seq(
      ("a.test",
        "# hdr\nUser-agent: *\nDisallow: /x\n" +
          "Sitemap: https://a.test/s1.xml\n" +
          "sitemap:https://a.test/s2.xml # trailing comment\n" +
          "Sitemapfoo: https://bad.example/decoy.xml\n" +
          "  SITEMAP :  https://a.test/s3.xml\n"),
      ("b.test", "User-agent: *\nDisallow: /\n"), // declares none
      ("c.test", "#Sitemap: https://c.test/commented-out.xml\n"))
      .toDF("host", "robots_txt")
    val out = Robots.sitemapDiscovery(robots).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).sorted
    assert(out.toSeq == Seq(
      ("a.test", 0L, "https://a.test/s1.xml"),
      ("a.test", 1L, "https://a.test/s2.xml"),
      ("a.test", 2L, "https://a.test/s3.xml")), out.mkString(";"))
  }
}
