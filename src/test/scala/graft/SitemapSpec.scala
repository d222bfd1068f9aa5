package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Sitemap

/** sitemaps.org protocol invariants: both document kinds parse,
  * optional fields default empty, loc-less entries drop, and the
  * XXE / entity-bomb hardening refuses DOCTYPEs outright. */
class SitemapSpec extends AnyFunSuite {

  test("urlset parses with optional fields present and absent") {
    val xml =
      """<?xml version="1.0" encoding="UTF-8"?>
        |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |  <url><loc>http://a.example/1</loc>
        |    <lastmod>2024-03-05</lastmod>
        |    <changefreq>daily</changefreq><priority>0.8</priority></url>
        |  <url><loc>http://a.example/2</loc></url>
        |  <url><lastmod>2024-01-01</lastmod></url>
        |</urlset>""".stripMargin
    val es = Sitemap.parseSitemap(xml).get
    assert(es.map(_.loc) == Seq("http://a.example/1", "http://a.example/2"),
      "loc-less entry must drop")
    assert(es.head.kind == "urlset" && es.head.lastmod == "2024-03-05" &&
      es.head.changefreq == "daily" && es.head.priority == "0.8")
    assert(es(1).lastmod == "" && es(1).priority == "")
  }

  test("sitemapindex parses as the recursive frontier kind") {
    val xml =
      """<sitemapindex>
        |  <sitemap><loc>http://a.example/s1.xml</loc>
        |    <lastmod>2024-02-02</lastmod></sitemap>
        |  <sitemap><loc>http://a.example/s2.xml</loc></sitemap>
        |</sitemapindex>""".stripMargin
    val es = Sitemap.parseSitemap(xml).get
    assert(es.map(_.loc) ==
      Seq("http://a.example/s1.xml", "http://a.example/s2.xml"))
    assert(es.forall(_.kind == "sitemapindex"))
  }

  test("namespace-prefixed sitemaps match on local names") {
    val xml =
      """<sm:urlset xmlns:sm="http://www.sitemaps.org/schemas/sitemap/0.9">
        |  <sm:url><sm:loc>http://a.example/ns1</sm:loc>
        |    <sm:priority>0.5</sm:priority></sm:url>
        |</sm:urlset>""".stripMargin
    val es = Sitemap.parseSitemap(xml).get
    assert(es.map(_.loc) == Seq("http://a.example/ns1"))
    assert(es.head.kind == "urlset" && es.head.priority == "0.5")
  }

  test("untrusted-input hardening: DOCTYPE refused, malformed refused") {
    val xxe =
      """<?xml version="1.0"?>
        |<!DOCTYPE urlset [<!ENTITY x SYSTEM "file:///etc/passwd">]>
        |<urlset><url><loc>&x;</loc></url></urlset>""".stripMargin
    assert(Sitemap.parseSitemap(xxe).isEmpty, "DOCTYPE must refuse")
    val bomb =
      """<!DOCTYPE lolz [<!ENTITY a "ha"><!ENTITY b "&a;&a;&a;&a;&a;">]>
        |<urlset><url><loc>&b;</loc></url></urlset>""".stripMargin
    assert(Sitemap.parseSitemap(bomb).isEmpty, "entity bomb must refuse")
    assert(Sitemap.parseSitemap("<urlset><url>").isEmpty, "unclosed tags")
    assert(Sitemap.parseSitemap("not xml at all").isEmpty)
    assert(Sitemap.parseSitemap("").isEmpty)
    assert(Sitemap.parseSitemap(null).isEmpty)
    assert(Sitemap.parseSitemap("<other><loc>x</loc></other>").isEmpty,
      "unknown root must refuse")
  }
}
