package graft

import org.apache.spark.sql.functions.col

import graft.operators.Dedup

/** URL canonicalization (`Dedup.urlCanonical`) and the canonical-key
  * dedup built on it. */
class UrlCanonSpec extends SparkSpecBase {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("url").select(Dedup.urlCanonical(col("url")).as("c"))
      .as[String].collect().toSeq

  test("case, default port, fragment, trailing slash, param order all fold") {
    val out = canon(
      "https://www.Site.com/a/b?x=1&y=2",
      "HTTPS://WWW.SITE.COM:443/a/b?y=2&x=1",
      "https://www.site.com/a//b/?x=1&y=2#frag")
    assert(out.distinct == Seq("https://www.site.com/a/b?x=1&y=2"))
  }

  test("tracking params are dropped, real params kept and sorted") {
    assert(canon("http://h.io/p?utm_source=a&b=2&fbclid=xx&a=1&gclid=g&utm_campaign=c")
      == Seq("http://h.io/p?a=1&b=2"))
  }

  test("non-default and cross-scheme ports survive") {
    assert(canon("https://h.io:8443/p", "http://h.io:443/p", "ftp://h.io:21/p")
      == Seq("https://h.io:8443/p", "http://h.io:443/p", "ftp://h.io:21/p"))
  }

  test("bare root slash and empty path are preserved") {
    assert(canon("https://h.io/", "https://h.io?b=1") ==
      Seq("https://h.io/", "https://h.io?b=1"))
  }

  test("canonicalization is idempotent (canon . canon == canon)") {
    val urls = Seq(
      "https://www.Site.com/a/b?x=1&y=2",
      "HTTPS://WWW.SITE.COM:443/a//b/?y=2&utm_source=s&x=1#f",
      "http://h.io:80/", "http://h.io:8080/p?z=9&a=0",
      "ftp://h.io:21/deep//path/", "https://h.io?b=1&utm_campaign=c")
    val once = canon(urls: _*)
    assert(canon(once: _*) == once)
  }

  test("malformed/scheme-less URLs fall back to the raw string as their key") {
    // no scheme -> raw key: two distinct malformed rows must NOT merge
    assert(canon("www.site.com/a/b?x=1", "site.org/other#frag", "://path", "")
      == Seq("www.site.com/a/b?x=1", "site.org/other#frag", "://path", ""))
    // ...and the fallback is idempotent
    assert(canon(canon("www.site.com/a/b?x=1#f"): _*)
      == Seq("www.site.com/a/b?x=1#f"))
  }

  test("well-formed EMPTY-AUTHORITY urls (file:///) keep full canonicalization") {
    val out = canon(
      "file:///docs//readme.md#top",
      "FILE:///docs/readme.md",
      "file:///docs/readme.md/")
    assert(out.distinct == Seq("file:///docs/readme.md"))
  }

  test("urlDedup groups variants under one keeper") {
    val df = Seq(
      (10L, "https://A.com/x?b=2&a=1"),
      (7L, "https://a.com:443/x/?a=1&utm_source=s&b=2"),
      (3L, "https://a.com/x#top?ignored"),
      (9L, "https://other.com/y")).toDF("doc_id", "url")
    val got = Dedup.urlDedup(df, "doc_id", "url")
      .orderBy("canon_url")
      .as[(String, Long, Long)].collect().toSeq
    // the fragment variant has no query at all once #... is dropped
    assert(got == Seq(
      ("https://a.com/x", 3L, 1L),
      ("https://a.com/x?a=1&b=2", 7L, 2L),
      ("https://other.com/y", 9L, 1L)))
  }
}
