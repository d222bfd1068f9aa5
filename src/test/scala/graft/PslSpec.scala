package graft

import graft.operators.Psl

/** Public-Suffix-List invariants: longest-match wins, wildcard rules
  * consume exactly one label, exception rules beat wildcards and drop
  * their leftmost label, the implicit * rule covers unlisted TLDs, and
  * a host that IS a public suffix has no registrable domain. */
class PslSpec extends SparkSpecBase {

  import spark.implicits._

  private val rules =
    Seq("com", "co.uk", "uk", "io", "github.io", "*.ck", "!www.ck").toDF("rule")

  private def reg(hosts: String*) = {
    val df = hosts.zipWithIndex.map { case (h, i) => (i.toLong, h) }
      .toDF("id", "host")
    Psl.registrable(df, "id", "host", rules).collect()
      .map(r => r.getAs[String]("host") ->
        (r.getAs[String]("public_suffix"), r.getAs[String]("registrable"),
          r.getAs[Boolean]("is_public_suffix"))).toMap
  }

  test("normal rules: longest match wins over shorter ones") {
    val m = reg("a.b.example.com", "x.shop.co.uk", "deep.y.github.io")
    assert(m("a.b.example.com") == (("com", "example.com", false)))
    // co.uk (2 labels) beats uk (1 label)
    assert(m("x.shop.co.uk") == (("co.uk", "shop.co.uk", false)))
    // github.io (2 labels) beats io (1 label)
    assert(m("deep.y.github.io") == (("github.io", "y.github.io", false)))
  }

  test("wildcard *.ck consumes exactly one label") {
    val m = reg("foo.bar.ck", "bar.ck", "ck")
    assert(m("foo.bar.ck") == (("bar.ck", "foo.bar.ck", false)))
    // bar.ck IS a public suffix under *.ck
    assert(m("bar.ck") == (("bar.ck", null, true)))
    // bare ck matches nothing listed -> implicit * -> ck is the suffix
    assert(m("ck") == (("ck", null, true)))
  }

  test("exception !www.ck beats the wildcard and drops its first label") {
    val m = reg("www.ck", "sub.www.ck")
    assert(m("www.ck") == (("ck", "www.ck", false)))
    // deeper host: www.ck candidate still matches the exception
    assert(m("sub.www.ck") == (("ck", "www.ck", false)))
  }

  test("implicit * rule: unlisted TLD's last label is the suffix") {
    val m = reg("a.b.unknowntld", "unknowntld")
    assert(m("a.b.unknowntld") == (("unknowntld", "b.unknowntld", false)))
    assert(m("unknowntld") == (("unknowntld", null, true)))
  }

  test("uppercase and FQDN trailing-dot hosts normalize; output echoes input") {
    val m = reg("WWW.Example.COM", "shop.co.uk.")
    // keys are the INPUT hosts, verbatim
    assert(m("WWW.Example.COM") == (("com", "example.com", false)))
    assert(m("shop.co.uk.") == (("co.uk", "shop.co.uk", false)))
  }

  test("null hosts keep their row with all-null results") {
    val df = Seq[(java.lang.Long, String)]((1L, "a.example.com"), (2L, null))
      .toDF("id", "host")
    val out = Psl.registrable(df, "id", "host", rules).collect()
      .map(r => r.getAs[Long]("id") -> r).toMap
    assert(out.size == 2, "output rows must equal input rows")
    assert(out(2L).getAs[String]("public_suffix") == null)
    assert(out(2L).getAs[String]("registrable") == null)
    assert(!out(2L).getAs[Boolean]("is_public_suffix"))
    assert(out(1L).getAs[String]("registrable") == "example.com")
  }

  test("host equal to a listed suffix is public, no registrable") {
    val m = reg("github.io", "co.uk", "com")
    assert(m("github.io") == (("github.io", null, true)))
    assert(m("co.uk") == (("co.uk", null, true)))
    assert(m("com") == (("com", null, true)))
  }
}
