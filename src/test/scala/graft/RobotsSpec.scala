package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Robots
import graft.operators.Robots.Rule

/** RFC 9309 invariants: the spec's own matching examples, group
  * resolution with longest-agent precedence, most-specific-match rule
  * precedence with allow winning ties, and the empty-Disallow /
  * comment / case-insensitivity lexical rules. */
class RobotsSpec extends AnyFunSuite {

  test("pattern matching: the RFC 9309 / Google reference examples") {
    // /fish matches /fish, /fishheads, /fish/salmon.html; not /Fish
    assert(Robots.patternMatches("/fish", "/fish"))
    assert(Robots.patternMatches("/fish", "/fishheads"))
    assert(Robots.patternMatches("/fish", "/fish/salmon.html"))
    assert(!Robots.patternMatches("/fish", "/Fish.asp"))
    assert(!Robots.patternMatches("/fish", "/catfish"))
    // /fish* is equivalent to /fish
    assert(Robots.patternMatches("/fish*", "/fishheads/yummy.html"))
    assert(!Robots.patternMatches("/fish*", "/desert/fish"))
    // /fish/ matches the directory only
    assert(Robots.patternMatches("/fish/", "/fish/salmon"))
    assert(!Robots.patternMatches("/fish/", "/fish"))
    // /*.php
    assert(Robots.patternMatches("/*.php", "/index.php"))
    assert(Robots.patternMatches("/*.php", "/folder/filename.php?params"))
    assert(!Robots.patternMatches("/*.php", "/windows.PHP"))
    // /*.php$ anchors the end
    assert(Robots.patternMatches("/*.php$", "/filename.php"))
    assert(!Robots.patternMatches("/*.php$", "/filename.php?params"))
    assert(!Robots.patternMatches("/*.php$", "/filename.php5"))
    // /fish*.php
    assert(Robots.patternMatches("/fish*.php", "/fishheads/catfish.php?p=2"))
    assert(!Robots.patternMatches("/fish*.php", "/Fish.PHP"))
    // multiple stars backtrack
    assert(Robots.patternMatches("/a*b*c", "/a-x-b-y-b-z-c"))
    assert(!Robots.patternMatches("/a*b*c", "/a-x-c"))
  }

  test("precedence: most specific match wins; allow wins exact ties") {
    val rules = Seq(Rule(false, "/p"), Rule(true, "/p/page"))
    assert(Robots.isAllowed(rules, "/p/page.html"), "longer allow wins")
    assert(!Robots.isAllowed(rules, "/p/other"), "shorter disallow holds")
    // the RFC's tie rule: equivalent patterns -> allow
    val tie = Seq(Rule(true, "/page"), Rule(false, "/page"))
    assert(Robots.isAllowed(tie, "/page"))
    // $ does not count toward specificity
    val dollar = Seq(Rule(false, "/x$"), Rule(true, "/x"))
    assert(Robots.isAllowed(dollar, "/x"), "equal octets -> allow wins")
    // no match at all allows
    assert(Robots.isAllowed(rules, "/elsewhere"))
    assert(Robots.isAllowed(Nil, "/anything"))
  }

  test("group resolution: longest agent prefix wins, * is the fallback") {
    val txt =
      """User-agent: *
        |Disallow: /all
        |
        |User-agent: graft
        |Disallow: /short
        |
        |User-agent: graftbot
        |Disallow: /long
        |""".stripMargin
    assert(Robots.parseRobots(txt, "graftbot-news").map(_.pattern) == Seq("/long"))
    assert(Robots.parseRobots(txt, "graftb").map(_.pattern) == Seq("/short"))
    assert(Robots.parseRobots(txt, "otherbot").map(_.pattern) == Seq("/all"))
    // consecutive agent lines share one rule set
    val multi =
      """User-agent: abot
        |User-agent: bbot
        |Disallow: /shared
        |""".stripMargin
    assert(Robots.parseRobots(multi, "abot").map(_.pattern) == Seq("/shared"))
    assert(Robots.parseRobots(multi, "bbot").map(_.pattern) == Seq("/shared"))
  }

  test("a valueless User-agent line is invalid: it never matches and orphans its rules") {
    val txt =
      """User-agent:
        |Disallow: /tmp
        |
        |User-agent: *
        |Disallow: /
        |""".stripMargin
    // the empty group must not count as 'specific' (it would suppress
    // the * fallback), and /tmp must not leak into any group
    assert(Robots.parseRobots(txt, "graftbot").map(_.pattern) == Seq("/"))
  }

  test("lexical rules: comments, case-insensitive fields, empty Disallow") {
    val txt =
      """# preamble comment
        |USER-AGENT: GraftBot
        |DISALLOW: /a # trailing comment
        |Allow:
        |disallow:
        |crawl-delay: 10
        |ALLOW: /a/b
        |""".stripMargin
    val rules = Robots.parseRobots(txt, "graftbot")
    assert(rules == Seq(Rule(false, "/a"), Rule(true, "/a/b")),
      rules.toString)
    assert(Robots.parseRobots(null, "x").isEmpty)
    assert(Robots.parseRobots("no rules here", "x").isEmpty)
  }

  test("Crawl-delay: group precedence, fractions, junk, and absence") {
    val txt =
      """User-agent: graftbot
        |Crawl-delay: 2.5
        |Disallow: /x
        |
        |User-agent: *
        |Crawl-delay: 9
        |""".stripMargin
    // the specific group's delay wins over the * group's decoy
    assert(Robots.crawlDelayMs(txt, "graftbot").contains(2500L))
    // an unmatched agent falls to the * group
    assert(Robots.crawlDelayMs(txt, "otherbot").contains(9000L))
    // sub-second fraction rounds to ms
    assert(Robots.crawlDelayMs("User-agent: *\nCrawl-delay: 0.25\n", "x")
      .contains(250L))
    // junk, negative, and non-finite values are ignored (None)
    assert(Robots.crawlDelayMs("User-agent: *\nCrawl-delay: soon\n", "x").isEmpty)
    assert(Robots.crawlDelayMs("User-agent: *\nCrawl-delay: -3\n", "x").isEmpty)
    assert(Robots.crawlDelayMs("User-agent: *\nCrawl-delay: NaN\n", "x").isEmpty)
    // absent entirely
    assert(Robots.crawlDelayMs("User-agent: *\nDisallow: /a\n", "x").isEmpty)
    assert(Robots.crawlDelayMs(null, "x").isEmpty)
    // the FIRST valid delay in a group wins; a later one does not override
    assert(Robots.crawlDelayMs(
      "User-agent: *\nCrawl-delay: 1\nCrawl-delay: 7\n", "x").contains(1000L))
    // a delay line before any group is orphaned, not global
    assert(Robots.crawlDelayMs("Crawl-delay: 4\nUser-agent: *\nDisallow: /a\n", "x").isEmpty)
  }
}
