package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * robots.txt URL filtering per RFC 9309 — the crawl-curation step a
 * 100 TB web pipeline runs before any content lands (companion to
 * [[Warc]] ingest and the URL-canonicalization dedup in [[Dedup]];
 * the reference has no robots surface — this is pipeline-necessity
 * coverage like the rest of the curation ladder).
 *
 * Implemented per the published RFC 9309 (Robots Exclusion Protocol):
 *   - group parsing: `User-agent:` lines open a group (consecutive
 *     agent lines share it), `Allow:` / `Disallow:` rules attach to
 *     the open groups; field names are case-insensitive; `#` starts
 *     a comment; an empty Disallow means "allow all" and contributes
 *     no rule
 *   - agent resolution: the group whose agent token is the LONGEST
 *     case-insensitive prefix of the product token wins; `*` groups
 *     apply only when no specific group matched
 *   - rule matching: patterns anchor at the path start; `*` matches
 *     any span, `$` at pattern end anchors the path end
 *   - precedence: the MOST SPECIFIC match wins — longest pattern (in
 *     octets, `$` excluded) first; on an allow/disallow tie, ALLOW
 *     wins; no match at all ⇒ allowed
 *
 * Scale shape: robots files are per-HOST and tiny; the decision table
 * compiles once per host and the URL table joins it on the host key —
 * a broadcast join against the (small) robots side at any corpus
 * scale, never a per-URL refetch/reparse of the same robots text.
 */
object Robots {

  /** One parsed rule: allow/disallow + its pattern, with the
    * specificity length RFC 9309 ranks by (pattern octets, `$`
    * excluded). */
  final case class Rule(allow: Boolean, pattern: String) {
    def specificity: Int =
      if (pattern.endsWith("$")) pattern.length - 1 else pattern.length
  }

  private final class Group(val agent: String) {
    val rules = scala.collection.mutable.ArrayBuffer.empty[Rule]
    var delay: Option[Double] = None // Crawl-delay seconds, first wins
  }

  /** Shared group walk: parse all groups, then resolve agent
    * precedence (longest specific prefix; `*` only as fallback). */
  private def chosenGroups(text: String, agent: String): Seq[Group] = {
    if (text == null) return Nil
    val agentLc = agent.toLowerCase(java.util.Locale.ROOT)
    val groups = scala.collection.mutable.ArrayBuffer.empty[Group]
    var openAgents: List[Group] = Nil
    var lastWasAgent = false
    text.split("\n").foreach { raw =>
      val line = raw.takeWhile(_ != '#').trim
      val colon = line.indexOf(':')
      if (colon > 0) {
        val field = line.substring(0, colon).trim
          .toLowerCase(java.util.Locale.ROOT)
        val value = line.substring(colon + 1).trim
        field match {
          case "user-agent" if value.isEmpty =>
            // a valueless user-agent line is invalid per RFC 9309:
            // drop it AND orphan any rules that follow it (they must
            // not leak into the previous group)
            openAgents = Nil
            lastWasAgent = false
          case "user-agent" =>
            val g = new Group(value.toLowerCase(java.util.Locale.ROOT))
            groups += g
            openAgents = if (lastWasAgent) g :: openAgents else List(g)
            lastWasAgent = true
          case "allow" | "disallow" =>
            lastWasAgent = false
            // an empty Disallow means allow-all: no rule
            if (value.nonEmpty)
              openAgents.foreach(_.rules += Rule(field == "allow", value))
          case "crawl-delay" =>
            // the de-facto extension (not in RFC 9309, honored by
            // several major crawlers): seconds, fractions allowed;
            // an unparseable value is ignored, first valid one wins
            lastWasAgent = false
            value.toDoubleOption.filter(d => d >= 0 && d.isFinite)
              .foreach(d => openAgents.foreach(g =>
                if (g.delay.isEmpty) g.delay = Some(d)))
          case _ => lastWasAgent = false // sitemap, unknown
        }
      }
    }
    val specific = groups.filter(g =>
      g.agent.nonEmpty && g.agent != "*" && agentLc.startsWith(g.agent))
    if (specific.nonEmpty) {
      val best = specific.map(_.agent.length).max
      specific.filter(_.agent.length == best).toSeq
    } else groups.filter(_.agent == "*").toSeq
  }

  /** Parse a robots.txt body into the rule list for `agent` (product
    * token, e.g. "graftbot"), resolving group membership and agent
    * precedence per RFC 9309. Unknown fields and comments are
    * skipped; a missing group yields no rules (allow all). */
  def parseRobots(text: String, agent: String): Seq[Rule] =
    chosenGroups(text, agent).flatMap(_.rules)

  /** The applicable group's Crawl-delay for `agent` in MILLISECONDS
    * (rounded), resolved with the same precedence as the rules; None
    * when the group declares none (callers fall back to their own
    * politeness default). */
  def crawlDelayMs(text: String, agent: String): Option[Long] =
    chosenGroups(text, agent).flatMap(_.delay).headOption
      .map(d => math.round(d * 1000.0))

  /** RFC 9309 pattern match against a path: anchored at the start,
    * `*` spans anything, trailing `$` anchors the end. Iterative
    * greedy-with-backtrack over the `*` split points. */
  def patternMatches(pattern: String, path: String): Boolean = {
    val (pat, anchored) =
      if (pattern.endsWith("$")) (pattern.dropRight(1), true) else (pattern, false)
    val parts = pat.split("\\*", -1)
    var pos = 0
    var i = 0
    while (i < parts.length) {
      val p = parts(i)
      if (i == 0) {
        if (!path.startsWith(p)) return false
        pos = p.length
      } else {
        val at =
          if (i == parts.length - 1 && anchored) {
            // last literal must sit at the end
            val want = path.length - p.length
            if (want >= pos && path.regionMatches(want, p, 0, p.length)) want
            else -1
          } else path.indexOf(p, pos)
        if (at < 0) return false
        pos = at + p.length
      }
      i += 1
    }
    if (anchored) pos == path.length else true
  }

  /** Decide one path against parsed rules: most-specific match wins,
    * allow wins specificity ties, no match allows. */
  def isAllowed(rules: Seq[Rule], path: String): Boolean = {
    var bestSpec = -1
    var bestAllow = true
    rules.foreach { r =>
      if (patternMatches(r.pattern, path)) {
        val s = r.specificity
        if (s > bestSpec || (s == bestSpec && r.allow && !bestAllow)) {
          bestSpec = s; bestAllow = r.allow
        }
      }
    }
    bestSpec == -1 || bestAllow
  }

  /** Filter a URL table against per-host robots bodies: `urls`
    * carries (hostCol, pathCol), `robots` carries (hostCol, textCol).
    * The robots side parses ONCE per host — on the (tiny) robots
    * DataFrame, BEFORE the broadcast, into a compact rules column —
    * so at 100 TB the URL table never shuffles and no host's robots
    * text is re-parsed per-URL; the per-row work is only the pattern
    * match. Left join: hosts with no robots file allow everything.
    * Rules travel as flagged strings ("a<pattern>" / "d<pattern>") to
    * keep the broadcast row format trivial. */
  def filterUrls(urls: DataFrame, robots: DataFrame, agent: String,
                 hostCol: String = "host", pathCol: String = "path",
                 textCol: String = "robots_txt"): DataFrame = {
    val parse = udf((text: String) =>
      parseRobots(text, agent).map(r =>
        (if (r.allow) "a" else "d") + r.pattern))
    val decide = udf((rules: Seq[String], path: String) =>
      isAllowed(rules.map(s => Rule(s.charAt(0) == 'a', s.substring(1))),
        if (path == null) "/" else path))
    val parsed = robots.withColumn("__rules", parse(col(textCol))).drop(textCol)
    urls.join(broadcast(parsed), Seq(hostCol), "left")
      .withColumn("allowed",
        when(col("__rules").isNull, lit(true))
          .otherwise(decide(col("__rules"), col(pathCol))))
      .drop("__rules")
  }

  /** Sitemap DISCOVERY — the hop that connects [[filterUrls]] to
    * [[Sitemap]]: `Sitemap:` lines in robots.txt are how a crawler
    * learns where a site's sitemaps live in the first place
    * (sitemaps.org protocol; RFC 9309 carries the field through as a
    * global, NON-group member — it applies regardless of which
    * user-agent group surrounds it, which is why this is a separate
    * pass from the group walk above). Field name case-insensitive,
    * `#` comments stripped with the same rule as the group parser,
    * the value is the first non-space run (URIs carry no spaces), and
    * a field name that merely STARTS with "sitemap" (e.g.
    * "Sitemapfoo:") does not match.
    *
    * Output: one row per declared sitemap — (host, pos, sitemap_url),
    * pos = the line's rank among the file's sitemap lines, document
    * order. Zero-UDF regexp algebra over the line array, so an oracle
    * replays it; hosts declaring none emit nothing (posexplode drops
    * the empty array). Scale shape: a stateless scan of the per-host
    * robots table (tiny by construction). */
  def sitemapDiscovery(robots: DataFrame, hostCol: String = "host",
                       textCol: String = "robots_txt"): DataFrame = {
    val urls = filter(
      transform(split(col(textCol), "\n"),
        l => regexp_extract(regexp_replace(l, "#.*", ""),
          "(?i)^\\s*sitemap\\s*:\\s*(\\S+)", 1)),
      u => u =!= "")
    robots.select(col(hostCol).as("host"), posexplode(urls))
      .select(col("host"), col("pos").cast("long").as("pos"),
        col("col").as("sitemap_url"))
  }
}
