package graft.operators

import org.w3c.dom.Element

/**
 * Sitemap parsing per the sitemaps.org protocol — the crawl-frontier
 * EXPANSION step beside [[Robots]] (a crawler discovers URLs from
 * sitemaps and gates them through robots.txt; reference surface: none,
 * this is pipeline-necessity coverage like the rest of the curation
 * ladder). Handles BOTH document kinds: `<urlset>` leaves (url ->
 * loc/lastmod/changefreq/priority) and `<sitemapindex>` index files
 * (sitemap -> loc/lastmod), which a frontier walks recursively.
 *
 * Parsing uses the JDK's DOM builder HARDENED for untrusted crawl
 * input: DOCTYPE declarations are refused outright (XXE / billion-
 * laughs entity expansion — the classic attack vector for XML from
 * the open web), XInclude and entity expansion are disabled. A
 * malformed document returns None (fail-open per-document, like every
 * ingest rung here — one bad sitemap must not kill the batch).
 *
 * Scale shape: stateless per-row map, zero shuffle; sitemaps are
 * bounded (50k URLs / 50 MB per the protocol) so per-row DOM cost is
 * capped by the format itself.
 */
object Sitemap {

  /** One entry: `loc` always present; the rest optional ("" = absent).
    * `kind` is "urlset" or "sitemapindex". */
  final case class SitemapEntry(kind: String, loc: String, lastmod: String,
                                changefreq: String, priority: String)

  // one configured builder per executor thread (builders are not
  // thread-safe; factory discovery via newInstance() is a service-
  // loader walk that must NOT run per row) — reset() before each parse
  private val builders =
    new ThreadLocal[javax.xml.parsers.DocumentBuilder] {
      override def initialValue(): javax.xml.parsers.DocumentBuilder = {
        val dbf = javax.xml.parsers.DocumentBuilderFactory.newInstance()
        // untrusted-input hardening: no DOCTYPE (kills XXE and entity
        // bombs), no XInclude, no entity expansion
        dbf.setFeature(
          "http://apache.org/xml/features/disallow-doctype-decl", true)
        dbf.setXIncludeAware(false)
        dbf.setExpandEntityReferences(false)
        // namespace-aware so prefixed documents (<sm:urlset
        // xmlns:sm="...">) match on LOCAL names like real sitemaps do
        dbf.setNamespaceAware(true)
        dbf.newDocumentBuilder()
      }
    }

  @inline private def localName(n: org.w3c.dom.Node): String = {
    val ln = n.getLocalName
    if (ln != null) ln else n.getNodeName
  }

  private def childText(e: Element, tag: String): String = {
    val nodes = e.getElementsByTagNameNS("*", tag)
    if (nodes.getLength == 0) "" else nodes.item(0).getTextContent.trim
  }

  /** Parse one sitemap document; None on malformed XML, a DOCTYPE, or
    * a root that is neither urlset nor sitemapindex. Entries missing
    * `loc` are skipped (the protocol requires loc). */
  def parseSitemap(xml: String): Option[Seq[SitemapEntry]] =
    try {
      require(xml != null && xml.nonEmpty, "empty document")
      val builder = builders.get()
      builder.reset()
      val doc = builder.parse(
        new java.io.ByteArrayInputStream(xml.getBytes("UTF-8")))
      val root = doc.getDocumentElement
      val (kind, itemTag) = localName(root) match {
        case "urlset" => ("urlset", "url")
        case "sitemapindex" => ("sitemapindex", "sitemap")
        case other => throw new IllegalArgumentException(s"root <$other>")
      }
      val items = root.getElementsByTagNameNS("*", itemTag)
      val out = Seq.newBuilder[SitemapEntry]
      var i = 0
      while (i < items.getLength) {
        val e = items.item(i).asInstanceOf[Element]
        val loc = childText(e, "loc")
        if (loc.nonEmpty)
          out += SitemapEntry(kind, loc, childText(e, "lastmod"),
            childText(e, "changefreq"), childText(e, "priority"))
        i += 1
      }
      Some(out.result())
    } catch { case _: Exception => None }
}
