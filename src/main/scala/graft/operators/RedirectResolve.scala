package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Redirect-chain resolution — the missing rung between fetching and
 * canonicalization in the crawl loop: a crawl log is full of 3xx hops
 * (http→https, apex→www, trailing-slash, moved pages), and every
 * downstream stage (dedup, anchor aggregation, frontier re-seeding)
 * wants each URL's TERMINAL location plus how many hops it took,
 * with loops and too-deep chains flagged instead of followed forever.
 *
 * Reference surface: the reference consumes crawled corpora
 * (`neurondb--1.0.sql` ingest functions); redirect resolution is the
 * standard crawler post-pass (browsers cap chains at ~20, most
 * crawlers at 5-10) re-expressed Spark-first.
 *
 * Scale shape — POINTER DOUBLING, not hop-by-hop: the redirect map
 * (only the 3xx rows, tiny next to the corpus) is composed with
 * itself ceil(log2(maxHops)) times — each round a self equi-join on
 * dst=src that doubles the distance every entry has advanced — and
 * the 100 TB corpus then joins the resolved map ONCE. A naive walk
 * would re-join the full corpus maxHops times; here the corpus moves
 * through exactly one shuffle (or zero, broadcast, when the map is
 * small) regardless of chain depth.
 */
object RedirectResolve {

  /** Compose the redirect edge set `(src, dst)` into a terminal map
    * `src -> (final_url, hops, resolved)`: `final_url` is the first
    * URL reached that does not itself redirect, `hops` counts edges
    * taken, and `resolved=false` marks chains that are still inside
    * the map after `maxHops` hops — loops (a→b→a) and chains deeper
    * than the cap, exactly the rows a polite crawler refuses to
    * follow. Unresolved rows report `(src, maxHops)` — "stayed put
    * after walking the cap" — so the output is independent of the
    * doubling order. Duplicate `src` rows keep the lexicographically
    * first `dst` (deterministic under re-crawl noise). */
  def resolveMap(redirects: DataFrame, srcCol: String, dstCol: String,
                 maxHops: Int = 8): DataFrame = {
    require(maxHops >= 1, "maxHops must be >= 1")
    // one edge per src, deterministically
    val edges = redirects
      .groupBy(col(srcCol).as("src"))
      .agg(min(col(dstCol)).as("dst"))
    var m = edges.select(col("src"), col("dst"), lit(1L).as("hops"))
    var reach = 1
    while (reach < maxHops) {
      // m2(x) = m(m(x)) where defined; entries already at a terminal
      // (dst not a key) pass through unchanged via the left join
      val nxt = m.select(col("src").as("j_src"), col("dst").as("j_dst"),
        col("hops").as("j_hops"))
      m = m.join(nxt, m("dst") === nxt("j_src"), "left")
        .select(col("src"),
          coalesce(col("j_dst"), col("dst")).as("dst"),
          (col("hops") + coalesce(col("j_hops"), lit(0L))).as("hops"))
      reach *= 2
    }
    // still pointing at a key, or terminal only beyond the cap (the
    // composed reach can overshoot a non-power-of-two maxHops) → loop
    // or too deep
    val keys = edges.select(col("src").as("k_src"))
    val ok = col("k_src").isNull && col("hops") <= maxHops
    m.join(keys, m("dst") === keys("k_src"), "left")
      .select(col("src"),
        when(ok, col("dst")).otherwise(col("src")).as("final_url"),
        when(ok, col("hops")).otherwise(lit(maxHops.toLong)).as("hops"),
        ok.as("resolved"))
  }

  /** Resolve every URL of `urls` through the redirect map: terminal
    * URL (itself when it never redirects), hop count, and the
    * resolved flag. The corpus-side join is the ONLY place the big
    * table moves. */
  def resolve(urls: DataFrame, urlCol: String,
              redirects: DataFrame, srcCol: String, dstCol: String,
              maxHops: Int = 8): DataFrame = {
    val m = resolveMap(redirects, srcCol, dstCol, maxHops)
      .select(col("src"), col("final_url").as("m_final"),
        col("hops").as("m_hops"), col("resolved").as("m_resolved"))
    urls.join(m, urls(urlCol) === m("src"), "left")
      .drop("src")
      .withColumn("final_url", coalesce(col("m_final"), col(urlCol)))
      .withColumn("hops", coalesce(col("m_hops"), lit(0L)))
      .withColumn("resolved", coalesce(col("m_resolved"), lit(true)))
      .drop("m_final", "m_hops", "m_resolved")
  }
}
