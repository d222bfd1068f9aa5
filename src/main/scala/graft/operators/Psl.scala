package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Registrable-domain extraction per the Public Suffix List algorithm
 * (publicsuffix.org/list/) — the key a crawl pipeline actually groups
 * by: per-HOST politeness is too fine (blog1.example.com and
 * blog2.example.com share an owner) and per-TLD too coarse; dedup
 * budgets, domain reweighting, and blocklists all want the
 * REGISTRABLE domain (public suffix + one label).
 *
 * Full rule semantics: normal rules ("co.uk"), wildcard rules
 * ("*.ck" — matches any single label in the starred position), and
 * exception rules ("!www.ck" — overrides a wildcard; its effective
 * suffix drops the leftmost label). No matching rule implies the
 * implicit "*" rule: the last label is the public suffix.
 *
 * Scale shape: the rule list is a few thousand rows — ALWAYS
 * broadcast. Each host explodes into its <= |labels| candidate
 * suffixes, equi-joins the broadcast rules twice (exact key;
 * tail-after-first-label key for wildcards), and one groupBy on the
 * row id picks the prevailing rule (exception beats all, else most
 * labels). One shuffle on the id key at any corpus size; no
 * nested-loop anywhere.
 *
 * Reference surface: the reference canonicalizes URLs
 * (url_canon_dedup family); suffix-list grouping is the crawl-scale
 * extension, public-method work (Mozilla PSL algorithm).
 */
object Psl {

  /** `rules` needs one string column `rule` in PSL syntax. Output per
    * input row: host, public_suffix, registrable (null when the host
    * IS a public suffix), is_public_suffix. */
  def registrable(urls: DataFrame, idCol: String, hostCol: String,
                  rules: DataFrame): DataFrame = {
    val kind = when(col("rule").startsWith("!"), lit("exc"))
      .when(col("rule").startsWith("*."), lit("wild"))
      .otherwise(lit("norm"))
    val key = when(col("kind") === "exc", expr("substring(rule, 2)"))
      .when(col("kind") === "wild", expr("substring(rule, 3)"))
      .otherwise(col("rule"))
    // PSL files are lowercase by convention; enforce it so rule/host
    // matching stays case-insensitive end to end
    val r = rules.select(lower(col("rule")).as("rule")).withColumn("kind", kind)
      .withColumn("key", key)
      .withColumn("key_labels", size(split(col("key"), "\\.")))
    // exact-key rules (norm + exc) and wildcard rules join differently
    val rExact = r.filter(col("kind") =!= "wild")
      .select(col("key").as("ek"), col("kind").as("ekind"))
    val rWild = r.filter(col("kind") === "wild")
      .select(col("key").as("wk"), (col("key_labels") + 1).as("wlabs"))

    // hosts match case-insensitively and in non-FQDN form (PSL
    // convention): lowercase and strip one trailing dot before
    // splitting; the OUTPUT host column echoes the input verbatim.
    // Null hosts cannot explode into candidates — they are carried
    // around the pipeline and re-attached with all-null results, so
    // output rows == input rows holds (per-id joins stay total).
    val norm = lower(regexp_replace(col(hostCol), "\\.$", ""))
    val nullHosts = urls.filter(col(hostCol).isNull)
      .select(col(idCol), col(hostCol).as("host"),
        lit(null).cast("string").as("public_suffix"),
        lit(null).cast("string").as("registrable"),
        lit(false).as("is_public_suffix"))
    // all suffix candidates of the host: last k labels, k = 1..n
    val cands = urls.filter(col(hostCol).isNotNull)
      .withColumn("__labs", split(norm, "\\."))
      .withColumn("__c", explode(expr(
        """transform(sequence(1, size(__labs)),
          |  k -> struct(
          |    array_join(slice(__labs, size(__labs) - k + 1, k), '.') AS cand,
          |    k AS clabs))""".stripMargin)))
      .select(col(idCol), col(hostCol), norm.as("__h"), col("__labs"),
        col("__c.cand").as("cand"), col("__c.clabs").as("clabs"))
      // the candidate minus its leftmost label — what a wildcard star consumes
      .withColumn("tail", when(col("clabs") > 1,
        expr("array_join(slice(split(cand, '\\\\.'), 2, clabs - 1), '.')")))

    val joined = cands
      .join(broadcast(rExact), col("cand") === col("ek"), "left")
      .join(broadcast(rWild),
        col("tail") === col("wk") && col("clabs") === col("wlabs"), "left")
      .withColumn("matched", col("ekind").isNotNull || col("wk").isNotNull)

    // prevailing rule: any exception wins (suffix = its tail); else the
    // matched candidate with the most labels; else the implicit * rule
    val picked = joined.groupBy(col(idCol))
      .agg(
        first(col(hostCol)).as("host"),
        first(col("__h")).as("__h"),
        max(when(col("ekind") === "exc",
          struct(col("clabs").as("l"), col("tail").as("sfx")))).as("exc"),
        max(when(col("matched"),
          struct(col("clabs").as("l"), col("cand").as("sfx")))).as("best"))
      .withColumn("public_suffix", coalesce(col("exc.sfx"), col("best.sfx"),
        expr("element_at(split(__h, '\\\\.'), -1)")))
    picked
      .withColumn("__slabs", size(split(col("public_suffix"), "\\.")))
      .withColumn("__hlabs", size(split(col("__h"), "\\.")))
      .select(col(idCol), col("host"), col("public_suffix"),
        when(col("__hlabs") > col("__slabs"),
          expr("array_join(slice(split(__h, '\\\\.'), CAST(__hlabs - __slabs AS INT), " +
            "CAST(__slabs + 1 AS INT)), '.')")).as("registrable"),
        (col("__hlabs") === col("__slabs")).as("is_public_suffix"))
      .unionAll(nullHosts)
  }
}
