package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{get_json_object, lit}

/**
 * JSONB-filter helpers for the reference's metadata predicates: the
 * `metadata @> '{"k":"v"}'` containment filter hybrid_search applies
 * (`NeuronDB/src/search/hybrid_search.c:203-207`) becomes an AND of
 * `get_json_object` equalities — plain Catalyst expressions, so the
 * filter participates in pushdown/pruning like any other predicate.
 * Top-level scalar containment only, which is what the reference's own
 * test filters use.
 */
object Json {

  /** Bracket notation so the key is matched as ONE literal top-level
    * field: `$.a.b` would traverse into a nested object, which is not
    * what `@>` containment on the key "a.b" means. Quote-containing keys
    * are rejected loudly: Spark's get_json_object path parser does not
    * support escaped quotes inside `$['…']`, so any escape attempt yields
    * an unparseable path and a silent NULL for every row. */
  def get(metaCol: Column, key: String): Column = {
    require(!key.contains("'"),
      s"JSON key containing a single quote is not supported by " +
        s"get_json_object bracket paths: $key")
    get_json_object(metaCol, s"$$['$key']")
  }

  /** `metadata @> {k1:v1, k2:v2, ...}` for scalar values. */
  def contains(metaCol: Column, filters: Map[String, String]): Column =
    filters.map { case (k, v) => get(metaCol, k) === lit(v) }
      .reduceOption(_ && _)
      .getOrElse(lit(true))
}
