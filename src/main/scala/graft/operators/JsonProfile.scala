package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{MapType, StringType}

/**
 * JSONL schema profiling — the data-quality pass a pipeline runs on a
 * new feed before trusting it: which keys exist, how often each is
 * present, what type its values actually sniff as (int / float / bool
 * / null / string), and which type dominates. Schema DRIFT between two
 * feeds is then a diff of two profiles.
 *
 * Parsing is `from_json` to map<string,string> (Catalyst's Jackson
 * path renders any scalar as its token text, so "1.5" and 1.5 both
 * arrive as the string "1.5"); type sniffing is anchored regex over
 * the token text. Nested objects/arrays arrive as raw JSON substrings
 * and sniff as strings — this is a SCALAR-feed profiler by design.
 *
 * Scale shape: one explode + ONE two-phase groupBy on the key; the
 * corpus-size denominator broadcasts back. |keys| output rows.
 */
object JsonProfile {

  def profile(df: DataFrame, jsonCol: String): DataFrame = {
    val m = from_json(col(jsonCol), MapType(StringType, StringType))
    val kv = df.select(explode(m).as(Seq("key", "value")))
    val isNull = col("value").isNull
    val isInt = col("value").rlike("^-?[0-9]+$")
    val isFloat = col("value").rlike("^-?[0-9]+\\.[0-9]+([eE][+-]?[0-9]+)?$")
    val isBool = col("value").isin("true", "false")
    val counts = kv.groupBy(col("key"))
      .agg(count(lit(1)).as("n_present"),
        sum(when(isNull, 1L).otherwise(0L)).as("n_null"),
        sum(when(!isNull && isInt, 1L).otherwise(0L)).as("n_int"),
        sum(when(!isNull && isFloat, 1L).otherwise(0L)).as("n_float"),
        sum(when(!isNull && isBool, 1L).otherwise(0L)).as("n_bool"))
      .withColumn("n_str",
        col("n_present") - col("n_null") - col("n_int") - col("n_float")
          - col("n_bool"))
    val total = df.select(count(lit(1)).as("__total"))
    counts.crossJoin(broadcast(total))
      // dominant type: max count, ties to the lexicographically largest
      // name (bool < float < int < null < str), so a tie with str reads str
      .withColumn("dominant", expr(
        """array_max(array(
          |  struct(n_null AS c, 'null' AS t),
          |  struct(n_int AS c, 'int' AS t),
          |  struct(n_float AS c, 'float' AS t),
          |  struct(n_bool AS c, 'bool' AS t),
          |  struct(n_str AS c, 'str' AS t))).t""".stripMargin))
      .select(col("key"), col("n_present"),
        (col("n_present") / col("__total")).cast("float").as("presence_pct"),
        col("n_int"), col("n_float"), col("n_bool"), col("n_null"),
        col("n_str"), col("dominant"))
  }
}
