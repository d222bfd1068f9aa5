package graft

import graft.operators.JsonProfile

/** Schema-profile invariants: scalar coercion through the map parse,
  * type sniffing (incl. exponents and negatives), null accounting,
  * nested values sniffing as strings, presence rates, and dominance
  * tiebreaks. */
class JsonProfileSpec extends SparkSpecBase {

  import spark.implicits._

  private def prof(rows: String*) =
    JsonProfile.profile(rows.toDF("j"), "j")
      .collect().map(r => r.getAs[String]("key") -> r).toMap

  test("scalars coerce to token text and sniff by type") {
    val m = prof(
      """{"a":1,"b":-2.5,"c":true,"d":null,"e":"x","f":1.5e3}""",
      """{"a":-7,"b":0.0,"c":false,"d":null,"e":"y","f":2.0e-2}""")
    assert(m("a").getAs[Long]("n_int") == 2L)
    assert(m("a").getAs[String]("dominant") == "int")
    assert(m("b").getAs[Long]("n_float") == 2L)
    assert(m("c").getAs[Long]("n_bool") == 2L)
    assert(m("d").getAs[Long]("n_null") == 2L)
    assert(m("d").getAs[String]("dominant") == "null")
    assert(m("e").getAs[Long]("n_str") == 2L)
    assert(m("f").getAs[Long]("n_float") == 2L, "exponent floats sniff float")
  }

  test("presence rates: a key present in 1 of 4 docs reads 0.25") {
    val m = prof("""{"a":1,"rare":2}""", """{"a":2}""", """{"a":3}""",
      """{"a":4}""")
    assert(m("rare").getAs[Long]("n_present") == 1L)
    assert(m("rare").getAs[Float]("presence_pct") == 0.25f)
    assert(m("a").getAs[Float]("presence_pct") == 1.0f)
  }

  test("nested objects and arrays sniff as strings (scalar profiler)") {
    val m = prof("""{"o":{"x":1},"l":[1,2]}""")
    assert(m("o").getAs[Long]("n_str") == 1L)
    assert(m("l").getAs[Long]("n_str") == 1L)
  }

  test("mixed-type key: dominance follows the max count") {
    val m = prof("""{"k":1}""", """{"k":2}""", """{"k":"s"}""")
    assert(m("k").getAs[Long]("n_int") == 2L)
    assert(m("k").getAs[Long]("n_str") == 1L)
    assert(m("k").getAs[String]("dominant") == "int")
  }

  test("boolean-looking STRINGS are strings, not bools") {
    val m = prof("""{"k":"true"}""")
    // from_json map<string,string> coerces the JSON string "true" to
    // the same token text as a real bool — a documented sniffing
    // limit of profiling post-coercion
    assert(m("k").getAs[Long]("n_bool") == 1L)
  }
}
