package graft

import graft.operators.Chat

/** Chat-dataset invariants: JSON turn parsing, strict-alternation
  * validity (leading system optional, must end on assistant), per-role
  * stats, render template offsets, mask spans slicing back to exactly
  * the assistant contents, and the zero-UDF scan-shaped plan. */
class ChatSpec extends SparkSpecBase {

  import spark.implicits._

  private def statsOf(json: String) =
    Chat.stats(Seq((1L, json)).toDF("id", "conv"), "id", "conv").collect().head

  test("stats: counts, chars, and validity on a well-formed conversation") {
    val r = statsOf(
      """[{"role":"system","content":"be nice"},
         {"role":"user","content":"hi"},
         {"role":"assistant","content":"hello!"}]""")
    assert(r.getAs[Long]("n_turns") == 3L)
    assert(r.getAs[Long]("n_user") == 1L)
    assert(r.getAs[Long]("n_assistant") == 1L)
    assert(r.getAs[Boolean]("valid"))
    assert(r.getAs[Long]("user_chars") == 2L)
    assert(r.getAs[Long]("asst_chars") == 6L)
  }

  test("validity: broken alternation, trailing user, unknown role, junk") {
    def valid(json: String) = statsOf(json).getAs[Boolean]("valid")
    assert(valid("""[{"role":"user","content":"a"},{"role":"assistant","content":"b"}]"""))
    // two consecutive user turns
    assert(!valid("""[{"role":"user","content":"a"},{"role":"user","content":"b"},{"role":"assistant","content":"c"}]"""))
    // ends on user: nothing to learn from
    assert(!valid("""[{"role":"user","content":"a"},{"role":"assistant","content":"b"},{"role":"user","content":"c"}]"""))
    // system must lead
    assert(!valid("""[{"role":"user","content":"a"},{"role":"system","content":"s"},{"role":"assistant","content":"b"}]"""))
    // unknown role, empty list, malformed JSON
    assert(!valid("""[{"role":"tool","content":"x"},{"role":"assistant","content":"b"}]"""))
    assert(!valid("[]"))
    assert(!valid("not json"))
  }

  test("malformed JSON reports n_turns = -1, zero chars") {
    val r = statsOf("{broken")
    assert(r.getAs[Long]("n_turns") == -1L)
    assert(r.getAs[Long]("user_chars") == 0L)
  }

  test("render: template shape and mask spans slice exactly the replies") {
    val conv =
      """[{"role":"user","content":"hi"},
         {"role":"assistant","content":"hello!"},
         {"role":"user","content":"more"},
         {"role":"assistant","content":"sure"}]"""
    val r = Chat.renderWithMask(Seq((1L, conv)).toDF("id", "conv"), "id", "conv")
      .collect().head
    val text = r.getAs[String]("rendered")
    assert(text ==
      "<|user|>\nhi\n<|assistant|>\nhello!\n<|user|>\nmore\n<|assistant|>\nsure\n")
    val spans = Chat.lossMask(Seq((1L, conv)).toDF("id", "conv"), "id", "conv")
      .orderBy("span_idx").collect()
    assert(spans.length == 2)
    assert(spans.map(_.getAs[String]("span_text")).toSeq == Seq("hello!", "sure"))
    // offsets really index the rendered string
    for (s <- spans) {
      val (a, b) = (s.getAs[Long]("start_off").toInt, s.getAs[Long]("end_off").toInt)
      assert(text.substring(a, b) == s.getAs[String]("span_text"))
    }
  }

  test("a conversation with no assistant turns yields no mask rows") {
    val out = Chat.lossMask(
      Seq((1L, """[{"role":"user","content":"a"}]""")).toDF("id", "conv"),
      "id", "conv").collect()
    assert(out.isEmpty)
  }

  test("stats and render are UDF-free, scan-shaped plans") {
    val df = Seq((1L, """[{"role":"user","content":"a"}]""")).toDF("id", "conv")
    for (q <- Seq(Chat.stats(df, "id", "conv"),
                  Chat.renderWithMask(df, "id", "conv"))) {
      val plan = q.queryExecution.executedPlan.toString
      assert(!plan.toLowerCase.contains("scalaudf"), plan)
      assert(!plan.contains("Exchange"), plan)
    }
  }

  private def traceOf(json: String) = {
    val r = Chat.toolTrace(Seq((1L, json)).toDF("id", "conv"), "id", "conv")
      .collect().head
    (r.getAs[Long]("n_calls"), r.getAs[Long]("answered"),
      r.getAs[Long]("dangling"), r.getAs[Long]("unanswered"),
      r.getAs[Boolean]("valid"))
  }

  test("toolTrace: clean call/result pairing validates") {
    val t = traceOf(
      """[{"role":"user","content":"q"},
         {"role":"assistant","content":"use [call:a1]"},
         {"role":"tool","content":"res","call_id":"a1"},
         {"role":"assistant","content":"done"}]""")
    assert(t == ((1L, 1L, 0L, 0L, true)))
  }

  test("toolTrace: parallel calls answered in any order validate") {
    val t = traceOf(
      """[{"role":"assistant","content":"[call:x] [call:y]"},
         {"role":"tool","content":"ry","call_id":"y"},
         {"role":"tool","content":"rx","call_id":"x"},
         {"role":"assistant","content":"ok"}]""")
    assert(t == ((2L, 2L, 0L, 0L, true)))
  }

  test("toolTrace: a user turn expires pending calls -> unanswered") {
    val t = traceOf(
      """[{"role":"assistant","content":"[call:p]"},
         {"role":"user","content":"never mind"}]""")
    assert(t == ((1L, 0L, 0L, 1L, false)))
  }

  test("toolTrace: end-of-conversation expires pending calls too") {
    val t = traceOf("""[{"role":"assistant","content":"[call:p]"}]""")
    assert(t == ((1L, 0L, 0L, 1L, false)))
  }

  test("toolTrace: dangling results — wrong id, no pending, missing call_id") {
    // tool answers an id never announced
    val wrong = traceOf(
      """[{"role":"assistant","content":"[call:a]"},
         {"role":"tool","content":"r","call_id":"b"}]""")
    assert(wrong == ((1L, 0L, 1L, 1L, false)))
    // tool turn with no preceding assistant call
    val noCall = traceOf("""[{"role":"tool","content":"r","call_id":"z"}]""")
    assert(noCall == ((0L, 0L, 1L, 0L, false)))
    // tool turn missing call_id entirely
    val noId = traceOf(
      """[{"role":"assistant","content":"[call:a]"},
         {"role":"tool","content":"r"}]""")
    assert(noId == ((1L, 0L, 1L, 1L, false)))
  }

  test("toolTrace: a second answer to a consumed id is dangling") {
    val t = traceOf(
      """[{"role":"assistant","content":"[call:a]"},
         {"role":"tool","content":"r1","call_id":"a"},
         {"role":"tool","content":"r2","call_id":"a"}]""")
    assert(t == ((1L, 1L, 1L, 0L, false)))
  }

  test("toolTrace: malformed JSON gets -1 sentinels and invalid") {
    val r = Chat.toolTrace(Seq((1L, "{not json")).toDF("id", "conv"),
      "id", "conv").collect().head
    assert(r.getAs[Long]("n_turns") == -1L)
    assert(r.getAs[Long]("n_tool_turns") == -1L)
    assert(r.getAs[Long]("n_calls") == -1L)
    assert(r.getAs[Long]("answered") == -1L)
    assert(!r.getAs[Boolean]("valid"))
  }

  test("toolTrace is UDF-free and scan-shaped") {
    val df = Seq((1L, """[{"role":"user","content":"a"}]""")).toDF("id", "conv")
    val plan = Chat.toolTrace(df, "id", "conv").queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("scalaudf"), plan)
    assert(!plan.contains("Exchange"), plan)
  }
}
