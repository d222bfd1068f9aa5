package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Conversation (SFT/chat) dataset operators — the turn-structured
 * slice of a modern training pipeline: instruction-tuning corpora
 * arrive as JSON turn lists (`[{"role":…,"content":…},…]`), and the
 * pipeline must validate their shape, profile them, and render them
 * into training strings where the LOSS MASK covers exactly the
 * assistant spans (loss is computed on what the model should say,
 * not on what it was told).
 *
 * Everything is Spark-native: `from_json` parses turns, and the
 * per-conversation folds (alternation check, running render offsets)
 * are `aggregate`/`transform` higher-order functions over the turn
 * array — zero UDFs, one stateless scan, no shuffle at all until a
 * caller aggregates.
 *
 * Reference surface: the reference's ingest/chunk functions consume
 * plain documents; chat-structured corpora are the training-data
 * extension (public SFT formats: OpenAI-style role lists, ShareGPT),
 * re-expressed Spark-first.
 */
object Chat {

  /** Turn-list schema: role + content per turn. */
  val turnsType: ArrayType =
    ArrayType(StructType(Seq(
      StructField("role", StringType),
      StructField("content", StringType))))

  /** Parse a JSON turn list; malformed JSON yields null (callers can
    * filter or count it). */
  def turns(convJson: Column): Column = from_json(convJson, turnsType)

  /** Strict-alternation validity: an optional leading `system` turn,
    * then user/assistant alternation starting with `user` and ENDING
    * with `assistant` (a trailing user turn has nothing to learn
    * from). Unknown roles, empty lists, and malformed JSON are
    * invalid. */
  def validAlternation(turnsCol: Column): Column = {
    val folded = aggregate(turnsCol,
      struct(lit("start").as("prev"), lit(true).as("ok")),
      (acc, t) => {
        val r = t.getField("role")
        val p = acc.getField("prev")
        val allowed =
          (p === "start" && (r === "system" || r === "user")) ||
            (p === "system" && r === "user") ||
            (p === "user" && r === "assistant") ||
            (p === "assistant" && r === "user")
        struct(r.as("prev"), (acc.getField("ok") && allowed).as("ok"))
      },
      acc => acc.getField("ok") && acc.getField("prev") === "assistant")
    coalesce(folded, lit(false))
  }

  private def roleChars(turnsCol: Column, role: String): Column =
    coalesce(aggregate(
      filter(turnsCol, t => t.getField("role") === role),
      lit(0L), (acc, t) => acc + length(t.getField("content"))), lit(0L))

  /** Per-conversation profile: turn counts by role, strict-alternation
    * validity, and per-role content characters. Stateless scan. */
  def stats(df: DataFrame, idCol: String, convCol: String): DataFrame = {
    val ts = turns(col(convCol))
    df.select(col(idCol),
      coalesce(size(ts), lit(-1)).cast("long").as("n_turns"),
      size(filter(ts, t => t.getField("role") === "user")).cast("long")
        .as("n_user"),
      size(filter(ts, t => t.getField("role") === "assistant")).cast("long")
        .as("n_assistant"),
      validAlternation(ts).as("valid"),
      roleChars(ts, "user").as("user_chars"),
      roleChars(ts, "assistant").as("asst_chars"))
  }

  private val spansType = "array<struct<start:bigint,end:bigint>>"

  /** Render a conversation to its training string — each turn as
    * `<|role|>\ncontent\n` — and the loss-mask spans: 0-based
    * [start, end) character offsets of each ASSISTANT content (the
    * trailing newline excluded). One fold computes text and offsets
    * together, so the spans are correct by construction. */
  def renderWithMask(df: DataFrame, idCol: String, convCol: String): DataFrame = {
    val folded = aggregate(turns(col(convCol)),
      struct(lit("").cast("string").as("text"),
        expr(s"CAST(array() AS $spansType)").as("spans")),
      (acc, t) => {
        val marker = concat(lit("<|"), t.getField("role"), lit("|>\n"))
        val start = (length(acc.getField("text")) + length(marker)).cast("long")
        val end = start + length(t.getField("content"))
        val withSpan = concat(acc.getField("spans"),
          array(struct(start.as("start"), end.as("end"))))
        struct(
          concat(acc.getField("text"), marker, t.getField("content"), lit("\n"))
            .as("text"),
          when(t.getField("role") === "assistant", withSpan)
            .otherwise(acc.getField("spans")).as("spans"))
      })
    df.select(col(idCol), folded.getField("text").as("rendered"),
      folded.getField("spans").as("mask_spans"))
  }

  /** Turn-list schema for AGENTIC conversations: tool-result turns
    * carry the call id they answer. */
  val toolTurnsType: ArrayType =
    ArrayType(StructType(Seq(
      StructField("role", StringType),
      StructField("content", StringType),
      StructField("call_id", StringType))))

  /** Tool-call trace validation — the agentic-SFT shape check: an
    * assistant turn announces calls as `[call:ID]` markers in its
    * content; each following `tool` turn must answer a pending id
    * (consuming it), and any non-tool turn expires what is still
    * pending. Per conversation: announced/answered counts, DANGLING
    * results (tool turns answering nothing pending — including tool
    * turns with no call_id), UNANSWERED calls (pending ids expired by
    * a later turn or end-of-conversation), and the validity flag.
    * Duplicate ids announced in one turn collapse (array semantics).
    *
    * One `aggregate` fold over the turn array — zero UDFs, stateless
    * scan, no shuffle. */
  def toolTrace(df: DataFrame, idCol: String, convCol: String): DataFrame = {
    val ts = from_json(col(convCol), toolTurnsType)
    val stateType =
      "struct<pending:array<string>,answered:bigint,dangling:bigint," +
        "unanswered:bigint,ncalls:bigint>"
    val folded = aggregate(ts,
      expr(s"CAST(struct(array(), 0, 0, 0, 0) AS $stateType)"),
      (acc, t) => {
        val pending = acc.getField("pending")
        val role = t.getField("role")
        val calls = coalesce(regexp_extract_all(t.getField("content"),
          lit("\\[call:([a-zA-Z0-9_-]+)\\]"), lit(1)),
          expr("CAST(array() AS array<string>)"))
        val newPending = when(role === "assistant", array_distinct(calls))
          .otherwise(expr("CAST(array() AS array<string>)"))
        val consumed = struct(
          array_remove(pending, t.getField("call_id")).as("pending"),
          (acc.getField("answered") + 1).as("answered"),
          acc.getField("dangling").as("dangling"),
          acc.getField("unanswered").as("unanswered"),
          acc.getField("ncalls").as("ncalls"))
        val rejected = struct(
          pending.as("pending"),
          acc.getField("answered").as("answered"),
          (acc.getField("dangling") + 1).as("dangling"),
          acc.getField("unanswered").as("unanswered"),
          acc.getField("ncalls").as("ncalls"))
        val advanced = struct(
          newPending.as("pending"),
          acc.getField("answered").as("answered"),
          acc.getField("dangling").as("dangling"),
          (acc.getField("unanswered") + size(pending)).as("unanswered"),
          (acc.getField("ncalls") + size(newPending)).as("ncalls"))
        when(role === "tool",
          // null call_id -> array_contains is null -> otherwise: dangling
          when(array_contains(pending, t.getField("call_id")), consumed)
            .otherwise(rejected))
          .otherwise(advanced)
      },
      acc => struct(
        acc.getField("answered").as("answered"),
        acc.getField("dangling").as("dangling"),
        (acc.getField("unanswered") + size(acc.getField("pending")))
          .as("unanswered"),
        acc.getField("ncalls").as("ncalls")))
    // malformed JSON folds to null: every count gets the same -1
    // sentinel stats() uses for n_turns, and valid coalesces to false
    df.select(col(idCol),
      coalesce(size(ts), lit(-1)).cast("long").as("n_turns"),
      coalesce(size(filter(ts, t => t.getField("role") === "tool")), lit(-1))
        .cast("long").as("n_tool_turns"),
      coalesce(folded.getField("ncalls"), lit(-1L)).as("n_calls"),
      coalesce(folded.getField("answered"), lit(-1L)).as("answered"),
      coalesce(folded.getField("dangling"), lit(-1L)).as("dangling"),
      coalesce(folded.getField("unanswered"), lit(-1L)).as("unanswered"),
      coalesce(folded.getField("dangling") === 0 &&
        folded.getField("unanswered") === 0, lit(false)).as("valid"))
  }

  /** Flattened loss mask: one row per assistant span with its slice of
    * the rendered text — offsets and content verify each other. */
  def lossMask(df: DataFrame, idCol: String, convCol: String): DataFrame =
    renderWithMask(df, idCol, convCol)
      .select(col(idCol), col("rendered"),
        posexplode(col("mask_spans")).as(Seq("span_idx", "span")))
      .select(col(idCol), col("span_idx").cast("long").as("span_idx"),
        col("span.start").as("start_off"), col("span.end").as("end_off"),
        col("rendered").substr(col("span.start").cast("int") + 1,
          (col("span.end") - col("span.start")).cast("int")).as("span_text"))
}
