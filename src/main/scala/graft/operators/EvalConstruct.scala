package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Multiple-choice eval construction — deterministic answer-position
 * assignment: models show measurable position bias on MCQ benchmarks,
 * so the harness must place the correct option at a position that is
 * uniform over questions yet reproducible run-to-run. The position
 * comes from a splitmix64 draw on the question id (replayable in the
 * DuckDB oracle through [[graft.functions.Mix64Sql]]).
 *
 * Scale shape: a stateless per-row map — the mixer rides a scalar UDF
 * (same convention as [[EpochShuffle]]), no shuffle, no state.
 */
object EvalConstruct {

  private val QPrime = 1000003L

  /** Correct-option slot for one question: mix64(qid * prime + seed)
    * folded into [0, nOptions) on the non-negative 53-bit domain. */
  def slot(qid: Long, nOptions: Int, seed: Long): Int =
    ((graft.functions.DetRandom.mix64(qid * QPrime + seed) >>> 11) %
      nOptions).toInt

  /** Assigns each question's correct answer a position in
    * [0, nOptions) plus the distractor rotation that fills the other
    * slots: emits (qid, correct_pos, letter) with letter = A + pos. */
  def mcqShuffle(df: DataFrame, qidCol: String, nOptions: Int = 4,
                 seed: Long = 42L): DataFrame = {
    require(nOptions >= 2 && nOptions <= 26, s"nOptions $nOptions")
    val slotUdf = udf((qid: Long) => slot(qid, nOptions, seed))
    df.filter(col(qidCol).isNotNull)
      .select(col(qidCol),
        slotUdf(col(qidCol).cast("long")).cast("long").as("correct_pos"))
      .withColumn("letter", expr("char(65 + correct_pos)"))
  }
}
