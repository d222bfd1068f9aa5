package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Luhn-verified payment-card detection — the PII gate
 * ([[graft.functions.TextAnalysis]] Pii) upgraded for primary account
 * numbers: a bare 13-19 digit run is usually a timestamp or an id, so
 * flagging on the pattern alone floods a corpus scrub with false
 * positives; the Luhn mod-10 check (ISO/IEC 7812) is what separates
 * plausible PANs from noise digits.
 *
 * Scale shape: a stateless per-row column program — regex extraction
 * plus a fold over each candidate's digits, zero UDFs, no shuffle.
 */
object Luhn {

  /** Luhn mod-10 validity of a digit string (the whole column value
    * must be digits): double every second digit from the RIGHT,
    * subtract 9 when the double exceeds 9, valid iff the sum is
    * divisible by 10. */
  def isValid(pan: Column): Column = {
    val rev = reverse(pan)
    val total = aggregate(sequence(lit(1), length(pan)), lit(0),
      (acc, i) => {
        val d = rev.substr(i, lit(1)).cast("int")
        acc + when(i % 2 === 0,
          when(d * 2 > 9, d * 2 - 9).otherwise(d * 2)).otherwise(d)
      })
    // sequence(1, 0) raises on empty input — an empty string is not a
    // PAN, short-circuit before the fold
    when(length(pan) === 0, lit(false)).otherwise(total % 10 === 0)
  }

  /** Per-document PAN audit: digit runs of 13-19 as candidates, the
    * Luhn-valid subset, and the valid PANs' last-4 digits in match
    * order (what a redaction log keeps). Emits (id, n_candidates,
    * n_valid, valid_last4). */
  def panScan(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val cands = regexp_extract_all(col(textCol), lit("[0-9]{13,19}"), lit(0))
    df.filter(col(textCol).isNotNull)
      .select(col(idCol), cands.as("__c"))
      .select(col(idCol),
        size(col("__c")).cast("long").as("n_candidates"),
        size(filter(col("__c"), p => isValid(p))).cast("long").as("n_valid"),
        array_join(transform(filter(col("__c"), p => isValid(p)),
          p => p.substr(length(p) - 3, lit(4))), ",").as("valid_last4"))
  }
}
