package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Unigram-LM (SentencePiece-style) tokenizer INFERENCE — Viterbi
 * max-likelihood segmentation of text against a scored piece
 * vocabulary (reference surface: the tokenizer in
 * `NeuronDB/src/onnx/neurondb_tokenizer.c`; the unigram model of
 * Kudo 2018). This is the second tokenizer family next to the BPE
 * trainer/encoder (`operators/Bpe.scala`): BPE segments by learned
 * merge order, unigram segments by global sequence likelihood — the
 * dynamic program below is exactly SentencePiece's decode step.
 *
 * Everything is INTEGER so the DuckDB oracle can replay it exactly:
 * piece scores are scaled log-probs (negative ints), and the DP value
 * packs a deterministic tie-break into the low bits —
 *
 *   v = 1024 * totalScore - nTokens
 *
 * maximizing v maximizes the score and, among equal-score paths,
 * minimizes the token count. Since only (score, nTokens) are emitted,
 * any remaining segmentation ambiguity is invisible to the output, so
 * the contract is total. score and nTokens unpack from v because
 * 0 <= nTokens <= maxChars < 1024.
 *
 * Scale shape: stateless per-row DP (O(len · maxPieceLen) with a
 * vocabulary hash map on the executor) — a 100 TB corpus tokenizes
 * embarrassingly parallel with zero shuffle, exactly like `bpe_encode`.
 */
object Unigram {

  /** (piece, scaled log-prob). Single letters and the space cover the
    * alphabet; digits are deliberately absent so the UNK path is
    * exercised; multi-character pieces are cheaper than their letter
    * spellings so the DP genuinely prefers them. */
  val vocab: Seq[(String, Int)] =
    ('a' to 'z').map(c => c.toString -> -60) ++ Seq(" " -> -20) ++ Seq(
      "th" -> -70, "he" -> -72, "in" -> -71, "er" -> -73, "an" -> -74,
      "re" -> -75, "on" -> -76, "at" -> -77, "en" -> -78, "es" -> -79,
      "or" -> -80, "te" -> -81, "ed" -> -82, "is" -> -83, "it" -> -84,
      "al" -> -85, "ar" -> -86, "st" -> -87, "to" -> -88, "nt" -> -89,
      "the" -> -95, "ing" -> -100, "and" -> -105, "ion" -> -110,
      "ent" -> -115, "for" -> -120, "tio" -> -125, "ati" -> -130,
      "tion" -> -140, "atio" -> -150,
      "ation" -> -180)

  val maxPieceLen: Int = vocab.map(_._1.length).max // 5
  val unkScore: Int = -100

  private lazy val vocabMap: Map[String, Int] = vocab.toMap

  /** Packed Viterbi value v = 1024*score - nTokens for the best
    * segmentation of `s`; 0 for the empty string. Unknown single
    * characters cost [[unkScore]]. */
  def viterbiPacked(s: String, vmap: Map[String, Int] = vocabMap): Long = {
    val n = s.length
    val best = new Array[Long](n + 1)
    var i = 1
    while (i <= n) {
      // UNK single char is always an option; in-vocab pieces beat it
      var b = best(i - 1) + 1024L * unkScore - 1
      val lMax = math.min(maxPieceLen, i)
      var l = 1
      while (l <= lMax) {
        vmap.get(s.substring(i - l, i)) match {
          case Some(sc) =>
            val cand = best(i - l) + 1024L * sc - 1
            if (cand > b) b = cand
          case None => ()
        }
        l += 1
      }
      best(i) = b
      i += 1
    }
    best(n)
  }

  /** (score, nTokens) unpacked from the Viterbi value. */
  def unpack(v: Long): (Long, Long) = {
    if (v == 0L) (0L, 0L)
    else {
      val neg = -v
      (-(neg / 1024L), neg % 1024L)
    }
  }

  /** Normalization shared with the oracle: lowercase, keep
    * `[a-z0-9 ]`, truncate to `maxChars`. */
  def normalize(text: String, maxChars: Int): String = {
    val t = if (text == null) "" else text
    val cleaned = t.toLowerCase(java.util.Locale.ROOT)
      .replaceAll("[^a-z0-9 ]", "")
    if (cleaned.length <= maxChars) cleaned else cleaned.substring(0, maxChars)
  }

  /** normalize → Viterbi → unpack as one call: (n_chars, n_tokens,
    * score). The single body behind BOTH the DataFrame operator and the
    * `unigram_stats` SQL registration, so the two surfaces cannot
    * drift; carries the tie-break-radix guard for both. */
  def stats(text: String, maxChars: Int): (Int, Long, Long) = {
    require(maxChars < 1024,
      s"maxChars $maxChars must stay below the 1024 tie-break radix")
    val s = normalize(text, maxChars)
    val (score, nTok) = unpack(viterbiPacked(s))
    (s.length, nTok, score)
  }

  /** Per-document segmentation stats: characters analyzed, Viterbi
    * token count, total scaled log-prob. */
  def segmentStats(df: DataFrame, idCol: String, textCol: String,
                   maxChars: Int): DataFrame = {
    require(maxChars < 1024, s"maxChars $maxChars must stay below the 1024 tie-break radix")
    val statsUdf = udf((text: String) => stats(text, maxChars))
    df.select(col(idCol), statsUdf(col(textCol)).as("st"))
      .select(col(idCol),
        col("st._1").as("n_chars"),
        col("st._2").as("n_tokens"),
        col("st._3").as("score"))
  }

  // ----------------------------------------------------------- oracle

  /** DuckDB VALUES list for the vocabulary: (piece, len, score). */
  def vocabValuesSql: String =
    vocab.map { case (p, sc) => s"('$p', ${p.length}, $sc)" }.mkString(", ")

  /** The unrolled DP as chained MATERIALIZED CTEs. State per doc is the
    * sliding window (b1..b5) = best[i-5..i-1] before step i; step i
    * shifts the window and computes best[i] = max over matching pieces
    * (and UNK) — frozen once i exceeds the text length so b5 ends as
    * best[n]. Everything BIGINT; the correlated `max` over the vocab
    * VALUES is per-row and the chain is MATERIALIZED so DuckDB never
    * inlines it exponentially. */
  def oracleSql(maxChars: Int): String = {
    require(maxChars < 1024)
    val NEG = "-4611686018427387904" // unreachable guard (-2^62)
    val steps = (1 to maxChars).map { i =>
      s"""u$i AS MATERIALIZED (
         |  SELECT doc_id, s, n, b2 AS b1, b3 AS b2, b4 AS b3, b5 AS b4,
         |    CASE WHEN $i > n THEN b5 ELSE greatest(
         |      coalesce((SELECT max(
         |          CASE v.l WHEN 1 THEN b5 WHEN 2 THEN b4 WHEN 3 THEN b3
         |                   WHEN 4 THEN b2 ELSE b1 END
         |          + 1024 * CAST(v.score AS BIGINT) - 1)
         |        FROM vocab v
         |        WHERE v.l <= $i AND v.p = substr(s, $i + 1 - v.l, v.l)),
         |        CAST($NEG AS BIGINT)),
         |      b5 + 1024 * CAST(${unkScore} AS BIGINT) - 1
         |    ) END AS b5
         |  FROM u${i - 1})""".stripMargin
    }.mkString(",\n")
    s"""WITH vocab(p, l, score) AS (VALUES ${vocabValuesSql}),
       |u0 AS MATERIALIZED (
       |  SELECT doc_id,
       |    substr(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), 1, $maxChars) AS s,
       |    least(strlen(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')), $maxChars) AS n,
       |    CAST($NEG AS BIGINT) AS b1, CAST($NEG AS BIGINT) AS b2,
       |    CAST($NEG AS BIGINT) AS b3, CAST($NEG AS BIGINT) AS b4,
       |    CAST(0 AS BIGINT) AS b5
       |  FROM documents),
       |$steps
       |SELECT doc_id, CAST(n AS INT) AS n_chars,
       |  CAST(CASE WHEN n = 0 THEN 0 ELSE (-b5) % 1024 END AS BIGINT) AS n_tokens,
       |  CAST(CASE WHEN n = 0 THEN 0 ELSE -((-b5) // 1024) END AS BIGINT) AS score
       |FROM u$maxChars""".stripMargin
  }
}
