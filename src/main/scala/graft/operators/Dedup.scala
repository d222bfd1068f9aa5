package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/**
 * Deduplication for training-data pipelines (BASELINE north star; not in
 * the reference's SQL surface but a first-class operator here):
 *
 *  - exact: hash-groupBy — one shuffle on the text hash, keeps min id;
 *  - MinHash + LSH: shingle → k-minhash signature → band buckets →
 *    candidates only within buckets → exact Jaccard verify. Pair
 *    generation is bounded by bucket sizes, never |D|²;
 *  - SimHash: 64-bit weighted token fingerprint; near-dups = small
 *    Hamming distance, banded on 16-bit chunks for candidate pruning;
 *  - n-gram Jaccard: exact set overlap of word n-grams;
 *  - embedding cosine: near-dup pairs under a cosine-distance threshold
 *    (broadcast for small sides, [[Ivf.join]] blocking at scale).
 *
 * All hash families are seeded constants — same input ⇒ same pairs.
 */
object Dedup {

  // ---------------- exact ----------------

  /** Exact duplicate groups; `keeper` is the smallest id in each group. */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(col(textCol))
      .agg(count(lit(1)).as("n_dups"), min(col(idCol)).as("keeper"))
      .filter(col("n_dups") > 1)

  /** Drop all but the smallest-id row of each exact-duplicate group. */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = Window.partitionBy(col(textCol)).orderBy(col(idCol))
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** Scale path for exact dedup: shuffle the 8-byte xxhash64 of the text
    * instead of the text itself. Collision probability ~2^-64 per pair —
    * the standard large-corpus trade; use [[exactDedup]] when the shuffle
    * can afford full payloads. */
  def fingerprintDedup(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = Window.partitionBy(xxhash64(col(textCol))).orderBy(col(idCol))
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  // ---------------- shingles / minhash ----------------

  def wordShingles(text: String, n: Int = 3): Set[String] = {
    val toks = TextFunctions.tokenize(text)
    if (toks.size < n) toks.toSet
    else toks.sliding(n).map(_.mkString(" ")).toSet
  }

  @inline private def djb2(s: String): Int = {
    var h = 5381
    val bytes = s.getBytes("UTF-8")
    var i = 0
    while (i < bytes.length) { h = ((h << 5) + h) ^ (bytes(i) & 0xFF); i += 1 }
    h
  }

  /** splitmix64 finalizer — a full-avalanche 64-bit mixer; with per-hash
    * seed offsets it gives the independent uniform hash family minhash
    * needs, at two multiplies per hash (no modular arithmetic). */
  @inline private def mix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  def minhashSignature(shingles: Set[String], numHashes: Int = 128,
                       seed: Long = 42L): Array[Long] = {
    val out = Array.fill(numHashes)(Long.MaxValue)
    shingles.foreach { s =>
      val x = djb2(s).toLong & 0xFFFFFFFFL
      var i = 0
      while (i < numHashes) {
        val h = mix64(x ^ mix64(seed + i))
        if (h < out(i)) out(i) = h
        i += 1
      }
    }
    out
  }

  def estimatedJaccard(sigA: Array[Long], sigB: Array[Long]): Double = {
    require(sigA.length == sigB.length)
    sigA.zip(sigB).count { case (a, b) => a == b }.toDouble / sigA.length
  }

  def exactJaccard(a: Set[String], b: Set[String]): Double =
    if (a.isEmpty && b.isEmpty) 1.0
    else (a & b).size.toDouble / (a | b).size

  /**
   * MinHash-LSH near-dup pairs: signature → (band, bandHash) buckets →
   * same-bucket candidate pairs → exact Jaccard filter. The shuffle key is
   * the band bucket, so cost tracks true near-duplicate density.
   */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
                      numHashes: Int = 128, bands: Int = 32,
                      jaccardThreshold: Double = 0.5,
                      shingleN: Int = 3, seed: Long = 42L): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rowsPerBand = numHashes / bands
    val sigUdf = udf((text: String) =>
      minhashSignature(wordShingles(text, shingleN), numHashes, seed))
    val sigs = df.select(col(idCol).as("id"), col(textCol).as("text"))
      .withColumn("sig", sigUdf(col("text")))
      .cache()
    val bandUdf = udf((sig: Seq[Long]) =>
      (0 until bands).map(b => (b, sig.slice(b * rowsPerBand, (b + 1) * rowsPerBand).hashCode())))
    val buckets = sigs.select(col("id"), explode(bandUdf(col("sig"))).as("bb"))
      .select(col("id"), col("bb._1").as("band"), col("bb._2").as("bucket"))
    val candidates = buckets.as("l").join(buckets.as("r"),
        col("l.band") === col("r.band") && col("l.bucket") === col("r.bucket") &&
          col("l.id") < col("r.id"))
      .select(col("l.id").as("a_id"), col("r.id").as("b_id"))
      .distinct()
    val jacUdf = udf((a: String, b: String) =>
      exactJaccard(wordShingles(a, shingleN), wordShingles(b, shingleN)))
    candidates
      .join(sigs.select(col("id").as("a_id"), col("text").as("a_text")), "a_id")
      .join(sigs.select(col("id").as("b_id"), col("text").as("b_text")), "b_id")
      .withColumn("jaccard", jacUdf(col("a_text"), col("b_text")))
      .filter(col("jaccard") >= jaccardThreshold)
      .select("a_id", "b_id", "jaccard")
  }

  // ---------------- simhash ----------------

  /** 64-bit SimHash over tf-weighted token djb2 hashes. */
  def simhash(text: String): Long = {
    val weights = new Array[Long](64)
    TextFunctions.termFreqs(text).foreach { case (term, tf) =>
      // two 32-bit djb2 passes (term, reversed term) → 64 bits
      val h = (djb2(term).toLong << 32) | (djb2(term.reverse).toLong & 0xFFFFFFFFL)
      var bit = 0
      while (bit < 64) {
        if (((h >>> bit) & 1L) == 1L) weights(bit) += tf else weights(bit) -= tf
        bit += 1
      }
    }
    var out = 0L
    var bit = 0
    while (bit < 64) { if (weights(bit) > 0) out |= (1L << bit); bit += 1 }
    out
  }

  def hammingDistance64(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  val simhashUdf = udf((text: String) => simhash(text))

  /** SimHash near-dup pairs: band the 64 bits into 4×16-bit keys; docs
    * sharing any band are candidates; verify by full Hamming distance. */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3): DataFrame = {
    val withSig = df.select(col(idCol).as("id"), col(textCol).as("text"))
      .withColumn("sim", simhashUdf(col("text")))
      .cache()
    val bandUdf = udf((sig: Long) =>
      (0 until 4).map(b => (b, ((sig >>> (16 * b)) & 0xFFFFL).toInt)))
    val buckets = withSig.select(col("id"), col("sim"), explode(bandUdf(col("sim"))).as("bb"))
      .select(col("id"), col("sim"), col("bb._1").as("band"), col("bb._2").as("bucket"))
    val hamUdf = udf((a: Long, b: Long) => hammingDistance64(a, b))
    buckets.as("l").join(buckets.as("r"),
        col("l.band") === col("r.band") && col("l.bucket") === col("r.bucket") &&
          col("l.id") < col("r.id"))
      .select(col("l.id").as("a_id"), col("r.id").as("b_id"),
        col("l.sim").as("a_sim"), col("r.sim").as("b_sim"))
      .distinct()
      .withColumn("hamming", hamUdf(col("a_sim"), col("b_sim")))
      .filter(col("hamming") <= maxHamming)
      .select("a_id", "b_id", "hamming")
  }

  // ---------------- n-gram jaccard / embedding cosine ----------------

  val ngramJaccardUdf = udf((a: String, b: String, n: Int) =>
    exactJaccard(wordShingles(a, n), wordShingles(b, n)))

  /** Exact n-gram Jaccard over all pairs of a (small or pre-blocked) set. */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        n: Int = 3, threshold: Double = 0.2): DataFrame = {
    val l = df.select(col(idCol).as("a_id"), col(textCol).as("a_text"))
    val r = df.select(col(idCol).as("b_id"), col(textCol).as("b_text"))
    l.crossJoin(broadcast(r))
      .filter(col("a_id") < col("b_id"))
      .withColumn("jaccard", ngramJaccardUdf(col("a_text"), col("b_text"), lit(n)))
      .filter(col("jaccard") >= threshold)
      .select("a_id", "b_id", "jaccard")
  }

  /**
   * Near-dup pairs → duplicate GROUPS: connected components of the pair
   * graph via distributed min-label propagation
   * ([[graft.ml.Dbscan.connectedComponents]] — one shuffle join +
   * aggregate per round, rounds ≤ component diameter, nothing on the
   * driver). The component id is the minimum member id; a row not in any
   * pair is its own singleton component. This is the step that turns
   * pairwise LSH/Jaccard/cosine output into "keep one per group":
   * keepers are exactly the rows with `id == component`.
   */
  def dupGroups(df: DataFrame, idCol: String, pairs: DataFrame,
                aCol: String = "a_id", bCol: String = "b_id"): DataFrame = {
    val comp = graft.ml.Dbscan.connectedComponents(
      pairs.select(col(aCol).cast("long").as("a"), col(bCol).cast("long").as("b")))
    df.select(col(idCol).cast("long").as("id"))
      .join(comp, Seq("id"), "left")
      .select(col("id"), coalesce(col("label"), col("id")).as("component"))
  }

  /** Drop all but the min-id member of each near-dup component. */
  def dedupByPairs(df: DataFrame, idCol: String, pairs: DataFrame,
                   aCol: String = "a_id", bCol: String = "b_id"): DataFrame =
    df.join(dupGroups(df, idCol, pairs, aCol, bCol)
        .filter(col("id") === col("component")).select("id"),
      df(idCol).cast("long") === col("id"), "left_semi")

  /** Embedding-cosine near-dup pairs under a distance threshold. The
    * `a_id < b_id` prune is part of the join condition so distances are
    * computed for half the cross product, not filtered afterwards. */
  def cosinePairs(df: DataFrame, idCol: String, vecCol: String,
                  maxCosineDistance: Double): DataFrame = {
    val l = df.select(col(idCol).as("a_id"), col(vecCol).as("a_vec"))
    val r = df.select(col(idCol).as("b_id"), col(vecCol).as("b_vec"))
    l.join(broadcast(r), col("a_id") < col("b_id"))
      .withColumn("cosine_distance", Knn.distCol("cosine")(col("a_vec"), col("b_vec")))
      .filter(col("cosine_distance") <= maxCosineDistance)
      .select("a_id", "b_id", "cosine_distance")
  }
}
