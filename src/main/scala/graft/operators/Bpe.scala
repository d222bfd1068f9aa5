package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Distributed BPE tokenizer TRAINING (Sennrich et al. 2016, "Neural
 * Machine Translation of Rare Words with Subword Units") — the
 * tokenizer-fitting step of a training-data pipeline, upstream of the
 * token accounting the repo already does (`budget_feed`, wordpiece-lite
 * encode). The reference ships a fixed pretrained tokenizer
 * (`NeuronDB/src/onnx/neurondb_tokenizer.c`); training one from the
 * corpus is the part a 100 TB curation run adds.
 *
 * Scale shape — the classic two-phase trick the original C++ trainer
 * uses, made distributed:
 *  1. ONE shuffle over the corpus builds the (word, freq) table; all
 *     merge learning then runs on that compacted table, whose size is
 *     the DISTINCT-word vocabulary (≪ corpus; stable as the corpus
 *     grows), never the corpus itself.
 *  2. Each merge round is a pair-count aggregate (map-side combined)
 *     + a driver-side argmax of ONE row + a map over the word table.
 *     No round ever touches raw documents again.
 *
 * Semantics (canonical, oracle-checked): pair counts include
 * overlapping occurrences weighted by word frequency (get_stats);
 * argmax tie-break is lexicographic smallest (l, r); a merge rewrites
 * every word left-to-right non-overlapping (after merging positions
 * (i, i+1) scanning resumes at i+2).
 */
object Bpe {

  final case class Merge(merge_rank: Int, lhs: String, rhs: String, cnt: Long)

  /** Canonical left-to-right non-overlapping single-pair merge. */
  def mergeWord(syms: Seq[String], l: String, r: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val n = syms.length
    var i = 0
    while (i < n) {
      if (i + 1 < n && syms(i) == l && syms(i + 1) == r) { out += (l + r); i += 2 }
      else { out += syms(i); i += 1 }
    }
    out.toSeq
  }

  private val symsUdf = udf { (w: String) => w.map(_.toString) :+ "</w>" }
  private val pairsUdf = udf { (syms: Seq[String]) => syms.zip(syms.tail) }

  /** The compacted (word, initial symbols, freq) table — the one
    * corpus-wide shuffle. */
  def wordTable(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(regexp_extract_all(
        lower(col(textCol)), lit("[a-z0-9]+"), lit(0))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .select(col("w"), symsUdf(col("w")).as("syms"), col("freq"))

  /** Learn `numMerges` merges; returns (ranked merge table, final word
    * table with columns w / syms / freq). The word table is
    * localCheckpoint'ed per round: each round's input is materialized,
    * so lineage stays flat across iterations.
    *
    * `minFreq` prunes words below the frequency floor BEFORE any round
    * runs — the real trainer's scale dial (hapax legomena dominate a
    * web vocabulary's row count while contributing almost nothing to
    * pair statistics; pruning them shrinks every round's input without
    * visibly moving the learned merges). */
  def train(docs: DataFrame, textCol: String,
            numMerges: Int, minFreq: Long = 1L): (Seq[Merge], DataFrame) = {
    require(numMerges >= 1, s"numMerges must be positive: $numMerges")
    require(minFreq >= 1, s"minFreq must be positive: $minFreq")
    var words = wordTable(docs, textCol)
      .filter(col("freq") >= minFreq).localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var rank = 1
    var exhausted = false
    while (rank <= numMerges && !exhausted) {
      val top = words
        .select(explode(pairsUdf(col("syms"))).as("p"), col("freq"))
        .groupBy(col("p._1").as("l"), col("p._2").as("r"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r, cnt) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += Merge(rank, l, r, cnt)
        val mu = udf((syms: Seq[String]) => mergeWord(syms, l, r))
        val prev = words
        words = words.withColumn("syms", mu(col("syms"))).localCheckpoint(true)
        prev.unpersist()
        rank += 1
      }
    }
    (merges.toSeq, words)
  }

  final case class WordRow(w: String, syms: Seq[String], freq: Long)

  /** Production-dial trainer: byte-for-byte the semantics of [[train]]
    * (same get_stats overlap counting, same (cnt desc, l, r) argmax
    * tie-break, same LTR non-overlapping merge, same early stop), but
    * after the ONE corpus shuffle the vocabulary-sized (word, freq)
    * table is collected to the driver and every merge round runs
    * in memory with incremental pair-stat updates — the original
    * subword-nmt trainer's algorithm. [[train]] costs two Spark jobs
    * per merge (a pair-count aggregate + a word-table rewrite), which
    * is fine at numMerges=10 but is 64k sequential jobs at a 32k vocab
    * budget; here the job count is CONSTANT in numMerges (one count,
    * one collect, one parallelize), because after compaction the merge
    * learning is a vocabulary-local computation — word order never
    * matters, only the (word, freq) multiset, which is exactly what
    * crossed the shuffle.
    *
    * Per round: the best pair comes from a lazy-deletion max-heap
    * (every stat update pushes a fresh (pair, cnt) entry; stale
    * entries are discarded against the live map on pop), and only the
    * words CONTAINING the merged pair (tracked in an inverted index)
    * are rewritten — O(affected) per merge, not O(vocab).
    *
    * `maxVocabRows` is the driver-memory guard: the post-minFreq
    * vocabulary is counted BEFORE collecting and the call fails loudly
    * when it exceeds the cap — raise `minFreq` (hapax pruning shrinks
    * a web vocabulary by ~half without moving the merges) or fall back
    * to the fully distributed [[train]]. */
  def trainLocal(docs: DataFrame, textCol: String, numMerges: Int,
                 minFreq: Long = 1L, maxVocabRows: Long = 10000000L)
      : (Seq[Merge], DataFrame) = {
    require(numMerges >= 1, s"numMerges must be positive: $numMerges")
    require(minFreq >= 1, s"minFreq must be positive: $minFreq")
    val spark = docs.sparkSession
    // materialize the compacted word table once: the guard count and the
    // collect would otherwise EACH replay the corpus tokenize+shuffle
    val wt = wordTable(docs, textCol).filter(col("freq") >= minFreq)
      .localCheckpoint(true)
    val n = wt.count()
    require(n <= maxVocabRows,
      s"vocabulary has $n rows > maxVocabRows=$maxVocabRows; raise minFreq " +
        "(prunes hapax legomena) or use Bpe.train (distributed rounds)")
    val rows = wt.select(col("w"), col("freq")).collect()
    val nW = rows.length
    val wordsArr = new Array[String](nW)
    val freqs = new Array[Long](nW)
    val symsArr = new Array[Seq[String]](nW)
    var i = 0
    while (i < nW) {
      wordsArr(i) = rows(i).getString(0)
      freqs(i) = rows(i).getLong(1)
      symsArr(i) = wordsArr(i).map(_.toString) :+ "</w>"
      i += 1
    }
    type P = (String, String)
    val stats = scala.collection.mutable.HashMap.empty[P, Long]
    val where = scala.collection.mutable.HashMap
      .empty[P, scala.collection.mutable.HashSet[Int]]
    // heap order: larger cnt wins; ties go to the lexicographically
    // SMALLEST (l, r) — so reverse-compare the strings.
    val heap = scala.collection.mutable.PriorityQueue
      .empty[(Long, String, String)](Ordering.by {
        case (c, l, r) => (c, Reversed(l), Reversed(r))
      })
    def bump(p: P, d: Long, idx: Int): Unit = {
      val c = stats.getOrElse(p, 0L) + d
      if (c <= 0L) stats.remove(p) else stats(p) = c
      // push on EVERY change leaving a live count — lazy deletion needs
      // the heap to hold an entry matching each pair's CURRENT count,
      // and a decrement (other-pair merge stealing an adjacency) lowers
      // counts just as legitimately as an increment raises them.
      if (c > 0L) heap.enqueue((c, p._1, p._2))
      if (d > 0L)
        where.getOrElseUpdate(p, scala.collection.mutable.HashSet.empty) += idx
      else where.get(p).foreach(_ -= idx)
    }
    i = 0
    while (i < nW) {
      val s = symsArr(i)
      var j = 0
      while (j + 1 < s.length) { bump((s(j), s(j + 1)), freqs(i), i); j += 1 }
      i += 1
    }
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var rank = 1
    var exhausted = false
    while (rank <= numMerges && !exhausted) {
      // pop stale entries until the top reflects the live stats map
      var best: Option[(String, String, Long)] = None
      while (best.isEmpty && heap.nonEmpty) {
        val (c, l, r) = heap.dequeue()
        if (stats.get((l, r)).contains(c)) best = Some((l, r, c))
      }
      best match {
        case None => exhausted = true
        case Some((l, r, cnt)) =>
          merges += Merge(rank, l, r, cnt)
          val affected = where.getOrElse((l, r), Set.empty[Int]).toArray
          var k = 0
          while (k < affected.length) {
            val w = affected(k)
            val old = symsArr(w)
            var j = 0
            while (j + 1 < old.length) { bump((old(j), old(j + 1)), -freqs(w), w); j += 1 }
            val nu = mergeWord(old, l, r)
            symsArr(w) = nu
            j = 0
            while (j + 1 < nu.length) { bump((nu(j), nu(j + 1)), freqs(w), w); j += 1 }
            k += 1
          }
          rank += 1
      }
    }
    val finalWords = spark.createDataFrame(
      (0 until nW).map(j => WordRow(wordsArr(j), symsArr(j), freqs(j))))
    (merges.toSeq, finalWords)
  }

  /** Reverse-ordered string wrapper for the heap tie-break. */
  private final case class Reversed(s: String) extends Ordered[Reversed] {
    def compare(that: Reversed): Int = that.s.compareTo(s)
  }

  /** Apply a learned merge table to text — the SERVE face of [[train]]:
    * each word is split to chars + the end marker and the merges are
    * replayed IN RANK ORDER (the canonical greedy encode). The merge
    * list is tiny (the vocab budget) and closed over — broadcast to
    * executors with the UDF; one scan, no shuffle. Returns the frame
    * with `tokens` (all subword tokens in order) and `n_tokens`. */
  def encodeWithMerges(docs: DataFrame, textCol: String,
                       merges: Seq[Merge]): DataFrame = {
    val ordered = merges.sortBy(_.merge_rank).map(m => (m.lhs, m.rhs)).toArray
    val encUdf = udf { (text: String) =>
      if (text == null) Seq.empty[String]
      else
        "[a-z0-9]+".r.findAllIn(text.toLowerCase).flatMap { w =>
          var syms: Seq[String] = w.map(_.toString) :+ "</w>"
          var i = 0
          while (i < ordered.length) {
            syms = mergeWord(syms, ordered(i)._1, ordered(i)._2)
            i += 1
          }
          syms
        }.toSeq
    }
    docs.withColumn("tokens", encUdf(col(textCol)))
      .withColumn("n_tokens", size(col("tokens")).cast("long"))
  }

  /** Persist a learned merge table (the tokenizer ARTIFACT — rank order
    * is the whole model); parquet, tiny. */
  def saveMerges(spark: org.apache.spark.sql.SparkSession,
                 merges: Seq[Merge], path: String): Unit =
    spark.createDataFrame(merges).write.mode("overwrite").parquet(path)

  /** Load a merge table back in rank order for [[encodeWithMerges]]. */
  def loadMerges(spark: org.apache.spark.sql.SparkSession,
                 path: String): Seq[Merge] = {
    import spark.implicits._
    spark.read.parquet(path).as[Merge].collect().sortBy(_.merge_rank).toSeq
  }

  /** Encode-side corpus statistics after the learned merges: distinct
    * words, corpus token counts before (chars + end marker) and after,
    * and the symbol-vocabulary size — the compression evidence a
    * tokenizer fit is judged by. One row. */
  def encodeStats(finalWords: DataFrame): DataFrame = {
    val base = finalWords.agg(
      count(lit(1)).as("n_words"),
      sum(col("freq") * (length(col("w")) + lit(1L))).as("tokens_before"),
      sum(col("freq") * size(col("syms")).cast("long")).as("tokens_after"))
    val vocab = finalWords.select(explode(col("syms")).as("s"))
      .agg(countDistinct(col("s")).as("n_vocab"))
    base.crossJoin(vocab)
  }
}
