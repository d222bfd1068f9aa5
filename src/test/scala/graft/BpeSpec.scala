package graft

import org.apache.spark.sql.functions._
import graft.operators.Bpe

class BpeSpec extends SparkSpecBase {
  import spark.implicits._

  test("mergeWord: canonical left-to-right non-overlapping semantics") {
    assert(Bpe.mergeWord(Seq("a", "a", "a"), "a", "a") == Seq("aa", "a"))
    assert(Bpe.mergeWord(Seq("a", "a", "a", "a"), "a", "a") == Seq("aa", "aa"))
    assert(Bpe.mergeWord(Seq("a", "a", "a", "a", "a"), "a", "a") == Seq("aa", "aa", "a"))
    assert(Bpe.mergeWord(Seq("l", "o", "w", "</w>"), "l", "o") == Seq("lo", "w", "</w>"))
    // merged symbol is not a left candidate in the same round
    assert(Bpe.mergeWord(Seq("a", "b", "b"), "a", "b") == Seq("ab", "b"))
    // no match is the identity
    assert(Bpe.mergeWord(Seq("x", "y", "</w>"), "a", "b") == Seq("x", "y", "</w>"))
  }

  test("train learns the hand-checkable merges of a tiny corpus") {
    val docs = Seq("low low low lower lowest", "new newer newest newer")
      .toDF("text")
    val (merges, words) = Bpe.train(docs, "text", numMerges = 4)
    assert(merges.length == 4)
    // "lo" + "w": 'l','o' adjacent in low/lower/lowest = 3+1+1 = 5 occurrences;
    // 'e','w' in new/newer/newest = 4; first merge must be the most
    // frequent pair with lexicographic tie-break
    val m1 = merges.head
    assert(m1.merge_rank == 1 && m1.cnt >= 4, s"got $m1")
    // ranks are 1..k and counts never increase against re-derivation order
    assert(merges.map(_.merge_rank) == (1 to 4))
    // every learned pair concatenates into a symbol present in the final words
    val finalSyms = words.select(explode(col("syms"))).as[String].collect().toSet
    val lastMerge = merges.last
    assert(finalSyms.contains(lastMerge.lhs + lastMerge.rhs))
  }

  test("minFreq prunes hapaxes from the trainer's word table") {
    val docs = (Seq.fill(30)("common words repeat here") ++
      Seq("zzqx unique singleton")).toDF("text")
    val (_, all) = Bpe.train(docs, "text", 2)
    val (_, pruned) = Bpe.train(docs, "text", 2, minFreq = 2L)
    assert(all.count() > pruned.count(), "pruning must shrink the round input")
    import org.apache.spark.sql.functions.col
    assert(pruned.filter(col("w") === "zzqx").count() == 0)
    assert(pruned.filter(col("w") === "common").count() == 1)
  }

  test("train is deterministic and partition-invariant") {
    val docs = (1 to 50).map(i => s"banana band bandana ana n$i").toDF("text")
    val a = Bpe.train(docs, "text", 6)._1
    val b = Bpe.train(docs.repartition(13), "text", 6)._1
    assert(a == b)
  }

  test("encodeWithMerges agrees with the trainer's own word table") {
    val docs = Seq("low lower lowest low", "newest newer new lowest").toDF("text")
    val (merges, words) = Bpe.train(docs, "text", 6)
    // corpus re-encoded with the learned merges must give the same total
    // token mass as the trainer's final word table
    val encoded = Bpe.encodeWithMerges(docs, "text", merges)
      .agg(sum(col("n_tokens"))).head().getLong(0)
    val fromWords = words.select(
      sum(col("freq") * size(col("syms")).cast("long"))).head().getLong(0)
    assert(encoded == fromWords)
    // unseen text still encodes (falls back to chars where no merge applies)
    val cold = Bpe.encodeWithMerges(Seq("zq").toDF("text"), "text", merges)
      .select(col("tokens")).head().getSeq[String](0)
    assert(cold == Seq("z", "q", "</w>"))
  }

  test("merge table round-trips through the catalog and encodes identically") {
    val docs = Seq("low lower lowest", "new newer newest").toDF("text")
    val (merges, _) = Bpe.train(docs, "text", 4)
    val dir = java.nio.file.Files.createTempDirectory("bpe_").toString + "/merges"
    Bpe.saveMerges(spark, merges, dir)
    val loaded = Bpe.loadMerges(spark, dir)
    assert(loaded == merges)
    val a = Bpe.encodeWithMerges(docs, "text", merges)
      .select("tokens").as[Seq[String]].collect().toSeq
    val b = Bpe.encodeWithMerges(docs, "text", loaded)
      .select("tokens").as[Seq[String]].collect().toSeq
    assert(a == b)
  }

  test("trainLocal: merge-for-merge parity with the distributed trainer") {
    // mixed corpus with ties, overlaps (banana: an-an), and shared
    // prefixes — the cases where argmax tie-break and LTR semantics bite
    val docs = (Seq("low low low lower lowest", "new newer newest newer",
      "banana band bandana ana", "the cat sat on the mat") ++
      (1 to 20).map(i => s"repeat token mass r${i % 7}")).toDF("text")
    val (a, wa) = Bpe.train(docs, "text", numMerges = 12)
    val (b, wb) = Bpe.trainLocal(docs, "text", numMerges = 12)
    assert(a == b, s"merge tables diverge:\n$a\n$b")
    val ka = wa.select("w", "syms", "freq").as[(String, Seq[String], Long)]
      .collect().sortBy(_._1).toSeq
    val kb = wb.select("w", "syms", "freq").as[(String, Seq[String], Long)]
      .collect().sortBy(_._1).toSeq
    assert(ka == kb, "final word tables diverge")
  }

  test("trainLocal: early-stop parity when pairs exhaust before the budget") {
    val docs = Seq("ab ab ab").toDF("text") // 'a b </w>': only 2 merges exist
    val (a, _) = Bpe.train(docs, "text", numMerges = 10)
    val (b, _) = Bpe.trainLocal(docs, "text", numMerges = 10)
    assert(a == b)
    assert(b.length < 10, s"tiny corpus must exhaust early: ${b.length}")
  }

  test("trainLocal: decrement-heavy corpus keeps the heap honest") {
    // many words share pairs whose counts DROP as other merges steal
    // adjacencies — exercises the lazy-deletion push-on-decrement path
    val docs = (1 to 40).map(i =>
      s"aaaa aaab aabb abbb bbbb ${"ab" * (i % 4 + 1)}").toDF("text")
    val (a, _) = Bpe.train(docs, "text", numMerges = 8)
    val (b, _) = Bpe.trainLocal(docs, "text", numMerges = 8)
    assert(a == b, s"diverge:\n$a\n$b")
  }

  test("trainLocal: maxVocabRows guard fails loudly with the dial named") {
    val docs = Seq("one two three four five six").toDF("text")
    val e = intercept[IllegalArgumentException] {
      Bpe.trainLocal(docs, "text", numMerges = 2, maxVocabRows = 3L)
    }
    assert(e.getMessage.contains("minFreq"), e.getMessage)
  }

  test("encodeStats: merges strictly compress the corpus token count") {
    val docs = Seq("the cat sat on the mat", "the mats were theirs",
      "low lower lowest", "banana bandana").toDF("text")
    val (_, words) = Bpe.train(docs, "text", 5)
    val st = Bpe.encodeStats(words).head()
    val (before, after) = (st.getAs[Long]("tokens_before"), st.getAs[Long]("tokens_after"))
    assert(after < before, s"5 merges must compress: $after vs $before")
    // token mass is conserved per merge: each application removes exactly
    // one token instance, so after >= before - 5 * max pair count is loose;
    // the tight invariant: after = before - sum(applied merge applications) > 0
    assert(after > 0)
  }
}
