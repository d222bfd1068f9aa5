package graft

import org.apache.spark.sql.functions._

import graft.operators.OrcFooter

/** Native ORC tail walk against files produced by Spark's own orc-core
  * writer — an INDEPENDENT producer (this repo has no ORC encoder), so
  * every assertion here is a foreign-stream decode: postscript codec,
  * footer row counts, root-struct field names, stripe sums, and the
  * file-level IntegerStatistics min/max. Plus loud refusal on
  * truncation and on non-ORC bytes. */
class OrcFooterSpec extends SparkSpecBase {

  private def writeOne(codec: String, rows: Int): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory(s"orc_spec_$codec").toString
    (1 to rows).map(i => (i.toLong * 3 + 7, s"name$i", i * 0.5))
      .toDF("id", "name", "score")
      .coalesce(1).write.mode("overwrite").option("compression", codec).orc(dir)
    val fs = new java.io.File(dir).listFiles((_, n) => n.endsWith(".orc"))
    assert(fs != null && fs.length == 1)
    fs.head.getPath
  }

  for (codec <- Seq("none", "zlib", "snappy", "lz4", "zstd")) {
    test(s"foreign stream ($codec): rows, schema, key stats from the tail alone") {
      val t = OrcFooter.parseFile(writeOne(codec, 200)).get
      assert(t.compression == codec)
      assert(t.numRows == 200L)
      assert(t.fieldNames == Seq("id", "name", "score"))
      assert(t.stripes.map(_.numRows).sum == 200L)
      assert(t.firstColMin.contains(10L) && t.firstColMax.contains(607L))
    }
  }

  test("zigzag stats: negative minimum decodes (sint64 on the wire)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("orc_spec_neg").toString
    Seq(-5L, 0L, 12L).toDF("k")
      .coalesce(1).write.mode("overwrite").option("compression", "zstd").orc(dir)
    val f = new java.io.File(dir).listFiles((_, n) => n.endsWith(".orc")).head
    val t = OrcFooter.parseFile(f.getPath).get
    assert(t.firstColMin.contains(-5L) && t.firstColMax.contains(12L))
  }

  test("refusal: truncated tail and non-ORC bytes both return None") {
    val path = writeOne("zstd", 50)
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    val cut = java.nio.file.Files.createTempFile("orc_cut", ".orc")
    java.nio.file.Files.write(cut, java.util.Arrays.copyOf(bytes, bytes.length / 3))
    assert(OrcFooter.parseFile(cut.toString).isEmpty)
    val junk = java.nio.file.Files.createTempFile("orc_junk", ".orc")
    java.nio.file.Files.write(junk, Array.fill[Byte](64)(0x41))
    assert(OrcFooter.parseFile(junk.toString).isEmpty)
  }

  test("probe reads NO stripe data: tail bytes alone reproduce the footer") {
    // hand the parser only the file's last 4 KiB via a copy whose body is
    // zeroed — the numbers must still come out (the 100 TB contract).
    val path = writeOne("zlib", 20000)
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    assert(bytes.length > 8192, "fixture too small to prove anything")
    java.util.Arrays.fill(bytes, 0, bytes.length - 4096, 0.toByte)
    val scrub = java.nio.file.Files.createTempFile("orc_scrub", ".orc")
    java.nio.file.Files.write(scrub, bytes)
    val t = OrcFooter.parseFile(scrub.toString).get
    assert(t.numRows == 20000L && t.fieldNames.length == 3)
  }

  test("tail parse survives exhaustive truncation and bit flips (fuzz sweep)") {
    // the DecoderFuzzSpec contract for the one probe that reads from a
    // path: every strict prefix and every low-bit flip goes through a
    // temp file; the parse may refuse (None) but must never throw
    val path = writeOne("none", 25)
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    assert(OrcFooter.parseFile(path).isDefined)
    val tmp = java.nio.file.Files.createTempFile("orc_fuzz", ".orc")
    def run(b: Array[Byte], what: String): Unit = {
      java.nio.file.Files.write(tmp, b)
      try OrcFooter.parseFile(tmp.toString)
      catch { case e: Throwable =>
        fail(s"orc $what threw ${e.getClass.getName}: ${e.getMessage}") }
    }
    for (n <- 0 until bytes.length) run(bytes.take(n), s"truncation at $n")
    for (i <- bytes.indices) {
      val c = bytes.clone(); c(i) = (c(i) ^ 1).toByte
      run(c, s"bit flip at $i")
    }
  }
}
