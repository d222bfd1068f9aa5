package graft

import graft.operators.ParquetFooter

/** Footer-probe invariants against TWO independent writers: the
  * driver's testdata files and Spark's own parquet output. num_rows
  * must equal the engine's count, schema names must match, row-group
  * row counts must sum to the total, and IO stays footer-sized. */
class ParquetFooterSpec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  test("driver-written testdata footers parse and agree with Spark's counts") {
    for (t <- Seq("region", "nation", "documents", "embeddings")) {
      val path = s"$dir/$t.parquet"
      val f = ParquetFooter.parseFile(path)
      assert(f.isDefined, s"$t footer refused")
      val got = f.get
      val expected = spark.read.parquet(path).count()
      assert(got.numRows == expected, s"$t: footer says ${got.numRows}, scan says $expected")
      assert(got.rowGroups.nonEmpty && got.rowGroups.map(_.numRows).sum == got.numRows,
        s"$t: row-group rows do not sum to the total")
      assert(got.rowGroups.forall(_.nColumns == got.columnNames.length),
        s"$t: row-group chunk count != column count")
      assert(got.createdBy.nonEmpty, s"$t: missing created_by")
    }
  }

  test("column names match the engine's schema (documents)") {
    val f = ParquetFooter.parseFile(s"$dir/documents.parquet").get
    val engine = spark.read.parquet(s"$dir/documents.parquet").columns.toSeq
    assert(f.columnNames == engine,
      s"footer names ${f.columnNames} != engine $engine")
  }

  test("a SPARK-written file (second independent writer) parses identically") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("pqprobe").toString
    try {
      (0 until 1000).map(i => (i.toLong, s"row $i", i * 0.5))
        .toDF("id", "name", "score")
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val f = ParquetFooter.parseFile(part.getAbsolutePath)
      assert(f.isDefined, "Spark-written footer refused")
      assert(f.get.numRows == 1000)
      assert(f.get.columnNames == Seq("id", "name", "score"))
      assert(f.get.createdBy.toLowerCase.contains("parquet"),
        s"unexpected created_by: ${f.get.createdBy}")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
  }

  test("thrift skip stays aligned across bool collection elements") {
    // a bool FIELD packs its value in the header nibble, but each bool
    // ELEMENT of a collection is one byte (0x01/0x02) — parquet.thrift
    // has no list<bool> today, but a foreign writer's extension field
    // must not misalign the walker.
    // list<bool> [true, false, true]: header (3 << 4) | TBoolTrue, 3 bytes
    val listBool = Array[Byte](0x31, 0x01, 0x02, 0x01)
    assert(ParquetFooter.consumedBySkip(listBool, 9) == 4) // TList
    // struct { 1: list<bool> [t,f]; 2: i32 3 } — skipping the whole
    // struct must land exactly on the byte after TStop
    val struct = Array[Byte](
      0x19, 0x21, 0x01, 0x02, // field 1: list header (2 elems, bool), t, f
      0x15, 0x06,             // field 2 (delta 1, i32), zigzag(3)
      0x00)                   // TStop
    assert(ParquetFooter.consumedBySkip(struct, 12) == 7) // TStruct
    // map<bool,bool> {t:f}: size varint 1, types (bool,bool), 2 bytes
    val mapBool = Array[Byte](0x01, 0x11, 0x01, 0x02)
    assert(ParquetFooter.consumedBySkip(mapBool, 11) == 4) // TMap
  }

  test("malformation is refused: bad magic, truncated footer, absurd length") {
    val good = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/region.parquet"))
    assert(ParquetFooter.parse(good).isDefined)
    val noMagic = good.clone(); noMagic(good.length - 1) = 'X'
    assert(ParquetFooter.parse(noMagic).isEmpty)
    assert(ParquetFooter.parse(good.take(good.length / 2)).isEmpty)
    val badLen = good.clone()
    badLen(good.length - 8) = 0xff.toByte; badLen(good.length - 7) = 0xff.toByte
    badLen(good.length - 6) = 0xff.toByte; badLen(good.length - 5) = 0x7f.toByte
    assert(ParquetFooter.parse(badLen).isEmpty)
  }

  test("first-column statistics match the data; pruning keeps exactly the hit groups") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("pqstats").toString
    try {
      // force several small row groups with a sorted key so min/max
      // ranges tile: block size floor ~ a few KB per group
      val hconf = spark.sparkContext.hadoopConfiguration
      hconf.setInt("parquet.block.size", 4096)
      (0 until 20000).map(i => (i.toLong, s"payload-$i-abcdefghijklmnop"))
        .toDF("id", "payload").orderBy("id")
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val f = ParquetFooter.parseFile(part.getAbsolutePath).get
      assert(f.rowGroups.length >= 3, s"only ${f.rowGroups.length} row groups - raise the data size")
      assert(f.firstColMin.contains(0L) && f.firstColMax.contains(19999L))
      // groups are sorted tiles: pruning a narrow range keeps few groups
      val kept = ParquetFooter.pruneRowGroups(f, 100, 200)
      assert(kept.nonEmpty && kept.length < f.rowGroups.length,
        s"pruning kept ${kept.length} of ${f.rowGroups.length}")
      // soundness: kept groups contain every matching row
      assert(kept.map(_.numRows).sum >= 101)
      // stats are per-group tight: every group's [min,max] within file bounds
      assert(f.rowGroups.forall(g => g.firstColMin.exists(_ >= 0) &&
        g.firstColMax.exists(_ <= 19999)))
    } finally {
      val hconf2 = spark.sparkContext.hadoopConfiguration
      hconf2.unset("parquet.block.size")
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
  }
}
