package graft

import org.apache.spark.sql.functions._
import graft.operators.Zorder

class ZorderSpec extends SparkSpecBase {
  import spark.implicits._

  private def mortonRef(qa: Int, qb: Int): Long = {
    var z = 0L
    for (j <- 0 until 16) {
      z |= ((qa >> j) & 1).toLong << (2 * j + 1)
      z |= ((qb >> j) & 1).toLong << (2 * j)
    }
    z
  }

  test("spread/interleave equals the bit-by-bit Morton reference") {
    val pairs = Seq((0, 0), (1, 0), (0, 1), (65535, 65535), (0xABCD, 0x1234),
      (255, 256), (32768, 1))
    val df = pairs.toDF("qa", "qb")
      .select(col("qa"), col("qb"),
        Zorder.interleave(col("qa").cast("long"), col("qb").cast("long")).as("z"))
    df.collect().foreach { r =>
      assert(r.getLong(2) == mortonRef(r.getInt(0), r.getInt(1)),
        s"(${r.getInt(0)}, ${r.getInt(1)})")
    }
  }

  test("layoutStats: bucket envelopes cover all rows; plan is all-native") {
    // a 256x256 grid: both dims uniform, independent
    val rows = for (a <- 0L until 256L; b <- 0L until 256L) yield (a * 7L, b * 13L)
    val df = rows.toDF("a", "b")
    val stats = Zorder.layoutStats(df, "a", "b", shift = 24)
    assert(!stats.queryExecution.executedPlan.toString.contains("BatchEvalPython"))
    assert(!stats.queryExecution.analyzed.toString.toLowerCase.contains("scalaudf"),
      "z-order must be all-native (codegen'd bitwise ops)")
    val st = stats.collect()
    assert(st.map(_.getAs[Long]("n")).sum == rows.size.toLong)
    // every bucket's envelope is internally consistent
    st.foreach { r =>
      assert(r.getAs[Long]("a_min") <= r.getAs[Long]("a_max"))
      assert(r.getAs[Long]("b_min") <= r.getAs[Long]("b_max"))
    }
  }

  test("z-order prunes 2-D boxes that a single-column sort cannot") {
    // uniform 2-D grid; the box is ~6% of each axis => ~0.4% of rows
    val rows = for (a <- 0L until 256L; b <- 0L until 256L) yield (a, b)
    val df = rows.toDF("a", "b")

    def statsOf(frame: org.apache.spark.sql.DataFrame) =
      frame.collect().map(r => (r.getAs[Long]("n"),
        r.getAs[Long]("a_min"), r.getAs[Long]("a_max"),
        r.getAs[Long]("b_min"), r.getAs[Long]("b_max")))

    val zStats = statsOf(Zorder.layoutStats(df, "a", "b", shift = 24)) // 256 buckets
    // single-column layout stand-in: bucket by a's value range only
    // (what sorting files by `a` gives), same bucket count
    val aStats = statsOf(
      df.groupBy(col("a").as("bucket"))
        .agg(count(lit(1)).as("n"),
          min("a").as("a_min"), max("a").as("a_max"),
          min("b").as("b_min"), max("b").as("b_max")))

    val (aLo, aHi, bLo, bHi) = (100L, 115L, 60L, 75L)
    val zFrac = Zorder.scanFraction(zStats, aLo, aHi, bLo, bHi)
    val aFrac = Zorder.scanFraction(aStats, aLo, aHi, bLo, bHi)
    // single-column layout prunes on `a` only: reads ~|aHi-aLo|/256 of rows
    // but z-order prunes on both dimensions
    assert(zFrac < aFrac, s"z-order ($zFrac) must beat single-column ($aFrac)")
    assert(zFrac < 0.05, s"z-order should read <5% for a ~0.4% box, got $zFrac")
  }

  test("layoutStats rejects degenerate ranges") {
    val df = Seq((1L, 5L), (1L, 9L)).toDF("a", "b")
    intercept[IllegalArgumentException] {
      Zorder.layoutStats(df, "a", "b", shift = 22)
    }
  }
}
