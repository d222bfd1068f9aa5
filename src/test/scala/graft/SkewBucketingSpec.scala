package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew

class SkewBucketingSpec extends SparkSpecBase {
  import spark.implicits._

  test("salted join returns exactly the unsalted join's result") {
    // heavily skewed left: 90% of rows share key 1
    val left = ((1 to 900).map(i => (1L, s"l$i")) ++ (1 to 100).map(i => (i.toLong + 1, s"x$i")))
      .toDF("k", "lv")
    val right = Seq((1L, "r1"), (2L, "r2"), (50L, "r50")).toDF("k", "rv")
    val expected = left.join(right, "k").select("k", "lv", "rv")
      .collect().map(_.toSeq).sortBy(_.toString)
    val salted = Skew.saltedJoin(left, right, "k", saltFactor = 4)
      .select("k", "lv", "rv").collect().map(_.toSeq).sortBy(_.toString)
    assert(salted.length == expected.length)
    assert(salted.toSeq == expected.toSeq)
  }

  test("salted join spreads a hot key over multiple salts — even for identical rows") {
    // the pathological case salting exists for: the hot key's rows are
    // byte-identical duplicates (null-sentinel pathology); a pure content
    // hash would give them all ONE salt and zero fan-out. The
    // deterministic salt mixes in spark_partition_id(), so identical rows
    // from different input partitions land on different salts.
    val left = spark.range(1000).repartition(16).select(lit(1L).as("k"), lit(0).as("v"))
    val right = Seq((1L, "r")).toDF("k", "rv")
    val salted = Skew.saltedJoin(left, right, "k", saltFactor = 8)
    // mirror the implementation's salt: identical rows still fan out
    // because each input partition contributes to a different salt
    val saltCounts = left.withColumn("__salt",
        pmod(hash(col("k"), col("v"), spark_partition_id()).cast("long") + lit(42L),
          lit(8L)).cast("int"))
      .groupBy("__salt").count().count()
    assert(saltCounts > 1, s"expected identical hot-key rows on >1 salt, got $saltCounts")
    assert(salted.count() == 1000)
  }

  test("salt assignment is deterministic across recomputation (no mono-id)") {
    // SPARK-23207 class: the salt must replay identically when the stage
    // recomputes. Evaluate the salted plan twice — row-for-row identical
    // salt assignment, unlike a monotonically_increasing_id round-robin.
    val left = ((1 to 200).map(i => (1L, s"l$i")) ++ Seq((2L, "x"))).toDF("k", "lv")
    def salts() = left.withColumn("__salt",
        pmod(hash(col("k"), col("lv"), spark_partition_id()).cast("long") + lit(42L),
          lit(4L)).cast("int"))
      .collect().map(r => (r.getString(1), r.getInt(2))).sorted.toSeq
    assert(salts() == salts())
  }

  test("salted join preserves duplicate-row multiplicities exactly") {
    val left = ((1 to 10).map(_ => (1L, "dup")) ++ Seq((2L, "x"))).toDF("k", "lv")
    val right = Seq((1L, "r1"), (1L, "r2"), (2L, "r")).toDF("k", "rv")
    val expected = left.join(right, "k").collect().map(_.toSeq.toString).sorted
    val salted = Skew.saltedJoin(left, right, "k", saltFactor = 4)
      .select("k", "lv", "rv").collect().map(_.toSeq.toString).sorted
    assert(salted.toSeq == expected.toSeq) // 10 dups x 2 right rows + 1
  }

  test("bucketed tables join without an exchange on either side") {
    for (t <- Seq("bucketed_a", "bucketed_b")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
      if (loc.exists()) org.apache.commons.io.FileUtils.deleteDirectory(loc)
    }
    val a = (1 to 500).map(i => (i.toLong, s"a$i")).toDF("k", "av")
    val b = (1 to 500).map(i => (i.toLong, s"b$i")).toDF("k", "bv")
    Skew.writeBucketed(a, "bucketed_a", "k", 4)
    Skew.writeBucketed(b, "bucketed_b", "k", 4)
    // force the sort-merge path (tiny test tables would broadcast)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Skew.bucketedTable(spark, "bucketed_a")
        .join(Skew.bucketedTable(spark, "bucketed_b"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("ShuffleExchange"), s"bucketed join still shuffles: $plan")
      assert(plan.contains("Bucketed: true"), s"bucketed scan not used: $plan")
      assert(joined.count() == 500)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
