package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc profiler: time named SparkEntry queries (args: sfDir q1 q2 …),
  * printing per-run seconds and the formatted plan on request via
  * SPARK_GRAFT_EXPLAIN=1. Not part of the driver contract. */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail.toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (name <- names; run <- 1 to 2) {
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, sfDir)
      if (sys.env.contains("SPARK_GRAFT_EXPLAIN") && run == 1) df.explain("formatted")
      df.write.format("noop").mode("overwrite").save()
      println(f"PROFILE $name run$run ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
