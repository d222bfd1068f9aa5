package graft

import org.apache.spark.sql.SparkSession

/** Variance probe: run ONE registered query N times in a single JVM and
  * print per-run wall seconds alongside the JVM GC time accumulated
  * during that run — the tool that separates "the plan is noisy" from
  * "the heap is noisy". Usage:
  * `runMain graft.QueryProbe <name> [sfDir] [runs]`. */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val runs = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.localMeasurement(cpus)
    val fn = SparkEntry.queries(name)
    import scala.jdk.CollectionConverters._
    def gcMs: Long = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum
    var i = 0
    while (i < runs) {
      val g0 = gcMs
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"run=$i%2d sec=$sec%.3f gc_ms=${gcMs - g0}%d")
      i += 1
    }
    spark.stop()
  }
}
