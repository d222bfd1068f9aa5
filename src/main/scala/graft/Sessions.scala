package graft

import org.apache.spark.sql.SparkSession

/** The one local-session recipe shared by every measurement main
  * (Bench, ScaleBench, QueryProbe): a config drift between them would
  * make the variance probe measure a differently-planned query than
  * the benchmark it explains. `Verify` keeps its own builder — the
  * correctness gate deliberately runs WITHOUT adaptive execution so
  * dumped plans are deterministic run-to-run. */
object Sessions {
  def localMeasurement(cpus: String): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
