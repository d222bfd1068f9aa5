package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Query auto-routing and self-learning parameter tuning (SURVEY §4;
 * reference `NeuronDB/src/planner/planner.c`).
 *
 * [[routeQuery]] ports `auto_route_query` (`planner.c:49-91`): choose ANN
 * vs exact scan from dimensionality and corpus size — but cost-based on
 * row count rather than the reference's query-substring heuristic
 * (SURVEY §7.4 lists that heuristic as a quirk not to replicate).
 *
 * [[Tuner]] ports `learn_from_query` (`planner.c:96-310`): per
 * query-fingerprint stats adapt the probe width toward a recall band and
 * a latency band — ef_search ±8 within [8,256] toward recall∈[0.90,0.99],
 * beam ±2 within [2,64] toward latency∈[15,100] ms (`planner.c:220-237`).
 * Here the adapted knob is IVF `nprobe` (the engine's ANN parameter), with
 * the reference's step sizes and clamps expressed as fractions of nlists.
 */
object AutoTune {

  /** djb2 fingerprint of the query text, as `learn_from_query` does. */
  def fingerprint(query: String): Long = {
    var h = 5381L
    query.foreach(c => h = ((h << 5) + h) ^ c.toLong)
    h & 0xFFFFFFFFL
  }

  /** ANN when the corpus is large enough to amortize index probing and
    * the vectors are high-dimensional; exact otherwise. */
  def routeQuery(rowCount: Long, dim: Int, k: Int): String =
    if (rowCount < 10000L * math.max(1, k)) "exact"
    else if (dim > 128) "ann"
    else if (rowCount > 1000000L) "ann"
    else "exact"

  /** `scale_precision` (`planner.c:368-451`): storage precision from
    * memory pressure and observed recall. */
  def scalePrecision(memoryPressure: Double, recall: Double): String =
    if (memoryPressure > 0.8 || recall < 0.85) "int8"
    else if (memoryPressure > 0.6 || recall < 0.90) "fp16"
    else "fp32"

  case class Observation(fingerprint: Long, nprobe: Int, recall: Double, latencyMs: Double)

  /** In-memory analog of `neurondb_query_history`; persists to parquet so
    * learned parameters survive sessions, like the lazily-created history
    * table (`planner.c:146-162`). */
  class Tuner(var nlists: Int,
              recallBand: (Double, Double) = (0.90, 0.99),
              latencyBandMs: (Double, Double) = (15.0, 100.0)) {

    private val state = scala.collection.mutable.Map.empty[Long, Int]
    private val history = scala.collection.mutable.ArrayBuffer.empty[Observation]

    private def step: Int = math.max(1, nlists / 16) // reference ±8 of 128
    private def clamp(n: Int): Int = math.max(1, math.min(nlists, n))

    def nprobeFor(query: String, default: Int = 10): Int =
      state.getOrElse(fingerprint(query), clamp(default))

    /** One adaptation step: recall below band → widen; latency above band
      * (recall already at/above the band floor) → narrow. Recall takes
      * precedence — a query that is both slow AND under-recalling widens,
      * because narrowing would trade correctness for speed. */
    def observe(query: String, nprobe: Int, recall: Double, latencyMs: Double): Int = {
      val fp = fingerprint(query)
      history += Observation(fp, nprobe, recall, latencyMs)
      val next =
        if (recall < recallBand._1) clamp(nprobe + step)
        else if (latencyMs > latencyBandMs._2) clamp(nprobe - step)
        else nprobe
      state(fp) = next
      next
    }

    def save(spark: SparkSession, path: String): Unit = {
      import spark.implicits._
      history.toSeq.toDF().write.mode("overwrite").parquet(s"$path/query_history")
      state.toSeq.toDF("fingerprint", "nprobe")
        .write.mode("overwrite").parquet(s"$path/learned_params")
    }

    def load(spark: SparkSession, path: String): Unit = {
      import spark.implicits._
      spark.read.parquet(s"$path/learned_params").as[(Long, Int)]
        .collect().foreach { case (fp, np) => state(fp) = np }
      // restore the history too — save() overwrites both files, so loading
      // only the params would truncate accumulated history to whatever
      // this session observes
      history ++= spark.read.parquet(s"$path/query_history").as[Observation].collect()
    }
  }
}
