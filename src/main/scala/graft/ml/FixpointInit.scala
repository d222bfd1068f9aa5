package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Shared preamble of the 2-D embedding fixpoint siblings
 * ([[TsneFixpoint]], [[UmapFixpoint]]): deterministic point collection
 * and the splitmix64-u01 layout init, with the matching DuckDB CTE
 * emitter — ONE definition of the init convention, so a change to the
 * u01 scaling or the xor-key folding cannot desynchronize the four
 * call sites it used to live in.
 */
private[ml] object FixpointInit {

  /** First `n` ids' first `d` coordinates, id-sorted: (ids, xs). */
  def collectPoints(df: DataFrame, idCol: String, vecCol: String,
                    n: Int, d: Int): (Array[Long], Array[Array[Double]]) = {
    val rows = df.filter(col(idCol) < n)
      .select(col(idCol).cast("long").as("id"), col(vecCol))
      .collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).iterator.take(d).map(_.toDouble).toArray))
      .sortBy(_._1)
    require(rows.length >= 2, "need at least 2 points")
    (rows.map(_._1), rows.map(_._2))
  }

  /** Hash-u01 2-D init: y_i = ((u01(seed⊕id)·2−1)·scale,
    * (u01(~seed⊕id)·2−1)·scale). */
  def hashInit(ids: Array[Long], seed: Long,
               initScale: Double): Array[Array[Double]] =
    Array.tabulate(ids.length)(i => Array(
      (Explain.u01(seed ^ ids(i)) * 2 - 1) * initScale,
      (Explain.u01(~seed ^ ids(i)) * 2 - 1) * initScale))

  /** The exact SQL form of [[Explain.u01]] over a Mix64Sql final z. */
  val u01Sql = "(z // 2048)::DOUBLE / 9007199254740992.0"

  /** The shared CTE prefix: `pts` (id, xs) + the k1/k2 splitmix64
    * chains + `y_0` mirroring [[hashInit]]. Callers append their own
    * weight/iteration CTEs. */
  def initCtes(table: String, idCol: String, vecCol: String,
               n: Int, d: Int, seed: Long, initScale: Double): String =
    s"""pts AS MATERIALIZED (
      |  SELECT $idCol AS id,
      |    list_transform($vecCol[1:$d], v -> CAST(v AS DOUBLE)) AS xs
      |  FROM $table WHERE $idCol < $n),
      |${graft.functions.Mix64Sql.ctes("k1", "pts", Seq("id"),
           s"xor(CAST($seed AS BIGINT), id)")},
      |${graft.functions.Mix64Sql.ctes("k2", "pts", Seq("id"),
           s"xor(CAST(${~seed} AS BIGINT), id)")},
      |y_0 AS MATERIALIZED (
      |  SELECT a.id,
      |    (${u01Sql.replace("z ", "a.z ")} * 2 - 1)
      |      * CAST($initScale AS DOUBLE) AS y1,
      |    (${u01Sql.replace("z ", "b.z ")} * 2 - 1)
      |      * CAST($initScale AS DOUBLE) AS y2
      |  FROM k16 a JOIN k26 b ON b.id = a.id)""".stripMargin
}
