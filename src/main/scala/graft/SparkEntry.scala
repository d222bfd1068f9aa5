package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

import graft.functions.{Embeddings, VectorAggregates => VA, VectorFunctions => VF}

/**
 * Driver contract: one `queries` entry (+ DuckDB `oracleSql` where
 * expressible) per implemented operator from SURVEY.md §2.
 *
 * Numeric conventions for oracle parity (BASELINE.md):
 *  - money-ish SUMs go through DECIMAL(18,4) so both engines sum exactly,
 *    then cast back to DOUBLE (deterministic in both);
 *  - float4-truncating element-wise ops are replicated in DuckDB with
 *    `CAST(... AS REAL)` so values match exactly;
 *  - distance outputs are double-accumulated on both sides and rounded to
 *    6 decimals.
 */
object SparkEntry {

  /** Flagship: embed documents with the deterministic fallback embedder and
    * rank them against a query string — the reference's `rag_query` shape
    * (`NeuronDB/neurondb--1.0.sql:6065-6089`). */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val docs = Tables.read(spark, dir, "documents")
      .withColumn("embedding", Embeddings.embed_text(col("text"), lit("all-MiniLM-L6-v2")))
    val qv = Embeddings.embedText("fast query sort merge join", "all-MiniLM-L6-v2")
    docs
      .withColumn("dist", VF.cosineUdf(col("embedding"), lit(qv)))
      .orderBy(col("dist"), col("doc_id"))
      .select(col("doc_id"), col("text"), round(col("dist"), 6).as("dist"))
      .limit(10)
  }

  private def dec(c: Column): Column = c.cast(DecimalType(18, 4))
  /** Exact decimal sum, then deterministic cast back to double. */
  private def dsum(c: Column): Column = sum(dec(c)).cast("double")

  /** The fixed query vector for the kNN oracle queries: embeddings.vec_id=0. */
  private def qvec(s: SparkSession, dir: String): Array[Float] =
    Tables.queryVector(s, dir, 0L)

  private val qvecSql = "(SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 0)"

  // ======================================================================
  // Relational core (scan / filter / agg / join / top-k / window)
  // ======================================================================

  private def q1Agg(s: SparkSession, dir: String): DataFrame =
    Tables.read(s, dir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
        (sum(dec(col("l_discount"))).cast("double") / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))

  private val q1AggSql =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
      |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
      |  CAST(sum(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem GROUP BY 1, 2""".stripMargin

  private def q2Join(s: SparkSession, dir: String): DataFrame = {
    val customer = Tables.read(s, dir, "customer")
    val orders = Tables.read(s, dir, "orders")
    val nation = Tables.read(s, dir, "nation")
    orders
      .join(broadcast(customer), orders("o_custkey") === customer("c_custkey"))
      .join(broadcast(nation), customer("c_nationkey") === nation("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(dsum(col("o_totalprice")).as("revenue"), count(lit(1)).as("n_orders"))
  }

  private val q2JoinSql =
    """SELECT n_name,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
      |  count(*) AS n_orders
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY 1""".stripMargin

  private def q3Topk(s: SparkSession, dir: String): DataFrame =
    Tables.read(s, dir, "orders")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .select(col("o_orderkey"), col("o_totalprice"))
      .limit(10)

  private val q3TopkSql =
    "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10"

  private def q4Window(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.read(s, dir, "orders")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("o_custkey"), col("o_orderkey").as("first_orderkey"),
        col("o_totalprice").as("first_totalprice"))
  }

  private val q4WindowSql =
    """SELECT o_custkey, o_orderkey AS first_orderkey, o_totalprice AS first_totalprice
      |FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn
      |      FROM orders) WHERE rn = 1""".stripMargin

  // ======================================================================
  // Distance metrics + kNN top-k (SURVEY §2.3, §2.5)
  // ======================================================================

  private def knnBy(s: SparkSession, dir: String, distUdf: (Column, Column) => Column): DataFrame = {
    val q = qvec(s, dir)
    Tables.read(s, dir, "embeddings")
      .withColumn("dist", distUdf(col("embedding"), lit(q)))
      .orderBy(col("dist"), col("vec_id"))
      .select(col("vec_id"), round(col("dist"), 6).as("dist"))
      .limit(10)
  }

  private def vL2Knn(s: SparkSession, dir: String): DataFrame = knnBy(s, dir, VF.l2Udf(_, _))
  private val vL2KnnSql =
    s"""SELECT vec_id, round(list_distance(embedding::DOUBLE[], $qvecSql), 6) AS dist
       |FROM embeddings
       |ORDER BY list_distance(embedding::DOUBLE[], $qvecSql), vec_id LIMIT 10""".stripMargin

  private def vCosineKnn(s: SparkSession, dir: String): DataFrame = knnBy(s, dir, VF.cosineUdf(_, _))
  private val vCosineKnnSql =
    s"""SELECT vec_id, round(1.0 - list_cosine_similarity(embedding::DOUBLE[], $qvecSql), 6) AS dist
       |FROM embeddings
       |ORDER BY 1.0 - list_cosine_similarity(embedding::DOUBLE[], $qvecSql), vec_id LIMIT 10""".stripMargin

  private def vIpKnn(s: SparkSession, dir: String): DataFrame = knnBy(s, dir, VF.ipUdf(_, _))
  private val vIpKnnSql =
    s"""SELECT vec_id, round(-list_inner_product(embedding::DOUBLE[], $qvecSql), 6) AS dist
       |FROM embeddings
       |ORDER BY -list_inner_product(embedding::DOUBLE[], $qvecSql), vec_id LIMIT 10""".stripMargin

  /** All long-tail metrics against the fixed query vector, one row per vector. */
  private def vDistances(s: SparkSession, dir: String): DataFrame = {
    val q = qvec(s, dir)
    val qc = lit(q)
    Tables.read(s, dir, "embeddings")
      .select(
        col("vec_id"),
        round(VF.l1Udf(col("embedding"), qc), 6).as("l1"),
        round(VF.chebyshevUdf(col("embedding"), qc), 6).as("chebyshev"),
        round(VF.squaredL2Udf(col("embedding"), qc), 6).as("sq_l2"),
        round(VF.minkowskiUdf(col("embedding"), qc, lit(3.0)), 6).as("minkowski3"),
        VF.hammingUdf(col("embedding"), qc).as("hamming"))
  }

  private val vDistancesSql =
    s"""WITH q AS (SELECT $qvecSql AS qv)
       |SELECT vec_id,
       |  round(list_sum(list_transform(range(1, len(embedding)+1), i -> abs(embedding[i]::DOUBLE - qv[i]))), 6) AS l1,
       |  round(list_max(list_transform(range(1, len(embedding)+1), i -> abs(embedding[i]::DOUBLE - qv[i]))), 6) AS chebyshev,
       |  round(list_sum(list_transform(range(1, len(embedding)+1), i -> (embedding[i]::DOUBLE - qv[i]) * (embedding[i]::DOUBLE - qv[i]))), 6) AS sq_l2,
       |  round(pow(list_sum(list_transform(range(1, len(embedding)+1), i -> pow(abs(embedding[i]::DOUBLE - qv[i]), 3.0))), 1.0/3.0), 6) AS minkowski3,
       |  len(list_filter(range(1, len(embedding)+1), i -> embedding[i] <> qv[i]::FLOAT)) AS hamming
       |FROM embeddings, q""".stripMargin

  // ======================================================================
  // Per-vector norms / stats / element-wise transforms (SURVEY §2.2)
  // ======================================================================

  private def vNormStats(s: SparkSession, dir: String): DataFrame =
    Tables.read(s, dir, "embeddings")
      .select(
        col("vec_id"),
        round(VF.normUdf(col("embedding")), 6).as("norm"),
        round(VF.elementSumUdf(col("embedding")), 6).as("elem_sum"),
        round(VF.meanUdf(col("embedding")), 6).as("elem_mean"),
        VF.minElemUdf(col("embedding")).cast("double").as("elem_min"),
        VF.maxElemUdf(col("embedding")).cast("double").as("elem_max"),
        VF.dimsUdf(col("embedding")).as("dims"))

  private val vNormStatsSql =
    """SELECT vec_id,
      |  round(sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x*x))), 6) AS norm,
      |  round(list_sum(embedding::DOUBLE[]), 6) AS elem_sum,
      |  round(list_sum(embedding::DOUBLE[]) / len(embedding), 6) AS elem_mean,
      |  list_min(embedding)::DOUBLE AS elem_min,
      |  list_max(embedding)::DOUBLE AS elem_max,
      |  len(embedding) AS dims
      |FROM embeddings""".stripMargin

  /** Element-wise pipeline scale*2 → translate+1 → clip[-0.2,0.2], exploded to
    * scalar rows; DuckDB replicates each float4 truncation with CAST AS REAL. */
  private def vElementwise(s: SparkSession, dir: String): DataFrame =
    Tables.read(s, dir, "embeddings")
      .filter(col("vec_id") < 20)
      .select(col("vec_id"),
        posexplode(
          VF.clipUdf(
            VF.translateUdf(VF.scaleUdf(col("embedding"), lit(2.0)), lit(1.0)),
            lit(-0.2), lit(1.2))))
      .select(col("vec_id"), col("pos"), col("col").cast("double").as("val"))

  private val vElementwiseSql =
    """SELECT vec_id,
      |  unnest(range(0, len(embedding))) AS pos,
      |  unnest(list_transform(embedding, x ->
      |    CAST(greatest(-0.2, least(1.2, CAST(CAST(x::DOUBLE * 2.0 AS REAL)::DOUBLE + 1.0 AS REAL)::DOUBLE)) AS REAL)::DOUBLE)) AS val
      |FROM embeddings WHERE vec_id < 20""".stripMargin

  /** normalize(): per-element x/||v||, float4-truncated; exploded. */
  private def vNormalize(s: SparkSession, dir: String): DataFrame =
    Tables.read(s, dir, "embeddings")
      .filter(col("vec_id") < 20)
      .select(col("vec_id"), posexplode(VF.normalizeUdf(col("embedding"))))
      .select(col("vec_id"), col("pos"), col("col").cast("double").as("val"))

  private val vNormalizeSql =
    """SELECT vec_id,
      |  unnest(range(0, len(embedding))) AS pos,
      |  unnest(list_transform(embedding, x ->
      |    CAST(x::DOUBLE / sqrt(list_sum(list_transform(embedding::DOUBLE[], y -> y*y))) AS REAL)::DOUBLE)) AS val
      |FROM embeddings WHERE vec_id < 20""".stripMargin

  // ======================================================================
  // kNN operators / IVF index / vec_join (SURVEY §2.1, §2.5)
  // ======================================================================

  /** IVF probe with nprobe=nlists is exhaustive, so it must reproduce the
    * brute-force top-10 exactly (BASELINE.md recall convention). */
  private def ivfKnnExact(s: SparkSession, dir: String): DataFrame = {
    val q = qvec(s, dir)
    val model = operators.Ivf.build(
      Tables.read(s, dir, "embeddings"), "embedding", nlists = 16, seed = 42L)
    model.search(q, k = 10, nprobe = 16)
      .select(col("vec_id"), round(col("distance"), 6).as("dist"))
  }

  private val ivfKnnExactSql = vL2KnnSql // identical contract to brute force

  /** vec_join: all pairs within L2 threshold 1.2 (~1% of pairs). */
  private def vecJoinPairs(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.read(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
    operators.Knn.vecJoin(e, e, "embedding", "embedding", "l2", threshold = 1.2)
      .filter(col("l_vec_id") < col("r_vec_id"))
      .select(col("l_vec_id").as("a_id"), col("r_vec_id").as("b_id"),
        round(col("distance"), 6).as("dist"))
  }

  private val vecJoinPairsSql =
    """SELECT a.vec_id AS a_id, b.vec_id AS b_id,
      |  round(list_distance(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS dist
      |FROM embeddings a, embeddings b
      |WHERE a.vec_id < b.vec_id
      |  AND list_distance(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) <= 1.2""".stripMargin

  /** build_knn_graph: top-3 neighbors per node over the first 100 vectors. */
  private def knnGraph(s: SparkSession, dir: String): DataFrame =
    operators.Knn.buildKnnGraph(
      Tables.read(s, dir, "embeddings").filter(col("vec_id") < 100), "vec_id", "embedding", k = 3)
      .select(col("src"), col("dst"), col("rank"), round(col("distance"), 6).as("dist"))

  private val knnGraphSql =
    """SELECT src, dst, rank, dist FROM (
      |  SELECT a.vec_id AS src, b.vec_id AS dst,
      |    row_number() OVER (PARTITION BY a.vec_id
      |      ORDER BY list_distance(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), b.vec_id) AS rank,
      |    round(list_distance(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS dist
      |  FROM embeddings a, embeddings b
      |  WHERE a.vec_id < 100 AND b.vec_id < 100 AND a.vec_id <> b.vec_id)
      |WHERE rank <= 3""".stripMargin

  /** faceted_vector_search: top-3 per label facet. */
  private def facetedKnn(s: SparkSession, dir: String): DataFrame = {
    val q = qvec(s, dir)
    operators.Knn.searchFaceted(
      Tables.read(s, dir, "embeddings"), "embedding", "label", q, 3, "l2", tieBreak = Seq("vec_id"))
      .select(col("label"), col("vec_id"), col("rank"), round(col("distance"), 6).as("dist"))
  }

  private val facetedKnnSql =
    s"""SELECT label, vec_id, rank, dist FROM (
       |  SELECT label, vec_id,
       |    row_number() OVER (PARTITION BY label
       |      ORDER BY list_distance(embedding::DOUBLE[], $qvecSql), vec_id) AS rank,
       |    round(list_distance(embedding::DOUBLE[], $qvecSql), 6) AS dist
       |  FROM embeddings)
       |WHERE rank <= 3""".stripMargin

  // ======================================================================
  // Vector aggregates (SURVEY §2.4)
  // ======================================================================

  /** vector_avg per label group, exploded to scalar rows. */
  private def vaAvg(s: SparkSession, dir: String): DataFrame =
    Tables.read(s, dir, "embeddings")
      .groupBy(col("label"))
      .agg(VA.vector_avg(col("embedding")).as("avg_vec"))
      .select(col("label"), posexplode(col("avg_vec")))
      .select(col("label"), col("pos"), col("col").cast("double").as("val"))

  private val vaAvgSql =
    """SELECT label, pos, CAST(CAST(sum(v) / count(*) AS REAL) AS DOUBLE) AS val
      |FROM (SELECT label, unnest(range(0, len(embedding))) AS pos,
      |             unnest(embedding::DOUBLE[]) AS v FROM embeddings)
      |GROUP BY label, pos""".stripMargin

  private def vaSum(s: SparkSession, dir: String): DataFrame =
    Tables.read(s, dir, "embeddings")
      .groupBy(col("label"))
      .agg(VA.vector_sum(col("embedding")).as("sum_vec"))
      .select(col("label"), posexplode(col("sum_vec")))
      .select(col("label"), col("pos"), col("col").cast("double").as("val"))

  private val vaSumSql =
    """SELECT label, pos, CAST(CAST(sum(v) AS REAL) AS DOUBLE) AS val
      |FROM (SELECT label, unnest(range(0, len(embedding))) AS pos,
      |             unnest(embedding::DOUBLE[]) AS v FROM embeddings)
      |GROUP BY label, pos""".stripMargin

  /** Element-wise min and max across rows per label group. */
  private def vaMinMax(s: SparkSession, dir: String): DataFrame =
    Tables.read(s, dir, "embeddings")
      .groupBy(col("label"))
      .agg(
        VA.vector_min_agg(col("embedding")).as("min_vec"),
        VA.vector_max_agg(col("embedding")).as("max_vec"))
      .select(col("label"), posexplode(arrays_zip(col("min_vec"), col("max_vec"))))
      .select(col("label"), col("pos"),
        col("col.min_vec").cast("double").as("vmin"),
        col("col.max_vec").cast("double").as("vmax"))

  private val vaMinMaxSql =
    """SELECT label, pos, min(v)::DOUBLE AS vmin, max(v)::DOUBLE AS vmax
      |FROM (SELECT label, unnest(range(0, len(embedding))) AS pos,
      |             unnest(embedding) AS v FROM embeddings)
      |GROUP BY label, pos""".stripMargin

  // ======================================================================
  // Registry
  // ======================================================================

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> (q1Agg(_, _)),
    "q2_join" -> (q2Join(_, _)),
    "q3_topk" -> (q3Topk(_, _)),
    "q4_window" -> (q4Window(_, _)),
    "v_l2_knn" -> (vL2Knn(_, _)),
    "v_cosine_knn" -> (vCosineKnn(_, _)),
    "v_ip_knn" -> (vIpKnn(_, _)),
    "v_distances" -> (vDistances(_, _)),
    "v_norm_stats" -> (vNormStats(_, _)),
    "v_elementwise" -> (vElementwise(_, _)),
    "v_normalize" -> (vNormalize(_, _)),
    "va_avg" -> (vaAvg(_, _)),
    "va_sum" -> (vaSum(_, _)),
    "va_minmax" -> (vaMinMax(_, _)),
    "ivf_knn_exact" -> (ivfKnnExact(_, _)),
    "vec_join_pairs" -> (vecJoinPairs(_, _)),
    "knn_graph" -> (knnGraph(_, _)),
    "faceted_knn" -> (facetedKnn(_, _)),
  )

  def oracleSql: Map[String, String] = Map(
    "q1_agg" -> q1AggSql,
    "q2_join" -> q2JoinSql,
    "q3_topk" -> q3TopkSql,
    "q4_window" -> q4WindowSql,
    "v_l2_knn" -> vL2KnnSql,
    "v_cosine_knn" -> vCosineKnnSql,
    "v_ip_knn" -> vIpKnnSql,
    "v_distances" -> vDistancesSql,
    "v_norm_stats" -> vNormStatsSql,
    "v_elementwise" -> vElementwiseSql,
    "v_normalize" -> vNormalizeSql,
    "va_avg" -> vaAvgSql,
    "va_sum" -> vaSumSql,
    "va_minmax" -> vaMinMaxSql,
    "ivf_knn_exact" -> ivfKnnExactSql,
    "vec_join_pairs" -> vecJoinPairsSql,
    "knn_graph" -> knnGraphSql,
    "faceted_knn" -> facetedKnnSql,
  )
}
