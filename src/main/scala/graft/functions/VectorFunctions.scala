package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

/**
 * Column-level API + SQL registration for the vector kernels in
 * [[VectorOps]]. Mirrors the SQL function surface installed by
 * `NeuronDB/neurondb--1.0.sql` (`vector_l2_distance` et al.) so that a
 * reference user can translate queries 1:1.
 *
 * All functions are plain Scala UDFs over `array<float>` columns; the four
 * hot distances also exist as codegen'd Catalyst expressions (see
 * `graft.plans`) which [[Vectors.dist]] prefers.
 */
object VectorFunctions {

  private def arr(s: Seq[Float]): Array[Float] = if (s == null) null else s.toArray

  // -- distances ---------------------------------------------------------
  val l2Udf: UserDefinedFunction = udf((a: Seq[Float], b: Seq[Float]) => VectorOps.l2(arr(a), arr(b)))
  val squaredL2Udf: UserDefinedFunction = udf((a: Seq[Float], b: Seq[Float]) => VectorOps.squaredL2(arr(a), arr(b)))
  val ipUdf: UserDefinedFunction = udf((a: Seq[Float], b: Seq[Float]) => VectorOps.innerProductDistance(arr(a), arr(b)))
  val dotUdf: UserDefinedFunction = udf((a: Seq[Float], b: Seq[Float]) => VectorOps.dot(arr(a), arr(b)))
  val cosineUdf: UserDefinedFunction = udf((a: Seq[Float], b: Seq[Float]) => VectorOps.cosineDistance(arr(a), arr(b)))
  val cosineSimUdf: UserDefinedFunction = udf((a: Seq[Float], b: Seq[Float]) => VectorOps.cosineSimilarity(arr(a), arr(b)))
  val l1Udf: UserDefinedFunction = udf((a: Seq[Float], b: Seq[Float]) => VectorOps.l1(arr(a), arr(b)))
  val hammingUdf: UserDefinedFunction = udf((a: Seq[Float], b: Seq[Float]) => VectorOps.hamming(arr(a), arr(b)))
  val chebyshevUdf: UserDefinedFunction = udf((a: Seq[Float], b: Seq[Float]) => VectorOps.chebyshev(arr(a), arr(b)))
  val minkowskiUdf: UserDefinedFunction = udf((a: Seq[Float], b: Seq[Float], p: Double) => VectorOps.minkowski(arr(a), arr(b), p))
  val jaccardUdf: UserDefinedFunction = udf((a: Seq[Float], b: Seq[Float]) => VectorOps.jaccard(arr(a), arr(b)))
  val diceUdf: UserDefinedFunction = udf((a: Seq[Float], b: Seq[Float]) => VectorOps.dice(arr(a), arr(b)))
  val mahalanobisUdf: UserDefinedFunction = udf((a: Seq[Float], b: Seq[Float], c: Seq[Float]) => VectorOps.mahalanobis(arr(a), arr(b), arr(c)))
  val brayCurtisUdf: UserDefinedFunction = udf((a: Seq[Float], b: Seq[Float]) => VectorOps.brayCurtis(arr(a), arr(b)))
  val canberraUdf: UserDefinedFunction = udf((a: Seq[Float], b: Seq[Float]) => VectorOps.canberra(arr(a), arr(b)))
  val sokalMichenerUdf: UserDefinedFunction = udf((a: Seq[Float], b: Seq[Float]) => VectorOps.sokalMichener(arr(a), arr(b)))
  val rogersTanimotoUdf: UserDefinedFunction = udf((a: Seq[Float], b: Seq[Float]) => VectorOps.rogersTanimoto(arr(a), arr(b)))
  val russellRaoUdf: UserDefinedFunction = udf((a: Seq[Float], b: Seq[Float]) => VectorOps.russellRao(arr(a), arr(b)))
  val matchingCoefficientUdf: UserDefinedFunction = udf((a: Seq[Float], b: Seq[Float]) => VectorOps.matchingCoefficient(arr(a), arr(b)))

  // -- norms / transforms ------------------------------------------------
  val normUdf: UserDefinedFunction = udf((a: Seq[Float]) => VectorOps.norm(arr(a)))
  val normalizeUdf: UserDefinedFunction = udf((a: Seq[Float]) => VectorOps.normalize(arr(a)))
  val addUdf: UserDefinedFunction = udf((a: Seq[Float], b: Seq[Float]) => VectorOps.add(arr(a), arr(b)))
  val subUdf: UserDefinedFunction = udf((a: Seq[Float], b: Seq[Float]) => VectorOps.sub(arr(a), arr(b)))
  val hadamardUdf: UserDefinedFunction = udf((a: Seq[Float], b: Seq[Float]) => VectorOps.hadamard(arr(a), arr(b)))
  val divideUdf: UserDefinedFunction = udf((a: Seq[Float], b: Seq[Float]) => VectorOps.divide(arr(a), arr(b)))
  val elemMinUdf: UserDefinedFunction = udf((a: Seq[Float], b: Seq[Float]) => VectorOps.elemMin(arr(a), arr(b)))
  val elemMaxUdf: UserDefinedFunction = udf((a: Seq[Float], b: Seq[Float]) => VectorOps.elemMax(arr(a), arr(b)))
  val mulScalarUdf: UserDefinedFunction = udf((a: Seq[Float], s: Double) => VectorOps.mulScalar(arr(a), s))
  val negUdf: UserDefinedFunction = udf((a: Seq[Float]) => VectorOps.neg(arr(a)))
  val absUdf: UserDefinedFunction = udf((a: Seq[Float]) => VectorOps.abs(arr(a)))
  val squareUdf: UserDefinedFunction = udf((a: Seq[Float]) => VectorOps.square(arr(a)))
  val sqrtUdf: UserDefinedFunction = udf((a: Seq[Float]) => VectorOps.sqrt(arr(a)))
  val powUdf: UserDefinedFunction = udf((a: Seq[Float], p: Double) => VectorOps.pow(arr(a), p))
  val scaleUdf: UserDefinedFunction = udf((a: Seq[Float], s: Double) => VectorOps.scale(arr(a), s))
  val translateUdf: UserDefinedFunction = udf((a: Seq[Float], t: Double) => VectorOps.translate(arr(a), t))
  val clipUdf: UserDefinedFunction = udf((a: Seq[Float], lo: Double, hi: Double) => VectorOps.clip(arr(a), lo, hi))
  val crossProductUdf: UserDefinedFunction = udf((a: Seq[Float], b: Seq[Float]) => VectorOps.crossProduct(arr(a), arr(b)))
  val standardizeUdf: UserDefinedFunction = udf((a: Seq[Float]) => VectorOps.standardize(arr(a)))
  val minmaxNormalizeUdf: UserDefinedFunction = udf((a: Seq[Float]) => VectorOps.minmaxNormalize(arr(a)))
  val filterThresholdUdf: UserDefinedFunction = udf((a: Seq[Float], t: Double) => VectorOps.filterThreshold(arr(a), t))
  val whereUdf: UserDefinedFunction = udf((c: Seq[Float], a: Seq[Float], b: Seq[Float]) => VectorOps.where(arr(c), arr(a), arr(b)))
  val preprocessUdf: UserDefinedFunction = udf((a: Seq[Float], m: String) => VectorOps.preprocess(arr(a), m))

  // -- comparisons / hash (NeuronDB/neurondb--1.0.sql:2217-2294) ---------
  // PG-style lexicographic array comparison; hash is djb2 over the float
  // bit patterns (content-based, dimension-sensitive).

  private def cmp(a: Seq[Float], b: Seq[Float]): Int = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val c = java.lang.Float.compare(a(i), b(i))
      if (c != 0) return c
      i += 1
    }
    a.length.compareTo(b.length)
  }

  def vectorHash(a: Seq[Float]): Int = {
    var h = 5381
    a.foreach { f =>
      val bits = java.lang.Float.floatToIntBits(f)
      var s = 0
      while (s < 32) { h = ((h << 5) + h) ^ ((bits >>> s) & 0xFF); s += 8 }
    }
    h
  }

  val eqUdf: UserDefinedFunction = udf((a: Seq[Float], b: Seq[Float]) => cmp(a, b) == 0)
  val neUdf: UserDefinedFunction = udf((a: Seq[Float], b: Seq[Float]) => cmp(a, b) != 0)
  val ltUdf: UserDefinedFunction = udf((a: Seq[Float], b: Seq[Float]) => cmp(a, b) < 0)
  val leUdf: UserDefinedFunction = udf((a: Seq[Float], b: Seq[Float]) => cmp(a, b) <= 0)
  val gtUdf: UserDefinedFunction = udf((a: Seq[Float], b: Seq[Float]) => cmp(a, b) > 0)
  val geUdf: UserDefinedFunction = udf((a: Seq[Float], b: Seq[Float]) => cmp(a, b) >= 0)
  val hashUdf: UserDefinedFunction = udf((a: Seq[Float]) => vectorHash(a))

  // -- element access / per-vector stats --------------------------------
  val getUdf: UserDefinedFunction = udf((a: Seq[Float], i: Int) => VectorOps.get(arr(a), i))
  val setUdf: UserDefinedFunction = udf((a: Seq[Float], i: Int, v: Double) => VectorOps.set(arr(a), i, v))
  val sliceUdf: UserDefinedFunction = udf((a: Seq[Float], from: Int, to: Int) => VectorOps.slice(arr(a), from, to))
  val appendUdf: UserDefinedFunction = udf((a: Seq[Float], v: Double) => VectorOps.append(arr(a), v))
  val prependUdf: UserDefinedFunction = udf((v: Double, a: Seq[Float]) => VectorOps.prepend(v, arr(a)))
  val concatUdf: UserDefinedFunction = udf((a: Seq[Float], b: Seq[Float]) => VectorOps.concat(arr(a), arr(b)))
  val elementSumUdf: UserDefinedFunction = udf((a: Seq[Float]) => VectorOps.elementSum(arr(a)))
  val meanUdf: UserDefinedFunction = udf((a: Seq[Float]) => VectorOps.mean(arr(a)))
  val varianceUdf: UserDefinedFunction = udf((a: Seq[Float]) => VectorOps.variance(arr(a)))
  val stddevUdf: UserDefinedFunction = udf((a: Seq[Float]) => VectorOps.stddev(arr(a)))
  val minElemUdf: UserDefinedFunction = udf((a: Seq[Float]) => VectorOps.minElem(arr(a)))
  val maxElemUdf: UserDefinedFunction = udf((a: Seq[Float]) => VectorOps.maxElem(arr(a)))
  val percentileUdf: UserDefinedFunction = udf((a: Seq[Float], p: Double) => VectorOps.percentile(arr(a), p))
  val medianUdf: UserDefinedFunction = udf((a: Seq[Float]) => VectorOps.median(arr(a)))
  val quantileUdf: UserDefinedFunction = udf((a: Seq[Float], q: Double) => VectorOps.quantile(arr(a), q))
  val dimsUdf: UserDefinedFunction = udf((a: Seq[Float]) => if (a == null) 0 else a.length)
  val castDimensionUdf: UserDefinedFunction = udf((a: Seq[Float], d: Int) => VectorOps.castDimension(arr(a), d))

  private val byName: Map[String, UserDefinedFunction] = Map(
    "vector_l2_distance" -> l2Udf,
    "vector_squared_l2_distance" -> squaredL2Udf,
    "vector_inner_product" -> ipUdf,
    "vector_dot" -> dotUdf,
    "vector_cosine_distance" -> cosineUdf,
    "vector_cosine_similarity" -> cosineSimUdf,
    "vector_similarity" -> cosineSimUdf,
    "vector_l1_distance" -> l1Udf,
    "vector_hamming_distance" -> hammingUdf,
    "vector_chebyshev_distance" -> chebyshevUdf,
    "vector_minkowski_distance" -> minkowskiUdf,
    "vector_jaccard_distance" -> jaccardUdf,
    "vector_dice_distance" -> diceUdf,
    "vector_mahalanobis_distance" -> mahalanobisUdf,
    "vector_bray_curtis_distance" -> brayCurtisUdf,
    "vector_canberra_distance" -> canberraUdf,
    "vector_sokal_michener_distance" -> sokalMichenerUdf,
    "vector_rogers_tanimoto_distance" -> rogersTanimotoUdf,
    "vector_russell_rao_distance" -> russellRaoUdf,
    "vector_matching_coefficient" -> matchingCoefficientUdf,
    "vector_norm" -> normUdf,
    "vector_normalize" -> normalizeUdf,
    "vector_add" -> addUdf,
    "vector_sub" -> subUdf,
    "vector_mul" -> mulScalarUdf,
    "vector_hadamard" -> hadamardUdf,
    "vector_divide" -> divideUdf,
    "vector_minimum" -> elemMinUdf,
    "vector_maximum" -> elemMaxUdf,
    "vector_neg" -> negUdf,
    "vector_abs" -> absUdf,
    "vector_square" -> squareUdf,
    "vector_sqrt" -> sqrtUdf,
    "vector_pow" -> powUdf,
    "vector_scale" -> scaleUdf,
    "vector_translate" -> translateUdf,
    "vector_clip" -> clipUdf,
    "vector_cross_product" -> crossProductUdf,
    "vector_standardize" -> standardizeUdf,
    "vector_minmax_normalize" -> minmaxNormalizeUdf,
    "vector_filter" -> filterThresholdUdf,
    "vector_where" -> whereUdf,
    "vector_get" -> getUdf,
    "vector_set" -> setUdf,
    "vector_slice" -> sliceUdf,
    "vector_append" -> appendUdf,
    "vector_prepend" -> prependUdf,
    "vector_concat" -> concatUdf,
    "vector_element_sum" -> elementSumUdf,
    "vector_mean" -> meanUdf,
    "vector_variance" -> varianceUdf,
    "vector_stddev" -> stddevUdf,
    "vector_min" -> minElemUdf,
    "vector_max" -> maxElemUdf,
    "vector_percentile" -> percentileUdf,
    "vector_median" -> medianUdf,
    "vector_quantile" -> quantileUdf,
    "vector_dims" -> dimsUdf,
    "vector_cast_dimension" -> castDimensionUdf,
    "preprocess" -> preprocessUdf,
    "vector_eq" -> eqUdf,
    "vector_ne" -> neUdf,
    "vector_lt" -> ltUdf,
    "vector_le" -> leUdf,
    "vector_gt" -> gtUdf,
    "vector_ge" -> geUdf,
    "vector_hash" -> hashUdf,
  )

  /** Register every function for `spark.sql` use under its reference name. */
  def register(spark: SparkSession): Unit =
    byName.foreach { case (name, f) => spark.udf.register(name, f) }
}
