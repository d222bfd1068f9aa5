package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.udf

import graft.functions.VectorParsers.SparseVec

/**
 * Sparse-vector kernels for the `vecmap` / `sparsevec` surface
 * (`NeuronDB/neurondb--1.0.sql:613-652` vecmap l2/cosine/ip/l1 +
 * add/sub/mul_scalar/norm; `:2413-2437` sparsevec l2/cosine/ip +
 * norm/normalize). Same numeric contract as the dense kernels: double
 * accumulation, dimension-mismatch errors, zero-norm cosine → 1.0.
 *
 * All kernels are merge-joins over index-sorted entries — O(nnz), never
 * O(dim) — so they hold for vocab-sized dims (30k+) at any nnz.
 */
object SparseOps {

  /** Index-sort + coalesce: duplicate indices are summed (a duplicate
    * left as-is would make dot/l2/add silently treat one coordinate as
    * two distinct ones). */
  private def sorted(v: SparseVec): SparseVec =
    if (v.indices.length <= 1 || v.indices.sliding(2).forall(w => w(0) < w(1))) v
    else {
      val pairs = v.indices.zip(v.values).sortBy(_._1)
      val idx = Array.newBuilder[Int]
      val vals = Array.newBuilder[Float]
      var i = 0
      while (i < pairs.length) {
        val cur = pairs(i)._1
        var s = 0.0
        while (i < pairs.length && pairs(i)._1 == cur) { s += pairs(i)._2; i += 1 }
        idx += cur; vals += s.toFloat
      }
      SparseVec(v.dim, idx.result(), vals.result())
    }

  @inline private def checkDims(a: SparseVec, b: SparseVec): Unit =
    if (a.dim != b.dim)
      throw new IllegalArgumentException(
        s"vector dimensions must match: ${a.dim} vs ${b.dim}")

  /** Merge fold over aligned entries: f(idx, aVal, bVal) with 0 for absent. */
  @inline private def mergeFold(a0: SparseVec, b0: SparseVec)(f: (Double, Double) => Unit): Unit = {
    val a = sorted(a0); val b = sorted(b0)
    var i = 0; var j = 0
    while (i < a.indices.length && j < b.indices.length) {
      val c = a.indices(i).compareTo(b.indices(j))
      if (c == 0) { f(a.values(i), b.values(j)); i += 1; j += 1 }
      else if (c < 0) { f(a.values(i), 0.0); i += 1 }
      else { f(0.0, b.values(j)); j += 1 }
    }
    while (i < a.indices.length) { f(a.values(i), 0.0); i += 1 }
    while (j < b.indices.length) { f(0.0, b.values(j)); j += 1 }
  }

  def dot(a: SparseVec, b: SparseVec): Double = {
    checkDims(a, b)
    var s = 0.0
    mergeFold(a, b)((x, y) => if (x != 0.0 && y != 0.0) s += x * y)
    s
  }

  def l2(a: SparseVec, b: SparseVec): Double = {
    checkDims(a, b)
    var s = 0.0
    mergeFold(a, b) { (x, y) => val d = x - y; s += d * d }
    math.sqrt(s)
  }

  def l1(a: SparseVec, b: SparseVec): Double = {
    checkDims(a, b)
    var s = 0.0
    mergeFold(a, b)((x, y) => s += math.abs(x - y))
    s
  }

  def norm(a0: SparseVec): Double = {
    // coalesce first: duplicate indices must sum into ONE coordinate
    // before squaring, or (0,2,0) represented as {1->1, 1->1} gets norm
    // sqrt(2) instead of 2 — the exact silent-wrong path sorted() exists
    // to close for the merge kernels
    val a = sorted(a0)
    var s = 0.0
    a.values.foreach(v => s += v.toDouble * v.toDouble)
    math.sqrt(s)
  }

  /** Zero-norm rule matches the dense kernel (distance.c:151-153). */
  def cosineDistance(a: SparseVec, b: SparseVec): Double = {
    checkDims(a, b)
    val na = norm(a); val nb = norm(b)
    if (na == 0.0 || nb == 0.0) 1.0
    else 1.0 - dot(a, b) / (na * nb)
  }

  def innerProductDistance(a: SparseVec, b: SparseVec): Double = -dot(a, b)

  def normalize(a0: SparseVec): SparseVec = {
    val a = sorted(a0) // coalesced form, so scaling by norm is exact
    val n = norm(a)
    if (n == 0.0) a
    else SparseVec(a.dim, a.indices.clone(), a.values.map(v => (v / n).toFloat))
  }

  def add(a: SparseVec, b: SparseVec): SparseVec = combine(a, b, 1.0)
  def sub(a: SparseVec, b: SparseVec): SparseVec = combine(a, b, -1.0)

  private def combine(a0: SparseVec, b0: SparseVec, sign: Double): SparseVec = {
    checkDims(a0, b0)
    val a = sorted(a0); val b = sorted(b0)
    val idx = Array.newBuilder[Int]; val vals = Array.newBuilder[Float]
    var i = 0; var j = 0
    def push(index: Int, v: Double): Unit = if (v != 0.0) { idx += index; vals += v.toFloat }
    while (i < a.indices.length && j < b.indices.length) {
      val c = a.indices(i).compareTo(b.indices(j))
      if (c == 0) { push(a.indices(i), a.values(i) + sign * b.values(j)); i += 1; j += 1 }
      else if (c < 0) { push(a.indices(i), a.values(i).toDouble); i += 1 }
      else { push(b.indices(j), sign * b.values(j)); j += 1 }
    }
    while (i < a.indices.length) { push(a.indices(i), a.values(i).toDouble); i += 1 }
    while (j < b.indices.length) { push(b.indices(j), sign * b.values(j)); j += 1 }
    SparseVec(a.dim, idx.result(), vals.result())
  }

  def mulScalar(a: SparseVec, s: Double): SparseVec =
    SparseVec(a.dim, a.indices.clone(), a.values.map(v => (v * s).toFloat))

  // -- Spark UDFs over (dim, indices, values) triples --------------------

  private def sv(dim: Int, idx: Seq[Int], vals: Seq[Float]) =
    SparseVec(dim, idx.toArray, vals.toArray)

  // STRICT like the rest of the SQL surface: any NULL array → NULL result
  // (null Seqs would NPE in sv's toArray and kill the task)
  private def sparse2(f: (SparseVec, SparseVec) => Double) =
    udf((d1: Int, i1: Seq[Int], v1: Seq[Float],
         d2: Int, i2: Seq[Int], v2: Seq[Float]) =>
      if (i1 == null || v1 == null || i2 == null || v2 == null) None
      else Some(f(sv(d1, i1, v1), sv(d2, i2, v2))))

  val sparseL2Udf = sparse2(l2)
  val sparseCosineUdf = sparse2(cosineDistance)
  val sparseDotUdf = sparse2(dot)
  val sparseNormUdf = udf((d: Int, i: Seq[Int], v: Seq[Float]) =>
    if (i == null || v == null) None else Some(norm(sv(d, i, v))))

  def register(spark: SparkSession): Unit = {
    spark.udf.register("sparsevec_l2_distance", sparseL2Udf)
    spark.udf.register("sparsevec_cosine_distance", sparseCosineUdf)
    spark.udf.register("sparse_vector_dot_product", sparseDotUdf)
    spark.udf.register("sparsevec_norm", sparseNormUdf)
  }
}
