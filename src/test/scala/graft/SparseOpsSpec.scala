package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{SparseOps => S, VectorOps => V}
import graft.functions.VectorParsers.SparseVec

class SparseOpsSpec extends AnyFunSuite {

  private val a = SparseVec(6, Array(0, 2, 5), Array(1f, 2f, 3f))
  private val b = SparseVec(6, Array(2, 3), Array(4f, 5f))

  test("sparse dot/l2/l1 match the dense kernels on densified inputs") {
    import graft.functions.VectorParsers.sparseToDense
    val da = sparseToDense(a); val db = sparseToDense(b)
    assert(S.dot(a, b) == V.dot(da, db))
    assert(math.abs(S.l2(a, b) - V.l2(da, db)) < 1e-12)
    assert(S.l1(a, b) == V.l1(da, db))
    assert(math.abs(S.cosineDistance(a, b) - V.cosineDistance(da, db)) < 1e-12)
    assert(S.innerProductDistance(a, b) == -S.dot(a, b))
  }

  test("dim mismatch errors; zero-norm cosine -> 1.0") {
    intercept[IllegalArgumentException](S.l2(a, SparseVec(5, Array(0), Array(1f))))
    val zero = SparseVec(6, Array.emptyIntArray, Array.emptyFloatArray)
    assert(S.cosineDistance(a, zero) == 1.0)
  }

  test("add/sub/mulScalar/normalize keep sparse form") {
    val sum = S.add(a, b)
    assert(sum.indices.toSeq == Seq(0, 2, 3, 5))
    assert(sum.values.toSeq == Seq(1f, 6f, 5f, 3f))
    val diff = S.sub(a, a)
    assert(diff.indices.isEmpty) // exact cancellation drops entries
    assert(S.mulScalar(a, 2.0).values.toSeq == Seq(2f, 4f, 6f))
    assert(math.abs(S.norm(S.normalize(a)) - 1.0) < 1e-6)
  }

  test("duplicate indices coalesce in EVERY kernel, norm-based ones included") {
    // {1->1, 1->1} IS the coordinate vector (0,2,0,...): norm must be 2
    val dup = SparseVec(4, Array(1, 1), Array(1f, 1f))
    assert(S.norm(dup) == 2.0)
    assert(S.dot(dup, dup) == 4.0)
    assert(math.abs(S.cosineDistance(dup, dup)) < 1e-12) // was -1 pre-coalesce
    val n = S.normalize(dup)
    assert(S.norm(n) > 0.999 && S.norm(n) < 1.001)
  }

  test("unsorted indices are handled (text-form vecmaps may be unordered)") {
    val u = SparseVec(6, Array(5, 0, 2), Array(3f, 1f, 2f))
    assert(S.dot(u, b) == S.dot(a, b))
  }
}
