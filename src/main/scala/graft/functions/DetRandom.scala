package graft.functions

/**
 * splitmix64 and derived noise streams — THE deterministic randomness the
 * evidence mains ([[graft.ScaleBench]], [[graft.RecallAtScale]]) build
 * their synthetic corpora from, kept in ONE place so the two artifacts
 * can't silently drift apart. Scala twin of the SQL generators in
 * [[Mix64Sql]]; [[graft.ml.Explain.u01]] applies the same mixer for its
 * [0,1) stream.
 */
object DetRandom {

  /** splitmix64 (Steele et al., public domain; also JDK SplittableRandom). */
  @inline def mix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Uniform in [-1, 1] from a 64-bit key. */
  @inline def unoise(key: Long): Float =
    ((mix64(key) >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0).toFloat

  /** Locale-independent fixed-decimal rendering for JSON artifacts —
    * `f"$x%.3f"` formats with the JVM default locale and a comma-decimal
    * locale would emit syntactically invalid JSON. */
  def fmt(x: Double, decimals: Int): String =
    String.format(java.util.Locale.ROOT, s"%.${decimals}f", Double.box(x))
}
