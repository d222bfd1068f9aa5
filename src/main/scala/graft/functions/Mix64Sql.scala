package graft.functions

/**
 * splitmix64 as chained DuckDB CTEs in CHECKED integer arithmetic — the
 * shared generator behind every hash-family oracle (MinHash-LSH, SHAP/
 * LIME coin streams, the isolation-forest and autoencoder randomness).
 *
 * Values live in HUGEINT mod 2⁶⁴: a possibly-negative BIGINT key is
 * folded into [0, 2⁶⁴) (two's-complement reinterpretation, matching the
 * JVM's wrapping arithmetic), `x >>> k` becomes `x // 2^k` on the
 * non-negative domain, and each wrapping 64×64 multiply splits into
 * 32-bit halves — `(z·c) mod 2⁶⁴ = zl·cl + ((zl·ch + zh·cl) mod
 * 2³²)·2³²  (mod 2⁶⁴)` — so every intermediate fits HUGEINT.
 *
 * CTEs are MATERIALIZED: the default inlining would re-expand the chain
 * into every consumer (exponential scan blowup on iterated oracles).
 */
private[graft] object Mix64Sql {

  /** Emits CTEs `<prefix>1..<prefix>6`; the last holds `carry..., z`
    * with `z = mix64(zExpr)` in [0, 2⁶⁴). */
  def ctes(prefix: String, src: String, carry: Seq[String],
           zExpr: String): String = {
    val M = "18446744073709551616::HUGEINT" // 2^64
    val B = "4294967296::HUGEINT"           // 2^32
    def mul(ch: Long, cl: Long): String =
      s"((z % $B) * $cl::HUGEINT + (((z % $B) * $ch::HUGEINT + " +
        s"(z // $B) * $cl::HUGEINT) % $B) * $B) % $M"
    val cols = carry.map(_ + ", ").mkString
    // 0x9E3779B97F4A7C15; 0xBF58476D1CE4E5B9 = (3210233709, 484763065);
    // 0x94D049BB133111EB = (2496678331, 321982955)
    s"""${prefix}1 AS MATERIALIZED (SELECT $cols((($zExpr)::HUGEINT + $M) % $M + 11400714819323198485::HUGEINT) % $M AS z FROM $src),
       |${prefix}2 AS MATERIALIZED (SELECT ${cols}xor(z, z // 1073741824::HUGEINT) AS z FROM ${prefix}1),
       |${prefix}3 AS MATERIALIZED (SELECT $cols${mul(3210233709L, 484763065L)} AS z FROM ${prefix}2),
       |${prefix}4 AS MATERIALIZED (SELECT ${cols}xor(z, z // 134217728::HUGEINT) AS z FROM ${prefix}3),
       |${prefix}5 AS MATERIALIZED (SELECT $cols${mul(2496678331L, 321982955L)} AS z FROM ${prefix}4),
       |${prefix}6 AS MATERIALIZED (SELECT ${cols}xor(z, z // 2147483648::HUGEINT) AS z FROM ${prefix}5)""".stripMargin
  }
}
