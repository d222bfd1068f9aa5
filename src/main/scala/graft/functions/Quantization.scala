package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.udf

/**
 * Lossy vector storage codecs (SURVEY §2.8), mirroring
 * `NeuronDB/src/types/quantization.c` and
 * `src/ml/ml_quantization_fp8.c`. Encoded forms are `Array[Byte]`
 * (Spark `BinaryType`), value-compatible with the reference's packed
 * layouts (payload only — PG varlena headers don't apply).
 *
 * Encode/decode pairs:
 *  - int8: max-abs scaling, `rint` rounding (`quantization.c:41-86`);
 *    decode /127 (`:116-140`)
 *  - uint8: min/max scaling to [0,255] (`:1355-1404`); decode /255
 *  - fp16: IEEE half, truncating mantissa, flush-to-zero subnormal encode
 *    (`float4_to_fp16:141-168`), exact decode incl. subnormals
 *    (`fp16_to_float:170-217`)
 *  - binary: bit = v > 0 (`quantize_vector_binary:285-313`); decode ±1
 *  - ternary: 2-bit {0,±1}, threshold = max_abs/3 (`:1496-1560`)
 *  - int4: scale 7/max_abs, offset-8 nibble packing (`:1575-1660`)
 *  - fp8 e4m3/e5m2: truncating encode (`ml_quantization_fp8.c:62-160`).
 *    NOTE the reference's fp8 decode has a uint8 underflow bug that flips
 *    the sign for negative unbiased exponents (`fp8_e4m3_to_float`
 *    computes `exp - 7` in uint8); we implement the evident intent
 *    (signed arithmetic), per SURVEY §7.4 "don't replicate bugs blindly".
 *    Non-finite handling likewise follows the formats' specs rather than
 *    the reference's exp-only clamp: e4m3 reserves S.1111.111 as NaN and
 *    saturates finite overflow to ±448; e5m2 keeps IEEE ±Inf/NaN codes.
 */
object Quantization {

  // ---------------- int8 (max-abs) ----------------

  def toInt8(v: Array[Float]): Array[Byte] = {
    val maxAbs = maxAbsOf(v)
    val out = new Array[Byte](v.length)
    if (maxAbs == 0f) return out
    val scale = 127.0f / maxAbs
    var i = 0
    while (i < v.length) {
      var x = v(i) * scale
      if (x > 127.0f) x = 127.0f
      if (x < -128.0f) x = -128.0f
      out(i) = math.rint(x).toByte
      i += 1
    }
    out
  }

  def int8ToVector(q: Array[Byte]): Array[Float] =
    q.map(b => b.toFloat / 127.0f)

  // ---------------- uint8 (min/max) ----------------

  def toUint8(v: Array[Float]): Array[Byte] = {
    if (v.isEmpty) return Array.emptyByteArray
    val mn = v.min; val mx = v.max
    val out = new Array[Byte](v.length)
    if (mx == mn) return out
    val scale = 255.0f / (mx - mn)
    var i = 0
    while (i < v.length) {
      var x = (v(i) - mn) * scale
      if (x > 255.0f) x = 255.0f
      if (x < 0.0f) x = 0.0f
      out(i) = math.rint(x).toInt.toByte // stored as unsigned
      i += 1
    }
    out
  }

  def uint8ToVector(q: Array[Byte]): Array[Float] =
    q.map(b => (b & 0xFF).toFloat / 255.0f)

  // ---------------- fp16 ----------------

  /** Truncating float32->fp16 with flush-to-zero on subnormals
    * (`quantization.c:141-168`) — NOT java's Float.floatToFloat16 (which
    * rounds and keeps subnormals). NaN encodes as fp16 NaN (not Infinity:
    * the reference's exp-only overflow test conflates the two, but
    * [[fp16ToFloat]] decodes NaN payloads faithfully, so round-tripping
    * must preserve NaN-ness). */
  def floatToFp16(f: Float): Short = {
    val u = java.lang.Float.floatToRawIntBits(f)
    val sign = (u >>> 16) & 0x8000
    if (f != f) return (sign | 0x7E00).toShort // quiet NaN
    val mantissa = u & 0x7FFFFF
    val exp = ((u >>> 23) & 0xFF) - 127 + 15
    if (exp <= 0) sign.toShort
    else if (exp >= 31) (sign | 0x7C00).toShort
    else (sign | (exp << 10) | (mantissa >>> 13)).toShort
  }

  def fp16ToFloat(h: Short): Float = {
    val sign = (h & 0x8000) << 16
    var exp = (h & 0x7C00) >>> 10
    val mantissa = h & 0x03FF
    val bits =
      if (exp == 0) {
        if (mantissa == 0) sign
        else { // subnormal: value = mantissa * 2^-24
          // (the reference's `127 - 15 - (10 - exp)` at quantization.c:196
          // is off by 2^10 — another bug not replicated, per SURVEY §7.4)
          var m = mantissa
          var e = 1
          while ((m & 0x0400) == 0) { m <<= 1; e -= 1 }
          m &= 0x03FF
          val exponent = 112 + e // = 127 - 15 + (e - 0); e = 1 - shifts
          sign | (exponent << 23) | (m << 13)
        }
      } else if (exp == 0x1F) sign | 0x7F800000 | (mantissa << 13)
      else sign | ((exp + 127 - 15) << 23) | (mantissa << 13)
    java.lang.Float.intBitsToFloat(bits)
  }

  def toFp16(v: Array[Float]): Array[Byte] = {
    val out = new Array[Byte](v.length * 2)
    var i = 0
    while (i < v.length) {
      val h = floatToFp16(v(i))
      out(2 * i) = (h & 0xFF).toByte
      out(2 * i + 1) = ((h >> 8) & 0xFF).toByte
      i += 1
    }
    out
  }

  def fp16ToVector(q: Array[Byte]): Array[Float] = {
    val out = new Array[Float](q.length / 2)
    var i = 0
    while (i < out.length) {
      val h = ((q(2 * i) & 0xFF) | ((q(2 * i + 1) & 0xFF) << 8)).toShort
      out(i) = fp16ToFloat(h)
      i += 1
    }
    out
  }

  // ---------------- binary (1 bit, sign) ----------------

  def toBinary(v: Array[Float]): Array[Byte] = {
    val out = new Array[Byte]((v.length + 7) / 8)
    var i = 0
    while (i < v.length) {
      if (v(i) > 0.0f) out(i / 8) = (out(i / 8) | (1 << (i % 8))).toByte
      i += 1
    }
    out
  }

  def binaryToVector(q: Array[Byte], dim: Int): Array[Float] = {
    require(dim >= 0 && dim <= q.length * 8,
      s"dim $dim outside encoded capacity ${q.length * 8}")
    val out = new Array[Float](dim)
    var i = 0
    while (i < dim) {
      out(i) = if ((q(i / 8) & (1 << (i % 8))) != 0) 1.0f else -1.0f
      i += 1
    }
    out
  }

  /** Popcount Hamming over packed bits (`quantization.c:385-431`,
    * `binaryvec_hamming_distance`). */
  def binaryHamming(a: Array[Byte], b: Array[Byte]): Int = {
    require(a.length == b.length, "binary vector lengths must match")
    var n = 0; var i = 0
    while (i < a.length) { n += java.lang.Integer.bitCount((a(i) ^ b(i)) & 0xFF); i += 1 }
    n
  }

  // ---------------- ternary (2 bits, threshold max_abs/3) ----------------

  def toTernary(v: Array[Float]): Array[Byte] = {
    val threshold = maxAbsOf(v) / 3.0f
    val out = new Array[Byte]((v.length * 2 + 7) / 8)
    var i = 0
    while (i < v.length) {
      val code =
        if (v(i) > threshold) 2
        else if (v(i) < -threshold) 1
        else 0
      val byteIdx = (i * 2) / 8
      val bitIdx = (i * 2) % 8
      out(byteIdx) = (out(byteIdx) | (code << bitIdx)).toByte
      i += 1
    }
    out
  }

  def ternaryToVector(q: Array[Byte], dim: Int): Array[Float] = {
    require(dim >= 0 && dim <= q.length * 4,
      s"dim $dim outside encoded capacity ${q.length * 4}")
    val out = new Array[Float](dim)
    var i = 0
    while (i < dim) {
      val code = (q((i * 2) / 8) >> ((i * 2) % 8)) & 0x03
      out(i) = if (code == 2) 1.0f else if (code == 1) -1.0f else 0.0f
      i += 1
    }
    out
  }

  // ---------------- int4 (nibble, offset-8) ----------------

  def toInt4(v: Array[Float]): Array[Byte] = {
    val maxAbs = maxAbsOf(v)
    val out = new Array[Byte]((v.length + 1) / 2)
    if (maxAbs == 0f) return out
    val scale = 7.0f / maxAbs
    var i = 0
    while (i < v.length) {
      val scaled = v(i) * scale
      val value =
        if (scaled > 7.0f) 7
        else if (scaled < -8.0f) -8
        else math.rint(scaled).toInt
      val uvalue = math.min(15, 8 + value)
      val byteIdx = i / 2
      val bitIdx = (i % 2) * 4
      out(byteIdx) = (out(byteIdx) | (uvalue << bitIdx)).toByte
      i += 1
    }
    out
  }

  def int4ToVector(q: Array[Byte], dim: Int): Array[Float] = {
    require(dim >= 0 && dim <= q.length * 2,
      s"dim $dim outside encoded capacity ${q.length * 2}")
    val out = new Array[Float](dim)
    var i = 0
    while (i < dim) {
      val uvalue = (q(i / 2) >> ((i % 2) * 4)) & 0x0F
      out(i) = (uvalue - 8).toFloat / 7.0f
      i += 1
    }
    out
  }

  // ---------------- fp8 (e4m3 / e5m2) ----------------

  /** E4M3 per the OCP FP8 layout: no Infinity; S.1111.111 is NaN. NaN and
    * ±Inf encode to the NaN code; finite overflow SATURATES to the max
    * finite ±448 (S.1111.110) — the reference's exp-only clamp to 0x7F
    * would turn Infinity (and every finite value ≥ 2⁸) into a plausible
    * 480.0 on decode, silently poisoning downstream distances. */
  def floatToFp8E4M3(f: Float): Byte = {
    if (f == 0.0f) return 0
    val bits = java.lang.Float.floatToRawIntBits(f)
    val sign = (bits >>> 31) & 0x1
    if (f != f || f.isInfinite) return ((sign << 7) | 0x7F).toByte // NaN code
    val exp = ((bits >>> 23) & 0xFF) - 127
    val mant = (bits >>> 20) & 0x7
    if (exp > 7) ((sign << 7) | 0x7E).toByte // saturate to ±448
    else if (exp < -6) 0
    else ((sign << 7) | (((exp + 7) & 0xF) << 3) | (mant & 0x7)).toByte
  }

  def fp8E4M3ToFloat(q: Byte): Float = {
    val sign = (q >> 7) & 0x1
    val exp = (q >> 3) & 0xF
    val mant = q & 0x7
    if ((q & 0x7F) == 0x7F) Float.NaN
    else if (exp == 0) 0.0f
    else {
      val bits = (sign << 31) | ((exp - 7 + 127) << 23) | (mant << 20)
      java.lang.Float.intBitsToFloat(bits)
    }
  }

  /** E5M2 is IEEE-shaped: S.11111.00 is ±Inf, S.11111.mm (mm≠0) NaN.
    * NaN encodes as NaN, Infinity and finite overflow as ±Inf — the
    * IEEE conversion result, instead of the reference's clamp that
    * decoded overflow as a finite 114688. */
  def floatToFp8E5M2(f: Float): Byte = {
    if (f == 0.0f) return 0
    val bits = java.lang.Float.floatToRawIntBits(f)
    val sign = (bits >>> 31) & 0x1
    if (f != f) return ((sign << 7) | 0x7F).toByte          // NaN
    val exp = ((bits >>> 23) & 0xFF) - 127
    val mant = (bits >>> 21) & 0x3
    if (exp > 15) ((sign << 7) | 0x7C).toByte               // ±Inf
    else if (exp < -14) 0
    else ((sign << 7) | (((exp + 15) & 0x1F) << 2) | (mant & 0x3)).toByte
  }

  def fp8E5M2ToFloat(q: Byte): Float = {
    val sign = (q >> 7) & 0x1
    val exp = (q >> 2) & 0x1F
    val mant = q & 0x3
    if (exp == 0x1F) {
      if (mant == 0) { if (sign == 0) Float.PositiveInfinity else Float.NegativeInfinity }
      else Float.NaN
    } else if (exp == 0) 0.0f
    else {
      val bits = (sign << 31) | ((exp - 15 + 127) << 23) | (mant << 21)
      java.lang.Float.intBitsToFloat(bits)
    }
  }

  def toFp8(v: Array[Float], e4m3: Boolean = true): Array[Byte] =
    if (e4m3) v.map(floatToFp8E4M3) else v.map(floatToFp8E5M2)

  def fp8ToVector(q: Array[Byte], e4m3: Boolean = true): Array[Float] =
    if (e4m3) q.map(fp8E4M3ToFloat) else q.map(fp8E5M2ToFloat)

  // ---------------- ranged int8 (explicit per-dim min/max) ----------------

  /** `vector_quantize_int8(v, min, max)`
    * (`NeuronDB/src/vector/vector_quantization.c:203-285`). */
  def rangedInt8(v: Array[Float], min: Array[Float], max: Array[Float]): Array[Byte] = {
    require(v.length == min.length && v.length == max.length, "vector dimensions must match")
    val out = new Array[Byte](v.length)
    var i = 0
    while (i < v.length) {
      val range = max(i) - min(i)
      if (range > 0.0f) {
        val normalized = (v(i) - min(i)) * (127.0f / range)
        out(i) =
          if (normalized > 127.0f) 127
          else if (normalized < -128.0f) -128
          else math.round(normalized).toByte
      }
      i += 1
    }
    out
  }

  def rangedDequantize(q: Array[Byte], min: Array[Float], max: Array[Float]): Array[Float] = {
    val out = new Array[Float](q.length)
    var i = 0
    while (i < q.length) {
      out(i) = min(i) + q(i).toFloat * (max(i) - min(i)) / 127.0f
      i += 1
    }
    out
  }

  // ---------------- auto / analyze ----------------

  /** `auto_quantize(v, method)` dispatch (`neurondb--1.0.sql:6838-6869`). */
  def autoQuantize(v: Array[Float], method: String): Array[Byte] = method match {
    case "int8"    => toInt8(v)
    case "uint8"   => toUint8(v)
    case "fp16"    => toFp16(v)
    case "binary"  => toBinary(v)
    case "ternary" => toTernary(v)
    case "int4"    => toInt4(v)
    case "fp8_e4m3" => toFp8(v, e4m3 = true)
    case "fp8_e5m2" => toFp8(v, e4m3 = false)
    case other => throw new IllegalArgumentException(s"unknown quantization method: $other")
  }

  case class QuantizeReport(mse: Double, mae: Double, maxError: Double,
                            compressionRatio: Double, relativeError: Double) {
    def toJson: String =
      f"""{"mse":$mse%.8f,"mae":$mae%.8f,"max_error":$maxError%.8f,""" +
        f""""compression_ratio":$compressionRatio%.2f,"relative_error":$relativeError%.8f}"""
  }

  /** `quantize_analyze_*` error probes (`neurondb--1.0.sql:573-605`,
    * impl `quantization.c:463-1352`): round-trip error metrics. */
  def analyze(v: Array[Float], method: String): QuantizeReport = {
    val deq: Array[Float] = method match {
      case "int8" =>
        // scale-aware round-trip, as quantize_analyze_int8 does
        val maxAbs = maxAbsOf(v)
        int8ToVector(toInt8(v)).map(_ * maxAbs)
      case "uint8" =>
        val mn = v.min; val mx = v.max
        uint8ToVector(toUint8(v)).map(x => mn + x * (mx - mn))
      case "fp16"    => fp16ToVector(toFp16(v))
      case "binary"  => binaryToVector(toBinary(v), v.length)
      case "ternary" =>
        val maxAbs = maxAbsOf(v)
        ternaryToVector(toTernary(v), v.length).map(_ * maxAbs)
      case "int4" =>
        val maxAbs = maxAbsOf(v)
        int4ToVector(toInt4(v), v.length).map(_ * maxAbs)
      case "fp8_e4m3" => fp8ToVector(toFp8(v, e4m3 = true), e4m3 = true)
      case "fp8_e5m2" => fp8ToVector(toFp8(v, e4m3 = false), e4m3 = false)
      case other => throw new IllegalArgumentException(s"unknown quantization method: $other")
    }
    val bitsPerDim = method match {
      case "binary" => 1.0
      case "ternary" => 2.0
      case "int4" => 4.0
      case "int8" | "uint8" | "fp8_e4m3" | "fp8_e5m2" => 8.0
      case "fp16" => 16.0
    }
    var mse = 0.0; var mae = 0.0; var maxErr = 0.0; var sumAbs = 0.0
    var i = 0
    while (i < v.length) {
      val e = math.abs(v(i).toDouble - deq(i).toDouble)
      mse += e * e; mae += e; if (e > maxErr) maxErr = e
      sumAbs += math.abs(v(i).toDouble)
      i += 1
    }
    val n = math.max(1, v.length)
    QuantizeReport(mse / n, mae / n, maxErr, 32.0 / bitsPerDim,
      if (sumAbs == 0.0) 0.0 else mae / (sumAbs / n))
  }

  @inline private def maxAbsOf(v: Array[Float]): Float = {
    var m = 0.0f; var i = 0
    while (i < v.length) { val a = math.abs(v(i)); if (a > m) m = a; i += 1 }
    m
  }

  // ---------------- Spark registration ----------------

  // STRICT like the reference's PG functions: NULL in → NULL out (the
  // raw lambdas would NPE on nullable embedding columns).
  val toInt8Udf = udf((v: Seq[Float]) => if (v == null) null else toInt8(v.toArray))
  val int8ToVectorUdf = udf((q: Array[Byte]) => if (q == null) null else int8ToVector(q))
  val toUint8Udf = udf((v: Seq[Float]) => if (v == null) null else toUint8(v.toArray))
  val uint8ToVectorUdf = udf((q: Array[Byte]) => if (q == null) null else uint8ToVector(q))
  val toFp16Udf = udf((v: Seq[Float]) => if (v == null) null else toFp16(v.toArray))
  val fp16ToVectorUdf = udf((q: Array[Byte]) => if (q == null) null else fp16ToVector(q))
  val toBinaryUdf = udf((v: Seq[Float]) => if (v == null) null else toBinary(v.toArray))
  val binaryToVectorUdf = udf((q: Array[Byte], dim: Int) =>
    if (q == null) null else binaryToVector(q, dim))
  val binaryHammingUdf = udf((a: Array[Byte], b: Array[Byte]) =>
    if (a == null || b == null) None else Some(binaryHamming(a, b)))
  val toTernaryUdf = udf((v: Seq[Float]) => if (v == null) null else toTernary(v.toArray))
  val ternaryToVectorUdf = udf((q: Array[Byte], dim: Int) =>
    if (q == null) null else ternaryToVector(q, dim))
  val toInt4Udf = udf((v: Seq[Float]) => if (v == null) null else toInt4(v.toArray))
  val int4ToVectorUdf = udf((q: Array[Byte], dim: Int) =>
    if (q == null) null else int4ToVector(q, dim))
  val autoQuantizeUdf = udf((v: Seq[Float], m: String) =>
    if (v == null || m == null) null else autoQuantize(v.toArray, m))
  val quantizeAnalyzeUdf = udf((v: Seq[Float], m: String) =>
    if (v == null || m == null) null else analyze(v.toArray, m).toJson)
  /** fp16-domain distance (`vector_l2_distance_fp16`, `neurondb--1.0.sql:2027-2036`). */
  val fp16L2Udf = udf((a: Array[Byte], b: Array[Byte]) =>
    if (a == null || b == null) None else Some(VectorOps.l2(fp16ToVector(a), fp16ToVector(b))))
  val fp16CosineUdf = udf((a: Array[Byte], b: Array[Byte]) =>
    if (a == null || b == null) None
    else Some(VectorOps.cosineDistance(fp16ToVector(a), fp16ToVector(b))))

  def register(spark: SparkSession): Unit = {
    spark.udf.register("vector_to_int8", toInt8Udf)
    spark.udf.register("int8_to_vector", int8ToVectorUdf)
    spark.udf.register("vector_to_uint8", toUint8Udf)
    spark.udf.register("uint8_to_vector", uint8ToVectorUdf)
    spark.udf.register("vector_to_float16", toFp16Udf)
    spark.udf.register("float16_to_vector", fp16ToVectorUdf)
    spark.udf.register("vector_to_binary", toBinaryUdf)
    spark.udf.register("binary_quantize", toBinaryUdf)
    spark.udf.register("binary_to_vector", binaryToVectorUdf)
    spark.udf.register("binary_hamming_distance", binaryHammingUdf)
    spark.udf.register("vector_to_ternary", toTernaryUdf)
    spark.udf.register("ternary_to_vector", ternaryToVectorUdf)
    spark.udf.register("vector_to_int4", toInt4Udf)
    spark.udf.register("int4_to_vector", int4ToVectorUdf)
    spark.udf.register("auto_quantize", autoQuantizeUdf)
    spark.udf.register("quantize_analyze", quantizeAnalyzeUdf)
    spark.udf.register("vector_l2_distance_fp16", fp16L2Udf)
    spark.udf.register("vector_cosine_distance_fp16", fp16CosineUdf)
  }
}
