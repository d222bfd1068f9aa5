package graft.operators

/**
 * Pure-JVM FLAC codec — the lossless-compression rung of the multimodal
 * ladder (reference surface: `NeuronDB/src/ml/ml_multimodal.c`'s
 * audio ingest; this repo's `audio_samples`/`audio_adpcm` siblings).
 * Everything here is written against the published format spec
 * (RFC 9639 / xiph.org FLAC format): stream marker + STREAMINFO,
 * frames with CRC-8-checked headers and CRC-16-checked payloads,
 * UTF-8-coded frame numbers, constant / verbatim / fixed-predictor /
 * LPC subframes, Rice-coded residuals with generic partition orders and
 * escape codes, and left/side · right/side · mid/side stereo
 * decorrelation. Lossless ⇒ the decode is integer-exact, so the
 * `audio_flac` oracle re-derives every output from the closed-form PCM
 * the encoder consumed — any bit-alignment, CRC, predictor, or
 * decorrelation defect breaks the hash.
 *
 * Scale shape: encode and decode are stateless per-row maps
 * (partition-local, no shuffle) — the same shape as every other
 * multimodal decode in this repo.
 */
object Flac {

  final case class FlacMeta(sampleRate: Int, channels: Int,
                            bitsPerSample: Int, totalSamples: Long,
                            nFrames: Int, maxBlockSize: Int)

  // ---------------------------------------------------------------- bit IO

  private[operators] final class BitWriter {
    private val buf = scala.collection.mutable.ArrayBuffer.empty[Byte]
    private var acc = 0L
    private var n = 0
    def writeBits(v: Long, bits: Int): Unit = {
      require(bits >= 0 && bits <= 57, s"bits out of range: $bits")
      acc = (acc << bits) | (v & ((1L << bits) - 1))
      n += bits
      while (n >= 8) { buf += ((acc >>> (n - 8)) & 0xff).toByte; n -= 8 }
    }
    def writeUnary(q: Int): Unit = { // q zeros then a one (FLAC unary)
      var left = q
      while (left >= 32) { writeBits(0L, 32); left -= 32 }
      writeBits(1L, left + 1)
    }
    def alignByte(): Unit = if (n > 0) writeBits(0L, 8 - n)
    def bytes: Array[Byte] = { require(n == 0, "unaligned"); buf.toArray }
    def size: Int = buf.length
  }

  private[operators] final class BitReader(data: Array[Byte]) {
    var bitPos: Long = 0L
    def bytePos: Int = (bitPos >> 3).toInt
    def atEnd: Boolean = bitPos >= data.length.toLong * 8
    def readBits(bits: Int): Long = {
      var v = 0L
      var left = bits
      while (left > 0) {
        val byte = data((bitPos >> 3).toInt) & 0xff
        val off = (bitPos & 7).toInt
        val take = math.min(8 - off, left)
        val chunk = (byte >> (8 - off - take)) & ((1 << take) - 1)
        v = (v << take) | chunk
        bitPos += take
        left -= take
      }
      v
    }
    def readSigned(bits: Int): Long = {
      val v = readBits(bits)
      if (bits > 0 && (v & (1L << (bits - 1))) != 0) v - (1L << bits) else v
    }
    def readUnary(): Int = {
      var q = 0
      while (readBits(1) == 0) q += 1
      q
    }
    def alignByte(): Unit = { val r = (bitPos & 7).toInt; if (r != 0) bitPos += 8 - r }
  }

  // ---------------------------------------------------------------- CRCs

  /** CRC-8, poly 0x07, init 0 — frame-header checksum. */
  def crc8(data: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= data(i) & 0xff
      var b = 0
      while (b < 8) {
        crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xff else (crc << 1) & 0xff
        b += 1
      }
      i += 1
    }
    crc
  }

  /** CRC-16, poly 0x8005, init 0 — whole-frame checksum. */
  def crc16(data: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= (data(i) & 0xff) << 8
      var b = 0
      while (b < 8) {
        crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xffff
              else (crc << 1) & 0xffff
        b += 1
      }
      i += 1
    }
    crc
  }

  // ----------------------------------------------------- UTF-8 frame number

  private def writeUtf8Number(w: BitWriter, value: Long): Unit = {
    if (value < 0x80) w.writeBits(value, 8)
    else {
      // count continuation bytes needed (frame numbers fit 36 bits)
      var nBytes = 2
      while (nBytes < 7 && value >= (1L << (nBytes * 5 + 1))) nBytes += 1
      val lead = (0xfe << (7 - nBytes)) & 0xff // nBytes leading 1s + 0
      w.writeBits(lead | ((value >> ((nBytes - 1) * 6)) &
        ((1L << (7 - nBytes)) - 1)), 8)
      var i = nBytes - 2
      while (i >= 0) {
        w.writeBits(0x80L | ((value >> (i * 6)) & 0x3f), 8)
        i -= 1
      }
    }
  }

  private def readUtf8Number(r: BitReader): Long = {
    val b0 = r.readBits(8).toInt
    if ((b0 & 0x80) == 0) b0.toLong
    else {
      var nBytes = 0
      var mask = 0x80
      while (nBytes < 8 && (b0 & mask) != 0) { nBytes += 1; mask >>= 1 }
      require(nBytes >= 2 && nBytes <= 7, s"bad utf8 lead byte $b0")
      var v = (b0 & (mask - 1)).toLong
      var i = 1
      while (i < nBytes) {
        val c = r.readBits(8).toInt
        require((c & 0xc0) == 0x80, s"bad utf8 continuation $c")
        v = (v << 6) | (c & 0x3f)
        i += 1
      }
      v
    }
  }

  // -------------------------------------------------------- fixed predictors

  /** Fixed-predictor residual (orders 0..4) over warmup history. */
  private def fixedResidual(x: Array[Long], i: Int, order: Int): Long = order match {
    case 0 => x(i)
    case 1 => x(i) - x(i - 1)
    case 2 => x(i) - 2 * x(i - 1) + x(i - 2)
    case 3 => x(i) - 3 * x(i - 1) + 3 * x(i - 2) - x(i - 3)
    case 4 => x(i) - 4 * x(i - 1) + 6 * x(i - 2) - 4 * x(i - 3) + x(i - 4)
  }

  private def fixedRestore(x: Array[Long], i: Int, order: Int, r: Long): Long = order match {
    case 0 => r
    case 1 => r + x(i - 1)
    case 2 => r + 2 * x(i - 1) - x(i - 2)
    case 3 => r + 3 * x(i - 1) - 3 * x(i - 2) + x(i - 3)
    case 4 => r + 4 * x(i - 1) - 6 * x(i - 2) + 4 * x(i - 3) - x(i - 4)
  }

  // ------------------------------------------------------------- rice coding

  private def zigzag(r: Long): Long = if (r >= 0) r << 1 else (-r << 1) - 1
  private def unzigzag(u: Long): Long = if ((u & 1) == 0) u >> 1 else -((u + 1) >> 1)

  private def bestRiceParam(res: Array[Long], from: Int, until: Int): Int = {
    var sum = 0L
    var i = from
    while (i < until) { sum += zigzag(res(i)); i += 1 }
    val n = math.max(1, until - from)
    val mean = sum / n
    var p = 0
    while (p < 14 && (1L << (p + 1)) < mean + 1) p += 1
    p
  }

  private def signedBitsNeeded(v: Long): Int = {
    // bits for two's-complement representation of v
    var b = 1
    while (b < 32 && !(v >= -(1L << (b - 1)) && v < (1L << (b - 1)))) b += 1
    b
  }

  /** Write one residual partition: 4-bit param or 0b1111 escape + 5-bit
    * raw width. Escapes when the rice param would need to exceed 14. */
  private[operators] def writeRicePartition(w: BitWriter, res: Array[Long],
                                 from: Int, until: Int): Unit = {
    val p = bestRiceParam(res, from, until)
    // escape if any quotient would be absurd (raw coding is cheaper)
    var maxU = 0L
    var i = from
    while (i < until) { val u = zigzag(res(i)); if (u > maxU) maxU = u; i += 1 }
    if (p >= 14 && (maxU >> p) > 64) {
      var raw = 1
      i = from
      while (i < until) {
        val b = signedBitsNeeded(res(i)); if (b > raw) raw = b; i += 1
      }
      w.writeBits(0xfL, 4)
      w.writeBits(raw.toLong, 5)
      i = from
      while (i < until) { w.writeBits(res(i), raw); i += 1 }
    } else {
      w.writeBits(p.toLong, 4)
      i = from
      while (i < until) {
        val u = zigzag(res(i))
        w.writeUnary((u >> p).toInt)
        if (p > 0) w.writeBits(u, p)
        i += 1
      }
    }
  }

  private[operators] def readRicePartition(r: BitReader, out: Array[Long],
                                from: Int, until: Int): Unit = {
    val p = r.readBits(4).toInt
    if (p == 0xf) {
      val raw = r.readBits(5).toInt
      var i = from
      while (i < until) { out(i) = r.readSigned(raw); i += 1 }
    } else {
      var i = from
      while (i < until) {
        val q = r.readUnary().toLong
        val u = if (p > 0) (q << p) | r.readBits(p) else q
        out(i) = unzigzag(u)
        i += 1
      }
    }
  }

  /** Residual block: 2-bit method (00 = 4-bit rice), 4-bit partition
    * order, then 2^order partitions (first one short by the predictor
    * order). */
  private def writeResiduals(w: BitWriter, res: Array[Long], blockSize: Int,
                             predOrder: Int, partOrder: Int): Unit = {
    require(blockSize % (1 << partOrder) == 0 &&
      (blockSize >> partOrder) > predOrder, s"bad partition order $partOrder")
    w.writeBits(0L, 2)
    w.writeBits(partOrder.toLong, 4)
    val per = blockSize >> partOrder
    var part = 0
    var idx = 0
    while (part < (1 << partOrder)) {
      val cnt = if (part == 0) per - predOrder else per
      writeRicePartition(w, res, idx, idx + cnt)
      idx += cnt
      part += 1
    }
  }

  private def readResiduals(r: BitReader, blockSize: Int,
                            predOrder: Int): Array[Long] = {
    val method = r.readBits(2).toInt
    require(method == 0, s"unsupported residual method $method")
    val partOrder = r.readBits(4).toInt
    val per = blockSize >> partOrder
    require(blockSize % (1 << partOrder) == 0 && per > predOrder,
      s"bad partition order $partOrder for blockSize $blockSize")
    val out = new Array[Long](blockSize - predOrder)
    var part = 0
    var idx = 0
    while (part < (1 << partOrder)) {
      val cnt = if (part == 0) per - predOrder else per
      readRicePartition(r, out, idx, idx + cnt)
      idx += cnt
      part += 1
    }
    out
  }

  // --------------------------------------------------------------- subframes

  /** Deterministic per-(frame, channel) subframe plan — cycles through
    * the four subframe families so every decode path is exercised by
    * ordinary corpus round-trips. */
  private def planSubframe(x: Array[Long], frameIdx: Int, ch: Int): Int = {
    var allEq = true
    var i = 1
    while (allEq && i < x.length) { allEq = x(i) == x(0); i += 1 }
    if (allEq || x.length <= 4) 0 // constant (or too short for prediction)
    else (frameIdx + ch) % 4 match {
      case 0 => 2 // fixed order 2
      case 1 => 1 // fixed order 1
      case 2 => 5 // verbatim
      case 3 => 6 // lpc order 2
    }
  }

  // LPC demo predictor: x̂[i] = (3·x[i−1] − x[i−2]) >> 1  (precision 3, shift 1)
  private val LpcCoeffs = Array(3L, -1L)
  private val LpcShift = 1
  private val LpcPrecision = 3

  private[operators] def writeSubframe(w: BitWriter, x: Array[Long], bps: Int,
                            kind: Int, partOrder: Int): Unit = {
    val n = x.length
    kind match {
      case 0 => // constant or fallback verbatim when not actually constant
        var allEq = true
        var i = 1
        while (allEq && i < n) { allEq = x(i) == x(0); i += 1 }
        if (allEq) {
          w.writeBits(0L, 1); w.writeBits(0L, 6); w.writeBits(0L, 1)
          w.writeBits(x(0), bps)
        } else {
          w.writeBits(0L, 1); w.writeBits(1L, 6); w.writeBits(0L, 1)
          i = 0
          while (i < n) { w.writeBits(x(i), bps); i += 1 }
        }
      case 5 => // verbatim
        w.writeBits(0L, 1); w.writeBits(1L, 6); w.writeBits(0L, 1)
        var i = 0
        while (i < n) { w.writeBits(x(i), bps); i += 1 }
      case o if o >= 1 && o <= 4 => // fixed predictor
        w.writeBits(0L, 1); w.writeBits(8L | o, 6); w.writeBits(0L, 1)
        var i = 0
        while (i < o) { w.writeBits(x(i), bps); i += 1 }
        val res = new Array[Long](n - o)
        i = o
        while (i < n) { res(i - o) = fixedResidual(x, i, o); i += 1 }
        val po = if (n % (1 << partOrder) == 0 && (n >> partOrder) > o) partOrder else 0
        writeResiduals(w, res, n, o, po)
      case 6 => // lpc order 2
        val o = LpcCoeffs.length
        w.writeBits(0L, 1); w.writeBits(0x20L | (o - 1), 6); w.writeBits(0L, 1)
        var i = 0
        while (i < o) { w.writeBits(x(i), bps); i += 1 }
        w.writeBits((LpcPrecision - 1).toLong, 4)
        w.writeBits(LpcShift.toLong, 5)
        i = 0
        while (i < o) { w.writeBits(LpcCoeffs(i), LpcPrecision); i += 1 }
        val res = new Array[Long](n - o)
        i = o
        while (i < n) {
          var acc = 0L
          var j = 0
          while (j < o) { acc += LpcCoeffs(j) * x(i - 1 - j); j += 1 }
          res(i - o) = x(i) - (acc >> LpcShift)
          i += 1
        }
        val po = if (n % (1 << partOrder) == 0 && (n >> partOrder) > o) partOrder else 0
        writeResiduals(w, res, n, o, po)
    }
  }

  private[operators] def readSubframe(r: BitReader, n: Int, bps: Int): Array[Long] = {
    val pad = r.readBits(1)
    require(pad == 0, "subframe padding bit set")
    val typ = r.readBits(6).toInt
    val wasted = r.readBits(1)
    require(wasted == 0, "wasted-bits subframes not emitted by this encoder")
    val x = new Array[Long](n)
    if (typ == 0) { // constant
      val v = r.readSigned(bps)
      java.util.Arrays.fill(x, v)
    } else if (typ == 1) { // verbatim
      var i = 0
      while (i < n) { x(i) = r.readSigned(bps); i += 1 }
    } else if ((typ & 0x38) == 0x08 && (typ & 0x07) <= 4) { // fixed
      val o = typ & 0x07
      var i = 0
      while (i < o) { x(i) = r.readSigned(bps); i += 1 }
      val res = readResiduals(r, n, o)
      i = o
      while (i < n) { x(i) = fixedRestore(x, i, o, res(i - o)); i += 1 }
    } else if ((typ & 0x20) != 0) { // lpc
      val o = (typ & 0x1f) + 1
      var i = 0
      while (i < o) { x(i) = r.readSigned(bps); i += 1 }
      val precision = r.readBits(4).toInt + 1
      require(precision <= 15, s"bad qlp precision $precision")
      val shift = r.readSigned(5).toInt
      require(shift >= 0, s"negative qlp shift $shift")
      val coeffs = new Array[Long](o)
      i = 0
      while (i < o) { coeffs(i) = r.readSigned(precision); i += 1 }
      val res = readResiduals(r, n, o)
      i = o
      while (i < n) {
        var acc = 0L
        var j = 0
        while (j < o) { acc += coeffs(j) * x(i - 1 - j); j += 1 }
        x(i) = res(i - o) + (acc >> shift)
        i += 1
      }
    } else sys.error(s"reserved subframe type $typ")
    x
  }

  // ------------------------------------------------------------------ encode

  /** Encode interleaved PCM16 as a spec-conformant FLAC stream.
    * `stereo`: "independent" or "midside" (2-channel only) — mid/side
    * writes the decorrelated pair with the side channel at bps+1.
    * Subframe types cycle per (frame, channel) via [[planSubframe]];
    * frames alternate Rice partition orders 0 and 1. */
  def encodeFlac(samples: Array[Short], sampleRate: Int, channels: Int,
                 blockSize: Int = 64, stereo: String = "independent"): Array[Byte] = {
    require(channels >= 1 && channels <= 8, s"channels: $channels")
    require(blockSize >= 8 && blockSize <= 65535, s"blockSize: $blockSize")
    require(samples.length % channels == 0, "ragged interleave")
    val stereoModes = Set("independent", "midside", "leftside", "rightside", "auto")
    require(stereoModes(stereo), s"unknown stereo mode $stereo")
    require(stereo == "independent" || channels == 2,
      s"stereo mode $stereo needs 2 channels")
    val bps = 16
    val frames = samples.length / channels
    val out = new java.io.ByteArrayOutputStream()
    out.write('f'); out.write('L'); out.write('a'); out.write('C')
    // STREAMINFO, last-metadata-block
    val si = new BitWriter
    si.writeBits(1L, 1); si.writeBits(0L, 7) // last + type 0
    si.writeBits(34L, 24)
    si.writeBits(blockSize.toLong, 16) // min block size
    si.writeBits(blockSize.toLong, 16) // max block size
    si.writeBits(0L, 24); si.writeBits(0L, 24) // frame sizes unknown
    si.writeBits(sampleRate.toLong, 20)
    si.writeBits((channels - 1).toLong, 3)
    si.writeBits((bps - 1).toLong, 5)
    si.writeBits(frames.toLong, 36)
    // MD5 of the unencoded PCM (little-endian interleaved int16) — the
    // format's whole-stream integrity signature
    val md5 = java.security.MessageDigest.getInstance("MD5")
    val pcmBytes = new Array[Byte](samples.length * 2)
    var si2 = 0
    while (si2 < samples.length) {
      pcmBytes(si2 * 2) = (samples(si2) & 0xff).toByte
      pcmBytes(si2 * 2 + 1) = ((samples(si2) >> 8) & 0xff).toByte
      si2 += 1
    }
    md5.update(pcmBytes)
    for (b <- md5.digest()) si.writeBits((b & 0xff).toLong, 8)
    out.write(si.bytes)
    var frameIdx = 0
    var pos = 0
    while (pos < frames) {
      val n = math.min(blockSize, frames - pos)
      // stereo decorrelation decision: build the candidate channel pair
      // for this frame's mode — "auto" estimates each mode's cost (sum
      // of |order-2 residual|, the standard encoder estimator) and picks
      // the cheapest of independent / left-side / right-side / mid-side,
      // exactly the per-frame decision real FLAC encoders make
      val (chAssign, chData): (Int, Seq[(Array[Long], Int)]) =
        if (channels == 2 && stereo != "independent") {
          val left = new Array[Long](n)
          val right = new Array[Long](n)
          var i = 0
          while (i < n) {
            left(i) = samples((pos + i) * 2).toLong
            right(i) = samples((pos + i) * 2 + 1).toLong
            i += 1
          }
          val side = Array.tabulate(n)(j => left(j) - right(j))
          val mid = Array.tabulate(n)(j => (left(j) + right(j)) >> 1)
          def cost(x: Array[Long]): Long = {
            var s = 0L
            var j = 2
            while (j < x.length) { s += math.abs(x(j) - 2 * x(j - 1) + x(j - 2)); j += 1 }
            s
          }
          val mode = stereo match {
            case "auto" =>
              val cL = cost(left); val cR = cost(right); val cS = cost(side)
              val cM = cost(mid)
              Seq(("independent", cL + cR), ("leftside", cL + cS),
                ("rightside", cS + cR), ("midside", cM + cS)).minBy(_._2)._1
            case m => m
          }
          mode match {
            case "independent" => (1, Seq((left, bps), (right, bps)))
            case "leftside"    => (8, Seq((left, bps), (side, bps + 1)))
            case "rightside"   => (9, Seq((side, bps + 1), (right, bps)))
            case "midside"     => (10, Seq((mid, bps), (side, bps + 1)))
          }
        } else {
          (channels - 1, (0 until channels).map { ch =>
            (Array.tabulate(n)(j => samples((pos + j) * channels + ch).toLong), bps)
          })
        }
      val w = new BitWriter
      w.writeBits(0x3ffeL, 14) // sync
      w.writeBits(0L, 1) // reserved
      w.writeBits(0L, 1) // fixed blocksize stream
      w.writeBits(7L, 4) // blocksize: 16-bit value - 1 at header end
      w.writeBits(0L, 4) // sample rate: from STREAMINFO
      w.writeBits(chAssign.toLong, 4)
      w.writeBits(4L, 3) // bps 16
      w.writeBits(0L, 1) // reserved
      writeUtf8Number(w, frameIdx.toLong)
      w.writeBits((n - 1).toLong, 16)
      w.alignByte()
      val headerBytes = w.bytes
      val w2 = new BitWriter
      val partOrder = if (frameIdx % 2 == 1) 1 else 0
      chData.zipWithIndex.foreach { case ((x, chBps), ch) =>
        writeSubframe(w2, x, chBps, planSubframe(x, frameIdx, ch), partOrder)
      }
      w2.alignByte()
      val bodyBytes = w2.bytes
      // assemble frame: header + crc8(header) + body + crc16(all)
      val frame = new Array[Byte](headerBytes.length + 1 + bodyBytes.length + 2)
      System.arraycopy(headerBytes, 0, frame, 0, headerBytes.length)
      frame(headerBytes.length) = crc8(headerBytes, 0, headerBytes.length).toByte
      System.arraycopy(bodyBytes, 0, frame, headerBytes.length + 1, bodyBytes.length)
      val c16 = crc16(frame, 0, frame.length - 2)
      frame(frame.length - 2) = ((c16 >> 8) & 0xff).toByte
      frame(frame.length - 1) = (c16 & 0xff).toByte
      out.write(frame)
      pos += n
      frameIdx += 1
    }
    out.toByteArray
  }

  // ------------------------------------------------------------------ decode

  /** Decode a FLAC stream to (meta, interleaved PCM16). CRC-8 and CRC-16
    * are VERIFIED per frame; any mismatch (or malformed structure)
    * returns None — corrupt media must never half-decode into a corpus. */
  def decodeFlac(payload: Array[Byte]): Option[(FlacMeta, Array[Short])] =
    try {
      if (payload.length < 42 || payload(0) != 'f' || payload(1) != 'L' ||
        payload(2) != 'a' || payload(3) != 'C') return None
      val r = new BitReader(payload)
      r.bitPos = 32L
      // metadata blocks
      var sampleRate = 0
      var channels = 0
      var bps = 0
      var total = 0L
      var maxBlock = 0
      var last = false
      var sawStreamInfo = false
      val md5Sig = new Array[Byte](16)
      while (!last) {
        last = r.readBits(1) == 1
        val typ = r.readBits(7).toInt
        val len = r.readBits(24).toInt
        if (typ == 0) {
          sawStreamInfo = true
          r.readBits(16) // min block
          maxBlock = r.readBits(16).toInt
          r.readBits(24); r.readBits(24)
          sampleRate = r.readBits(20).toInt
          channels = r.readBits(3).toInt + 1
          bps = r.readBits(5).toInt + 1
          total = r.readBits(36)
          var i = 0
          while (i < 16) { md5Sig(i) = r.readBits(8).toByte; i += 1 }
        } else {
          var i = 0
          while (i < len) { r.readBits(8); i += 1 }
        }
      }
      if (!sawStreamInfo || bps != 16) return None
      val out = new Array[Short]((total * channels).toInt)
      var written = 0
      var nFrames = 0
      while (r.bytePos + 2 <= payload.length && !r.atEnd) {
        val frameStart = r.bytePos
        val sync = r.readBits(14)
        require(sync == 0x3ffe, f"lost frame sync at byte $frameStart: $sync%x")
        require(r.readBits(1) == 0, "reserved bit set")
        r.readBits(1) // blocking strategy
        val bsCode = r.readBits(4).toInt
        val srCode = r.readBits(4).toInt
        val chAssign = r.readBits(4).toInt
        val bpsCode = r.readBits(3).toInt
        require(r.readBits(1) == 0, "reserved bit set")
        readUtf8Number(r)
        val blockSize = bsCode match {
          case 1 => 192
          case c if c >= 2 && c <= 5 => 576 << (c - 2)
          case 6 => r.readBits(8).toInt + 1
          case 7 => r.readBits(16).toInt + 1
          case c if c >= 8 => 256 << (c - 8)
          case _ => sys.error("reserved blocksize code")
        }
        srCode match {
          case 0 => () // from STREAMINFO
          case 12 => r.readBits(8)
          case 13 | 14 => r.readBits(16)
          case c if c >= 1 && c <= 11 => ()
          case _ => sys.error("invalid samplerate code")
        }
        require(bpsCode == 4, s"only 16-bit streams emitted here: $bpsCode")
        val headerEnd = r.bytePos
        val hCrc = r.readBits(8).toInt
        require(hCrc == crc8(payload, frameStart, headerEnd),
          s"frame header CRC-8 mismatch at byte $frameStart")
        val chans: Array[Array[Long]] = chAssign match {
          case a if a <= 7 =>
            require(a + 1 == channels, s"channel count flip: ${a + 1} vs $channels")
            Array.fill(channels)(readSubframe(r, blockSize, 16))
          case 8 => // left/side
            require(channels == 2, "left/side in non-stereo stream")
            val left = readSubframe(r, blockSize, 16)
            val side = readSubframe(r, blockSize, 17)
            val right = new Array[Long](blockSize)
            var i = 0
            while (i < blockSize) { right(i) = left(i) - side(i); i += 1 }
            Array(left, right)
          case 9 => // right/side
            require(channels == 2, "right/side in non-stereo stream")
            val side = readSubframe(r, blockSize, 17)
            val right = readSubframe(r, blockSize, 16)
            val left = new Array[Long](blockSize)
            var i = 0
            while (i < blockSize) { left(i) = right(i) + side(i); i += 1 }
            Array(left, right)
          case 10 => // mid/side
            require(channels == 2, "mid/side in non-stereo stream")
            val mid = readSubframe(r, blockSize, 16)
            val side = readSubframe(r, blockSize, 17)
            val left = new Array[Long](blockSize)
            val right = new Array[Long](blockSize)
            var i = 0
            while (i < blockSize) {
              val m = (mid(i) << 1) | (side(i) & 1L)
              left(i) = (m + side(i)) >> 1
              right(i) = (m - side(i)) >> 1
              i += 1
            }
            Array(left, right)
          case _ => sys.error(s"reserved channel assignment $chAssign")
        }
        r.alignByte()
        val crcPos = r.bytePos
        val fCrc = r.readBits(16).toInt
        require(fCrc == crc16(payload, frameStart, crcPos),
          s"frame CRC-16 mismatch at byte $frameStart")
        var i = 0
        while (i < blockSize && written < out.length) {
          var ch = 0
          while (ch < channels) {
            val v = chans(ch)(i)
            require(v >= Short.MinValue && v <= Short.MaxValue,
              s"decoded sample out of 16-bit range: $v")
            out(written) = v.toShort
            written += 1
            ch += 1
          }
          i += 1
        }
        nFrames += 1
      }
      require(written == out.length,
        s"stream truncated: $written of ${out.length} samples")
      // verify the STREAMINFO MD5 when set (all-zero means unknown)
      if (md5Sig.exists(_ != 0)) {
        val md5 = java.security.MessageDigest.getInstance("MD5")
        val pcmBytes = new Array[Byte](out.length * 2)
        var i = 0
        while (i < out.length) {
          pcmBytes(i * 2) = (out(i) & 0xff).toByte
          pcmBytes(i * 2 + 1) = ((out(i) >> 8) & 0xff).toByte
          i += 1
        }
        md5.update(pcmBytes)
        require(java.util.Arrays.equals(md5.digest(), md5Sig),
          "STREAMINFO MD5 mismatch — decoded PCM differs from encoded PCM")
      }
      Some((FlacMeta(sampleRate, channels, 16, total, nFrames, maxBlock), out))
    } catch { case _: Exception => None }
}
