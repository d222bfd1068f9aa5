package graft.operators

import scala.collection.mutable

/**
 * TFRecord shard ingestion — the ML-NATIVE archive rung after WARC /
 * ustar / ZIP: large training corpora ship as TFRecord shards of
 * `tf.Example` protobufs, and an engine that claims to feed trainers
 * must read them record-exactly.
 *
 * Both layers are public formats:
 *  - TFRecord framing (TensorFlow's record format): per record a
 *    little-endian u64 length, the MASKED CRC32C of those 8 length
 *    bytes, the payload, and the masked CRC32C of the payload; mask =
 *    ((crc >>> 15) | (crc << 17)) + 0xa282ead8 (mod 2³²). CRC32C
 *    (Castagnoli) is `java.util.zip.CRC32C` — stdlib, like DEFLATE.
 *  - `tf.Example` protobuf wire format: varint tags `(field << 3) |
 *    wire_type`, length-delimited submessages, the Features map as
 *    repeated map-entry messages (key = 1, value = 2), and the three
 *    Feature kinds — BytesList(1) / FloatList(2, packed fixed32) /
 *    Int64List(3, packed varints, full 10-byte two's-complement for
 *    negatives).
 *
 * Any CRC, framing, varint, or tag defect fails the whole shard
 * (None) — a half-read shard must not silently truncate a corpus.
 * Unknown fields are SKIPPED by wire type (the protobuf contract), so
 * shards written by newer producers still read.
 *
 * Scale shape: stateless per-row map (shard blob in, example rows
 * out) — the "many shards, one row each" layout TFRecord was designed
 * for; record boundaries come from the framing, never from scanning.
 */
object Tfrecord {

  sealed trait FeatureValue
  final case class BytesV(values: Seq[Array[Byte]]) extends FeatureValue
  final case class FloatsV(values: Seq[Float]) extends FeatureValue
  final case class IntsV(values: Seq[Long]) extends FeatureValue

  type Example = Map[String, FeatureValue]

  // ------------------------------------------------------------ varint

  private def writeVarint(out: mutable.ArrayBuffer[Byte], v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0) {
      out += ((v & 0x7f) | 0x80).toByte
      v >>>= 7
    }
    out += (v & 0x7f).toByte
  }

  private final class Reader(val data: Array[Byte], var pos: Int, val end: Int) {
    def varint(): Long = {
      var shift = 0
      var v = 0L
      var b = 0
      do {
        require(pos < end && shift < 64, "varint truncated or overlong")
        b = data(pos) & 0xff
        v |= (b & 0x7fL) << shift
        shift += 7
        pos += 1
      } while ((b & 0x80) != 0)
      v
    }
    def bytes(n: Int): Array[Byte] = {
      require(n >= 0 && pos + n <= end, "length-delimited field truncated")
      val r = java.util.Arrays.copyOfRange(data, pos, pos + n)
      pos += n
      r
    }
    def fixed32(): Int = {
      require(pos + 4 <= end, "fixed32 truncated")
      val v = (data(pos) & 0xff) | ((data(pos + 1) & 0xff) << 8) |
        ((data(pos + 2) & 0xff) << 16) | ((data(pos + 3) & 0xff) << 24)
      pos += 4
      v
    }
    def skip(wireType: Int): Unit = wireType match {
      case 0 => varint()
      case 1 => require(pos + 8 <= end, "fixed64 truncated"); pos += 8
      case 2 => val n = varint().toInt; bytes(n)
      case 5 => fixed32()
      case w => sys.error(s"unknown wire type $w")
    }
  }

  // --------------------------------------------------- protobuf encode

  private def lenDelimited(field: Int, body: Array[Byte],
                           out: mutable.ArrayBuffer[Byte]): Unit = {
    writeVarint(out, (field.toLong << 3) | 2)
    writeVarint(out, body.length.toLong)
    out ++= body
  }

  private def encodeFeature(f: FeatureValue): Array[Byte] = {
    val out = mutable.ArrayBuffer[Byte]()
    f match {
      case BytesV(vs) =>
        val bl = mutable.ArrayBuffer[Byte]()
        vs.foreach { v =>
          writeVarint(bl, (1L << 3) | 2); writeVarint(bl, v.length.toLong); bl ++= v
        }
        lenDelimited(1, bl.toArray, out)
      case FloatsV(vs) =>
        val fl = mutable.ArrayBuffer[Byte]()
        val packed = mutable.ArrayBuffer[Byte]()
        vs.foreach { v =>
          val bits = java.lang.Float.floatToIntBits(v)
          packed += (bits & 0xff).toByte
          packed += ((bits >> 8) & 0xff).toByte
          packed += ((bits >> 16) & 0xff).toByte
          packed += ((bits >> 24) & 0xff).toByte
        }
        writeVarint(fl, (1L << 3) | 2)
        writeVarint(fl, packed.length.toLong)
        fl ++= packed
        lenDelimited(2, fl.toArray, out)
      case IntsV(vs) =>
        val il = mutable.ArrayBuffer[Byte]()
        val packed = mutable.ArrayBuffer[Byte]()
        vs.foreach(writeVarint(packed, _))
        writeVarint(il, (1L << 3) | 2)
        writeVarint(il, packed.length.toLong)
        il ++= packed
        lenDelimited(3, il.toArray, out)
    }
    out.toArray
  }

  /** Serialize one tf.Example (sorted keys for determinism). */
  def encodeExample(ex: Example): Array[Byte] = {
    val features = mutable.ArrayBuffer[Byte]()
    ex.toSeq.sortBy(_._1).foreach { case (k, v) =>
      val entry = mutable.ArrayBuffer[Byte]()
      lenDelimited(1, k.getBytes("UTF-8"), entry)
      lenDelimited(2, encodeFeature(v), entry)
      lenDelimited(1, entry.toArray, features) // Features.feature map entry
    }
    val out = mutable.ArrayBuffer[Byte]()
    lenDelimited(1, features.toArray, out) // Example.features
    out.toArray
  }

  // --------------------------------------------------- protobuf decode

  private def decodeFeature(data: Array[Byte]): FeatureValue = {
    val r = new Reader(data, 0, data.length)
    var result: FeatureValue = BytesV(Nil)
    var seen = false
    while (r.pos < r.end) {
      val tag = r.varint()
      val field = (tag >>> 3).toInt
      val wt = (tag & 7).toInt
      (field, wt) match {
        case (1, 2) => // BytesList
          val body = r.bytes(r.varint().toInt)
          val br = new Reader(body, 0, body.length)
          val vs = mutable.Buffer[Array[Byte]]()
          while (br.pos < br.end) {
            val t2 = br.varint()
            require(t2 == ((1L << 3) | 2), s"unexpected BytesList tag $t2")
            vs += br.bytes(br.varint().toInt)
          }
          result = BytesV(vs.toSeq); seen = true
        case (2, 2) => // FloatList
          val body = r.bytes(r.varint().toInt)
          val br = new Reader(body, 0, body.length)
          val vs = mutable.Buffer[Float]()
          while (br.pos < br.end) {
            val t2 = br.varint()
            val w2 = (t2 & 7).toInt
            require((t2 >>> 3).toInt == 1, s"unexpected FloatList field")
            if (w2 == 2) { // packed
              val n = br.varint().toInt
              require(n % 4 == 0, "packed float blob not multiple of 4")
              val end = br.pos + n
              while (br.pos < end) vs += java.lang.Float.intBitsToFloat(br.fixed32())
            } else if (w2 == 5) vs += java.lang.Float.intBitsToFloat(br.fixed32())
            else sys.error(s"bad FloatList wire type $w2")
          }
          result = FloatsV(vs.toSeq); seen = true
        case (3, 2) => // Int64List
          val body = r.bytes(r.varint().toInt)
          val br = new Reader(body, 0, body.length)
          val vs = mutable.Buffer[Long]()
          while (br.pos < br.end) {
            val t2 = br.varint()
            val w2 = (t2 & 7).toInt
            require((t2 >>> 3).toInt == 1, s"unexpected Int64List field")
            if (w2 == 2) { // packed
              val n = br.varint().toInt
              val end = br.pos + n
              while (br.pos < end) vs += br.varint()
              require(br.pos == end, "packed varint blob misaligned")
            } else if (w2 == 0) vs += br.varint()
            else sys.error(s"bad Int64List wire type $w2")
          }
          result = IntsV(vs.toSeq); seen = true
        case _ => r.skip(wt)
      }
    }
    require(seen, "Feature with no kind")
    result
  }

  def decodeExample(data: Array[Byte]): Example = {
    val r = new Reader(data, 0, data.length)
    val out = mutable.Map[String, FeatureValue]()
    while (r.pos < r.end) {
      val tag = r.varint()
      if ((tag >>> 3) == 1 && (tag & 7) == 2) { // Example.features
        val fb = r.bytes(r.varint().toInt)
        val fr = new Reader(fb, 0, fb.length)
        while (fr.pos < fr.end) {
          val t2 = fr.varint()
          if ((t2 >>> 3) == 1 && (t2 & 7) == 2) { // map entry
            val eb = fr.bytes(fr.varint().toInt)
            val er = new Reader(eb, 0, eb.length)
            var key: String = null
            var value: FeatureValue = null
            while (er.pos < er.end) {
              val t3 = er.varint()
              ((t3 >>> 3).toInt, (t3 & 7).toInt) match {
                case (1, 2) => key = new String(er.bytes(er.varint().toInt), "UTF-8")
                case (2, 2) => value = decodeFeature(er.bytes(er.varint().toInt))
                case (_, w) => er.skip(w)
              }
            }
            require(key != null && value != null, "map entry missing key or value")
            out(key) = value
          } else fr.skip((t2 & 7).toInt)
        }
      } else r.skip((tag & 7).toInt)
    }
    out.toMap
  }

  // ---------------------------------------------------- record framing

  private def maskedCrc32c(b: Array[Byte]): Int = {
    val c = new java.util.zip.CRC32C()
    c.update(b)
    val crc = c.getValue.toInt
    ((crc >>> 15) | (crc << 17)) + 0xa282ead8
  }

  private def le64(v: Long): Array[Byte] =
    Array.tabulate[Byte](8)(i => ((v >>> (8 * i)) & 0xff).toByte)
  private def le32(v: Int): Array[Byte] =
    Array.tabulate[Byte](4)(i => ((v >>> (8 * i)) & 0xff).toByte)

  /** Frame serialized examples as a TFRecord shard. */
  def encodeShard(examples: Seq[Example]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    examples.foreach { ex =>
      val payload = encodeExample(ex)
      val len = le64(payload.length.toLong)
      out.write(len)
      out.write(le32(maskedCrc32c(len)))
      out.write(payload)
      out.write(le32(maskedCrc32c(payload)))
    }
    out.toByteArray
  }

  /** Decode a shard to examples; None on ANY CRC/framing/wire defect. */
  def decodeShard(payload: Array[Byte]): Option[Seq[Example]] =
    try {
      val out = mutable.Buffer[Example]()
      var off = 0
      def rdLe32(i: Int): Int =
        (payload(i) & 0xff) | ((payload(i + 1) & 0xff) << 8) |
          ((payload(i + 2) & 0xff) << 16) | ((payload(i + 3) & 0xff) << 24)
      while (off < payload.length) {
        require(off + 12 <= payload.length, "record header truncated")
        val lenBytes = java.util.Arrays.copyOfRange(payload, off, off + 8)
        var len = 0L
        (0 until 8).foreach(i => len |= (lenBytes(i) & 0xffL) << (8 * i))
        require(maskedCrc32c(lenBytes) == rdLe32(off + 8), "length CRC mismatch")
        require(len <= Int.MaxValue && off + 12 + len + 4 <= payload.length,
          "record payload truncated")
        val body = java.util.Arrays.copyOfRange(payload, off + 12, off + 12 + len.toInt)
        require(maskedCrc32c(body) == rdLe32(off + 12 + len.toInt), "payload CRC mismatch")
        out += decodeExample(body)
        off += 12 + len.toInt + 4
      }
      Some(out.toSeq)
    } catch { case _: Exception => None }
}
