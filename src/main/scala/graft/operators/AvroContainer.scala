package graft.operators

import scala.collection.mutable.ArrayBuffer

/**
 * Native Avro Object Container File (OCF) codec — the row-major ingest
 * format beside parquet/ORC in every data lake: Kafka dumps, Sqoop
 * exports, and event archives arrive as `.avro` long before anyone
 * columnarizes them, so a 100 TB ingest layer must read the container
 * natively and in parallel (sync markers make OCF block-splittable —
 * the same property TFRecord lacks).
 *
 * Format (public, Avro 1.12 spec §"Object Container Files"): magic
 * `Obj\x01`; file metadata as an Avro map (zigzag-varint block counts —
 * a NEGATIVE count is followed by a byte size — then string/bytes
 * pairs) carrying `avro.schema` (JSON) and `avro.codec`; a 16-byte sync
 * marker; then data blocks of (record count, byte size, payload, sync),
 * where the payload is the concatenated binary-encoded records under
 * the declared codec. Codecs here: `null`, `deflate` (raw DEFLATE),
 * `snappy` (raw block + 4-byte big-endian CRC32 of the PLAINTEXT).
 *
 * Record decode (spec §"Binary Encoding") for flat record schemas of
 * primitives: boolean = 1 byte; int/long = zigzag varint; float/double =
 * little-endian IEEE; string/bytes = length-prefixed; `["null", T]`
 * unions = zigzag branch index then the branch's encoding. Schemas
 * beyond that subset are REFUSED loudly, never guessed.
 *
 * Reference surface: the reference ingests through the database's own
 * storage (`NeuronDB/src`); container-format work is the same public
 * stance as the WARC/ZIP/TFRecord/parquet rungs.
 *
 * Scale shape: stateless per-file (or per sync-split) decode — a
 * mapPartitions-shaped scan with no shuffle; blocks stream, nothing
 * buffers beyond one block.
 */
object AvroContainer {

  final case class Field(name: String, tpe: String, nullable: Boolean)
  final case class Container(codec: String, fields: Seq[Field],
                             rows: Seq[Seq[Any]])

  // ------------------------------ reader -------------------------------

  private final class R(val data: Array[Byte], var pos: Int) {
    def hasMore: Boolean = pos < data.length
    def u8(): Int = { require(pos < data.length, "avro truncated"); val b = data(pos) & 0xff; pos += 1; b }
    def zigzag(): Long = {
      var shift = 0; var v = 0L
      var b = u8()
      while ((b & 0x80) != 0) {
        v |= (b & 0x7fL) << shift; shift += 7
        require(shift <= 63, "varint overflow")
        b = u8()
      }
      v |= (b & 0x7fL) << shift
      (v >>> 1) ^ -(v & 1)
    }
    def bytes(n: Long): Array[Byte] = {
      require(n >= 0 && n <= Int.MaxValue && pos + n <= data.length, "avro truncated")
      val b = java.util.Arrays.copyOfRange(data, pos, pos + n.toInt); pos += n.toInt; b
    }
    def str(): String = new String(bytes(zigzag()), "UTF-8")
  }

  /** Avro maps arrive in COUNT-prefixed blocks; a negative count is
    * followed by the block's byte size (spec's skip affordance). */
  private def readMeta(r: R): Map[String, Array[Byte]] = {
    val m = Map.newBuilder[String, Array[Byte]]
    var n = r.zigzag()
    while (n != 0) {
      val count = if (n < 0) { r.zigzag(); -n } else n
      var i = 0L
      while (i < count) { m += (r.str() -> r.bytes(r.zigzag())); i += 1 }
      n = r.zigzag()
    }
    m.result()
  }

  /** The flat-record schema subset: name + primitive type per field,
    * `["null", T]` unions allowed. Anything else → loud refusal. */
  private def parseSchema(json: String): Seq[Field] = {
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = om.readTree(json)
    require(root.isObject && root.path("type").asText == "record",
      "avro schema: only record roots supported")
    val fields = root.path("fields")
    require(fields.isArray && fields.size > 0, "avro schema: no fields")
    val prims = Set("boolean", "int", "long", "float", "double", "bytes", "string")
    (0 until fields.size).map { i =>
      val f = fields.get(i)
      val name = f.path("name").asText
      val t = f.path("type")
      if (t.isTextual) {
        require(prims(t.asText), s"avro schema: unsupported type ${t.asText}")
        Field(name, t.asText, nullable = false)
      } else {
        require(t.isArray && t.size == 2 && t.get(0).asText == "null" &&
          t.get(1).isTextual && prims(t.get(1).asText),
          s"avro schema: unsupported union at field $name")
        Field(name, t.get(1).asText, nullable = true)
      }
    }
  }

  private def readValue(r: R, tpe: String): Any = tpe match {
    case "boolean" => r.u8() match {
      case 0 => false; case 1 => true
      case b => sys.error(s"avro boolean byte $b")
    }
    case "int"    => val v = r.zigzag(); require(v >= Int.MinValue && v <= Int.MaxValue, "int overflow"); v.toInt
    case "long"   => r.zigzag()
    case "float"  =>
      val b = r.bytes(4)
      java.lang.Float.intBitsToFloat(
        (b(0) & 0xff) | ((b(1) & 0xff) << 8) | ((b(2) & 0xff) << 16) | ((b(3) & 0xff) << 24))
    case "double" =>
      val b = r.bytes(8)
      var v = 0L
      var i = 7
      while (i >= 0) { v = (v << 8) | (b(i) & 0xffL); i -= 1 }
      java.lang.Double.longBitsToDouble(v)
    case "bytes"  => r.bytes(r.zigzag())
    case "string" => r.str()
    case t => sys.error(s"avro type $t")
  }

  private def inflateBlock(payload: Array[Byte], codec: String): Array[Byte] =
    codec match {
      case "null" => payload
      case "deflate" => Zlib.inflateAll(payload, raw = true)
      case "snappy" =>
        require(payload.length >= 4, "avro snappy block truncated")
        val body = java.util.Arrays.copyOfRange(payload, 0, payload.length - 4)
        val plain = org.xerial.snappy.Snappy.uncompress(body)
        val crc = new java.util.zip.CRC32(); crc.update(plain)
        val want = ((payload(payload.length - 4) & 0xffL) << 24) |
          ((payload(payload.length - 3) & 0xffL) << 16) |
          ((payload(payload.length - 2) & 0xffL) << 8) |
          (payload(payload.length - 1) & 0xffL)
        require(crc.getValue == want, "avro snappy CRC mismatch")
        plain
      case c => sys.error(s"avro codec $c unsupported")
    }

  /** Parse a whole OCF. None on anything that is not a valid container
    * (bad magic, sync mismatch, truncation, CRC failure) — refuse, never
    * guess. Unsupported schema shapes and codecs also refuse. */
  def parse(data: Array[Byte]): Option[Container] = {
    try {
      val r = new R(data, 0)
      if (data.length < 20 || r.u8() != 'O' || r.u8() != 'b' || r.u8() != 'j' || r.u8() != 1)
        return None
      val meta = readMeta(r)
      val codec = meta.get("avro.codec").map(new String(_, "UTF-8")).getOrElse("null")
      val schema = new String(meta.getOrElse("avro.schema",
        sys.error("avro: no schema")), "UTF-8")
      val fields = parseSchema(schema)
      val sync = r.bytes(16)
      val rows = ArrayBuffer.empty[Seq[Any]]
      while (r.hasMore) {
        val count = r.zigzag()
        require(count >= 0, "avro negative block count")
        val payload = r.bytes(r.zigzag())
        require(java.util.Arrays.equals(r.bytes(16), sync), "avro sync mismatch")
        val br = new R(inflateBlock(payload, codec), 0)
        var i = 0L
        while (i < count) {
          rows += fields.map { f =>
            if (f.nullable) {
              br.zigzag() match {
                case 0 => null
                case 1 => readValue(br, f.tpe)
                case b => sys.error(s"avro union branch $b")
              }
            } else readValue(br, f.tpe)
          }
          i += 1
        }
        require(!br.hasMore, "avro block has trailing bytes")
      }
      Some(Container(codec, fields, rows.toSeq))
    } catch { case _: Exception => None }
  }

  // ------------------------------ writer -------------------------------

  private def writeZigzag(out: java.io.ByteArrayOutputStream, value: Long): Unit = {
    var v = (value << 1) ^ (value >> 63)
    while ((v & ~0x7fL) != 0) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
    out.write(v.toInt)
  }

  private def writeStr(out: java.io.ByteArrayOutputStream, s: String): Unit = {
    val b = s.getBytes("UTF-8"); writeZigzag(out, b.length); out.write(b)
  }

  /** Encode rows as a null-codec OCF (one block) — the producer side of
    * the round-trip; the independent consumer is avro-java's
    * DataFileReader (spec-exercised). `sync` must be 16 bytes. */
  def writeBytes(fields: Seq[Field], rows: Seq[Seq[Any]],
                 sync: Array[Byte]): Array[Byte] = {
    require(sync.length == 16, "sync must be 16 bytes")
    val schema = fields.map { f =>
      val t = if (f.nullable) s"""["null","${f.tpe}"]""" else s""""${f.tpe}""""
      s"""{"name":"${f.name}","type":$t}"""
    }.mkString("""{"type":"record","name":"r","fields":[""", ",", "]}")
    val out = new java.io.ByteArrayOutputStream()
    out.write('O'); out.write('b'); out.write('j'); out.write(1)
    writeZigzag(out, 2)
    writeStr(out, "avro.schema"); writeStr(out, schema)
    writeStr(out, "avro.codec")
    writeZigzag(out, 4); out.write("null".getBytes("UTF-8"))
    writeZigzag(out, 0)
    out.write(sync)
    val body = new java.io.ByteArrayOutputStream()
    rows.foreach { row =>
      require(row.length == fields.length, "row arity mismatch")
      fields.zip(row).foreach { case (f, v) =>
        if (f.nullable) {
          if (v == null) { writeZigzag(body, 0) }
          else { writeZigzag(body, 1); writeOne(body, f.tpe, v) }
        } else writeOne(body, f.tpe, v)
      }
    }
    writeZigzag(out, rows.length)
    writeZigzag(out, body.size)
    body.writeTo(out)
    out.write(sync)
    out.toByteArray
  }

  private def writeOne(out: java.io.ByteArrayOutputStream, tpe: String, v: Any): Unit =
    tpe match {
      case "boolean" => out.write(if (v.asInstanceOf[Boolean]) 1 else 0)
      case "int"     => writeZigzag(out, v.asInstanceOf[Int].toLong)
      case "long"    => writeZigzag(out, v.asInstanceOf[Long])
      case "float"   =>
        val bits = java.lang.Float.floatToIntBits(v.asInstanceOf[Float])
        out.write(bits & 0xff); out.write((bits >> 8) & 0xff)
        out.write((bits >> 16) & 0xff); out.write((bits >> 24) & 0xff)
      case "double"  =>
        var bits = java.lang.Double.doubleToLongBits(v.asInstanceOf[Double])
        var i = 0
        while (i < 8) { out.write((bits & 0xff).toInt); bits >>>= 8; i += 1 }
      case "bytes"   =>
        val b = v.asInstanceOf[Array[Byte]]; writeZigzag(out, b.length); out.write(b)
      case "string"  => writeStr(out, v.asInstanceOf[String])
      case t => sys.error(s"avro type $t")
    }
}
