package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AvroContainer
import graft.operators.AvroContainer.Field

/** Avro OCF codec, cross-checked BOTH directions against avro-java —
  * an independent implementation bundled with Spark: our reader decodes
  * DataFileWriter streams under all three codecs, and avro-java's
  * DataFileReader decodes our writer's null-codec container. Plus loud
  * refusal on sync mismatch, CRC corruption, truncation, and
  * out-of-subset schemas. */
class AvroContainerSpec extends AnyFunSuite {

  import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}

  private val schemaJson =
    """{"type":"record","name":"t","fields":[
      |{"name":"id","type":"long"},{"name":"ok","type":"boolean"},
      |{"name":"w","type":"int"},{"name":"f","type":"float"},
      |{"name":"x","type":"double"},{"name":"s","type":"string"},
      |{"name":"b","type":"bytes"},
      |{"name":"opt","type":["null","long"]}]}""".stripMargin

  private def foreign(codec: String, n: Int): Array[Byte] = {
    val schema = new org.apache.avro.Schema.Parser().parse(schemaJson)
    val out = new java.io.ByteArrayOutputStream()
    val w = new org.apache.avro.file.DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](schema))
    w.setCodec(codec match {
      case "deflate" => org.apache.avro.file.CodecFactory.deflateCodec(6)
      case "snappy"  => org.apache.avro.file.CodecFactory.snappyCodec()
      case _         => org.apache.avro.file.CodecFactory.nullCodec()
    })
    w.create(schema, out, Array.tabulate[Byte](16)(_.toByte))
    (0 until n).foreach { i =>
      val r = new GenericData.Record(schema)
      r.put("id", i.toLong * 7 - 3)
      r.put("ok", i % 2 == 0)
      r.put("w", -i)
      r.put("f", i * 0.25f)
      r.put("x", i * 0.125 + 1.0)
      r.put("s", s"véc$i") // multi-byte UTF-8 on purpose
      r.put("b", java.nio.ByteBuffer.wrap(Array[Byte](i.toByte, (i + 1).toByte)))
      r.put("opt", if (i % 3 == 0) null else java.lang.Long.valueOf(i.toLong))
      w.append(r)
    }
    w.close()
    out.toByteArray
  }

  for (codec <- Seq("null", "deflate", "snappy")) {
    test(s"foreign stream ($codec): full value round-trip out of avro-java") {
      val c = AvroContainer.parse(foreign(codec, 9)).get
      assert(c.codec == codec)
      assert(c.fields.map(_.name) == Seq("id", "ok", "w", "f", "x", "s", "b", "opt"))
      assert(c.rows.length == 9)
      assert(c.rows(4) match {
        case Seq(25L, true, -4, f: Float, x: Double, "véc4", b: Array[Byte], 4L) =>
          f == 1.0f && x == 1.5 && b.sameElements(Array[Byte](4, 5))
        case _ => false
      })
      assert(c.rows(3)(7) == null && c.rows(0)(0) == -3L)
    }
  }

  test("our writer reads back through avro-java's DataFileReader") {
    val fields = Seq(Field("id", "long", nullable = false),
      Field("s", "string", nullable = false),
      Field("opt", "double", nullable = true))
    val rows = Seq(Seq(1L, "a", 0.5), Seq(-9L, "ümlaut", null), Seq(7L, "", 2.25))
    val bytes = AvroContainer.writeBytes(fields, rows,
      Array.tabulate[Byte](16)(i => (i * 3).toByte))
    val in = new org.apache.avro.file.SeekableByteArrayInput(bytes)
    val r = new org.apache.avro.file.DataFileReader[GenericRecord](
      in, new GenericDatumReader[GenericRecord]())
    val got = new scala.collection.mutable.ArrayBuffer[(Long, String, Any)]
    while (r.hasNext) {
      val rec = r.next()
      got += ((rec.get("id").asInstanceOf[Long], rec.get("s").toString, rec.get("opt")))
    }
    r.close()
    assert(got.toSeq == Seq((1L, "a", 0.5), (-9L, "ümlaut", null), (7L, "", 2.25)))
  }

  test("refusal: flipped sync marker, snappy CRC corruption, truncation") {
    val ok = foreign("null", 5)
    val sync = ok.clone(); sync(sync.length - 1) = (sync(sync.length - 1) ^ 0x7f).toByte
    assert(AvroContainer.parse(sync).isEmpty)
    val sn = foreign("snappy", 5)
    // corrupt the stored CRC32 (last 4 bytes before the trailing sync)
    sn(sn.length - 17) = (sn(sn.length - 17) ^ 0x55).toByte
    assert(AvroContainer.parse(sn).isEmpty)
    assert(AvroContainer.parse(java.util.Arrays.copyOf(ok, ok.length - 3)).isEmpty)
    assert(AvroContainer.parse("not avro at all".getBytes("UTF-8")).isEmpty)
  }

  test("refusal: schemas outside the flat-primitive subset") {
    val nested =
      """{"type":"record","name":"n","fields":[
        |{"name":"inner","type":{"type":"record","name":"i","fields":[
        |{"name":"x","type":"long"}]}}]}""".stripMargin
    val schema = new org.apache.avro.Schema.Parser().parse(nested)
    val out = new java.io.ByteArrayOutputStream()
    val w = new org.apache.avro.file.DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, out, Array.tabulate[Byte](16)(_.toByte))
    val inner = new GenericData.Record(schema.getField("inner").schema())
    inner.put("x", 1L)
    val rec = new GenericData.Record(schema); rec.put("inner", inner)
    w.append(rec); w.close()
    assert(AvroContainer.parse(out.toByteArray).isEmpty)
  }
}
