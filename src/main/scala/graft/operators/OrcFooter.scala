package graft.operators

/**
 * Native ORC tail probe — the second storage-format introspection rung
 * beside [[ParquetFooter]]: answer "how many rows, what schema, what
 * value range" from the file TAIL alone, never touching stripe data.
 * At 100 TB this is the read that decides which files a predicate can
 * skip entirely (ORC's file/stripe statistics play the same role as
 * parquet row-group stats).
 *
 * Format (all public, ORC spec §"File tail" + orc-format's
 * orc_proto.proto): the file ends with a PostScript (UNcompressed
 * protobuf) followed by one byte holding the PostScript's length. The
 * PostScript gives the compression kind and the byte lengths of the
 * Footer and Metadata sections that precede it. Footer and Metadata are
 * protobuf messages wrapped in ORC's chunked compression framing: each
 * chunk has a 3-byte little-endian header `(chunkLength << 1) |
 * isOriginal`, where isOriginal=1 marks a stored-uncompressed chunk
 * (compression NONE drops the framing entirely).
 *
 * Parsed with a general protobuf WIRE-FORMAT walker (varint tags,
 * wire types 0/1/2/5) that skips unknown fields, so tails from ANY
 * writer version parse — same stance as the thrift walker in
 * [[ParquetFooter]]. Field numbers follow orc_proto.proto:
 * PostScript{1 footerLength, 2 compression, 3 compressionBlockSize,
 * 5 metadataLength, 8000 magic}, Footer{3 stripes, 4 types,
 * 6 numberOfRows, 7 statistics}, StripeInformation{1 offset,
 * 2 indexLength, 3 dataLength, 4 footerLength, 5 numberOfRows},
 * Type{1 kind, 2 subtypes, 3 fieldNames}, ColumnStatistics
 * {1 numberOfValues, 2 intStatistics{1 minimum, 2 maximum — SINT64,
 * zigzag on the wire}}.
 *
 * Reference surface: the reference reads tables through the database's
 * own storage (`NeuronDB/src`); columnar-tail introspection is
 * public-format work, the same stance as the WARC/ZIP/parquet rungs.
 *
 * Scale shape: O(tail bytes) per FILE; stripe data never loads.
 */
object OrcFooter {

  final case class Stripe(offset: Long, indexLength: Long, dataLength: Long,
                          footerLength: Long, numRows: Long)
  /** `firstColMin`/`firstColMax`: the FILE-level IntegerStatistics of the
    * first struct field (flattened type id 1) — the numbers file pruning
    * reads instead of stripe data. None when the writer omitted them. */
  final case class Tail(compression: String, numRows: Long,
                        fieldNames: Seq[String], stripes: Seq[Stripe],
                        firstColMin: Option[Long], firstColMax: Option[Long])

  // --------------------------- protobuf wire ---------------------------

  private final class R(val data: Array[Byte], var pos: Int, val end: Int) {
    def hasMore: Boolean = pos < end
    def u8(): Int = { require(pos < end, "orc tail truncated"); val b = data(pos) & 0xff; pos += 1; b }
    def varint(): Long = {
      var shift = 0; var v = 0L
      var b = u8()
      while ((b & 0x80) != 0) {
        v |= (b & 0x7fL) << shift; shift += 7
        require(shift <= 63, "varint overflow")
        b = u8()
      }
      v | ((b & 0x7fL) << shift)
    }
    def zigzag(): Long = { val v = varint(); (v >>> 1) ^ -(v & 1) }
    def slice(n: Int): R = {
      require(n >= 0 && pos + n <= end, "orc tail truncated")
      val r = new R(data, pos, pos + n); pos += n; r
    }
    def bytes(n: Int): Array[Byte] = {
      require(n >= 0 && pos + n <= end, "orc tail truncated")
      val b = java.util.Arrays.copyOfRange(data, pos, pos + n); pos += n; b
    }
  }

  /** Skip one field of the given wire type (unknown-field tolerance). */
  private def skip(r: R, wire: Int): Unit = wire match {
    case 0 => r.varint(); ()
    case 1 => r.bytes(8); ()
    case 2 => val n = r.varint(); r.bytes(toInt(n)); ()
    case 5 => r.bytes(4); ()
    case _ => sys.error(s"unsupported protobuf wire type $wire")
  }

  private def toInt(v: Long): Int = {
    require(v >= 0 && v <= Int.MaxValue, "length out of range"); v.toInt
  }

  /** Walk a message, dispatching (fieldNumber, wireType) to `f`; `f`
    * returns false to have the walker skip the field. */
  private def walk(r: R)(f: (Int, Int, R) => Boolean): Unit =
    while (r.hasMore) {
      val tag = r.varint()
      val field = toInt(tag >>> 3); val wire = (tag & 7).toInt
      if (!f(field, wire, r)) skip(r, wire)
    }

  // --------------------------- chunk framing ---------------------------

  private val CodecNames = Map(0 -> "none", 1 -> "zlib", 2 -> "snappy",
    3 -> "lzo", 4 -> "lz4", 5 -> "zstd", 6 -> "brotli")

  /** Undo ORC's chunked compression framing over `data[off, off+len)`.
    * compression=0 (NONE) means no framing: the bytes ARE the message.
    * `blockSize` (postscript compressionBlockSize) bounds every chunk's
    * decoded form — the spec's cap, used where the codec's raw block
    * carries no plaintext length of its own (lz4). */
  private def unchunk(data: Array[Byte], off: Int, len: Int,
                      compression: Int, blockSize: Int): Array[Byte] = {
    if (compression == 0)
      return java.util.Arrays.copyOfRange(data, off, off + len)
    val out = new java.io.ByteArrayOutputStream()
    var p = off
    val end = off + len
    while (p < end) {
      require(p + 3 <= end, "orc chunk header truncated")
      val h = (data(p) & 0xff) | ((data(p + 1) & 0xff) << 8) | ((data(p + 2) & 0xff) << 16)
      val chunkLen = h >>> 1
      val original = (h & 1) == 1
      p += 3
      require(p + chunkLen <= end, "orc chunk body truncated")
      if (original) out.write(data, p, chunkLen)
      else compression match {
        case 1 => out.write(Zlib.inflate(data, p, chunkLen, raw = true)._1)
        case 2 => out.write(org.xerial.snappy.Snappy.uncompress(
          java.util.Arrays.copyOfRange(data, p, p + chunkLen)))
        case 4 =>
          // lz4 raw block carries no plaintext length; the postscript's
          // compressionBlockSize is the spec's per-chunk decoded cap.
          val in = java.util.Arrays.copyOfRange(data, p, p + chunkLen)
          out.write(net.jpountz.lz4.LZ4Factory.fastestInstance()
            .safeDecompressor().decompress(in, math.max(blockSize, 64)))
        case 5 =>
          val in = java.util.Arrays.copyOfRange(data, p, p + chunkLen)
          val n = com.github.luben.zstd.Zstd.getFrameContentSize(in)
          require(n >= 0 && n <= Int.MaxValue, "zstd chunk size unknown")
          out.write(com.github.luben.zstd.Zstd.decompress(in, n.toInt))
        case c => sys.error(s"unsupported orc compression $c")
      }
      p += chunkLen
    }
    out.toByteArray
  }

  // ------------------------------ messages -----------------------------

  private final case class PostScript(footerLength: Long, compression: Int,
                                      blockSize: Int, metadataLength: Long,
                                      magic: String)

  private def parsePostScript(r: R): PostScript = {
    var footerLength = 0L; var compression = 0; var metadataLength = 0L
    var blockSize = 256 * 1024; var magic = ""
    walk(r) {
      case (1, 0, rr) => footerLength = rr.varint(); true
      case (2, 0, rr) => compression = toInt(rr.varint()); true
      case (3, 0, rr) => blockSize = toInt(rr.varint()); true
      case (5, 0, rr) => metadataLength = rr.varint(); true
      case (8000, 2, rr) =>
        magic = new String(rr.bytes(toInt(rr.varint())), "US-ASCII"); true
      case _ => false
    }
    PostScript(footerLength, compression, blockSize, metadataLength, magic)
  }

  private def parseStripe(r: R): Stripe = {
    var off = 0L; var idx = 0L; var dat = 0L; var foot = 0L; var rows = 0L
    walk(r) {
      case (1, 0, rr) => off = rr.varint(); true
      case (2, 0, rr) => idx = rr.varint(); true
      case (3, 0, rr) => dat = rr.varint(); true
      case (4, 0, rr) => foot = rr.varint(); true
      case (5, 0, rr) => rows = rr.varint(); true
      case _ => false
    }
    Stripe(off, idx, dat, foot, rows)
  }

  /** (numberOfValues, intStats min/max) of one ColumnStatistics. */
  private def parseColStats(r: R): (Long, Option[Long], Option[Long]) = {
    var n = 0L; var mn: Option[Long] = None; var mx: Option[Long] = None
    walk(r) {
      case (1, 0, rr) => n = rr.varint(); true
      case (2, 2, rr) =>
        val sub = rr.slice(toInt(rr.varint()))
        walk(sub) {
          case (1, 0, ss) => mn = Some(ss.zigzag()); true
          case (2, 0, ss) => mx = Some(ss.zigzag()); true
          case _ => false
        }
        true
      case _ => false
    }
    (n, mn, mx)
  }

  /** Root struct's field names from Type[0] (kind 12 = STRUCT). */
  private def parseType(r: R): (Int, Seq[String]) = {
    var kind = -1; val names = Seq.newBuilder[String]
    walk(r) {
      case (1, 0, rr) => kind = toInt(rr.varint()); true
      case (3, 2, rr) =>
        names += new String(rr.bytes(toInt(rr.varint())), "UTF-8"); true
      case _ => false
    }
    (kind, names.result())
  }

  private def parseFooter(r: R, compression: Int): Tail = {
    var numRows = 0L
    val stripes = Seq.newBuilder[Stripe]
    var fieldNames: Seq[String] = Seq.empty
    var typesSeen = 0
    var statsSeen = 0
    var col1: (Long, Option[Long], Option[Long]) = (0L, None, None)
    walk(r) {
      case (3, 2, rr) => stripes += parseStripe(rr.slice(toInt(rr.varint()))); true
      case (4, 2, rr) =>
        val t = parseType(rr.slice(toInt(rr.varint())))
        if (typesSeen == 0) {
          require(t._1 == 12, s"orc root type is kind ${t._1}, want STRUCT")
          fieldNames = t._2
        }
        typesSeen += 1; true
      case (6, 0, rr) => numRows = rr.varint(); true
      case (7, 2, rr) =>
        val st = parseColStats(rr.slice(toInt(rr.varint())))
        if (statsSeen == 1) col1 = st // flattened id 1 = first struct field
        statsSeen += 1; true
      case _ => false
    }
    Tail(CodecNames.getOrElse(compression, s"codec$compression"), numRows,
      fieldNames, stripes.result(), col1._2, col1._3)
  }

  // ------------------------------ file tail ----------------------------

  /** Parse one ORC file's tail. None on anything that is not a valid ORC
    * tail (bad magic, truncation, lying lengths) — a probe must refuse,
    * not guess. */
  def parseFile(path: String): Option[Tail] = {
    val f = new java.io.RandomAccessFile(path, "r")
    try {
      val size = f.length()
      if (size < 16) return None
      // one read of the last 256 KiB covers any sane footer+postscript
      val tailLen = math.min(size, 256L * 1024).toInt
      val tail = new Array[Byte](tailLen)
      f.seek(size - tailLen); f.readFully(tail)
      val psLen = tail(tailLen - 1) & 0xff
      if (psLen == 0 || psLen + 1 > tailLen) return None
      val ps = parsePostScript(new R(tail, tailLen - 1 - psLen, tailLen - 1))
      if (ps.magic != "ORC") return None
      val need = ps.footerLength + ps.metadataLength + psLen + 1
      if (need > size || ps.footerLength + psLen + 1 > tailLen) return None
      val footOff = tailLen - 1 - psLen - toInt(ps.footerLength)
      val msg = unchunk(tail, footOff, toInt(ps.footerLength), ps.compression,
        ps.blockSize)
      Some(parseFooter(new R(msg, 0, msg.length), ps.compression))
    } catch { case _: Exception => None }
    finally f.close()
  }
}
