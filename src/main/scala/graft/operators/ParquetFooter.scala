package graft.operators

/**
 * Native Parquet footer probe — the storage-format introspection rung:
 * a data platform must answer "how many rows, how many row groups,
 * which writer produced this file" from the FOOTER alone, without
 * scanning a byte of column data. That is exactly how engines plan
 * row-group pruning at 100 TB.
 *
 * Format (all public): `PAR1` magic at both ends; 4-byte LE footer
 * length; the footer is a `FileMetaData` struct in the THRIFT COMPACT
 * protocol (varint/zigzag field headers, short-form list headers) per
 * parquet-format's parquet.thrift — parsed here with a general
 * compact-protocol walker that skips unknown fields, so footers from
 * ANY writer (parquet-mr/Spark, pyarrow, duckdb) parse.
 *
 * Reference surface: the reference reads its tables through the
 * database's own storage (`NeuronDB/src`); footer introspection is
 * public-format work, the same stance as the WARC/ZIP/TFRecord rungs.
 *
 * Scale shape: a footer read is O(footer bytes) per FILE — the "many
 * files, one row each" layout; row data never loads.
 */
object ParquetFooter {

  /** `firstColMin`/`firstColMax`: the first column's Statistics
    * (min_value/max_value, INT32/INT64 decoded) over the row group —
    * the numbers row-group PRUNING reads instead of data pages. */
  final case class RowGroup(numRows: Long, totalByteSize: Long, nColumns: Int,
                            firstColMin: Option[Long] = None,
                            firstColMax: Option[Long] = None)
  final case class Footer(version: Int, numRows: Long, createdBy: String,
                          columnNames: Seq[String], rowGroups: Seq[RowGroup]) {
    /** file-level min/max of the first column from footer stats alone —
      * None unless EVERY row group carries stats: a group without them
      * can hold values outside the visible range, and a partial answer
      * would be a silent wrong one. */
    def firstColMin: Option[Long] = {
      val ms = rowGroups.flatMap(_.firstColMin)
      if (ms.length == rowGroups.length && ms.nonEmpty) Some(ms.min) else None
    }
    def firstColMax: Option[Long] = {
      val ms = rowGroups.flatMap(_.firstColMax)
      if (ms.length == rowGroups.length && ms.nonEmpty) Some(ms.max) else None
    }
  }

  // ------------------------- thrift compact protocol -------------------

  private final class R(val data: Array[Byte], var pos: Int) {
    def u8(): Int = { require(pos < data.length, "footer truncated"); val b = data(pos) & 0xff; pos += 1; b }
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
    def bytes(n: Int): Array[Byte] = {
      require(n >= 0 && pos + n <= data.length, "footer truncated")
      val b = java.util.Arrays.copyOfRange(data, pos, pos + n); pos += n; b
    }
  }

  private val TStop = 0; private val TBoolTrue = 1; private val TBoolFalse = 2
  private val TByte = 3; private val TI16 = 4; private val TI32 = 5
  private val TI64 = 6; private val TDouble = 7; private val TBinary = 8
  private val TList = 9; private val TSet = 10; private val TMap = 11
  private val TStruct = 12

  /** `inCollection`: a bool FIELD packs its value into the field-header
    * type nibble (zero extra bytes), but a bool ELEMENT of a list/set/
    * map occupies one byte of its own — skipping it as zero-width would
    * misalign the walker on any footer carrying a bool collection. */
  private def skip(r: R, tpe: Int, inCollection: Boolean = false): Unit = tpe match {
    case TBoolTrue | TBoolFalse => if (inCollection) { r.u8(); () }
    case TByte => r.u8()
    case TI16 | TI32 | TI64 => r.zigzag()
    case TDouble => r.bytes(8)
    case TBinary => r.bytes(r.varint().toInt)
    case TList | TSet =>
      val (n, et) = listHeader(r)
      (0 until n).foreach(_ => skip(r, et, inCollection = true))
    case TMap =>
      val sz = r.varint().toInt
      if (sz > 0) {
        val kv = r.u8()
        val kt = kv >> 4; val vt = kv & 0x0f
        (0 until sz).foreach { _ =>
          skip(r, kt, inCollection = true); skip(r, vt, inCollection = true)
        }
      }
    case TStruct =>
      var last = 0
      var cont = true
      while (cont) {
        val h = r.u8()
        if (h == TStop) cont = false
        else {
          val delta = h >> 4; val t = h & 0x0f
          last = if (delta == 0) r.zigzag().toInt else last + delta
          skip(r, t)
        }
      }
    case t => sys.error(s"unknown thrift compact type $t")
  }

  /** Test hook: bytes consumed skipping one value of `tpe` (top-level
    * field position, so bools are nibble-packed zero-width). */
  private[graft] def consumedBySkip(data: Array[Byte], tpe: Int): Int = {
    val r = new R(data, 0)
    skip(r, tpe)
    r.pos
  }

  private def listHeader(r: R): (Int, Int) = {
    val h = r.u8()
    val short = h >> 4; val et = h & 0x0f
    val n = if (short == 15) r.varint().toInt else short
    require(n >= 0 && n < (1 << 24), "absurd list size")
    (n, et)
  }

  /** Walk one struct, calling `field(id, type)` per field; the callback
    * must consume the value (or call skipField). */
  private def struct(r: R)(field: (Int, Int) => Unit): Unit = {
    var last = 0
    var cont = true
    while (cont) {
      val h = r.u8()
      if (h == TStop) cont = false
      else {
        val delta = h >> 4; val t = h & 0x0f
        last = if (delta == 0) r.zigzag().toInt else last + delta
        field(last, t)
      }
    }
  }

  // ------------------------------ FileMetaData -------------------------

  private def parseSchemaElement(r: R): (String, Int) = {
    var name = ""; var numChildren = 0
    struct(r) {
      case (4, TBinary) => name = new String(r.bytes(r.varint().toInt), "UTF-8")
      case (5, t) => numChildren = r.zigzag().toInt; require(t == TI32, "bad num_children type")
      case (_, t) => skip(r, t)
    }
    (name, numChildren)
  }

  /** Statistics: prefer the v2 min_value/max_value (fields 6/5) over
    * the deprecated min/max (2/1); bytes decode by physical type. */
  private def parseStatistics(r: R, physType: Int): (Option[Long], Option[Long]) = {
    var minB: Array[Byte] = null; var maxB: Array[Byte] = null
    var minLegacy: Array[Byte] = null; var maxLegacy: Array[Byte] = null
    struct(r) {
      case (1, TBinary) => maxLegacy = r.bytes(r.varint().toInt)
      case (2, TBinary) => minLegacy = r.bytes(r.varint().toInt)
      case (5, TBinary) => maxB = r.bytes(r.varint().toInt)
      case (6, TBinary) => minB = r.bytes(r.varint().toInt)
      case (_, t) => skip(r, t)
    }
    def decode(b: Array[Byte]): Option[Long] =
      if (b == null) None
      else physType match {
        case 1 if b.length == 4 => // INT32, little-endian, sign-extended
          Some(((b(0) & 0xffL) | ((b(1) & 0xffL) << 8) | ((b(2) & 0xffL) << 16) |
            ((b(3) & 0xffL) << 24)).toInt.toLong)
        case 2 if b.length == 8 => // INT64
          Some((0 until 8).map(i => (b(i) & 0xffL) << (8 * i)).reduce(_ | _))
        case _ => None
      }
    (decode(if (minB != null) minB else minLegacy),
      decode(if (maxB != null) maxB else maxLegacy))
  }

  /** ColumnChunk -> ColumnMetaData: physical type (1) + Statistics (12). */
  private def parseFirstChunkStats(r: R): (Option[Long], Option[Long]) = {
    var res: (Option[Long], Option[Long]) = (None, None)
    struct(r) { // ColumnChunk
      case (3, TStruct) => // ColumnMetaData
        var physType = -1
        struct(r) {
          case (1, TI32) => physType = r.zigzag().toInt
          case (12, TStruct) => res = parseStatistics(r, physType)
          case (_, t) => skip(r, t)
        }
      case (_, t) => skip(r, t)
    }
    res
  }

  private def parseRowGroup(r: R): RowGroup = {
    var numRows = 0L; var totalBytes = 0L; var nCols = 0
    var stats: (Option[Long], Option[Long]) = (None, None)
    struct(r) {
      case (1, TList) =>
        val (n, et) = listHeader(r)
        nCols = n
        if (n > 0) {
          stats = parseFirstChunkStats(r)
          (1 until n).foreach(_ => skip(r, et))
        }
      case (2, TI64) => totalBytes = r.zigzag()
      case (3, TI64) => numRows = r.zigzag()
      case (_, t) => skip(r, t)
    }
    RowGroup(numRows, totalBytes, nCols, stats._1, stats._2)
  }

  /** Row-group pruning on the first column: which groups CAN contain a
    * value in [lo, hi]? A group with no stats is never prunable (must
    * be read) — the conservative rule pruning correctness depends on. */
  def pruneRowGroups(f: Footer, lo: Long, hi: Long): Seq[RowGroup] =
    f.rowGroups.filter { g =>
      (g.firstColMin, g.firstColMax) match {
        case (Some(mn), Some(mx)) => mx >= lo && mn <= hi
        case _ => true
      }
    }

  /** Parse a complete .parquet file's footer from in-memory bytes.
    * None on any malformation (bad magic, truncated footer, thrift
    * faults). */
  def parse(file: Array[Byte]): Option[Footer] =
    try {
      require(file.length >= 12, "file too small for a parquet footer")
      def magicAt(o: Int): Boolean =
        file(o) == 'P' && file(o + 1) == 'A' && file(o + 2) == 'R' && file(o + 3) == '1'
      require(magicAt(0) && magicAt(file.length - 4), "bad PAR1 magic")
      val fl = (file(file.length - 8) & 0xff) | ((file(file.length - 7) & 0xff) << 8) |
        ((file(file.length - 6) & 0xff) << 16) | ((file(file.length - 5) & 0xff) << 24)
      val start = file.length - 8 - fl
      require(fl > 0 && start >= 4, "footer length out of range")
      Some(parseFooter(java.util.Arrays.copyOfRange(file, start, start + fl)))
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Footer-only file probe: reads the 4-byte head magic plus the
    * trailing footer — O(footer bytes) of IO regardless of file size,
    * which is the whole point of footer planning at 100 TB. */
  def parseFile(path: String): Option[Footer] =
    try {
      val raf = new java.io.RandomAccessFile(path, "r")
      try {
        val len = raf.length()
        require(len >= 12, "file too small for a parquet footer")
        val head = new Array[Byte](4); raf.readFully(head)
        require(head.sameElements("PAR1".getBytes("US-ASCII")), "bad leading magic")
        val t8 = new Array[Byte](8); raf.seek(len - 8); raf.readFully(t8)
        require(t8(4) == 'P' && t8(5) == 'A' && t8(6) == 'R' && t8(7) == '1',
          "bad trailing magic")
        val fl = (t8(0) & 0xff) | ((t8(1) & 0xff) << 8) |
          ((t8(2) & 0xff) << 16) | ((t8(3) & 0xff) << 24)
        require(fl > 0 && fl <= len - 12, "footer length out of range")
        val foot = new Array[Byte](fl)
        raf.seek(len - 8 - fl); raf.readFully(foot)
        Some(parseFooter(foot))
      } finally raf.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Parse the thrift-compact FileMetaData bytes (throwing form). */
  private def parseFooter(foot: Array[Byte]): Footer = {
    val r = new R(foot, 0)
      var version = 0; var numRows = 0L; var createdBy = ""
      var names = Seq.empty[String]
      val groups = Seq.newBuilder[RowGroup]
      struct(r) {
        case (1, TI32) => version = r.zigzag().toInt
        case (2, TList) =>
          val (n, et) = listHeader(r)
          require(et == TStruct && n >= 1, "schema must be a struct list")
          val (_, rootChildren) = parseSchemaElement(r) // root
          val all = (1 until n).map(_ => parseSchemaElement(r))
          // top-level column names: walk the flattened tree, taking
          // the root's immediate children (skipping their subtrees)
          val top = Seq.newBuilder[String]
          var i = 0; var taken = 0
          def subtree(idx: Int): Int = { // nodes consumed incl. self
            var n2 = 1; var c = all(idx)._2; var j = idx + 1
            while (c > 0) { val s = subtree(j); j += s; n2 += s; c -= 1 }
            n2
          }
          while (taken < rootChildren && i < all.length) {
            top += all(i)._1
            i += subtree(i)
            taken += 1
          }
          names = top.result()
        case (3, TI64) => numRows = r.zigzag()
        case (4, TList) =>
          val (n, et) = listHeader(r)
          require(et == TStruct, "row_groups must be structs")
          (0 until n).foreach(_ => groups += parseRowGroup(r))
        case (6, TBinary) => createdBy = new String(r.bytes(r.varint().toInt), "UTF-8")
        case (_, t) => skip(r, t)
      }
      require(numRows >= 0, "negative row count")
      Footer(version, numRows, createdBy, names, groups.result())
  }
}
