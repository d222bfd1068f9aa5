package graft.operators

/**
 * EXIF metadata codec — the metadata rung of the multimodal ladder and
 * the PII-IN-METADATA operator a crawl curation pipeline actually needs:
 * scraped photos carry GPS coordinates in their EXIF block, and a
 * training-data pipeline must be able to (a) EXTRACT camera/geo metadata
 * as typed columns and (b) SCRUB the geo IFD without re-encoding pixels.
 *
 * Reference surface: the reference's multimodal ingest
 * (`NeuronDB/src/ml/ml_multimodal.c`) treats images as opaque payloads
 * with typed metadata alongside; EXIF itself is public-spec work
 * (CIPA DC-008 / TIFF 6.0) the reference never implements.
 *
 * Spec-true structure implemented here:
 *  - JPEG marker walk: SOI, then segments `FF mm len(2, big-endian,
 *    inclusive)`; APP1 (0xFFE1) with the `Exif\0\0` preamble carries a
 *    complete TIFF file: 8-byte header (II/MM byte order, magic 42,
 *    first-IFD offset), 12-byte IFD entries (tag, type, count,
 *    value-or-offset — values ≤ 4 bytes are INLINE, larger live at an
 *    offset), next-IFD pointer.
 *  - Types: all 12 TIFF 6.0 types. The unsigned five (BYTE, ASCII,
 *    SHORT, LONG, RATIONAL) and UNDEFINED decode numerically/as
 *    bytes; the signed/float six (SBYTE, SSHORT, SLONG, SRATIONAL,
 *    FLOAT, DOUBLE — ShutterSpeedValue on a real camera is SRATIONAL)
 *    round-trip as raw bytes. Unrecognized type codes are SKIPPED,
 *    the reader behavior TIFF 6.0 prescribes. Both byte orders parse;
 *    the encoder emits either. Fill bytes (0xFF) before markers and
 *    length-less TEM/RSTn markers are handled in the segment walk.
 *  - IFD0 links the Exif sub-IFD (tag 0x8769) and GPS IFD (0x8825);
 *    GPS latitude/longitude are 3 RATIONALs (deg, min, sec) plus an
 *    ASCII ref (N/S/E/W) — the exact shape `scrubGps` must remove.
 *    IFD0's next-IFD pointer is FOLLOWED: IFD1 (the thumbnail IFD)
 *    and its embedded JPEGInterchangeFormat bitstream survive the
 *    scrub re-layout with the pointer tag re-aimed.
 *  - `scrubGps` re-LAYOUTS the TIFF block generically (every kept
 *    entry re-packed inline-or-external, sub-IFD offsets recomputed)
 *    so unknown vendor TAGS survive untouched; only the GPS pointer
 *    and its IFD vanish. Unknown field TYPES (code > 12) are the one
 *    exception: TIFF 6.0 gives them no element size, so their extent
 *    is unresolvable and the re-layout DROPS them (readers are
 *    required to skip them anyway). Pixel data is never touched — the
 *    scrub is a segment splice.
 *
 * Scale shape: stateless per-row map over payload blobs — no shuffle;
 * at 100 TB this is a scan-stage rewrite, the same "many blobs, one
 * row each" layout as the archive readers.
 */
object Exif {

  /** One IFD entry, endian-normalized: numeric types carry `nums`
    * (RATIONAL flattened as num,den pairs); BYTE/ASCII/UNDEFINED carry
    * `bytes`. */
  final case class Entry(tag: Int, typ: Int, count: Int,
                         nums: Vector[Long], bytes: Array[Byte])

  /** `ifd1`/`thumb`: the thumbnail IFD linked from IFD0's next-IFD
    * pointer and its embedded JPEG bitstream (JPEGInterchangeFormat,
    * tags 0x0201/0x0202) — present in virtually every camera file and
    * preserved through the scrub re-layout. */
  final case class ExifData(bigEndian: Boolean, ifd0: Vector[Entry],
                            exifIfd: Vector[Entry], gpsIfd: Vector[Entry],
                            ifd1: Vector[Entry] = Vector.empty,
                            thumb: Array[Byte] = Array.empty)

  private val TagExifPtr = 0x8769
  private val TagGpsPtr = 0x8825

  /** APP1 preamble `Exif\0\0` — built from bytes so no NUL literal
    * lands in source (git would classify the file as binary). */
  private val ExifPre = Array[Byte]('E', 'x', 'i', 'f', 0, 0)

  def ascii(s: String): Entry = {
    val raw = s.getBytes("ISO-8859-1")
    val b = java.util.Arrays.copyOf(raw, raw.length + 1) // trailing NUL
    Entry(0, 2, b.length, Vector.empty, b)
  }
  def short(vs: Long*): Entry = Entry(0, 3, vs.length, vs.toVector, Array.empty)
  def long(vs: Long*): Entry = Entry(0, 4, vs.length, vs.toVector, Array.empty)
  def rational(pairs: (Long, Long)*): Entry =
    Entry(0, 5, pairs.length, pairs.flatMap(p => Seq(p._1, p._2)).toVector, Array.empty)

  /** TIFF 6.0 field-type widths, all 12 standard types: BYTE, ASCII,
    * SHORT, LONG, RATIONAL, SBYTE, UNDEFINED, SSHORT, SLONG, SRATIONAL,
    * FLOAT, DOUBLE. Real camera files routinely carry the signed
    * types (ShutterSpeedValue is SRATIONAL) — a reader that only
    * knows the unsigned five crashes on ordinary photos. */
  private def typeSize(t: Int): Int = t match {
    case 1 | 2 | 6 | 7 => 1
    case 3 | 8 => 2
    case 4 | 9 | 11 => 4
    case 5 | 10 | 12 => 8
    case t => sys.error(s"unsupported EXIF type $t")
  }

  private def knownType(t: Int): Boolean = t >= 1 && t <= 12

  private def valueByteLen(e: Entry): Int = typeSize(e.typ) * e.count

  // ---------------------------------------------------------------- encode

  private final class TiffW(bigEndian: Boolean) {
    val out = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit =
      if (bigEndian) { out.write((v >>> 8) & 0xff); out.write(v & 0xff) }
      else { out.write(v & 0xff); out.write((v >>> 8) & 0xff) }
    def u32(v: Long): Unit =
      if (bigEndian) {
        out.write(((v >>> 24) & 0xff).toInt); out.write(((v >>> 16) & 0xff).toInt)
        out.write(((v >>> 8) & 0xff).toInt); out.write((v & 0xff).toInt)
      } else {
        out.write((v & 0xff).toInt); out.write(((v >>> 8) & 0xff).toInt)
        out.write(((v >>> 16) & 0xff).toInt); out.write(((v >>> 24) & 0xff).toInt)
      }
    def raw(b: Array[Byte]): Unit = out.write(b)
    def size: Int = out.size()
  }

  private def writeValue(w: TiffW, e: Entry): Unit = e.typ match {
    case 1 | 2 | 7 => w.raw(e.bytes)
    case 3 => e.nums.foreach(v => w.u16(v.toInt))
    case 4 => e.nums.foreach(w.u32)
    case 5 => e.nums.foreach(w.u32)
    // signed/float types (SBYTE/SSHORT/SLONG/SRATIONAL/FLOAT/DOUBLE)
    // round-trip as raw bytes — the re-layout keeps the byte order, so
    // verbatim bytes are exact and no numeric interpretation is needed
    case 6 | 8 | 9 | 10 | 11 | 12 => w.raw(e.bytes)
  }

  /** Serialize one IFD at `offset` (entries sorted by tag as the spec
    * requires; external value areas follow the IFD). Returns the bytes
    * and the next free offset. `patch` maps tag → value for pointer
    * tags whose target offsets are only known later. */
  private def writeIfd(bigEndian: Boolean, entries: Seq[Entry],
                       offset: Int, nextIfd: Long = 0L): (Array[Byte], Int) = {
    val sorted = entries.sortBy(_.tag)
    val ifdLen = 2 + 12 * sorted.length + 4
    var extOff = offset + ifdLen
    val w = new TiffW(bigEndian)
    val ext = new TiffW(bigEndian)
    w.u16(sorted.length)
    sorted.foreach { e =>
      w.u16(e.tag); w.u16(e.typ); w.u32(e.count.toLong)
      val len = valueByteLen(e)
      if (len <= 4) {
        val before = w.size
        writeValue(w, e)
        var pad = 4 - (w.size - before)
        while (pad > 0) { w.out.write(0); pad -= 1 }
      } else {
        w.u32(extOff.toLong)
        val b0 = ext.size
        writeValue(ext, e)
        extOff += ext.size - b0
      }
    }
    w.u32(nextIfd)
    w.raw(ext.out.toByteArray)
    (w.out.toByteArray, extOff)
  }

  /** Serialize a full TIFF block (header + IFD0 [+ Exif IFD [+ GPS
    * IFD]]) with pointer tags materialized. */
  def encodeTiffBlock(d: ExifData): Array[Byte] = {
    // Layout: header(8) | IFD0+ext | exifIfd+ext | gpsIfd+ext.
    // Pointer values depend on IFD0's serialized size, which depends on
    // entry COUNT only (pointers are inline LONGs) — two-pass is exact.
    val ifd0Base = 8
    def withPointers(exifOff: Long, gpsOff: Long): Seq[Entry] = {
      val base = d.ifd0.filterNot(e => e.tag == TagExifPtr || e.tag == TagGpsPtr)
      val p1 = if (d.exifIfd.nonEmpty) Seq(long(exifOff).copy(tag = TagExifPtr)) else Nil
      val p2 = if (d.gpsIfd.nonEmpty) Seq(long(gpsOff).copy(tag = TagGpsPtr)) else Nil
      base ++ p1 ++ p2
    }
    val (probe, probeEnd) = writeIfd(d.bigEndian, withPointers(0, 0), ifd0Base)
    val exifOff = probeEnd
    val (exifB, exifEnd) =
      if (d.exifIfd.nonEmpty) writeIfd(d.bigEndian, d.exifIfd, exifOff)
      else (Array.empty[Byte], exifOff)
    val gpsOff = exifEnd
    val (gpsB, gpsEnd) =
      if (d.gpsIfd.nonEmpty) writeIfd(d.bigEndian, d.gpsIfd, gpsOff)
      else (Array.empty[Byte], gpsOff)
    // IFD1 (thumbnail) follows; its JPEGInterchangeFormat pointer
    // (0x0201, a LONG — always inline, so IFD1's size is count-stable)
    // is re-aimed at the blob's re-layout position.
    val ifd1Off = gpsEnd
    val (ifd1B, thumbOff) =
      if (d.ifd1.nonEmpty) {
        val (probe1, end1) = writeIfd(d.bigEndian, d.ifd1, ifd1Off)
        val patched = d.ifd1.map(e =>
          if (e.tag == 0x0201 && d.thumb.nonEmpty) e.copy(nums = Vector(end1.toLong)) else e)
        val (b1, e1b) = writeIfd(d.bigEndian, patched, ifd1Off)
        require(b1.length == probe1.length && e1b == end1, "IFD1 layout instability")
        (b1, end1)
      } else (Array.empty[Byte], gpsEnd)
    val nextIfd = if (d.ifd1.nonEmpty) ifd1Off.toLong else 0L
    val (ifd0B, _) =
      writeIfd(d.bigEndian, withPointers(exifOff.toLong, gpsOff.toLong), ifd0Base, nextIfd)
    require(ifd0B.length == probe.length, "IFD0 layout instability")
    val w = new TiffW(d.bigEndian)
    if (d.bigEndian) { w.out.write('M'); w.out.write('M') }
    else { w.out.write('I'); w.out.write('I') }
    w.u16(42); w.u32(ifd0Base.toLong)
    w.raw(ifd0B); w.raw(exifB); w.raw(gpsB); w.raw(ifd1B)
    if (d.ifd1.nonEmpty && d.thumb.nonEmpty) {
      require(w.size - 0 == thumbOff, "thumbnail offset drift")
      w.raw(d.thumb)
    }
    w.out.toByteArray
  }

  /** Wrap a TIFF block as a JPEG APP1 segment and splice it right
    * after SOI of `jpeg`. */
  def embedExif(jpeg: Array[Byte], d: ExifData): Array[Byte] = {
    require(jpeg.length >= 2 && (jpeg(0) & 0xff) == 0xff && (jpeg(1) & 0xff) == 0xd8,
      "not a JPEG (no SOI)")
    val tiff = encodeTiffBlock(d)
    val pre = ExifPre
    val segLen = 2 + pre.length + tiff.length
    require(segLen <= 0xffff, "EXIF block too large for one APP1 segment")
    val out = new java.io.ByteArrayOutputStream()
    out.write(jpeg, 0, 2)
    out.write(0xff); out.write(0xe1)
    out.write((segLen >>> 8) & 0xff); out.write(segLen & 0xff)
    out.write(pre); out.write(tiff)
    out.write(jpeg, 2, jpeg.length - 2)
    out.toByteArray
  }

  // ---------------------------------------------------------------- decode

  private final class TiffR(val data: Array[Byte], val bigEndian: Boolean) {
    def u16(o: Int): Int = {
      require(o + 2 <= data.length, "u16 out of range")
      if (bigEndian) ((data(o) & 0xff) << 8) | (data(o + 1) & 0xff)
      else ((data(o + 1) & 0xff) << 8) | (data(o) & 0xff)
    }
    def u32(o: Int): Long = {
      require(o + 4 <= data.length, "u32 out of range")
      if (bigEndian)
        ((data(o) & 0xffL) << 24) | ((data(o + 1) & 0xffL) << 16) |
          ((data(o + 2) & 0xffL) << 8) | (data(o + 3) & 0xffL)
      else
        ((data(o + 3) & 0xffL) << 24) | ((data(o + 2) & 0xffL) << 16) |
          ((data(o + 1) & 0xffL) << 8) | (data(o) & 0xffL)
    }
  }

  private def readIfd(r: TiffR, off: Int): Vector[Entry] = {
    val n = r.u16(off)
    (0 until n).flatMap { i =>
      val p = off + 2 + 12 * i
      val tag = r.u16(p)
      val typ = r.u16(p + 2)
      if (!knownType(typ)) None // TIFF 6.0: readers SKIP unrecognized field types
      else {
        val count = r.u32(p + 4).toInt
        require(count >= 0 && count < (1 << 20), s"absurd EXIF count $count")
        val len = typeSize(typ) * count
        val vo = if (len <= 4) p + 8 else r.u32(p + 8).toInt
        require(vo >= 0 && vo + len <= r.data.length, s"EXIF value out of range (tag $tag)")
        Some(typ match {
          case 1 | 2 | 6 | 7 | 8 | 9 | 10 | 11 | 12 =>
            Entry(tag, typ, count, Vector.empty,
              java.util.Arrays.copyOfRange(r.data, vo, vo + len))
          case 3 =>
            Entry(tag, typ, count, (0 until count).map(k => r.u16(vo + 2 * k).toLong).toVector, Array.empty)
          case 4 =>
            Entry(tag, typ, count, (0 until count).map(k => r.u32(vo + 4 * k)).toVector, Array.empty)
          case 5 =>
            Entry(tag, typ, count,
              (0 until count).flatMap(k => Seq(r.u32(vo + 8 * k), r.u32(vo + 8 * k + 4))).toVector,
              Array.empty)
        })
      }
    }.toVector
  }

  /** Parse the TIFF block of an APP1 payload (after the Exif\0\0
    * preamble). */
  def parseTiffBlock(tiff: Array[Byte]): ExifData = {
    require(tiff.length >= 8, "TIFF block truncated")
    val bigEndian = (tiff(0), tiff(1)) match {
      case ('M', 'M') => true
      case ('I', 'I') => false
      case _ => sys.error("bad TIFF byte-order mark")
    }
    val r = new TiffR(tiff, bigEndian)
    require(r.u16(2) == 42, "bad TIFF magic")
    val ifd0Off = r.u32(4).toInt
    val ifd0 = readIfd(r, ifd0Off)
    def sub(tag: Int): Vector[Entry] =
      ifd0.find(_.tag == tag) match {
        case Some(e) => readIfd(r, e.nums.head.toInt)
        case None => Vector.empty
      }
    // follow the next-IFD pointer: IFD1 carries the thumbnail IFD and
    // (usually) an embedded JPEG via JPEGInterchangeFormat(Length).
    // DEFENSIVE by design: real-world APP1 blocks are routinely
    // truncated by processing tools with IFD1 pointers left dangling —
    // a damaged thumbnail IFD must DEGRADE (dropped from the parse,
    // and hence from any re-layout) rather than fail the whole file.
    // Dropping is also the only safe re-layout for an IFD1 whose
    // pointer tags we cannot re-aim (JPEGInterchangeFormat without a
    // length, TIFF strip thumbnails): preserving them verbatim would
    // leave offsets into a layout that no longer exists.
    val rawN = r.u16(ifd0Off)
    // the slot count written by readIfd's walk is the declared count,
    // so the next-IFD pointer sits right after the declared entries
    val next = r.u32(ifd0Off + 2 + 12 * rawN).toInt
    val (ifd1, thumb) =
      try {
        if (next == 0) (Vector.empty[Entry], Array.empty[Byte])
        else {
          val es = readIfd(r, next)
          val off = es.find(_.tag == 0x0201).flatMap(_.nums.headOption)
          val len = es.find(_.tag == 0x0202).flatMap(_.nums.headOption)
          val blob = (off, len) match {
            case (Some(o), Some(l)) =>
              require(o >= 0 && l >= 0 && o + l <= tiff.length,
                "thumbnail blob out of range")
              java.util.Arrays.copyOfRange(tiff, o.toInt, (o + l).toInt)
            case _ => Array.empty[Byte]
          }
          val strips = es.exists(e => e.tag == 0x0111 || e.tag == 0x0117)
          val jif = es.exists(_.tag == 0x0201)
          // keep only when every pointer it carries can be re-aimed:
          // no TIFF strip thumbnail, and JPEGInterchangeFormat only
          // with its captured blob
          if (!strips && (!jif || blob.nonEmpty)) (es, blob)
          else (Vector.empty[Entry], Array.empty[Byte])
        }
      } catch {
        case scala.util.control.NonFatal(_) =>
          (Vector.empty[Entry], Array.empty[Byte])
      }
    ExifData(bigEndian, ifd0, sub(TagExifPtr), sub(TagGpsPtr), ifd1, thumb)
  }

  /** Walk JPEG segments; returns the APP1 Exif TIFF block if present.
    * None = a JPEG with no EXIF (not an error); malformed marker
    * structure throws. */
  def findExifSegment(jpeg: Array[Byte]): Option[(Int, Int)] = {
    require(jpeg.length >= 2 && (jpeg(0) & 0xff) == 0xff && (jpeg(1) & 0xff) == 0xd8,
      "not a JPEG (no SOI)")
    var p = 2
    val pre = ExifPre
    while (p + 2 <= jpeg.length) {
      require((jpeg(p) & 0xff) == 0xff, s"bad marker byte at $p")
      // the spec permits any number of 0xFF FILL bytes before a marker
      while (p + 2 <= jpeg.length && (jpeg(p + 1) & 0xff) == 0xff) p += 1
      require(p + 2 <= jpeg.length, "fill bytes run off the end")
      val m = jpeg(p + 1) & 0xff
      if (m == 0xd9 || m == 0xda) return None // EOI / SOS: entropy data follows
      if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) p += 2 // TEM/RSTn: no length field
      else {
        require(p + 4 <= jpeg.length, "marker length truncated")
        val len = ((jpeg(p + 2) & 0xff) << 8) | (jpeg(p + 3) & 0xff)
        require(len >= 2 && p + 2 + len <= jpeg.length, s"segment overruns at $p")
        if (m == 0xe1 && len >= 2 + pre.length &&
          (0 until pre.length).forall(i => jpeg(p + 4 + i) == pre(i)))
          return Some((p, len))
        p += 2 + len
      }
    }
    None
  }

  def parseExif(jpeg: Array[Byte]): Option[ExifData] =
    findExifSegment(jpeg).map { case (p, len) =>
      parseTiffBlock(java.util.Arrays.copyOfRange(jpeg, p + 10, p + 2 + len))
    }

  /** Remove the GPS IFD (and its IFD0 pointer) from a JPEG's EXIF
    * segment, preserving every other tag — including unknown vendor
    * tags — via a generic re-layout. Entries with an unrecognized
    * field TYPE (> 12) do NOT survive: their size is undefined by
    * TIFF 6.0, so the parse skips them and the re-layout cannot carry
    * them. JPEGs without EXIF or without GPS pass through
    * unchanged. */
  def scrubGps(jpeg: Array[Byte]): Array[Byte] =
    findExifSegment(jpeg) match {
      case None => jpeg
      case Some((p, len)) =>
        val d = parseTiffBlock(java.util.Arrays.copyOfRange(jpeg, p + 10, p + 2 + len))
        if (d.gpsIfd.isEmpty && !d.ifd0.exists(_.tag == TagGpsPtr)) jpeg
        else {
          val clean = d.copy(ifd0 = d.ifd0.filterNot(_.tag == TagGpsPtr),
            gpsIfd = Vector.empty)
          val tiff = encodeTiffBlock(clean)
          val pre = ExifPre
          val segLen = 2 + pre.length + tiff.length
          val out = new java.io.ByteArrayOutputStream()
          out.write(jpeg, 0, p)
          out.write(0xff); out.write(0xe1)
          out.write((segLen >>> 8) & 0xff); out.write(segLen & 0xff)
          out.write(pre); out.write(tiff)
          out.write(jpeg, p + 2 + len, jpeg.length - (p + 2 + len))
          out.toByteArray
        }
    }

  // ------------------------------------------------------------- accessors

  def asciiValue(es: Seq[Entry], tag: Int): Option[String] =
    es.find(_.tag == tag).map { e =>
      val b = e.bytes
      val end = b.indexWhere(_ == 0) match { case -1 => b.length; case i => i }
      new String(b, 0, end, "ISO-8859-1")
    }
  def numValue(es: Seq[Entry], tag: Int): Option[Long] =
    es.find(_.tag == tag).flatMap(_.nums.headOption)
  def rationals(es: Seq[Entry], tag: Int): Option[Vector[(Long, Long)]] =
    es.find(_.tag == tag).map(_.nums.grouped(2).map(p => (p(0), p(1))).toVector)
}
