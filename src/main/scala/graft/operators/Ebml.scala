package graft.operators

import scala.collection.mutable

/**
 * EBML / Matroska / WebM metadata probe — the container rung for the
 * web's dominant video wrapper: a crawl pipeline must read a WebM
 * file's doctype, duration, and track layout (codec ids, dimensions,
 * sample rates) WITHOUT decoding any codec payload, both to route
 * files and to build the typed metadata columns the multimodal tables
 * carry.
 *
 * Written against the public EBML (RFC 8794) and Matroska/WebM specs:
 *  - VINT coding: the leading-zero count of the first byte gives the
 *    octet length; element IDs keep their marker bit (class A-D ids
 *    transmitted verbatim), SIZES drop it. All-ones sizes (unknown
 *    size) are refused loudly — metadata elements must be sized.
 *  - EBML header (0x1A45DFA3): DocType 0x4282, DocTypeVersion 0x4287.
 *  - Segment (0x18538067) → Info (0x1549A966): TimestampScale
 *    0x2AD7B1 (default 1_000_000 ns), Duration 0x4489 (IEEE float,
 *    4 or 8 bytes); → Tracks (0x1654AE6B) → TrackEntry (0xAE):
 *    TrackNumber 0xD7, TrackType 0x83 (1 video / 2 audio), CodecID
 *    0x86 (ASCII), Video 0xE0 {PixelWidth 0xB0, PixelHeight 0xBA},
 *    Audio 0xE1 {SamplingFrequency 0xB5 (float), Channels 0x9F}.
 *  - Unknown ELEMENTS skip by their declared size (the EBML forward-
 *    compatibility contract); truncation or malformed VINTs refuse
 *    the whole file (None).
 *
 * Scale shape: stateless per-row map over header bytes — a probe
 * never touches cluster payloads, so cost is independent of media
 * size (the property that makes it runnable over 100 TB of video).
 */
object Ebml {

  // ------------------------------------------------------------- write

  private def vintSize(v: Long): Array[Byte] = {
    // choose the shortest length whose value space holds v
    var len = 1
    while (len <= 8 && v >= (1L << (7 * len)) - 1) len += 1
    require(len <= 8, s"size $v too large for VINT")
    val out = new Array[Byte](len)
    var i = len - 1
    var rest = v
    while (i >= 0) {
      out(i) = (rest & 0xff).toByte
      rest >>>= 8
      i -= 1
    }
    out(0) = (out(0) | (0x80 >> (len - 1))).toByte
    out
  }

  private def idBytes(id: Long): Array[Byte] = {
    // IDs are transmitted verbatim; length from the high byte position
    val len = if (id <= 0xff) 1 else if (id <= 0xffff) 2
    else if (id <= 0xffffff) 3 else 4
    Array.tabulate[Byte](len)(i => ((id >>> (8 * (len - 1 - i))) & 0xff).toByte)
  }

  private def element(id: Long, body: Array[Byte]): Array[Byte] =
    idBytes(id) ++ vintSize(body.length.toLong) ++ body

  private def uintBody(v: Long): Array[Byte] = {
    var len = 1
    while (len < 8 && (v >>> (8 * len)) != 0) len += 1
    Array.tabulate[Byte](len)(i => ((v >>> (8 * (len - 1 - i))) & 0xff).toByte)
  }

  private def floatBody(v: Double): Array[Byte] = {
    val bits = java.lang.Double.doubleToLongBits(v)
    Array.tabulate[Byte](8)(i => ((bits >>> (8 * (7 - i))) & 0xff).toByte)
  }

  final case class Track(number: Int, trackType: Int, codecId: String,
                         pixelWidth: Int = 0, pixelHeight: Int = 0,
                         sampleRate: Double = 0.0, channels: Int = 0)

  final case class WebmMeta(docType: String, docTypeVersion: Int,
                            timestampScale: Long, durationTicks: Double,
                            tracks: Seq[Track])

  /** Serialize a metadata-only WebM (header + Segment{Info, Tracks}). */
  def encodeWebm(m: WebmMeta): Array[Byte] = {
    val header = element(0x1A45DFA3L,
      element(0x4286L, uintBody(1)) ++ // EBMLVersion
        element(0x42F7L, uintBody(1)) ++ // EBMLReadVersion
        element(0x42F2L, uintBody(4)) ++ // EBMLMaxIDLength
        element(0x42F3L, uintBody(8)) ++ // EBMLMaxSizeLength
        element(0x4282L, m.docType.getBytes("US-ASCII")) ++
        element(0x4287L, uintBody(m.docTypeVersion.toLong)) ++
        element(0x4285L, uintBody(2)))
    val info = element(0x1549A966L,
      element(0x2AD7B1L, uintBody(m.timestampScale)) ++
        element(0x4489L, floatBody(m.durationTicks)) ++
        element(0x4D80L, "graft".getBytes("US-ASCII")) ++ // MuxingApp
        element(0x5741L, "graft".getBytes("US-ASCII"))) // WritingApp
    val tracks = element(0x1654AE6BL,
      m.tracks.map { t =>
        val base = element(0xD7L, uintBody(t.number.toLong)) ++
          element(0x83L, uintBody(t.trackType.toLong)) ++
          element(0x86L, t.codecId.getBytes("US-ASCII"))
        val media =
          if (t.trackType == 1)
            element(0xE0L, element(0xB0L, uintBody(t.pixelWidth.toLong)) ++
              element(0xBAL, uintBody(t.pixelHeight.toLong)))
          else
            element(0xE1L, element(0xB5L, floatBody(t.sampleRate)) ++
              element(0x9FL, uintBody(t.channels.toLong)))
        element(0xAEL, base ++ media)
      }.reduceOption(_ ++ _).getOrElse(Array.empty))
    header ++ element(0x18538067L, info ++ tracks)
  }

  // -------------------------------------------------------------- read

  private final class R(val data: Array[Byte], var pos: Int, val end: Int) {
    def readId(): Long = {
      require(pos < end, "id truncated")
      val first = data(pos) & 0xff
      val len = Integer.numberOfLeadingZeros(first) - 24 + 1
      require(len >= 1 && len <= 4, s"bad id lead byte $first")
      require(pos + len <= end, "id truncated")
      var v = 0L
      (0 until len).foreach(i => v = (v << 8) | (data(pos + i) & 0xff))
      pos += len
      v
    }
    def readSize(): Long = {
      require(pos < end, "size truncated")
      val first = data(pos) & 0xff
      require(first != 0, "VINT with 8+ leading zeros unsupported")
      val len = Integer.numberOfLeadingZeros(first) - 24 + 1
      require(pos + len <= end, "size truncated")
      var v = (first & (0xff >> len)).toLong
      (1 until len).foreach(i => v = (v << 8) | (data(pos + i) & 0xff))
      // all value bits set = "unknown size" — refused for metadata
      val allOnes = (1L << (7 * len)) - 1
      require(v != allOnes, "unknown-size element refused in metadata probe")
      pos += len
      v
    }
    def uint(n: Int): Long = {
      require(n >= 0 && n <= 8 && pos + n <= end, "uint truncated")
      var v = 0L
      (0 until n).foreach(i => v = (v << 8) | (data(pos + i) & 0xff))
      pos += n
      v
    }
    def float(n: Int): Double = {
      require(n == 4 || n == 8, s"EBML float must be 4 or 8 bytes, got $n")
      if (n == 4) java.lang.Float.intBitsToFloat(uint(4).toInt).toDouble
      else java.lang.Double.longBitsToDouble(uint(8))
    }
    def ascii(n: Int): String = {
      require(pos + n <= end, "string truncated")
      val s = new String(data, pos, n, "US-ASCII")
      pos += n
      s
    }
    def skip(n: Long): Unit = {
      require(n >= 0 && pos + n <= end, "skip past end")
      pos += n.toInt
    }
  }

  /** Probe a WebM/Matroska byte stream's metadata. None on ANY
    * malformed VINT, truncation, or missing mandatory element. */
  def probeWebm(data: Array[Byte]): Option[WebmMeta] =
    try {
      val r = new R(data, 0, data.length)
      // extent discipline: every child's declared end must sit inside
      // its parent, and every nested walk must consume EXACTLY its
      // element — a size lie parses misaligned otherwise, returning
      // garbage metadata instead of the documented loud None.
      def childEnd(sz: Long, parentEnd: Int, what: String): Int = {
        // Long math FIRST: a 56-bit EBML size that is a multiple of
        // 2^32 would wrap to 0 under toInt and pass the bound check
        require(sz >= 0 && sz <= parentEnd.toLong - r.pos,
          s"$what overruns its parent")
        r.pos + sz.toInt
      }
      def exact(end: Int, what: String): Unit =
        require(r.pos == end, s"$what children misaligned with its extent")
      require(r.readId() == 0x1A45DFA3L, "no EBML header")
      val hEnd = childEnd(r.readSize(), data.length, "EBML header")
      var docType = ""
      var docTypeVersion = 1
      while (r.pos < hEnd) {
        val id = r.readId(); val sz = r.readSize()
        val e = childEnd(sz, hEnd, "header child")
        id match {
          case 0x4282L => docType = r.ascii(sz.toInt)
          case 0x4287L => docTypeVersion = r.uint(sz.toInt).toInt
          case _ => r.skip(sz)
        }
        exact(e, "header child")
      }
      exact(hEnd, "EBML header")
      require(docType.nonEmpty, "missing DocType")
      require(r.readId() == 0x18538067L, "no Segment")
      val segEnd = childEnd(r.readSize(), data.length, "Segment")
      var tsScale = 1000000L
      var duration = 0.0
      val tracks = mutable.Buffer[Track]()
      while (r.pos < segEnd) {
        val id = r.readId(); val sz = r.readSize()
        val elEnd = childEnd(sz, segEnd, "segment child")
        id match {
          case 0x1549A966L => // Info
            while (r.pos < elEnd) {
              val i2 = r.readId(); val s2 = r.readSize()
              val e2 = childEnd(s2, elEnd, "Info child")
              i2 match {
                case 0x2AD7B1L => tsScale = r.uint(s2.toInt)
                case 0x4489L => duration = r.float(s2.toInt)
                case _ => r.skip(s2)
              }
              exact(e2, "Info child")
            }
            exact(elEnd, "Info")
          case 0x1654AE6BL => // Tracks
            while (r.pos < elEnd) {
              val i2 = r.readId(); val s2 = r.readSize()
              if (i2 == 0xAEL) {
                val tEnd = childEnd(s2, elEnd, "TrackEntry")
                var num = 0; var tt = 0; var codec = ""
                var pw = 0; var ph = 0; var rate = 0.0; var ch = 0
                while (r.pos < tEnd) {
                  val i3 = r.readId(); val s3 = r.readSize()
                  val e3 = childEnd(s3, tEnd, "TrackEntry child")
                  i3 match {
                    case 0xD7L => num = r.uint(s3.toInt).toInt
                    case 0x83L => tt = r.uint(s3.toInt).toInt
                    case 0x86L => codec = r.ascii(s3.toInt)
                    case 0xE0L =>
                      while (r.pos < e3) {
                        val i4 = r.readId(); val s4 = r.readSize()
                        val e4 = childEnd(s4, e3, "Video child")
                        i4 match {
                          case 0xB0L => pw = r.uint(s4.toInt).toInt
                          case 0xBAL => ph = r.uint(s4.toInt).toInt
                          case _ => r.skip(s4)
                        }
                        exact(e4, "Video child")
                      }
                    case 0xE1L =>
                      while (r.pos < e3) {
                        val i4 = r.readId(); val s4 = r.readSize()
                        val e4 = childEnd(s4, e3, "Audio child")
                        i4 match {
                          case 0xB5L => rate = r.float(s4.toInt)
                          case 0x9FL => ch = r.uint(s4.toInt).toInt
                          case _ => r.skip(s4)
                        }
                        exact(e4, "Audio child")
                      }
                    case _ => r.skip(s3)
                  }
                  exact(e3, "TrackEntry child")
                }
                exact(tEnd, "TrackEntry")
                require(codec.nonEmpty, "TrackEntry missing CodecID")
                tracks += Track(num, tt, codec, pw, ph, rate, ch)
              } else {
                val e2 = childEnd(s2, elEnd, "Tracks child")
                r.skip(s2); exact(e2, "Tracks child")
              }
            }
            exact(elEnd, "Tracks")
          case _ => r.skip(sz) // Clusters, Cues, unknown — all skipped
        }
        exact(elEnd, "segment child")
      }
      exact(segEnd, "Segment")
      Some(WebmMeta(docType, docTypeVersion, tsScale, duration, tracks.toSeq))
    } catch { case _: Exception => None }
}
