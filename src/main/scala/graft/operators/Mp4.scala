package graft.operators

import java.io.ByteArrayOutputStream

/**
 * ISOBMFF / MP4 container probe — the metadata rung for the most
 * common video container (ISO/IEC 14496-12): a box walk (32-bit
 * big-endian size + fourcc type, `size == 1` -> 64-bit largesize,
 * `size == 0` -> extends to end of file) that recurses into the
 * container boxes on the moov path and parses:
 *
 *  - `mvhd` (movie header, version 0/1): timescale + duration;
 *  - per `trak`: `tkhd` (track id, 16.16 fixed width/height),
 *    `mdhd` (media timescale/duration, packed 5-bit ISO-639 language),
 *    `hdlr` (handler fourcc: vide/soun/...), and the first `stsd`
 *    sample entry's codec fourcc, plus visual width/height or audio
 *    channelcount/16.16 samplerate from the fixed sample-entry
 *    layouts (14496-12 §8.5.2, §12.1.3, §12.2.3).
 *
 * Unknown boxes are skipped by size (footers from ANY muxer walk);
 * every declared extent is bounds-checked against its parent, and a
 * truncated or overlapping box refuses the whole parse (None) rather
 * than guessing.
 *
 * The encoder emits the minimal spec-legal layout (ftyp + moov + an
 * empty mdat) for round-trip fixtures; there is no independent MP4
 * producer in this sandbox (the JDK has none), so the evidence is
 * golden byte pins at published offsets plus structural probes —
 * recorded in COVERAGE.md's codec-evidence table.
 *
 * Reference surface: the reference's multimodal ingest treats video
 * as opaque bytes + metadata (`NeuronDB/src/ml/ml_multimodal.c`); the
 * container walk is public-spec work, re-expressed here.
 */
object Mp4 {

  final case class Track(trackId: Long, handler: String, codec: String,
                         width: Int, height: Int, channels: Int,
                         sampleRate: Int, mediaTimescale: Long,
                         mediaDuration: Long, language: String)

  final case class Movie(timescale: Long, duration: Long,
                         durationMs: Long, tracks: Seq[Track])

  // ------------------------------------------------------------------
  // byte helpers (big-endian, the ISOBMFF convention)
  // ------------------------------------------------------------------

  private def u16(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)

  private def u32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)

  private def u64(b: Array[Byte], o: Int): Long =
    (u32(b, o) << 32) | u32(b, o + 4)

  private def fourcc(b: Array[Byte], o: Int): String =
    new String(b, o, 4, "ISO-8859-1")

  /** One box header: (type, payloadStart, boxEnd). Returns None when
    * the declared extent does not fit [off, lim). */
  private def boxAt(b: Array[Byte], off: Int, lim: Int): Option[(String, Int, Int)] = {
    if (off + 8 > lim) return None
    val size32 = u32(b, off)
    val typ = fourcc(b, off + 4)
    val (payload, end) =
      if (size32 == 1L) {
        if (off + 16 > lim) return None
        val sz = u64(b, off + 8)
        if (sz < 16 || off + sz > lim) return None
        (off + 16, off + sz.toInt)
      } else if (size32 == 0L) (off + 8, lim) // extends to end of enclosure
      else {
        if (size32 < 8 || off + size32 > lim) return None
        (off + 8, off + size32.toInt)
      }
    Some((typ, payload, end))
  }

  /** Walk the children of [off, lim), invoking f per box; refuses the
    * whole walk on any malformed extent. */
  private def walk(b: Array[Byte], off: Int, lim: Int)(
      f: (String, Int, Int) => Boolean): Boolean = {
    var p = off
    while (p < lim) {
      boxAt(b, p, lim) match {
        case None => return false
        case Some((typ, payload, end)) =>
          if (!f(typ, payload, end)) return false
          p = end
      }
    }
    true
  }

  // ------------------------------------------------------------------
  // probe
  // ------------------------------------------------------------------

  /** ISO-639-2/T language from mdhd's packed 5-bit triple. */
  private def lang(packed: Int): String = {
    val a = ((packed >> 10) & 0x1f) + 0x60
    val b = ((packed >> 5) & 0x1f) + 0x60
    val c = (packed & 0x1f) + 0x60
    new String(Array(a.toChar, b.toChar, c.toChar))
  }

  def probe(bytes: Array[Byte]): Option[Movie] = {
    if (bytes.length < 8 || fourcc(bytes, 4) != "ftyp") return None
    var mvhd: Option[(Long, Long)] = None
    val tracks = Seq.newBuilder[Track]
    var ok = walk(bytes, 0, bytes.length) { (typ, p, e) =>
      typ match {
        case "moov" =>
          walk(bytes, p, e) { (t2, p2, e2) =>
            t2 match {
              case "mvhd" =>
                if (e2 - p2 < 20) false // shortest legal v0 prefix
                else {
                  val v = bytes(p2) & 0xff
                  if (v == 1 && e2 - p2 < 32) false
                  else {
                    mvhd = Some(
                      if (v == 1) (u32(bytes, p2 + 20), u64(bytes, p2 + 24))
                      else (u32(bytes, p2 + 12), u32(bytes, p2 + 16)))
                    true
                  }
                }
              case "trak" => parseTrak(bytes, p2, e2).exists { t =>
                tracks += t; true
              }
              case _ => true // udta, iods, free, ...
            }
          }
        case _ => true // ftyp, mdat, free, skip, ...
      }
    }
    ok &&= mvhd.isDefined
    mvhd.filter(_ => ok).map { case (ts, dur) =>
      // round-half-up ms conversion, exact in Long arithmetic
      val ms = if (ts > 0) (dur * 1000L + ts / 2) / ts else 0L
      Movie(ts, dur, ms, tracks.result())
    }
  }

  private def parseTrak(b: Array[Byte], off: Int, lim: Int): Option[Track] = {
    var trackId = 0L
    var w = 0; var h = 0
    var handler = ""; var codec = ""
    var ch = 0; var sr = 0
    var mts = 0L; var mdur = 0L; var lg = ""
    // every fixed-layout read is bounds-checked against the box payload
    // first — an extent-valid but too-short box refuses (None), never
    // reads the neighboring box's bytes
    var ok = walk(b, off, lim) { (typ, p, e) =>
      typ match {
        case "tkhd" =>
          // v0 payload is 80 bytes, v1 is 92 (14496-12 §8.3.2)
          if (e - p < 80) false
          else {
            val v = b(p) & 0xff
            if (v == 1 && e - p < 92) false
            else {
              trackId = if (v == 1) u32(b, p + 20) else u32(b, p + 12)
              w = u16(b, e - 8); h = u16(b, e - 4) // 16.16 integer parts
              true
            }
          }
        case "mdia" =>
          // child order is unconstrained by the spec: resolve mdhd and
          // hdlr in a FIRST pass so stsd parsing never depends on hdlr
          // preceding minf
          val headersOk = walk(b, p, e) { (t2, p2, e2) =>
            t2 match {
              case "mdhd" =>
                if (e2 - p2 < 24) false
                else {
                  val v = b(p2) & 0xff
                  if (v == 1 && e2 - p2 < 36) false
                  else {
                    if (v == 1) { mts = u32(b, p2 + 20); mdur = u64(b, p2 + 24) }
                    else { mts = u32(b, p2 + 12); mdur = u32(b, p2 + 16) }
                    lg = lang(u16(b, p2 + (if (v == 1) 32 else 20)))
                    true
                  }
                }
              case "hdlr" =>
                if (e2 - p2 < 12) false
                else { handler = fourcc(b, p2 + 8); true }
              case _ => true
            }
          }
          headersOk && walk(b, p, e) { (t2, p2, e2) =>
            if (t2 == "minf") walk(b, p2, e2) { (t3, p3, e3) =>
              if (t3 == "stbl") walk(b, p3, e3) { (t4, p4, e4) =>
                if (t4 == "stsd") {
                  if (e4 - p4 < 8 || u32(b, p4 + 4) < 1) false
                  else boxAt(b, p4 + 8, e4).exists { case (cc, p5, e5) =>
                    codec = cc
                    // sample-entry fixed layouts (after the 6-byte
                    // reserved + 2-byte data_reference_index)
                    if (handler == "vide") {
                      if (e5 - p5 < 8 + 20) false
                      else { w = u16(b, p5 + 8 + 16); h = u16(b, p5 + 8 + 18); true }
                    } else if (handler == "soun") {
                      if (e5 - p5 < 8 + 20) false
                      else {
                        ch = u16(b, p5 + 8 + 8)
                        sr = u16(b, p5 + 8 + 16) // 16.16 integer part
                        true
                      }
                    } else true
                  }
                } else true
              }
              else true
            }
            else true
          }
        case _ => true
      }
    }
    if (ok && handler.nonEmpty)
      Some(Track(trackId, handler, codec, w, h, ch, sr, mts, mdur, lg))
    else None
  }

  // ------------------------------------------------------------------
  // encoder (fixture producer)
  // ------------------------------------------------------------------

  private def be16(v: Int): Array[Byte] =
    Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def be32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def be64(v: Long): Array[Byte] = be32(v >>> 32) ++ be32(v)

  private def box(typ: String, payload: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(be32(payload.length + 8L))
    out.write(typ.getBytes("ISO-8859-1"))
    out.write(payload)
    out.toByteArray
  }

  /** 'und' packed as 5-bit triple. */
  private def packLang(s: String): Int =
    ((s(0) - 0x60) << 10) | ((s(1) - 0x60) << 5) | (s(2) - 0x60)

  final case class TrackSpec(handler: String, codec: String,
                             width: Int = 0, height: Int = 0,
                             channels: Int = 0, sampleRate: Int = 0,
                             language: String = "und")

  /** Minimal spec-legal MP4: ftyp + moov(mvhd + trak*) + empty mdat.
    * `v1` emits version-1 (64-bit) mvhd/mdhd headers. */
  def encode(timescale: Long, duration: Long, tracks: Seq[TrackSpec],
             v1: Boolean = false): Array[Byte] = {
    val ftyp = box("ftyp",
      "isom".getBytes("ISO-8859-1") ++ be32(512L) ++
        "isomiso2mp41".getBytes("ISO-8859-1"))
    val mvhd = {
      val o = new ByteArrayOutputStream()
      o.write(if (v1) Array[Byte](1, 0, 0, 0) else Array[Byte](0, 0, 0, 0))
      if (v1) { o.write(be64(0)); o.write(be64(0)) } // creation/modification
      else { o.write(be32(0)); o.write(be32(0)) }
      o.write(be32(timescale))
      if (v1) o.write(be64(duration)) else o.write(be32(duration))
      o.write(be32(0x00010000L)) // rate 1.0
      o.write(be16(0x0100)) // volume 1.0
      o.write(new Array[Byte](2 + 8)) // reserved
      // identity matrix
      o.write(be32(0x00010000L)); o.write(be32(0)); o.write(be32(0))
      o.write(be32(0)); o.write(be32(0x00010000L)); o.write(be32(0))
      o.write(be32(0)); o.write(be32(0)); o.write(be32(0x40000000L))
      o.write(new Array[Byte](24)) // pre_defined
      o.write(be32(tracks.length + 1L)) // next_track_ID
      box("mvhd", o.toByteArray)
    }
    val traks = tracks.zipWithIndex.map { case (t, i) =>
      val tkhd = {
        val o = new ByteArrayOutputStream()
        o.write(Array[Byte](0, 0, 0, 7)) // v0, enabled|in_movie|in_preview
        o.write(be32(0)); o.write(be32(0)) // creation/modification
        o.write(be32(i + 1L)) // track_ID
        o.write(be32(0)) // reserved
        o.write(be32(duration))
        o.write(new Array[Byte](8)) // reserved
        o.write(be16(0)); o.write(be16(0)) // layer, alternate_group
        o.write(be16(if (t.handler == "soun") 0x0100 else 0)) // volume
        o.write(be16(0)) // reserved
        o.write(be32(0x00010000L)); o.write(be32(0)); o.write(be32(0))
        o.write(be32(0)); o.write(be32(0x00010000L)); o.write(be32(0))
        o.write(be32(0)); o.write(be32(0)); o.write(be32(0x40000000L))
        o.write(be16(t.width)); o.write(be16(0)) // 16.16 width
        o.write(be16(t.height)); o.write(be16(0)) // 16.16 height
        box("tkhd", o.toByteArray)
      }
      val mdhd = {
        val o = new ByteArrayOutputStream()
        o.write(if (v1) Array[Byte](1, 0, 0, 0) else Array[Byte](0, 0, 0, 0))
        if (v1) { o.write(be64(0)); o.write(be64(0)) }
        else { o.write(be32(0)); o.write(be32(0)) }
        o.write(be32(timescale))
        if (v1) o.write(be64(duration)) else o.write(be32(duration))
        o.write(be16(packLang(t.language)))
        o.write(be16(0)) // pre_defined
        box("mdhd", o.toByteArray)
      }
      val hdlr = box("hdlr",
        be32(0) ++ be32(0) ++ t.handler.getBytes("ISO-8859-1") ++
          new Array[Byte](12) ++ Array(0.toByte)) // null-terminated name
      val entry = {
        val o = new ByteArrayOutputStream()
        o.write(new Array[Byte](6)) // reserved
        o.write(be16(1)) // data_reference_index
        if (t.handler == "vide") {
          o.write(new Array[Byte](16)) // pre_defined/reserved
          o.write(be16(t.width)); o.write(be16(t.height))
          o.write(be32(0x00480000L)); o.write(be32(0x00480000L)) // 72 dpi
          o.write(be32(0)); o.write(be16(1)) // reserved, frame_count
          o.write(new Array[Byte](32)) // compressorname
          o.write(be16(0x0018)); o.write(be16(0xffff)) // depth, pre_defined
        } else {
          o.write(new Array[Byte](8)) // reserved
          o.write(be16(t.channels)); o.write(be16(16)) // samplesize
          o.write(be32(0)) // pre_defined/reserved
          o.write(be16(t.sampleRate)); o.write(be16(0)) // 16.16 rate
        }
        box(t.codec, o.toByteArray)
      }
      val stsd = box("stsd", be32(0) ++ be32(1) ++ entry)
      val stbl = box("stbl", stsd)
      val minf = box("minf", stbl)
      val mdia = box("mdia", mdhd ++ hdlr ++ minf)
      box("trak", tkhd ++ mdia)
    }
    val moov = box("moov", mvhd ++ traks.flatten.toArray)
    val mdat = box("mdat", Array.emptyByteArray)
    ftyp ++ moov ++ mdat
  }
}
