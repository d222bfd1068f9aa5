package graft.operators

/**
 * ID3 tag codec — the metadata wrapper around real-world MP3 payloads
 * (reference surface: `NeuronDB/src/ml/ml_multimodal.c` audio ingest;
 * sibling of [[Multimodal.decodeMp3Meta]]'s frame walk, which skips
 * leading junk byte-by-byte but cannot EXTRACT the tags a crawl
 * pipeline actually wants to index).
 *
 * Implements the published layouts:
 *  - ID3v2.3 (id3.org spec): 10-byte tag header `"ID3"` + version
 *    (0x03 0x00) + flags + 28-bit SYNCSAFE size (4 bytes, MSB of each
 *    clear), then frames: 4-char id + 32-bit BE size + 2 flag bytes +
 *    body; text frames (`T___`) carry one encoding byte (0x00 =
 *    ISO-8859-1 here) + the text.
 *  - ID3v1: the fixed 128-byte TRAILER `"TAG"` + title(30) artist(30)
 *    album(30) year(4) comment(30) genre(1), NUL-padded fields.
 *
 * [[mp3TagMeta]] composes the real-world read path: skip the v2 tag by
 * its declared size, walk the MPEG frames ([[Multimodal.decodeMp3Meta]]
 * on the slice), and read the v1 trailer if present — the exact pass an
 * audio indexer runs over crawled .mp3 blobs.
 *
 * Scale shape: stateless per-row map like every decode here.
 */
object Id3 {

  /** 28-bit syncsafe encode (4 bytes, 7 bits each, MSBs clear). */
  def syncsafe(n: Int): Array[Byte] = {
    require(n >= 0 && n < (1 << 28), s"syncsafe range: $n")
    Array(((n >> 21) & 0x7f).toByte, ((n >> 14) & 0x7f).toByte,
      ((n >> 7) & 0x7f).toByte, (n & 0x7f).toByte)
  }

  def unSyncsafe(b: Array[Byte], off: Int): Int =
    ((b(off) & 0x7f) << 21) | ((b(off + 1) & 0x7f) << 14) |
      ((b(off + 2) & 0x7f) << 7) | (b(off + 3) & 0x7f)

  /** Encode an ID3v2.3 tag with ISO-8859-1 TEXT frames (id -> value).
    * Frame ids must be 4 ASCII chars (e.g. TIT2, TPE1, TALB, TYER). */
  def encodeId3v2(frames: Seq[(String, String)]): Array[Byte] = {
    val body = new java.io.ByteArrayOutputStream()
    frames.foreach { case (id, text) =>
      require(id.length == 4 && id.forall(c => c < 128), s"frame id $id")
      val tb = text.getBytes("ISO-8859-1")
      body.write(id.getBytes("US-ASCII"))
      val sz = tb.length + 1 // encoding byte
      body.write(Array[Byte](((sz >> 24) & 0xff).toByte, ((sz >> 16) & 0xff).toByte,
        ((sz >> 8) & 0xff).toByte, (sz & 0xff).toByte))
      body.write(Array[Byte](0, 0)) // frame flags
      body.write(0) // encoding: ISO-8859-1
      body.write(tb)
    }
    val b = body.toByteArray
    val out = new java.io.ByteArrayOutputStream()
    out.write("ID3".getBytes("US-ASCII"))
    out.write(Array[Byte](3, 0)) // v2.3.0
    out.write(0) // flags
    out.write(syncsafe(b.length))
    out.write(b)
    out.toByteArray
  }

  /** Encode the fixed 128-byte ID3v1 trailer. Fields truncate/NUL-pad
    * to their spec widths. */
  def encodeId3v1(title: String, artist: String, album: String,
                  year: String, comment: String, genre: Int): Array[Byte] = {
    require(genre >= 0 && genre <= 255, s"genre $genre")
    val out = new Array[Byte](128)
    def put(s: String, off: Int, len: Int): Unit = {
      val b = s.getBytes("ISO-8859-1")
      var i = 0
      while (i < len && i < b.length) { out(off + i) = b(i); i += 1 }
    }
    put("TAG", 0, 3)
    put(title, 3, 30); put(artist, 33, 30); put(album, 63, 30)
    put(year, 93, 4); put(comment, 97, 30)
    out(127) = genre.toByte
    out
  }

  /** Parse an ID3v2.2/3/4 tag at offset 0: returns (majorVersion,
    * text frames id -> value, total tag length incl. header). Only
    * v2.3-layout frames are walked (4+4+2); v2.4 shares it with
    * syncsafe frame sizes — both handled; v2.2 reports no frames.
    * The header flag byte is honored: an UNSYNCHRONISED tag body
    * (flag 0x80) is de-unsynchronised (each FF 00 → FF) before the
    * walk, and an EXTENDED HEADER (flag 0x40) is skipped by its
    * declared size (v2.3: 4-byte size EXCLUDING itself; v2.4:
    * syncsafe size INCLUDING itself) — real-world tags carry both,
    * and ignoring the flags silently parses zero frames. Text frame
    * bodies drop the spec-permitted trailing NUL terminator(s). */
  def parseId3v2(payload: Array[Byte]): Option[(Int, Seq[(String, String)], Int)] = {
    if (payload == null || payload.length < 10) return None
    if (!(payload(0) == 'I' && payload(1) == 'D' && payload(2) == '3')) return None
    val major = payload(3) & 0xff
    val flags = payload(5) & 0xff
    val size = unSyncsafe(payload, 6)
    val total = 10 + size
    if (total > payload.length) return None
    if (major != 3 && major != 4) return Some((major, Nil, total))
    // tag BODY, de-unsynchronised if the header says so
    val body: Array[Byte] =
      if ((flags & 0x80) != 0) {
        val out = new java.io.ByteArrayOutputStream(size)
        var i = 10
        while (i < total) {
          val b = payload(i)
          out.write(b)
          if ((b & 0xff) == 0xff && i + 1 < total && payload(i + 1) == 0) i += 2
          else i += 1
        }
        out.toByteArray
      } else java.util.Arrays.copyOfRange(payload, 10, total)
    var p = 0
    if ((flags & 0x40) != 0 && body.length >= 4) {
      val extSz =
        if (major == 4) unSyncsafe(body, 0) // v2.4: size includes itself
        else 4 + (((body(0) & 0xff) << 24) | ((body(1) & 0xff) << 16) |
          ((body(2) & 0xff) << 8) | (body(3) & 0xff)) // v2.3: excludes the 4 size bytes
      if (extSz < 4 || extSz > body.length) return Some((major, Nil, total))
      p = extSz
    }
    val frames = Seq.newBuilder[(String, String)]
    var done = false
    while (!done && p + 10 <= body.length) {
      val id = new String(body, p, 4, "US-ASCII")
      if (id(0) == 0) done = true // zero padding reached
      else {
        val sz =
          if (major == 4) unSyncsafe(body, p + 4)
          else ((body(p + 4) & 0xff) << 24) | ((body(p + 5) & 0xff) << 16) |
            ((body(p + 6) & 0xff) << 8) | (body(p + 7) & 0xff)
        if (sz < 0 || p + 10 + sz > body.length) done = true
        else {
          if (id.startsWith("T") && sz >= 1 && body(p + 10) == 0) {
            // trim the optional trailing NUL terminator(s) real
            // encoders write after the text
            var end = p + 10 + sz
            while (end > p + 11 && body(end - 1) == 0) end -= 1
            frames += ((id, new String(body, p + 11, end - (p + 11), "ISO-8859-1")))
          }
          p += 10 + sz
        }
      }
    }
    Some((major, frames.result(), total))
  }

  /** Parse an ID3v1 trailer from the LAST 128 bytes; NUL-trimmed. */
  def parseId3v1(payload: Array[Byte]): Option[(String, String, String, String, Int)] = {
    if (payload == null || payload.length < 128) return None
    val off = payload.length - 128
    if (!(payload(off) == 'T' && payload(off + 1) == 'A' && payload(off + 2) == 'G'))
      return None
    def str(o: Int, len: Int): String = {
      var end = 0
      while (end < len && payload(off + o + end) != 0) end += 1
      new String(payload, off + o, end, "ISO-8859-1")
    }
    Some((str(3, 30), str(33, 30), str(63, 30), str(93, 4),
      payload(off + 127) & 0xff))
  }

  final case class Mp3Tagged(v2Frames: Seq[(String, String)],
                             audio: Multimodal.Mp3Meta,
                             v1: Option[(String, String, String, String, Int)])

  /** The real-world MP3 read pass: skip the leading ID3v2 tag by its
    * declared size, frame-walk the audio in the middle, and read the
    * ID3v1 trailer if one closes the file. None if the audio region
    * holds no parseable MPEG frames. */
  def mp3TagMeta(payload: Array[Byte]): Option[Mp3Tagged] = {
    if (payload == null || payload.length < 4) return None
    val v2 = parseId3v2(payload)
    val audioStart = v2.map(_._3).getOrElse(0)
    val v1 = parseId3v1(payload)
    val audioEnd = if (v1.isDefined) payload.length - 128 else payload.length
    if (audioEnd <= audioStart) return None
    val audio = java.util.Arrays.copyOfRange(payload, audioStart, audioEnd)
    Multimodal.decodeMp3Meta(audio).map { m =>
      Mp3Tagged(v2.map(_._2).getOrElse(Nil), m, v1)
    }
  }
}
