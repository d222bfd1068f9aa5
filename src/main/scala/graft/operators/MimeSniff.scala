package graft.operators

/**
 * Content-type sniffing from magic bytes — the dispatch step a crawl
 * pipeline runs on every binary payload BEFORE choosing a decoder
 * (Content-Type headers lie; the WHATWG MIME-sniffing standard exists
 * because of it). Covers every format this ladder decodes, each by
 * its published signature:
 *
 *   PNG  89 50 4E 47 0D 0A 1A 0A      JPEG FF D8 FF
 *   GIF  "GIF87a"/"GIF89a"            BMP  "BM"
 *   QOI  "qoif"                       TIFF "II*\0" / "MM\0*"
 *   WAV  "RIFF"....+"WAVE"            AVI  "RIFF"....+"AVI "
 *   AIFF "FORM"....+"AIFF"            AU   ".snd"
 *   FLAC "fLaC"                       MP3  ID3v2 tag or FF Ex/Fx sync
 *   Y4M  "YUV4MPEG2"                  FLIC 11 AF / 12 AF at offset 4
 *   gzip 1F 8B (WARC's carrier)       tar  "ustar" at offset 257
 *   QOI/XML/HTML text probes last (sitemaps, pages)
 *
 * Order matters: container formats that share a prefix (RIFF/WAVE vs
 * RIFF/AVI, FORM/AIFF) disambiguate on the form-type field, exactly
 * as the published signatures specify. Unknown bytes return
 * "application/octet-stream" — sniffing is total.
 *
 * Scale shape: looks at <= 262 leading bytes per row, stateless map,
 * zero shuffle.
 */
object MimeSniff {

  @inline private def at(b: Array[Byte], i: Int): Int =
    if (i < b.length) b(i) & 0xff else -1

  private def hasAscii(b: Array[Byte], off: Int, s: String): Boolean = {
    var i = 0
    while (i < s.length) {
      if (at(b, off + i) != s.charAt(i)) return false
      i += 1
    }
    true
  }

  /** Sniff a payload's type from its leading bytes (and the tar magic
    * at offset 257). Total: unknown input is octet-stream. */
  def sniff(b: Array[Byte]): String = {
    if (b == null || b.length == 0) return "application/octet-stream"
    if (at(b, 0) == 0x89 && hasAscii(b, 1, "PNG") && at(b, 4) == 0x0d &&
        at(b, 5) == 0x0a && at(b, 6) == 0x1a && at(b, 7) == 0x0a) "image/png"
    else if (at(b, 0) == 0xff && at(b, 1) == 0xd8 && at(b, 2) == 0xff) "image/jpeg"
    else if (hasAscii(b, 0, "GIF87a") || hasAscii(b, 0, "GIF89a")) "image/gif"
    else if (hasAscii(b, 0, "qoif")) "image/qoi"
    else if ((at(b, 0) == 'I' && at(b, 1) == 'I' && at(b, 2) == 42 && at(b, 3) == 0) ||
             (at(b, 0) == 'M' && at(b, 1) == 'M' && at(b, 2) == 0 && at(b, 3) == 42))
      "image/tiff"
    else if (hasAscii(b, 0, "BM")) "image/bmp"
    else if (hasAscii(b, 0, "RIFF") && hasAscii(b, 8, "WAVE")) "audio/wav"
    else if (hasAscii(b, 0, "RIFF") && hasAscii(b, 8, "AVI ")) "video/avi"
    else if (hasAscii(b, 0, "RIFF") && hasAscii(b, 8, "WEBP")) "image/webp"
    else if (hasAscii(b, 0, "FORM") && hasAscii(b, 8, "AIFF")) "audio/aiff"
    else if (hasAscii(b, 0, ".snd")) "audio/basic"
    else if (hasAscii(b, 0, "fLaC")) "audio/flac"
    else if (hasAscii(b, 0, "ID3")) "audio/mpeg"
    else if (at(b, 0) == 0xff && at(b, 1) >= 0 && (at(b, 1) & 0xe0) == 0xe0 &&
             ((at(b, 1) >> 1) & 0x03) != 0)
      "audio/mpeg" // MPEG sync, layer != reserved; at(b,1) >= 0 keeps the
                   // out-of-bounds sentinel (-1, all-ones under masks) out
    else if (hasAscii(b, 0, "YUV4MPEG2")) "video/y4m"
    // gzip's 2-byte magic at offset 0 is decisive and must be probed
    // BEFORE FLIC's offset-4 magic: a gzip MTIME field can spell
    // 0xAF11/0xAF12 at bytes 4-5 (~2/65536 of real timestamps)
    else if (at(b, 0) == 0x1f && at(b, 1) == 0x8b) "application/gzip"
    else if (at(b, 5) == 0xaf && (at(b, 4) == 0x11 || at(b, 4) == 0x12) &&
             b.length >= 12)
      "video/flic" // FLIC magic 0xAF11/0xAF12 LITTLE-endian at offset 4
    else if (at(b, 0) == 'P' && at(b, 1) == 'K' && at(b, 2) == 3 && at(b, 3) == 4)
      "application/zip" // local-file-header magic PK\x03\x04
    else if (hasAscii(b, 0, "%PDF-")) "application/pdf"
    else if (hasAscii(b, 257, "ustar")) "application/x-tar"
    else if (hasAscii(b, 0, "<?xml") || hasAscii(b, 0, "<urlset") ||
             hasAscii(b, 0, "<sitemapindex")) "application/xml"
    else "application/octet-stream"
  }
}
