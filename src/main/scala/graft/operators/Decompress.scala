package graft.operators

/**
 * Transparent payload decompression — the normalization gate at the
 * very front of a crawl pipeline: HTTP bodies and dataset drops arrive
 * gzip-wrapped, zlib-wrapped (the "deflate" content-encoding as most
 * servers actually send it), raw-DEFLATE (the same header-less stream
 * the broken minority sends), or uncompressed, and every byte
 * downstream assumes plaintext.
 *
 * Detection ladder (all public formats; every codec here ships on
 * Spark's own classpath — zstd-jni, lz4-java, snappy-java,
 * commons-compress — or in the JDK):
 *  1. RFC 1952 gzip: magic 1f 8b, CM 8 — every concatenated member
 *     decoded via [[Zlib.gzipMember]], CRC32 + ISIZE verified,
 *     trailing garbage refused.
 *  2. RFC 8878 zstd: magic 28 b5 2f fd — frame decode via zstd-jni
 *     (per-block and optional frame xxhash verified by the library).
 *  3. LZ4 frame: magic 04 22 4d 18 — lz4-java frame reader (header
 *     HC + per-block checks).
 *  4. bzip2: magic "BZh" + level digit — commons-compress (block and
 *     stream CRCs verified).
 *  5. Snappy framed: stream identifier ff 06 00 00 "sNaPpY" —
 *     snappy-java framed reader (masked CRC-32C per chunk).
 *  6. RFC 1950 zlib: CM = 8 in CMF and the (CMF·256+FLG) % 31 == 0
 *     header check — Adler-32 verified by Inflater. Unlike rungs 1-5
 *     this is a HEURISTIC, not a magic: ~1/496 of arbitrary prefixes
 *     pass it (plaintext starting "x", "x?", …), so an inflate
 *     failure falls THROUGH to rungs 7-8 instead of refusing — which
 *     also means a genuinely corrupt zlib body degrades to identity
 *     rather than None (indistinguishable from coincidental plaintext
 *     by construction).
 *  7. Raw DEFLATE: attempted when no magic matches; a stream that
 *     fails to inflate cleanly falls through. INHERENTLY heuristic:
 *     raw DEFLATE has no magic, so a plaintext payload that happens
 *     to BE a valid full-consumption deflate stream (e.g. bytes
 *     starting 01 <len LE> <~len LE> — a stored block) is
 *     indistinguishable from compressed data by construction. Callers
 *     that know the encoding out of band (an HTTP Content-Encoding
 *     header) should dispatch directly instead of sniffing.
 *  8. Identity: returned as-is (with method = "identity") — transparent
 *     means uncompressed data must survive unchanged.
 *
 * Branches with a REAL magic (1-5) REFUSE corrupt streams (None)
 * rather than falling through — a payload that declares compression
 * and fails its checksum is corruption, not plaintext. Scale shape:
 * stateless per-row map.
 */
object Decompress {

  private def magic(p: Array[Byte], bytes: Int*): Boolean =
    p.length >= bytes.length && bytes.zipWithIndex.forall { case (b, i) => (p(i) & 0xff) == b }

  private def drain(in: java.io.InputStream): Array[Byte] =
    try in.readAllBytes() finally in.close()

  /** Returns (method, plaintext); None when a DECLARED compression
    * (a recognized magic, rungs 1-6) fails its integrity check. */
  def auto(payload: Array[Byte]): Option[(String, Array[Byte])] = {
    if (payload == null) return Some(("identity", Array.empty))
    if (magic(payload, 0x1f, 0x8b)) {
      // Walk ALL concatenated members (pigz/bgzip emit several) with the
      // shared CRC32+ISIZE-verified member decode; anything left over
      // after the last trailer is trailing garbage, refused. (The JDK's
      // GZIPInputStream silently swallows trailing junk — it cannot
      // implement this contract.)
      return (try {
        val out = new java.io.ByteArrayOutputStream()
        var off = 0
        while (off < payload.length) {
          val (body, next) = Zlib.gzipMember(payload, off)
          out.write(body); off = next
        }
        Some(("gzip", out.toByteArray))
      } catch { case _: Exception => None })
    }
    if (magic(payload, 0x28, 0xb5, 0x2f, 0xfd)) {
      return (try Some(("zstd", drain(new com.github.luben.zstd.ZstdInputStream(
        new java.io.ByteArrayInputStream(payload)))))
      catch { case _: Exception => None })
    }
    if (magic(payload, 0x04, 0x22, 0x4d, 0x18)) {
      return (try Some(("lz4", drain(new net.jpountz.lz4.LZ4FrameInputStream(
        new java.io.ByteArrayInputStream(payload)))))
      catch { case _: Exception => None })
    }
    if (magic(payload, 'B', 'Z', 'h') && payload.length >= 4 &&
        payload(3) >= '1' && payload(3) <= '9') {
      return (try Some(("bzip2", drain(
        new org.apache.commons.compress.compressors.bzip2.BZip2CompressorInputStream(
          new java.io.ByteArrayInputStream(payload)))))
      catch { case _: Exception => None })
    }
    if (magic(payload, 0xff, 0x06, 0x00, 0x00, 's', 'N', 'a', 'P', 'p', 'Y')) {
      return (try Some(("snappy", drain(new org.xerial.snappy.SnappyFramedInputStream(
        new java.io.ByteArrayInputStream(payload), true))))
      catch { case _: Exception => None })
    }
    if (payload.length >= 2) {
      val cmf = payload(0) & 0xff
      val flg = payload(1) & 0xff
      if ((cmf & 0x0f) == 8 && (cmf * 256 + flg) % 31 == 0) {
        // zlib has NO real magic — this 2-byte heuristic fires on ~1/496
        // of arbitrary prefixes (e.g. plaintext starting "x"), so
        // an inflate failure falls THROUGH to the raw-deflate/identity
        // rungs below instead of refusing genuine uncompressed data.
        try return Some(("zlib", Zlib.inflateAll(payload, raw = false)))
        catch { case _: Exception => () }
      }
    }
    try Some(("deflate", Zlib.inflateAll(payload, raw = true)))
    catch { case _: Exception => Some(("identity", payload)) }
  }
}
