package graft

import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis
import graft.operators.{Dedup, Multimodal}

class DedupTextSpec extends SparkSpecBase {
  import spark.implicits._

  test("exact dedup keeps smallest id per group") {
    val df = Seq((1L, "aaa"), (2L, "bbb"), (3L, "aaa"), (4L, "aaa")).toDF("id", "text")
    val groups = Dedup.exactGroups(df, "id", "text").collect()
    assert(groups.length == 1 && groups.head.getLong(1) == 3 && groups.head.getLong(2) == 1)
    val kept = Dedup.exactDedup(df, "id", "text").select("id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L))
  }

  test("minhash estimates jaccard within tolerance") {
    val a = Dedup.wordShingles("the quick brown fox jumps over the lazy dog wow", 2)
    val b = Dedup.wordShingles("the quick brown fox jumps over a lazy dog wow", 2)
    val exact = Dedup.exactJaccard(a, b)
    val est = Dedup.estimatedJaccard(
      Dedup.minhashSignature(a, 256), Dedup.minhashSignature(b, 256))
    assert(math.abs(est - exact) < 0.15, s"est $est vs exact $exact")
    // determinism
    assert(Dedup.minhashSignature(a, 64).toSeq == Dedup.minhashSignature(a, 64).toSeq)
  }

  test("incremental dedup: exact plants flagged, near plants matched, novel rows null") {
    val catalog = Seq(
      (100L, "spark shuffle partition join aggregate window sort merge scan filter"),
      (101L, "completely different vocabulary about cooking pasta and tomato sauce"),
      (102L, "spark shuffle partition join aggregate window sort merge scan filter")
    ).toDF("id", "text")
    val batch = Seq(
      (1L, "spark shuffle partition join aggregate window sort merge scan filter"), // exact dup of 100/102
      (2L, "spark shuffle partition join aggregate window sort merge scan filters"), // near dup
      (3L, "yet another unrelated document on mountain hiking trails and weather")   // novel
    ).toDF("id", "text")
    val out = Dedup.incrementalDedup(catalog, batch, "id", "text",
      numHashes = 64, bands = 16, jaccardThreshold = 0.5, shingleN = 1)
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(1), if (r.isNullAt(2)) -1L else r.getLong(2))).toMap
    assert(out(1L)._1, "verbatim text must flag exact_dup")
    assert(out(1L)._2 == 100L, "best match ties break to the smallest catalog id")
    assert(!out(2L)._1 && out(2L)._2 == 100L, "near plant matches its source")
    assert(!out(3L)._1 && out(3L)._2 == -1L, "novel doc has no match")
    assert(out.size == 3, "exactly one decision row per batch doc")
  }

  test("minhash LSH finds planted near-duplicates and skips unrelated docs") {
    val docs = Seq(
      (1L, "spark shuffle partition join aggregate window sort merge scan filter"),
      (2L, "spark shuffle partition join aggregate window sort merge scan filters"), // near-dup of 1
      (3L, "completely different vocabulary about cooking pasta and tomato sauce"),
      (4L, "yet another unrelated document on mountain hiking trails and weather")
    ).toDF("id", "text")
    val pairs = Dedup.minhashLshPairs(docs, "id", "text",
      numHashes = 64, bands = 16, jaccardThreshold = 0.5, shingleN = 1)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("simhash: identical text -> distance 0; near text -> small; pairs found") {
    val t1 = "spark shuffle partition join aggregate window sort"
    val t2 = "spark shuffle partition join aggregate window sorted"
    val t3 = "cooking pasta with tomato sauce and basil for dinner tonight"
    assert(Dedup.hammingDistance64(Dedup.simhash(t1), Dedup.simhash(t1)) == 0)
    val near = Dedup.hammingDistance64(Dedup.simhash(t1), Dedup.simhash(t2))
    val far = Dedup.hammingDistance64(Dedup.simhash(t1), Dedup.simhash(t3))
    assert(near < far, s"near=$near far=$far")
    val df = Seq((1L, t1), (2L, t1), (3L, t3)).toDF("id", "text")
    val pairs = Dedup.simhashPairs(df, "id", "text", maxHamming = 0)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("langId: script detection + stopword argmax") {
    assert(TextAnalysis.langId("the cat and the dog went to the park and it was fun") == "en")
    assert(TextAnalysis.langId("der Hund und die Katze ist im Haus und das war gut") == "de")
    assert(TextAnalysis.langId("这是一个中文句子用于测试语言检测功能") == "zh")
    assert(TextAnalysis.langId("") == "und")
    assert(TextAnalysis.langId("qwzx bnmp vrtk") == "und")
  }

  test("langId separates the CJK scripts: kana -> ja, hangul -> ko, pure han -> zh") {
    assert(TextAnalysis.langId("これは日本語のテスト文です") == "ja")   // kanji + kana mix
    assert(TextAnalysis.langId("ひらがなだけのぶんしょうです") == "ja") // pure hiragana
    assert(TextAnalysis.langId("한국어 문장입니다 언어 감지 테스트") == "ko")
    assert(TextAnalysis.langId("中文和日本語が混ざった文章テスト") == "ja") // any kana wins over han
  }

  test("qualityScore ranks clean prose above junk") {
    val clean = "the quick brown fox jumps over the lazy dog and it was a fine day in the park " * 3
    val junk = "@@@@ #### !!!! %%%% ^^^^ &&&& **** (((( ))))"
    assert(TextAnalysis.qualityScore(clean) > TextAnalysis.qualityScore(junk))
    assert(TextAnalysis.qualityScore("") == 0.0)
    assert(TextAnalysis.qualityScore(clean) > 0.7)
  }

  test("bpeTokenCount treats an astral-plane letter as one symbol, not two surrogates") {
    // U+1D483 (mathematical bold italic b) is a LETTER beyond the BMP
    val astral = new String(Character.toChars(0x1D483))
    assert(TextAnalysis.bpeTokenCount(s"a${astral}c") == 1) // one 3-cp run -> ceil(3/4)
    assert(TextAnalysis.bpeTokenCount("abc") == TextAnalysis.bpeTokenCount(s"ab$astral"))
  }

  test("token counts: whitespace and BPE-ish") {
    assert(TextAnalysis.whitespaceTokenCount("one two  three") == 3)
    assert(TextAnalysis.whitespaceTokenCount("  ") == 0)
    // "hello" -> ceil(5/4)=2, "," -> 1, "world" -> 2
    assert(TextAnalysis.bpeTokenCount("hello, world") == 5)
  }

  test("fingerprint: deterministic rolling hash, window fingerprints overlap detection") {
    val t = "a b c d e f g h i j k l"
    assert(TextAnalysis.fingerprint(t) == TextAnalysis.fingerprint(t))
    assert(TextAnalysis.fingerprint(t) != TextAnalysis.fingerprint(t + " m"))
    val w1 = TextAnalysis.windowFingerprints("one two three four five six seven eight nine", 4).toSet
    val w2 = TextAnalysis.windowFingerprints("zzz two three four five six qqq", 4).toSet
    assert((w1 & w2).nonEmpty) // shared 4-token span detected
  }

  test("dupGroups chains pairs into components; dedupByPairs keeps min id per group") {
    val docs = Seq((1L, "x"), (2L, "x"), (3L, "x"), (4L, "y"), (5L, "z"))
      .toDF("doc_id", "text")
    // chain 1-2, 2-3 (one component), isolated 4 and 5
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("a_id", "b_id")
    val comp = Dedup.dupGroups(docs, "doc_id", pairs)
      .as[(Long, Long)].collect().toMap
    assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 5L))
    val kept = Dedup.dedupByPairs(docs, "doc_id", pairs)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 4L, 5L))
  }

  test("aHash fingerprints the WHOLE image via the 8x8 grid average") {
    // two 16x16 images identical in the top-left sliver, different below
    val flat = Array.fill(256)(100)
    val split = Array.tabulate(256)(i => if (i < 64) 100 else 250)
    def hashOf(px: Array[Int]) =
      Multimodal.aHash64(Multimodal.gridAverage8x8(16, 16, px))
    assert(hashOf(flat) != hashOf(split)) // take(64) would hash these equal
    // 8x8 inputs: grid average is the identity, fixture oracle unchanged
    val px8 = Array.tabulate(64)(i => (i * 4) % 256)
    assert(Multimodal.gridAverage8x8(8, 8, px8).toSeq == px8.toSeq)
    // real decode path end-to-end on a 16x16 PNG-like raster via ImageIO
    val img = new java.awt.image.BufferedImage(16, 16,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 16; x <- 0 until 16) img.getRaster.setSample(x, y, 0, split(y * 16 + x))
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    val d = Multimodal.decodeImage(baos.toByteArray).get
    assert(d.width == 16 && Multimodal.gridAverage8x8(16, 16, d.pixels).length == 64)
  }

  test("media stubs tolerate null payloads and reject nonsense strides") {
    val media = Seq((1L, "video", Option.empty[Array[Byte]], 0, 0, 0L),
        (2L, "video", Some(Array.fill[Byte](16)(1)), 0, 0, 0L))
      .toDF("media_id", "media_type", "payload", "width", "height", "duration_ms")
    assert(Multimodal.resizeStub(media, 8).count() == 2) // null row passes as NULL
    val frames = Multimodal.frameSampleStub(media, frameBytes = 4, stride = 2)
    assert(frames.filter($"media_id" === 1L).count() == 0) // null -> no frames
    assert(frames.filter($"media_id" === 2L).count() == 2) // frames 0 and 2 of 4
    intercept[IllegalArgumentException](Multimodal.frameSampleStub(media, 4, 0))
    intercept[IllegalArgumentException](Multimodal.frameSampleStub(media, 0, 1))
    intercept[IllegalArgumentException](Multimodal.resizeStub(media, 0))
  }

  test("multimodal: media schema plumbing, stub features, frame sampling") {
    val docs = Seq((1L, "aab"), (2L, "zzzz")).toDF("id", "text")
    val media = Multimodal.asMedia(docs, "id", "text")
    assert(media.schema.fieldNames.toSeq ==
      Seq("media_id", "media_type", "payload", "width", "height", "duration_ms"))
    val feats = Multimodal.extractFeatures(media)
      .select("media_id", "features").as[(Long, Seq[Float])].collect().toMap
    assert(math.abs(feats(1L)(97) - 2f / 3) < 1e-6) // 'a' ratio
    assert(feats(2L)(122) == 1f)                    // all 'z'
    val frames = Multimodal.frameSampleStub(media.filter($"media_id" === 2), 2, 2)
    assert(frames.select("frame_index").as[Int].collect().toSeq == Seq(0)) // frames 0,1 -> stride 2 keeps 0
    val near = Multimodal.crossModalSearch(Multimodal.extractFeatures(media), "aab".getBytes, 1)
    assert(near.select("media_id").as[Long].head() == 1L)
  }

  test("mp3 meta: frame walk, garbage-prefix resync, malformed rejection") {
    val bytes = Multimodal.encodeMp3Frames(bitrateIdx = 9, srIdx = 0, nFrames = 7)
    val m = Multimodal.decodeMp3Meta(bytes).get
    assert(m.bitrateKbps == 128 && m.sampleRate == 44100)
    assert(m.frameLen == 144 * 128000 / 44100, s"got ${m.frameLen}") // 417
    assert(m.nFrames == 7 && m.durationMs == 7L * 1152 * 1000 / 44100)
    // a garbage prefix must resync to the first real frame
    val prefixed = Array[Byte](0x12, 0x34, 0x00) ++ bytes
    assert(Multimodal.decodeMp3Meta(prefixed).get.nFrames == 7)
    // free-bitrate / reserved-samplerate / non-MPEG1 headers are rejected
    assert(Multimodal.decodeMp3Meta("not audio".getBytes).isEmpty)
    val badVersion = bytes.clone; badVersion(1) = 0xF3.toByte // MPEG-2 bits
    assert(Multimodal.decodeMp3Meta(badVersion).isEmpty)
    intercept[IllegalArgumentException](Multimodal.encodeMp3Frames(0, 0, 1))
    intercept[IllegalArgumentException](Multimodal.encodeMp3Frames(9, 3, 1))
  }

  test("phash15: brightness-invariant, content-sensitive, integer basis rows sum to 0") {
    // every AC basis row of the rounded DCT table sums to exactly 0,
    // which is what makes the hash brightness-invariant in integers
    for (u <- 1 until 8)
      assert(Multimodal.DctC(u).sum == 0L, s"row $u: ${Multimodal.DctC(u).toSeq}")
    assert(Multimodal.DctC(0).forall(_ == 4096L))
    val px = Array.tabulate(64)(i => 40 + ((i * 37) % 160))
    val (h0, dc0) = Multimodal.phash15(px)
    // +25 brightness: every AC coefficient unchanged, DC moves, hash identical
    val (h1, dc1) = Multimodal.phash15(px.map(_ + 25))
    assert(h1 == h0 && dc1 == dc0 + 25L * 64L * 4096L * 4096L)
    // content change (transpose the grid) moves the hash
    val t = Array.tabulate(64)(i => px((i % 8) * 8 + i / 8))
    val (h2, _) = Multimodal.phash15(t)
    assert(h2 != h0, "transposed content must fingerprint differently")
  }

  test("multimodal: REAL PNG decode round-trips pixels exactly; aHash is the mean-threshold bits") {
    val px = Array.tabulate(64)(i => (i * 4) % 256)
    val bytes = Multimodal.encodePng8x8(px)
    // a real PNG came out (magic header), and ImageIO decodes it back losslessly
    assert((bytes(0) & 0xFF) == 0x89 && bytes(1) == 'P' && bytes(2) == 'N' && bytes(3) == 'G')
    val dec = Multimodal.decodeImage(bytes).get
    assert(dec.width == 8 && dec.height == 8)
    assert(dec.pixels.toSeq == px.toSeq)
    // aHash: bit i set iff p(i)*n > sum
    val total = px.map(_.toLong).sum
    val expected = px.zipWithIndex.foldLeft(0L) { case (h, (p, i)) =>
      if (p * 64L > total) h | (1L << i) else h
    }
    assert(Multimodal.aHash64(dec.pixels) == expected)
    // undecodable bytes -> None (the stub fallback path)
    assert(Multimodal.decodeImage("not an image".getBytes).isEmpty)
    // decodeImages surfaces dims/hash as columns, NULLs for non-images
    val df = Seq((1L, bytes), (2L, "junk".getBytes)).toDF("media_id", "payload")
    val out = Multimodal.decodeImages(df)
      .select("media_id", "img_width", "img_ahash")
      .collect().map(r => r.getLong(0) -> (Option(r.get(1)), Option(r.get(2)))).toMap
    assert(out(1L) == (Some(8), Some(expected)))
    assert(out(2L) == (None, None))
  }

  test("multimodal: REAL WAV header parse round-trips the encoded fmt/data fields") {
    val samples = Array.tabulate(300)(i => (i * 111 - 15000).toShort)
    val bytes = Multimodal.encodeWavPcm16(samples, sampleRate = 22050, channels = 2)
    assert(new String(bytes.take(4), "US-ASCII") == "RIFF")
    assert(new String(bytes.slice(8, 12), "US-ASCII") == "WAVE")
    val m = Multimodal.decodeWavMeta(bytes).get
    assert(m.audioFormat == 1 && m.channels == 2 && m.sampleRate == 22050)
    assert(m.bitsPerSample == 16 && m.dataBytes == 600)
    assert(m.frames == 150 && m.durationMs == 150L * 1000 / 22050)
    // chunk walk: an unknown odd-sized chunk BEFORE fmt/data still parses
    val extra = java.nio.ByteBuffer.allocate(bytes.length + 8 + 3 + 1)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    extra.put(bytes.take(12))                    // RIFF..WAVE
    extra.put("LIST".getBytes("US-ASCII")).putInt(3)
    extra.put(Array[Byte](1, 2, 3, 0))           // 3 bytes + pad to even
    extra.put(bytes.drop(12))                    // original fmt + data
    assert(Multimodal.decodeWavMeta(extra.array()).contains(m))
    // not-a-WAV and truncated payloads -> None, never a throw
    assert(Multimodal.decodeWavMeta("definitely not audio".getBytes).isEmpty)
    assert(Multimodal.decodeWavMeta(bytes.take(20)).isEmpty)
    assert(Multimodal.decodeWavMeta(null).isEmpty)
    // a final ODD-size chunk with no pad byte (common in the wild) must
    // still parse — end-of-buffer is end-of-stream, not corruption
    val odd = java.nio.ByteBuffer.allocate(12 + 8 + 16 + 8 + 3)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    odd.put(bytes.take(12 + 8 + 16))             // RIFF..WAVE + fmt chunk
    odd.put("data".getBytes("US-ASCII")).putInt(3)
    odd.put(Array[Byte](1, 2, 3))                // 3 bytes, NO pad
    val oddMeta = Multimodal.decodeWavMeta(odd.array())
    assert(oddMeta.exists(w => w.dataBytes == 3 && w.sampleRate == 22050))
    // DataFrame face: columns for WAVs, NULLs for junk
    val df = Seq((1L, bytes), (2L, "junk junk".getBytes)).toDF("media_id", "payload")
    val out = Multimodal.decodeAudioMeta(df)
      .select("media_id", "audio_sample_rate", "audio_frames")
      .collect().map(r => r.getLong(0) -> (Option(r.get(1)), Option(r.get(2)))).toMap
    assert(out(1L) == (Some(22050), Some(150L)))
    assert(out(2L) == (None, None))
  }

  test("multimodal: REAL PCM16 sample decode round-trips samples; waveform stats exact") {
    val samples = Array[Short](100, -200, -300, 400, 0, -1, 2, -3)
    val bytes = Multimodal.encodeWavPcm16(samples, sampleRate = 8000, channels = 2)
    val (m, xs) = Multimodal.decodeWavSamples(bytes).get
    assert(m.channels == 2 && xs.toSeq == samples.toSeq)
    // non-PCM16 narrows to None (metadata still parses): flip bits field
    val bb8 = java.nio.ByteBuffer.wrap(bytes.clone())
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb8.putShort(34, 8.toShort) // fmt bitsPerSample offset in canonical layout
    assert(Multimodal.decodeWavSamples(bb8.array()).isEmpty)
    assert(Multimodal.decodeWavMeta(bb8.array()).nonEmpty)
    // DataFrame face: per-channel zero-crossings (stride 2), exact energy
    val df = Seq((1L, bytes), (2L, "junk".getBytes)).toDF("media_id", "payload")
    val out = Multimodal.decodeAudioFeatures(df)
      .select("media_id", "audio_n_samples", "audio_peak",
        "audio_zero_crossings", "audio_energy", "audio_rms")
      .collect().map(r => r.getLong(0) -> r).toMap
    val r1 = out(1L)
    assert(r1.getInt(1) == 8 && r1.getInt(2) == 400)
    // per-channel stride-2 crossings (zero counts as non-negative):
    // ch0 = 100,-300,0,2 -> 2 flips; ch1 = -200,400,-1,-3 -> 2 flips
    val expectZc = (2 until samples.length)
      .count(i => (samples(i - 2) < 0) != (samples(i) < 0))
    assert(expectZc == 4 && r1.getLong(3) == expectZc)
    val expectEnergy = samples.map(s => s.toLong * s).sum
    assert(r1.getLong(4) == expectEnergy)
    assert(math.abs(r1.getFloat(5) -
      math.sqrt(expectEnergy.toDouble / 8).toFloat) == 0f)
    assert(out(2L).isNullAt(1) && out(2L).isNullAt(5))
  }

  test("multimodal: REAL AVI header parse round-trips the avih fields through the LIST walk") {
    val bytes = Multimodal.encodeAviHeader(
      totalFrames = 240, width = 640, height = 480, usPerFrame = 40000)
    assert(new String(bytes.take(4), "US-ASCII") == "RIFF")
    assert(new String(bytes.slice(8, 12), "US-ASCII") == "AVI ")
    val m = Multimodal.decodeAviMeta(bytes).get
    assert(m.width == 640 && m.height == 480)
    assert(m.totalFrames == 240 && m.usPerFrame == 40000)
    assert(m.durationMs == 240L * 40000 / 1000) // 9600 ms at 25 fps
    // junk / truncated / WAV payloads -> None, never a throw
    assert(Multimodal.decodeAviMeta("not a video".getBytes).isEmpty)
    assert(Multimodal.decodeAviMeta(bytes.take(16)).isEmpty)
    assert(Multimodal.decodeAviMeta(
      Multimodal.encodeWavPcm16(Array[Short](1, 2), 8000, 1)).isEmpty)
    // a container whose ONLY chunk is odd-size with NO pad byte must
    // return None without throwing (end-of-buffer is end-of-stream;
    // position(next) used to overshoot the limit and throw)
    val padless = java.nio.ByteBuffer.allocate(12 + 8 + 3)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    padless.put("RIFF".getBytes("US-ASCII")).putInt(12 + 3)
      .put("AVI ".getBytes("US-ASCII"))
      .put("JUNK".getBytes("US-ASCII")).putInt(3)
      .put(Array[Byte](7, 8, 9))
    assert(Multimodal.decodeAviMeta(padless.array()).isEmpty)
    // DataFrame face: columns for AVIs, NULLs for junk
    val df = Seq((1L, bytes), (2L, "junk".getBytes)).toDF("media_id", "payload")
    val out = Multimodal.decodeVideoMeta(df)
      .select("media_id", "video_width", "video_duration_ms")
      .collect().map(r => r.getLong(0) -> (Option(r.get(1)), Option(r.get(2)))).toMap
    assert(out(1L) == (Some(640), Some(9600L)))
    assert(out(2L) == (None, None))
  }

  test("multimodal: REAL AVI frame decode — DIB stride/row-order round-trip, MJPEG via ImageIO") {
    // width 6: stride 3*6=18 -> padded to 20, exercising the 4-byte
    // alignment branch the 8x8 fixture (stride 24, already aligned) skips
    val w = 6; val h = 4
    val f0 = Array.tabulate(w * h)(i => (i * 11) % 256)
    val f1 = Array.tabulate(w * h)(i => (255 - i * 7) % 256)
    val bytes = Multimodal.encodeAviFrames(Seq(f0, f1), w, h, usPerFrame = 40000)
    val vf = Multimodal.decodeVideoFrames(bytes).get
    assert(vf.meta.width == w && vf.meta.height == h && vf.meta.totalFrames == 2)
    assert(vf.compression == new String(Array.fill(4)(0.toChar))) // BI_RGB
    assert(vf.frames.map(_.pixels.toSeq) == Seq(f0.toSeq, f1.toSeq))
    // MJPEG: each 00dc chunk is a standalone JPEG; decode must agree with
    // a direct ImageIO decode of the same raster (lossy, so compare via
    // the independently-encoded single image, not the source pixels)
    val mj = Multimodal.encodeAviFrames(Seq(f0, f1), w, h, usPerFrame = 40000,
      mjpeg = true)
    val vmj = Multimodal.decodeVideoFrames(mj).get
    assert(vmj.compression == "MJPG" && vmj.frames.size == 2)
    assert(vmj.frames.forall(fr => fr.width == w && fr.height == h))
    // header-only AVIs (no movi) still decode with zero frames;
    // junk/truncated payloads -> None, never a throw
    val headerOnly = Multimodal.decodeVideoFrames(
      Multimodal.encodeAviHeader(240, 640, 480, 40000))
    assert(headerOnly.get.frames.isEmpty)
    assert(Multimodal.decodeVideoFrames("not a video".getBytes).isEmpty)
    assert(Multimodal.decodeVideoFrames(bytes.take(40)).isEmpty)
    assert(Multimodal.decodeVideoFrames(null).isEmpty)
    // a frame chunk whose declared size overruns the buffer is dropped,
    // not fatal
    val clipped = bytes.dropRight(10)
    val cf = Multimodal.decodeVideoFrames(clipped)
    assert(cf.isEmpty || cf.get.frames.size <= 1)
    // DataFrame face: integer features for AVIs, NULLs for junk
    val df = Seq((1L, bytes), (2L, "junk".getBytes)).toDF("media_id", "payload")
    val out = Multimodal.decodeVideoFrameFeatures(df)
      .select("media_id", "video_n_frames", "video_peak_luma",
        "video_luma_sum", "video_motion", "video_first_ahash")
      .collect().map(r => r.getLong(0) -> r).toMap
    val r1 = out(1L)
    val s0 = f0.map(_.toLong).sum; val s1 = f1.map(_.toLong).sum
    assert(r1.getInt(1) == 2)
    assert(r1.getInt(2) == math.max(f0.max, f1.max))
    assert(r1.getLong(3) == s0 + s1)
    assert(r1.getLong(4) == math.abs(s1 - s0))
    assert(r1.getLong(5) ==
      Multimodal.aHash64(Multimodal.gridAverage8x8(w, h, f0)))
    assert(out(2L).isNullAt(1) && out(2L).isNullAt(5))
  }

  test("repetitionStats counts duplicate lines and the modal 2-gram exactly") {
    import graft.functions.TextAnalysis.{repetitionStats => rs}
    // 4 non-empty lines; "same line" occurs 2x (trim catches the \t/space
    // variants), "other" once, so dup_line_count = 2 (every occurrence),
    // dup_line_chars = 2 * 9; blank-only lines are dropped
    val t = "same line\n \t\nother\n\tsame line \n"
    val a = rs(t)
    assert(a.nLines == 3 && a.dupLineCount == 2 && a.dupLineChars == 18)
    // words across ALL lines: same line other same line -> 2-grams:
    // "same line" x2, "line other", "other same" -> 4 total, top 2
    assert(a.n2grams == 4 && a.top2gramCount == 2)
    // the classic degenerate repeat: "the the the the"
    val b = rs("the the the the")
    assert(b.n2grams == 3 && b.top2gramCount == 3)
    assert(b.nLines == 1 && b.dupLineCount == 0 && b.dupLineChars == 0L)
    // empty / null / single-word contracts
    assert(rs(null) == graft.functions.TextAnalysis.RepetitionStats(0, 0, 0L, 0, 0))
    assert(rs("").nLines == 0 && rs("word").n2grams == 0)
    // non-BMP chars count as ONE codepoint in dup_line_chars
    val emoji = "a😀b\na😀b"
    assert(rs(emoji).dupLineChars == 2 * 3)
  }

  test("Pii.scrub counts and redacts emails/ipv4/phones with native regexp columns") {
    import graft.functions.TextAnalysis.Pii
    val df = Seq(
      (1L, "mail a.b+c@x-y.org and 10.20.30.40 then +4915123456789 done"),
      (2L, "no pii here, just 1234.5 and an @ sign"),
      (3L, "two mails: a@b.io b@c.de; bad ip 999.999.999.999 still matches the regex")
    ).toDF("id", "text")
    val out = df.select(col("id") +: Pii.scrub(col("text")).map { case (n, c) => c.as(n) }: _*)
      .collect().map(r => r.getLong(0) -> r).toMap
    val r1 = out(1L)
    assert(r1.getInt(1) == 1 && r1.getInt(2) == 1 && r1.getInt(3) == 1)
    assert(r1.getString(4) == "mail [EMAIL] and [IP] then [PHONE] done")
    assert(r1.getInt(5) == r1.getString(4).length)
    val r2 = out(2L)
    assert(r2.getInt(1) == 0 && r2.getInt(2) == 0 && r2.getInt(3) == 0)
    assert(r2.getString(4) == "no pii here, just 1234.5 and an @ sign")
    // the 1-3 digit octet class is a syntactic matcher, not a validator —
    // 999.999.999.999 matches by design (curation wants recall)
    assert(out(3L).getInt(1) == 2 && out(3L).getInt(2) == 1)
    // the plan is UDF-free: only native regexp expressions appear
    val plan = df.select(Pii.scrub(col("text")).map { case (n, c) => c.as(n) }: _*)
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("UDF"), s"expected native-only plan, got:\n$plan")
  }

  test("G.711 expansion matches the CCITT reference values; WAV codec branch round-trips") {
    // canonical spot values from the public G.711 tables
    assert(Multimodal.ulaw2linear(0xFF) == 0)      // +0
    assert(Multimodal.ulaw2linear(0x7F) == 0)      // -0
    assert(Multimodal.ulaw2linear(0x00) == -32124) // negative full scale
    assert(Multimodal.ulaw2linear(0x80) == 32124)  // positive full scale
    assert(Multimodal.alaw2linear(0x55) == -8)     // closest-to-zero negative
    assert(Multimodal.alaw2linear(0xD5) == 8)      // closest-to-zero positive
    assert(Multimodal.alaw2linear(0x2A) == -32256) // negative full scale
    assert(Multimodal.alaw2linear(0xAA) == 32256)  // positive full scale
    // all 256 codes stay within int16 for both laws
    for (c <- 0 until 256) {
      assert(Multimodal.ulaw2linear(c) >= -32124 && Multimodal.ulaw2linear(c) <= 32124)
      assert(Multimodal.alaw2linear(c) >= -32256 && Multimodal.alaw2linear(c) <= 32256)
    }
    // WAV round-trip through the audioFormat 7/6 decode branches
    val codes = Array.tabulate(64)(i => ((i * 37) % 256).toByte)
    for (aLaw <- Seq(false, true)) {
      val bytes = Multimodal.encodeWavG711(codes, 8000, 1, aLaw)
      val (m, xs) = Multimodal.decodeWavSamples(bytes).get
      assert(m.audioFormat == (if (aLaw) 6 else 7) && m.bitsPerSample == 8)
      assert(m.frames == 64)
      val expect = codes.map(c =>
        if (aLaw) Multimodal.alaw2linear(c & 0xFF) else Multimodal.ulaw2linear(c & 0xFF))
      assert(xs.map(_.toInt).toSeq == expect.toSeq)
    }
    // an 8-bit WAV with any OTHER format tag stays on the None path
    val bad = Multimodal.encodeWavG711(codes, 8000, 1, aLaw = false)
    bad(20) = 2 // audioFormat -> MS ADPCM
    assert(Multimodal.decodeWavSamples(bad).isEmpty)
    assert(Multimodal.decodeWavMeta(bad).nonEmpty) // metadata still parses
  }

  test("decontaminate: hashed-gram petabyte dial agrees with the string join") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "one two three four five six seven eight nine ten"),
      (3L, "alpha beta gamma delta epsilon zeta eta theta different tail"),
      (4L, "short doc")).toDF("doc_id", "text")
    val bench = Seq((9L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
      .toDF("doc_id", "text")
    def run(hash: Boolean) =
      Dedup.decontaminate(docs, bench, "doc_id", "text", n = 8, hashGrams = hash)
        .orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    val byString = run(hash = false)
    assert(byString == Seq((1L, 3L, true), (2L, 0L, false),
      (3L, 1L, true), (4L, 0L, false)))
    assert(run(hash = true) == byString)
  }

  test("dupGroups rejects non-numeric ids instead of silently emptying the corpus") {
    val docs = Seq(("u-1", "a"), ("u-2", "b")).toDF("id", "text")
    val pairs = Seq(("u-1", "u-2")).toDF("a_id", "b_id")
    intercept[IllegalArgumentException](Dedup.dupGroups(docs, "id", pairs))
  }

  test("media parsers never throw on arbitrary bytes (UDF robustness fuzz)") {
    // deterministic pseudo-random payloads, including RIFF-prefixed ones
    // that exercise the chunk walkers' bounds checks
    val rnd = new scala.util.Random(20260813L)
    val payloads = (0 until 300).map { i =>
      val n = rnd.nextInt(96)
      val b = new Array[Byte](n)
      rnd.nextBytes(b)
      if (i % 3 == 0 && n >= 12) { // plant RIFF/WAVE|AVI magics
        Array[Byte]('R', 'I', 'F', 'F').copyToArray(b, 0)
        (if (i % 6 == 0) "WAVE" else "AVI ").getBytes("US-ASCII").copyToArray(b, 8)
      }
      b
    } :+ Array.empty[Byte] :+ (null: Array[Byte])
    payloads.foreach { p =>
      Multimodal.decodeWavMeta(p)   // Option result, must not throw
      Multimodal.decodeAviMeta(p)
      Multimodal.decodeImage(p)
      Multimodal.decodeWavSamples(p)   // PCM16 + G.711 branches
      Multimodal.decodeVideoFrames(p)  // movi walk + DIB/MJPEG branches
    }
    // valid containers with corrupted interiors: truncate/flip real
    // encodes at every boundary-ish offset — walkers must narrow, not die
    val wav = Multimodal.encodeWavG711(
      Array.tabulate(32)(i => (i * 9).toByte), 8000, 1)
    val avi = Multimodal.encodeAviFrames(
      Seq(Array.tabulate(64)(_ % 256)), 8, 8, 40000)
    for (cut <- Seq(13, 20, 36, 44, wav.length - 1)) {
      Multimodal.decodeWavSamples(wav.take(cut))
      Multimodal.decodeWavMeta(wav.take(cut))
    }
    for (cut <- Seq(13, 32, 88, 160, avi.length - 1)) {
      Multimodal.decodeVideoFrames(avi.take(cut))
      Multimodal.decodeAviMeta(avi.take(cut))
    }
  }

  test("line dedup removes corpus-frequent lines, keeps order, counts honestly") {
    val docs = Seq(
      (1L, "unique alpha\nCOMMON FOOTER\nmiddle one\nSHARED AD"),
      (2L, "unique beta\nCOMMON FOOTER\nSHARED AD"),
      (3L, "COMMON FOOTER\nunique gamma\nSHARED AD"),
      (4L, "only original content here\nCOMMON FOOTER")
    ).toDF("id", "text")
    val out = Dedup.lineDedup(docs, "id", "text", minDocs = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    // COMMON FOOTER in 4 docs, SHARED AD in 3 — both boilerplate at minDocs=3
    assert(out(1L) == (("unique alpha\nmiddle one", 2L, 4L)))
    assert(out(2L) == (("unique beta", 2L, 3L)))
    assert(out(3L) == (("unique gamma", 2L, 3L)))
    assert(out(4L) == (("only original content here", 1L, 2L)))
    // at minDocs=4 SHARED AD (3 docs) survives, in original position
    val loose = Dedup.lineDedup(docs, "id", "text", minDocs = 4)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(loose(3L) == "unique gamma\nSHARED AD")
    // a doc that is ALL boilerplate cleans to the empty string
    val allBoiler = Seq((1L, "X\nY"), (2L, "X\nY"), (3L, "X\nY")).toDF("id", "text")
    val cleaned = Dedup.lineDedup(allBoiler, "id", "text", minDocs = 3)
      .collect().map(r => (r.getString(1), r.getLong(2)))
    assert(cleaned.forall(_ == (("", 2L))))
  }

  test("audio decimation keeps every k-th frame with interleave and stats") {
    // 5 stereo frames; frames 0,2,4 survive factor-2 decimation
    val xs = Array[Short](1, -1, 9, 9, -3, 3, 9, 9, 5, -5)
    val wav = Multimodal.encodeWavPcm16(xs, sampleRate = 8000, channels = 2)
    val media = Seq((1L, wav)).toDF("doc_id", "payload")
    val r = Multimodal.decodeAudioResampled(media, factor = 2).collect().head
    assert(r.getAs[Int]("audio_n_samples") == 6)       // ys = [1,-1,-3,3,5,-5]
    assert(r.getAs[Int]("audio_out_rate") == 4000)
    assert(r.getAs[Int]("audio_peak") == 5)
    assert(r.getAs[Long]("audio_zero_crossings") == 4L) // every survivor flips sign
    assert(r.getAs[Long]("audio_energy") == 70L)
    // factor=1 is the identity: same stats as the plain feature pass
    val a = Multimodal.decodeAudioResampled(media, factor = 1).collect().head
    val b = Multimodal.decodeAudioFeatures(media).collect().head
    assert(a.getAs[Int]("audio_n_samples") == b.getAs[Int]("audio_n_samples"))
    assert(a.getAs[Long]("audio_energy") == b.getAs[Long]("audio_energy"))
    assert(a.getAs[Long]("audio_zero_crossings") == b.getAs[Long]("audio_zero_crossings"))
  }

  test("hammingBandPairs: pigeonhole recall up to 3 bits, banded blocking beyond") {
    import spark.implicits._
    // base signature + variants at hamming 1, 3 (one band touched),
    // 4-spread (one bit flipped in EVERY band -> no shared band bucket),
    // and an unrelated far signature
    val s0 = 0x0123456789ABCDEFL
    val h1 = s0 ^ 1L                       // bit 0
    val h3 = s0 ^ 7L                       // bits 0-2, all in band 0
    val spread4 = s0 ^ ((1L << 0) | (1L << 16) | (1L << 32) | (1L << 48))
    val far = ~s0
    val df = Seq((1L, s0), (2L, h1), (3L, h3), (4L, spread4), (5L, far))
      .toDF("id", "sig")
    val pairs = Dedup.hammingBandPairs(df, "id", "sig", maxHamming = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // guaranteed: every pair within hamming <= 3 of s0 family shares a band
    assert(pairs.contains((1L, 2L, 1)))
    assert(pairs.contains((1L, 3L, 3)))
    assert(pairs.contains((2L, 3L, 2)))
    // documented heuristic: hamming 4 spread across all four bands is
    // invisible to the blocking even though 4 <= maxHamming
    assert(!pairs.exists(p => p._1 == 1L && p._2 == 4L))
    // far signature never pairs
    assert(!pairs.exists(p => p._2 == 5L))
  }

  test("decontaminateBloom output is exactly decontaminate's (bloom FPs verified away)") {
    val docs = Tables.read(spark, "/root/testdata/sf0.001", "documents")
      .filter(col("doc_id") < 300)
    val bench = docs.filter(col("doc_id") % 50 === 0)
    val exact = Dedup.decontaminate(docs, bench, "doc_id", "text", n = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    // a deliberately high fpp floods the prefilter with false positives;
    // the verify join must still remove every one of them
    val bloom = Dedup.decontaminateBloom(docs, bench, "doc_id", "text", n = 8,
        fpp = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(bloom == exact)
    assert(exact.exists(_._3), "fixture should contain contaminated docs")
    assert(exact.exists(!_._3), "fixture should contain clean docs")
  }
}
