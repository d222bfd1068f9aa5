package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Id3, Multimodal}

/** ID3v1/v2 codec invariants: syncsafe arithmetic, frame walk, the
  * tag-skip + frame-walk + trailer composition, and refusal paths. */
class Id3Spec extends AnyFunSuite {

  test("syncsafe round-trips and keeps every MSB clear") {
    for (n <- Seq(0, 1, 127, 128, 255, 16383, 16384, (1 << 28) - 1)) {
      val b = Id3.syncsafe(n)
      assert(b.forall(x => (x & 0x80) == 0))
      assert(Id3.unSyncsafe(b, 0) == n)
    }
    intercept[IllegalArgumentException](Id3.syncsafe(1 << 28))
  }

  test("ID3v2.3 encode/parse round-trips text frames in order") {
    val frames = Seq("TIT2" -> "A Title", "TPE1" -> "Someone",
      "TALB" -> "An Album", "TYER" -> "1999")
    val tag = Id3.encodeId3v2(frames)
    assert(new String(tag.take(3), "US-ASCII") == "ID3" && tag(3) == 3)
    val Some((major, parsed, total)) = Id3.parseId3v2(tag)
    assert(major == 3 && total == tag.length && parsed == frames)
  }

  test("ID3v1 trailer round-trips with NUL-padded fields") {
    val t = Id3.encodeId3v1("Song", "Artist", "Album", "2001", "hi", 17)
    assert(t.length == 128)
    val audio = Multimodal.encodeMp3Frames(8, 0, 2)
    val Some((title, artist, album, year, genre)) = Id3.parseId3v1(audio ++ t)
    assert(title == "Song" && artist == "Artist" && album == "Album" &&
      year == "2001" && genre == 17)
    // a 30-char title survives exactly; a longer one truncates
    val long = "x" * 40
    val Some((t30, _, _, _, _)) = Id3.parseId3v1(audio ++
      Id3.encodeId3v1(long, "", "", "", "", 0))
    assert(t30 == "x" * 30)
  }

  test("mp3TagMeta: v2 skip + frame walk + v1 trailer compose") {
    val v2 = Id3.encodeId3v2(Seq("TIT2" -> "T", "TPE1" -> "P"))
    val audio = Multimodal.encodeMp3Frames(5, 1, 4) // 64 kbps, 48 kHz
    val v1 = Id3.encodeId3v1("V1T", "V1P", "", "1970", "", 9)
    val Some(all) = Id3.mp3TagMeta(v2 ++ audio ++ v1)
    assert(all.v2Frames.toMap == Map("TIT2" -> "T", "TPE1" -> "P"))
    assert(all.audio.nFrames == 4 && all.audio.sampleRate == 48000)
    assert(all.v1.map(_._1).contains("V1T"))
    // no trailer: v1 empty, same frame count
    val Some(noV1) = Id3.mp3TagMeta(v2 ++ audio)
    assert(noV1.v1.isEmpty && noV1.audio.nFrames == 4)
    // no v2 tag: frames only
    val Some(bare) = Id3.mp3TagMeta(audio)
    assert(bare.v2Frames.isEmpty && bare.audio.nFrames == 4)
    // the v2 skip is BY DECLARED SIZE, not sync-scan: a 0xFF byte
    // inside the tag text must not derail the walk
    val trap = Id3.encodeId3v2(Seq("TIT2" -> ("AÿB")))
    val Some(trapped) = Id3.mp3TagMeta(trap ++ audio)
    assert(trapped.audio.nFrames == 4)
  }

  test("v2 header flags are honored: extended header skip + de-unsynchronisation") {
    // hand-build a v2.3 tag with an extended header (flag 0x40): 4-byte
    // ext size (excluding itself) = 6, 6 bytes of ext data, then one
    // TIT2 frame — ignoring the flag would read the ext bytes as a
    // frame id and return zero frames
    val frame = {
      val t = "Hello".getBytes("ISO-8859-1")
      val sz = t.length + 1
      Array[Byte]('T', 'I', 'T', '2',
        ((sz >> 24) & 0xff).toByte, ((sz >> 16) & 0xff).toByte,
        ((sz >> 8) & 0xff).toByte, (sz & 0xff).toByte, 0, 0, 0) ++ t
    }
    val ext = Array[Byte](0, 0, 0, 6, 0, 0, 0, 0, 0, 0)
    val body = ext ++ frame
    val tag = "ID3".getBytes("US-ASCII") ++ Array[Byte](3, 0, 0x40) ++
      Id3.syncsafe(body.length) ++ body
    val Some((_, frames, _)) = Id3.parseId3v2(tag)
    assert(frames == Seq("TIT2" -> "Hello"))
    // unsynchronisation (flag 0x80): every FF in the body is followed
    // by a stuffed 00 that the parser must remove before walking
    val raw = frame.clone()
    // put an 0xFF inside the text to force a stuffing site
    raw(11) = 0xff.toByte
    val unsynced = raw.flatMap(b =>
      if ((b & 0xff) == 0xff) Array(b, 0.toByte) else Array(b))
    val tag2 = "ID3".getBytes("US-ASCII") ++ Array[Byte](3, 0, 0x80.toByte) ++
      Id3.syncsafe(unsynced.length) ++ unsynced
    val Some((_, frames2, _)) = Id3.parseId3v2(tag2)
    assert(frames2 == Seq("TIT2" -> "ÿello"))
  }

  test("v2 text frames drop the spec-permitted trailing NUL terminator") {
    val t = "Song".getBytes("ISO-8859-1") ++ Array[Byte](0) // text + NUL
    val sz = t.length + 1
    val frame = Array[Byte]('T', 'I', 'T', '2',
      ((sz >> 24) & 0xff).toByte, ((sz >> 16) & 0xff).toByte,
      ((sz >> 8) & 0xff).toByte, (sz & 0xff).toByte, 0, 0, 0) ++ t
    val tag = "ID3".getBytes("US-ASCII") ++ Array[Byte](3, 0, 0) ++
      Id3.syncsafe(frame.length) ++ frame
    val Some((_, frames, _)) = Id3.parseId3v2(tag)
    assert(frames == Seq("TIT2" -> "Song"), "trailing NUL leaked into the value")
  }

  test("malformed tags are refused or skipped, never crash") {
    assert(Id3.parseId3v2("ID3".getBytes("US-ASCII")).isEmpty)
    assert(Id3.parseId3v1(new Array[Byte](100)).isEmpty)
    assert(Id3.mp3TagMeta(Array.empty[Byte]).isEmpty)
    // v2 tag whose declared size overruns the payload
    val bad = Id3.encodeId3v2(Seq("TIT2" -> "x")).dropRight(2)
    assert(Id3.parseId3v2(bad).isEmpty)
    // tag-only payload (no audio) is not an mp3
    assert(Id3.mp3TagMeta(Id3.encodeId3v2(Seq("TIT2" -> "x"))).isEmpty)
  }
}
