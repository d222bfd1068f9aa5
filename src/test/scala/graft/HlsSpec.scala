package graft

import graft.operators.Hls

/** HLS parse invariants: EXTINF/URI pairing, master-variant detection,
  * header gating, orphan tags, comment/blank tolerance, and the
  * zero-UDF scan shape. */
class HlsSpec extends SparkSpecBase {

  import spark.implicits._

  private def parse(text: String) = {
    val r = Hls.parse(Seq((1L, text)).toDF("id", "pl"), "id", "pl")
      .collect().head
    (r.getAs[String]("kind"), r.getAs[Long]("n_segments"),
      r.getAs[Double]("total_duration"), r.getAs[Long]("target_duration"),
      r.getAs[Long]("n_variants"), r.getAs[Long]("max_bandwidth"))
  }

  test("media playlist: segments pair with the following URI line") {
    val t = parse(
      """#EXTM3U
        |#EXT-X-TARGETDURATION:6
        |#EXTINF:5.5,
        |a.ts
        |#EXTINF:4.0,first segment title
        |b.ts
        |#EXT-X-ENDLIST""".stripMargin)
    assert(t == (("media", 2L, 9.5, 6L, 0L, 0L)))
  }

  test("master playlist: variants counted, max bandwidth kept") {
    val t = parse(
      """#EXTM3U
        |#EXT-X-STREAM-INF:BANDWIDTH=1280000,RESOLUTION=640x360
        |low.m3u8
        |#EXT-X-STREAM-INF:BANDWIDTH=5120000,RESOLUTION=1920x1080
        |high.m3u8""".stripMargin)
    assert(t == (("master", 0L, 0.0, 0L, 2L, 5120000L)))
  }

  test("missing #EXTM3U header is invalid; counters zero") {
    assert(parse("#EXTINF:4.0,\na.ts") ==
      (("invalid", 0L, 0.0, 0L, 0L, 0L)))
  }

  test("orphan EXTINF (no following URI) adds nothing; URIs without a tag ignored") {
    val t = parse(
      """#EXTM3U
        |naked-uri.ts
        |#EXTINF:3.0,
        |#EXT-X-ENDLIST""".stripMargin)
    assert(t._2 == 0L && t._3 == 0.0)
  }

  test("comments, blank lines, and CRLF endings are tolerated") {
    val t = parse(
      "#EXTM3U\r\n# just a comment\r\n\r\n#EXTINF:2.0,\r\nseg.ts\r\n")
    assert(t == (("media", 1L, 2.0, 0L, 0L, 0L)))
  }

  test("a NULL playlist is invalid, not an empty media playlist") {
    val df = Seq((1L, null.asInstanceOf[String])).toDF("id", "pl")
    val r = Hls.parse(df, "id", "pl").collect().head
    assert(r.getAs[String]("kind") == "invalid")
    assert(r.getAs[Long]("n_segments") == 0L)
  }

  test("a legal zero-duration EXTINF still counts its segment") {
    val t = parse("#EXTM3U\n#EXTINF:0,\na.ts\n#EXTINF:2.5,\nb.ts")
    assert(t._2 == 2L && t._3 == 2.5)
  }

  test("TARGETDURATION substring inside a comment or URI is not the tag") {
    val t = parse(
      "#EXTM3U\n# was #EXT-X-TARGETDURATION:6 once\n#EXTINF:1.0,\nx.ts")
    assert(t._4 == 0L, s"unanchored tag match: $t")
    val t2 = parse("#EXTM3U\n#EXT-X-TARGETDURATION:7\n#EXTINF:1.0,\nx.ts")
    assert(t2._4 == 7L)
  }

  test("hostile numerics never throw under ANSI: overlong digits, multi-dot durations") {
    // a 20-digit bandwidth, a 20-digit target duration, and a "1.2.3"
    // duration must all fail the BOUNDED match and read as 0 — before
    // the digit bounds, each reached an ANSI cast error and killed the
    // whole scan (the HtmlMeta colspan bug class)
    val t = parse(
      """#EXTM3U
        |#EXT-X-TARGETDURATION:99999999999999999999
        |#EXTINF:1.2.3,
        |a.ts
        |#EXTINF:4.0,
        |b.ts""".stripMargin)
    // the malformed EXTINF reads duration 0 but still pairs its URI
    assert(t == (("media", 2L, 4.0, 0L, 0L, 0L)), t.toString)
    val m = parse(
      """#EXTM3U
        |#EXT-X-STREAM-INF:BANDWIDTH=99999999999999999999
        |v0.m3u8
        |#EXT-X-STREAM-INF:BANDWIDTH=700000
        |v1.m3u8""".stripMargin)
    assert(m == (("master", 0L, 0.0, 0L, 2L, 700000L)), m.toString)
    // boundary sanity: 15-digit bandwidths still parse whole
    val big = parse(
      s"""#EXTM3U
         |#EXT-X-STREAM-INF:BANDWIDTH=999999999999999
         |v.m3u8""".stripMargin)
    assert(big._6 == 999999999999999L)
  }

  test("long legitimate fractions truncate at 9 digits instead of zeroing") {
    // some muxers emit microsecond-or-finer duration fractions; the
    // bounded match must TRUNCATE those (keep the first 9 fraction
    // digits), not reject the whole duration (ADVICE r13) — while a
    // >9-digit INTEGER part stays the hostile case and reads 0
    val t = parse(
      """#EXTM3U
        |#EXTINF:2.0166666666666666,
        |a.ts
        |#EXTINF:12345678901.5,
        |b.ts""".stripMargin)
    assert(t._2 == 2L, t.toString)
    assert(math.abs(t._3 - 2.016666666) < 1e-9, t.toString)
  }

  test("parse is UDF-free and scan-shaped") {
    val df = Seq((1L, "#EXTM3U\n")).toDF("id", "pl")
    val plan = Hls.parse(df, "id", "pl").queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("scalaudf"), plan)
    assert(!plan.contains("Exchange"), plan)
  }
}
