package graft

import graft.operators.LongContext
import org.apache.spark.sql.functions._

/** Needle-splice invariants: depth 0 prepends, depth 1 appends, the
  * splice position floors depth*len, lengths add up, and the
  * fingerprint is the md5 of the actual spliced text. */
class LongContextSpec extends SparkSpecBase {

  import spark.implicits._

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def splice(text: String, needle: String, depth: Double) =
    LongContext.insertNeedle(
      Seq((1L, text, needle, depth)).toDF("id", "text", "needle", "depth"),
      "id", "text", "needle", "depth").collect().head

  test("depth 0 prepends, depth 1 appends") {
    val r0 = splice("abcdef", "<N>", 0.0)
    assert(r0.getAs[Long]("pos") == 0L)
    assert(r0.getAs[String]("fingerprint") == md5Hex("<N>abcdef"))
    val r1 = splice("abcdef", "<N>", 1.0)
    assert(r1.getAs[Long]("pos") == 6L)
    assert(r1.getAs[String]("fingerprint") == md5Hex("abcdef<N>"))
  }

  test("mid-depth splices at floor(depth*len) and lengths add up") {
    val r = splice("abcdef", "<N>", 0.5)
    assert(r.getAs[Long]("pos") == 3L)
    assert(r.getAs[Long]("text_len") == 6L)
    assert(r.getAs[Long]("total_len") == 9L)
    assert(r.getAs[String]("fingerprint") == md5Hex("abc<N>def"))
  }

  test("splice is character-based on multibyte text") {
    val r = splice("日本語テキスト", "N", 0.5) // 7 chars, pos 3
    assert(r.getAs[Long]("pos") == 3L)
    assert(r.getAs[Long]("total_len") == 8L)
    assert(r.getAs[String]("fingerprint") == md5Hex("日本語Nテキスト"))
  }
}
