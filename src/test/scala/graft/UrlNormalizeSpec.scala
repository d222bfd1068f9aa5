package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.UrlNormalize.normalizePercent

/** RFC 3986 §6.2.2 invariants: unreserved escapes decode, reserved
  * escapes uppercase, malformed escapes pass through, and the
  * transform is idempotent on arbitrary inputs. */
class UrlNormalizeSpec extends AnyFunSuite {

  test("unreserved escapes decode; reserved escapes uppercase; rest untouched") {
    assert(normalizePercent("http://ex.com/%7Euser/%41bc") ==
      "http://ex.com/~user/Abc")
    assert(normalizePercent("/a%2fb?q=%2a") == "/a%2Fb?q=%2A")
    // non-ASCII UTF-8 bytes stay encoded, hex uppercased
    assert(normalizePercent("/caf%c3%a9") == "/caf%C3%A9")
    // the full unreserved set decodes
    assert(normalizePercent("%41%61%30%2D%2E%5F%7E") == "Aa0-._~")
    // reserved/sub-delim escapes keep their encoding (meaning-bearing)
    assert(normalizePercent("%2F%3F%23%26%3D") == "%2F%3F%23%26%3D")
    assert(normalizePercent("plain/path") == "plain/path")
    assert(normalizePercent(null) == null)
  }

  test("malformed escapes pass through literally") {
    assert(normalizePercent("/100%") == "/100%")
    assert(normalizePercent("/a%zzb") == "/a%zzb")
    assert(normalizePercent("/a%4") == "/a%4")
    assert(normalizePercent("%%41") == "%A") // first % malformed, then %41
  }

  test("idempotent on every input whose escapes are well-formed") {
    val r = new scala.util.Random(7L)
    val hexChars = "0123456789abcdefABCDEF"
    for (trial <- 1 to 200) {
      val s = (1 to (1 + r.nextInt(30))).map { _ =>
        r.nextInt(3) match {
          case 0 => ('a' + r.nextInt(26)).toChar.toString
          case 1 => "%" + hexChars(r.nextInt(22)) + hexChars(r.nextInt(22))
          case _ => "/"
        }
      }.mkString
      val once = normalizePercent(s)
      assert(normalizePercent(once) == once, s"trial=$trial s=$s once=$once")
    }
    // the documented non-idempotent corner: a MALFORMED '%' followed by
    // escapes that decode to hex digits assembles a new escape — such
    // inputs were never valid URLs (scaladoc'd fail-open behavior)
    assert(normalizePercent("%%34%31") == "%41")
    assert(normalizePercent("%41") == "A")
  }
}
