package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.WebDataset
import graft.operators.WebDataset.TarEntry

/** ustar shard reader invariants: byte-exact round-trips, 512-block
  * arithmetic, checksum verification, WebDataset key grouping. */
class WebDatasetSpec extends AnyFunSuite {

  test("encode/decode round-trips names and payloads byte-exact") {
    val es = Seq(
      TarEntry("000001.txt", "hello sample".getBytes("UTF-8")),
      TarEntry("000001.json", """{"a":1}""".getBytes("UTF-8")),
      TarEntry("000002.bin", Array.tabulate[Byte](700)(i => (i % 251).toByte)))
    val dec = WebDataset.decodeTar(WebDataset.encodeTar(es)).get
    assert(dec.map(_.name) == es.map(_.name))
    dec.zip(es).foreach { case (a, b) => assert(a.payload.toSeq == b.payload.toSeq) }
  }

  test("payload sizes straddling block boundaries") {
    for (n <- Seq(0, 1, 511, 512, 513, 1024, 1025)) {
      val es = Seq(TarEntry("k.bin", Array.tabulate[Byte](n)(_.toByte)))
      val dec = WebDataset.decodeTar(WebDataset.encodeTar(es)).get
      assert(dec.head.payload.length == n, s"size $n")
    }
  }

  test("checksum: any header corruption is refused") {
    val enc = WebDataset.encodeTar(Seq(TarEntry("a.txt", "x".getBytes)))
    for (pos <- Seq(0, 101, 125, 150, 258)) { // name, mode, size, cksum, magic
      val bad = enc.clone()
      bad(pos) = (bad(pos) ^ 0x04).toByte
      assert(WebDataset.decodeTar(bad).isEmpty, s"corruption at $pos undetected")
    }
    assert(WebDataset.decodeTar(enc.take(600)).isEmpty, "truncation undetected")
    assert(WebDataset.decodeTar("notatar".getBytes).isEmpty)
  }

  test("payload corruption is OUTSIDE the header checksum (documented trade)") {
    // ustar checksums cover headers only — flip a payload byte and the
    // archive still parses (content integrity is the .gz layer's job in
    // .tar.gz shards; stated so nobody assumes tar catches it)
    val enc = WebDataset.encodeTar(Seq(TarEntry("a.txt", "hello".getBytes)))
    val bad = enc.clone()
    bad(512) = 'X' // first payload byte (header occupies 0..511)
    val dec = WebDataset.decodeTar(bad)
    assert(dec.isDefined && new String(dec.get.head.payload) == "Xello")
  }

  test("empty archive decodes to zero entries") {
    assert(WebDataset.decodeTar(WebDataset.encodeTar(Seq.empty)).get.isEmpty)
  }
}
