package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class InflateSpec extends AnyFunSuite {

  private def deflateRaw(data: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
    d.setInput(data); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  test("round-trips raw deflate and rejects garbage as null") {
    val payload = """{"marketSymbol":"ETH-BTC"}""".getBytes("UTF-8")
    assert(Inflate.tryInflate(deflateRaw(payload)).toSeq == payload.toSeq)
    assert(Inflate.tryInflate("not compressed".getBytes) == null)
  }

  test("deflate bomb degrades to null at the output cap instead of OOM") {
    // ~100 MB of zeros compresses to ~100 KB; default cap is 8 MB
    val bomb = deflateRaw(new Array[Byte](100 << 20))
    assert(bomb.length < (1 << 20), "fixture must actually be a bomb")
    assert(Inflate.tryInflate(bomb) == null, "bomb must hit the cap and null out")
    // a custom cap above the payload admits it
    assert(Inflate.tryInflate(bomb, 128 << 20).length == (100 << 20))
    // and an honest frame far under the cap is unaffected
    val small = deflateRaw("x".getBytes)
    assert(Inflate.tryInflate(small).toSeq == "x".getBytes.toSeq)
  }
}
