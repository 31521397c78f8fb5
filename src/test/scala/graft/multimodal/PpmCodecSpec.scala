package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** The codec contract: [[PpmCodec.decode]] is a real parser of the
  * Netpbm P6 format — it must read what any conformant writer produces
  * (comments, arbitrary header whitespace), reject malformed payloads,
  * and round-trip [[PpmCodec.encode]] bit-exactly. */
class PpmCodecSpec extends AnyFunSuite {
  import PpmCodec._

  private def ascii(s: String) = s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)

  test("round-trips encode -> decode bit-exactly") {
    val raster = Array.tabulate(3 * 4 * 5)(i => (i * 7 % 256).toByte)
    val img = decode(encode(4, 5, 255, raster))
    assert(img.width == 4 && img.height == 5 && img.maxval == 255)
    assert(img.raster.toSeq == raster.toSeq)
  }

  test("parses a foreign header: comments anywhere, mixed whitespace, maxval < 255") {
    // handcrafted, NOT from our encoder: comment between every field,
    // CRLF + tabs as separators, 2x1 image
    val header = "P6 # magic comment\n#another\n\t2 # width\r\n1\n# before maxval\n127 "
    val raster = Array[Byte](1, 2, 3, 4, 5, 6)
    val img = decode(ascii(header) ++ raster)
    assert(img.width == 2 && img.height == 1 && img.maxval == 127)
    assert(img.raster.toSeq == raster.toSeq)
  }

  test("raster bytes are consumed raw: no whitespace or comment skipping inside") {
    // raster starting with '#' and spaces must be data, not header syntax
    val raster = Array[Byte]('#', ' ', '\n', 10, 20, 30)
    val img = decode(ascii("P6\n2 1\n255\n") ++ raster)
    assert(img.raster.toSeq == raster.toSeq)
  }

  test("rejects malformed payloads") {
    val ok = encode(2, 2, 255, new Array[Byte](12))
    assertThrows[IllegalArgumentException](decode(ascii("P5\n2 2\n255\n") ++ new Array[Byte](12)))
    assertThrows[IllegalArgumentException](decode(ok.dropRight(1)))      // short raster
    assertThrows[IllegalArgumentException](decode(ascii("P6\n2 2\n")))    // missing maxval
    assertThrows[IllegalArgumentException](decode(ascii("P6\n2 2\n999\n") ++ new Array[Byte](24))) // 2-byte samples unsupported
    assertThrows[IllegalArgumentException](decode(ascii("P6\n0 2\n255\n")))
    assertThrows[IllegalArgumentException](decode(Array.empty[Byte]))
  }

  test("distributed decode output matches a local re-computation on real parsed bytes") {
    val s = graft.TestSpark.spark
    val got = Media.ppmDecode(s, graft.TestSpark.sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(5))).toSeq
    assert(got.nonEmpty)
    // independently re-derive one row from the pixel formula
    val (id, w, h, sumR) = got.head
    assert(w == (id % 13).toInt + 2 && h == (id % 7).toInt + 2)
    val expectR = (0 until 3 * w * h).filter(_ % 3 == 0).map(i => (id * 31 + i) % 256).sum
    assert(sumR == expectR)
  }
}
