package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Round-trip contract for the from-scratch GIF writer against the JDK's
  * independent decoder — frame count, dimensions, and every index byte
  * must survive. The large-raster cases force the LZW code width through
  * every stage (9→12 bits) and across the 4096-entry clear/reset, the
  * two places an off-by-one desyncs encoder and decoder silently on
  * small inputs. */
class GifCodecSpec extends AnyFunSuite {

  private def roundTrip(w: Int, h: Int, frames: Seq[Array[Byte]]): Unit = {
    val decoded = GifCodec.decode(GifCodec.encode(w, h, frames))
    assert(decoded.length == frames.length, "frame count")
    decoded.zip(frames).zipWithIndex.foreach { case ((d, orig), i) =>
      assert(d.width == w && d.height == h, s"frame $i dims ${d.width}x${d.height}")
      assert(d.indices.sameElements(orig), s"frame $i raster mismatch")
    }
  }

  test("multi-frame round trip: deterministic small animation") {
    val frames = (0 until 5).map(f => Array.tabulate(9 * 6)(i => ((f * 7 + i * 13) % 256).toByte))
    roundTrip(9, 6, frames)
  }

  test("single pixel, single frame") {
    roundTrip(1, 1, Seq(Array[Byte](200.toByte)))
  }

  test("flat frame (maximal LZW run compression)") {
    roundTrip(40, 30, Seq(Array.fill[Byte](1200)(7)))
  }

  test("code width growth: raster large enough to cross 9→10→11 bits") {
    val rnd = new scala.util.Random(42)
    // ~6000 high-entropy bytes add ~1 dict entry per ~2 input bytes —
    // comfortably past the 512 and 1024 table marks
    val raster = Array.fill[Byte](6000)(rnd.nextInt(256).toByte)
    roundTrip(100, 60, Seq(raster))
  }

  test("table reset: raster large enough to fill 4096 entries and clear") {
    val rnd = new scala.util.Random(7)
    val raster = Array.fill[Byte](20000)(rnd.nextInt(256).toByte)
    roundTrip(200, 100, Seq(raster))
  }

  test("randomized multi-frame round trips across seeds") {
    (1 to 20).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val w = rnd.nextInt(30) + 1
      val h = rnd.nextInt(20) + 1
      val n = rnd.nextInt(6) + 1
      val frames = (0 until n).map(_ => Array.fill[Byte](w * h)(rnd.nextInt(256).toByte))
      roundTrip(w, h, frames)
    }
  }

  test("encode rejects mis-sized rasters and empty animations") {
    intercept[IllegalArgumentException](GifCodec.encode(3, 3, Seq(new Array[Byte](8))))
    intercept[IllegalArgumentException](GifCodec.encode(3, 3, Nil))
    intercept[IllegalArgumentException](GifCodec.encode(0, 3, Seq(new Array[Byte](0))))
  }

  test("decode rejects a truncated container") {
    val full = GifCodec.encode(8, 8, Seq(Array.tabulate(64)(_.toByte)))
    intercept[Exception](GifCodec.decode(full.take(20)))
  }
}
