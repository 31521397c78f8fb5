package graft.multimodal

import org.scalacheck.{Gen, Prop, Properties}

/** Property round trips for the real byte-format codecs: for ANY
  * dimensions/raster (PPM) and ANY rate/channels/samples (WAV), decode
  * after encode recovers the input bit-exactly — the codecs are inverses
  * over their whole domain, not just the fixture's shapes. Pure JVM
  * (no Spark jobs), so the case counts can stay at ScalaCheck defaults. */
object CodecPropertySpec extends Properties("CodecProperty") {

  private val ppmGen: Gen[(Int, Int, Int, Array[Byte])] = for {
    w <- Gen.chooseNum(1, 40)
    h <- Gen.chooseNum(1, 30)
    maxval <- Gen.chooseNum(1, 255)
    raster <- Gen.listOfN(3 * w * h, Gen.chooseNum(Byte.MinValue, Byte.MaxValue))
  } yield (w, h, maxval, raster.toArray)

  property("PPM decode ∘ encode = identity") = Prop.forAll(ppmGen) {
    case (w, h, maxval, raster) =>
      val img = PpmCodec.decode(PpmCodec.encode(w, h, maxval, raster))
      img.width == w && img.height == h && img.maxval == maxval &&
        java.util.Arrays.equals(img.raster, raster)
  }

  private val wavGen: Gen[(Int, Int, Array[Short])] = for {
    rate <- Gen.chooseNum(1, 192000)
    channels <- Gen.chooseNum(1, 8)
    frames <- Gen.chooseNum(0, 200)
    samples <- Gen.listOfN(frames * channels, Gen.chooseNum(Short.MinValue, Short.MaxValue))
  } yield (rate, channels, samples.toArray)

  property("WAV decode ∘ encode = identity") = Prop.forAll(wavGen) {
    case (rate, channels, samples) =>
      val a = WavCodec.decode(WavCodec.encode(rate, channels, samples))
      a.sampleRate == rate && a.channels == channels &&
        java.util.Arrays.equals(a.samples, samples)
  }

  private val pngGen: Gen[(Int, Int, Array[Byte])] = for {
    w <- Gen.chooseNum(1, 40)
    h <- Gen.chooseNum(1, 30)
    raster <- Gen.listOfN(3 * w * h, Gen.chooseNum(Byte.MinValue, Byte.MaxValue))
  } yield (w, h, raster.toArray)

  // cross-IMPLEMENTATION, not a round trip through one codebase: our
  // from-scratch deflate+CRC writer vs the JDK's independent PNG reader
  property("PNG: javax.imageio decode ∘ PngCodec encode = identity") =
    Prop.forAll(pngGen) { case (w, h, raster) =>
      val img = PngCodec.decode(PngCodec.encode(w, h, raster))
      img.width == w && img.height == h &&
        java.util.Arrays.equals(img.raster, raster)
    }

  property("PNG rejects a corrupted signature") = Prop.forAll(pngGen) {
    case (w, h, raster) =>
      val full = PngCodec.encode(w, h, raster)
      full(0) = 'X'.toByte
      Prop.throws(classOf[IllegalArgumentException]) {
        PngCodec.decode(full): Unit
      }
  }

  // the JDK reader is deliberately lenient about a missing IEND/CRC
  // tail, so the truncation check cuts into the IHDR itself — no
  // conformant reader can produce an image from a partial header
  property("PNG rejects truncation inside the IHDR") = Prop.forAll(pngGen) {
    case (w, h, raster) =>
      val full = PngCodec.encode(w, h, raster)
      Prop.throws(classOf[IllegalArgumentException]) {
        PngCodec.decode(full.take(20)): Unit
      }
  }

  property("PPM rejects any truncation of a valid payload") =
    Prop.forAll(ppmGen, Gen.chooseNum(1, 5)) { case ((w, h, maxval, raster), cut) =>
      val full = PpmCodec.encode(w, h, maxval, raster)
      Prop.throws(classOf[IllegalArgumentException]) {
        PpmCodec.decode(full.dropRight(cut)): Unit
      }
    }
}
