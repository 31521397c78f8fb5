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

  // IMA ADPCM golden vector, hand-walked from the published tables:
  // state (pred=0, idx=0, step=7). Input 100: diff=100 ≥ 7·15/8 → code
  // 7, delta 7+3+1+0=11... verified transitions below pin the exact
  // state machine (any table or shift error diverges immediately).
  property("ADPCM decoder matches the hand-computed golden transitions") = {
    val enc = AdpcmCodec.encode(Array[Short](100, 100, 0))
    val dec = AdpcmCodec.decode(enc, 3)
    // step0=7: code=7 → delta=7+3+1+(7>>3=0)=...: delta = (7>>3)+(7)+(7>>1)+(7>>2)=0+7+3+1=11, pred=11, idx=0+8=8
    // step8=16: diff=89 ≥ → code 7 → delta=(16>>3)+16+8+4=30, pred=41, idx=16
    // step16=34: target 0, diff=-41 → sign, mag: 41≥34→4, rem 7; 7<17→0; 7≥8? no... 41-34=7, 7 >= 17? no; 7 >= 8? no → code=12, delta=(34>>3)+34=4+34=38, pred=3, idx=16+2=18
    Prop(dec.sameElements(Array[Short](11, 41, 3)))
  }

  // ramps START NEAR ZERO (the codec's initial predictor): the budget
  // then measures slope tracking + wrap recovery, not a cold-start
  // transient the fixture can simply avoid
  private val adpcmGen: Gen[Array[Short]] = for {
    n <- Gen.chooseNum(0, 400)
    slope <- Gen.chooseNum(1, 40)
    phase <- Gen.chooseNum(0, 97)
  } yield Array.tabulate(n)(i => ((2000 + phase + i * slope) % 4000 - 2000).toShort)

  // The budget must be wrap-aware: the sawtooth's +2000 → −2000 cliff is a
  // 4000-amplitude step the 4-bit coder cannot follow in one sample — the
  // step table needs ~8 max-code samples to grow from step 7 to cover the
  // deficit, then a few more to damp the oversized quantizer back down.
  // R = 16 samples bounds that transient (deltas 12,28,60,128,275,590,
  // 1267,2716 cumulate past 4000 by sample 8; the post-catch-up ringing is
  // step-sized and decays as the index steps back). A flat 256·n budget is
  // unsound when a wrap lands near the end of a short array (the transient
  // has no tail to amortize over), which made this property seed-flaky.
  property("ADPCM round trip tracks a smooth signal within a bounded mean error") =
    Prop.forAll(adpcmGen) { samples =>
      val dec = AdpcmCodec.decode(AdpcmCodec.encode(samples), samples.length)
      val err = samples.indices.map(i => math.abs(dec(i) - samples(i)).toLong).sum
      val wraps = (1 until samples.length).count(i => samples(i) < samples(i - 1))
      samples.isEmpty || err <= 256L * samples.length + 4000L * 16 * wraps
    }

  property("ADPCM compresses exactly 4:1 (two 4-bit codes per byte)") =
    Prop.forAll(adpcmGen) { samples =>
      AdpcmCodec.encode(samples).length == (samples.length + 1) / 2
    }

  property("PPM rejects any truncation of a valid payload") =
    Prop.forAll(ppmGen, Gen.chooseNum(1, 5)) { case ((w, h, maxval, raster), cut) =>
      val full = PpmCodec.encode(w, h, maxval, raster)
      Prop.throws(classOf[IllegalArgumentException]) {
        PpmCodec.decode(full.dropRight(cut)): Unit
      }
    }

  // AVI frame payloads are opaque byte blobs to the container — any
  // non-empty bytes exercise the mux/demux round trip
  private val aviGen: Gen[(Int, Int, Int, Seq[Array[Byte]])] = for {
    w <- Gen.chooseNum(1, 64)
    h <- Gen.chooseNum(1, 64)
    fps <- Gen.chooseNum(1, 60)
    nf <- Gen.chooseNum(1, 12)
    frames <- Gen.listOfN(nf,
      Gen.chooseNum(1, 200).flatMap(n => Gen.listOfN(n,
        Gen.chooseNum(Byte.MinValue, Byte.MaxValue)).map(_.toArray)))
  } yield (w, h, fps, frames)

  property("AVI demux ∘ mux recovers every frame payload bit-exactly") =
    Prop.forAll(aviGen) { case (w, h, fps, frames) =>
      val v = AviCodec.decode(AviCodec.encode(w, h, fps, frames))
      v.width == w && v.height == h && v.frames.length == frames.length &&
        v.frames.zip(frames).forall { case (a, b) => java.util.Arrays.equals(a, b) }
    }

  property("AVI rejects any truncation of a valid payload") =
    Prop.forAll(aviGen, Gen.chooseNum(1, 5)) { case ((w, h, fps, frames), cut) =>
      val full = AviCodec.encode(w, h, fps, frames)
      // the declared RIFF length no longer fits the payload; the walk
      // must fail loudly, never return a short frame set
      Prop.throws(classOf[IllegalArgumentException]) {
        AviCodec.decode(full.dropRight(cut)): Unit
      }
    }

  property("AVI rejects a frame-count mismatch between header and movi") =
    Prop.forAll(aviGen) { case (w, h, fps, frames) =>
      val full = AviCodec.encode(w, h, fps, frames)
      // patch avih's dwTotalFrames (RIFF 12 + LIST hdr 8 + 'hdrl' 4 +
      // avih id/len 8 + field offset 16 = byte 48) to a structural lie
      val lied = full.clone()
      val wrong = frames.length + 1
      lied(48) = (wrong & 0xff).toByte
      lied(49) = ((wrong >> 8) & 0xff).toByte
      lied(50) = ((wrong >> 16) & 0xff).toByte
      lied(51) = ((wrong >> 24) & 0xff).toByte
      Prop.throws(classOf[IllegalArgumentException]) {
        AviCodec.decode(lied): Unit
      }
    }
}
