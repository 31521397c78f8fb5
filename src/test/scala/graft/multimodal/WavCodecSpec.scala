package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** The WAV codec contract: real RIFF chunk walking (unknown chunks
  * skipped by declared length, odd lengths word-padded), PCM16 header
  * fields from the parsed fmt chunk, malformed-input rejection, and a
  * bit-exact encode→decode round trip. */
class WavCodecSpec extends AnyFunSuite {
  import WavCodec._

  private def le(bytes: Int): java.nio.ByteBuffer =
    java.nio.ByteBuffer.allocate(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)

  test("round-trips encode -> decode bit-exactly, stereo and mono") {
    for (ch <- Seq(1, 2)) {
      val samples = Array.tabulate(30 * ch)(i => ((i * 1337) % 65536 - 32768).toShort)
      val a = decode(encode(44100, ch, samples))
      assert(a.sampleRate == 44100 && a.channels == ch && a.nFrames == 30)
      assert(a.samples.toSeq == samples.toSeq)
    }
  }

  test("parses a foreign layout: unknown odd-length chunk before fmt, word padding") {
    val samples = Array[Short](100, -200, 300, -400)
    val junk = Array[Byte](1, 2, 3) // odd length: consumer must skip the pad byte
    val data = le(2 * samples.length)
    samples.foreach(s => data.putShort(s): Unit)
    val fmt = le(16).putShort(1.toShort).putShort(2.toShort).putInt(8000)
      .putInt(8000 * 4).putShort(4.toShort).putShort(16.toShort)
    val body = le(4 + 8 + 4 + 1 + 8 + 16 + 8 + 2 * samples.length)
      .put("WAVE".getBytes("US-ASCII"))
      .put("JUNK".getBytes("US-ASCII")).putInt(junk.length).put(junk).put(0.toByte)
      .put("fmt ".getBytes("US-ASCII")).putInt(16).put(fmt.array())
      .put("data".getBytes("US-ASCII")).putInt(2 * samples.length).put(data.array())
    val payload = le(8 + body.capacity())
      .put("RIFF".getBytes("US-ASCII")).putInt(body.capacity()).put(body.array()).array()
    val a = decode(payload)
    assert(a.sampleRate == 8000 && a.channels == 2 && a.nFrames == 2)
    assert(a.samples.toSeq == samples.toSeq)
  }

  test("rejects malformed payloads") {
    val ok = encode(8000, 1, Array[Short](1, 2, 3))
    assertThrows[IllegalArgumentException](decode("RIFX".getBytes("US-ASCII") ++ ok.drop(4)))
    assertThrows[IllegalArgumentException](decode(ok.dropRight(1)))     // data overruns
    assertThrows[IllegalArgumentException](decode(ok.take(12)))         // no fmt/data
    // non-PCM format tag
    val bad = ok.clone()
    bad(20) = 2 // audioFormat low byte inside fmt chunk
    assertThrows[IllegalArgumentException](decode(bad))
    assertThrows[IllegalArgumentException](decode(Array.empty[Byte]))
  }

  test("distributed decode matches the sample formula on real parsed bytes") {
    val s = graft.TestSpark.spark
    val got = Media.wavDecode(s, graft.TestSpark.sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got.nonEmpty)
    val (id, rate, ch, frames, sumC0) = got.head
    assert(rate == 8000 + (id % 3).toInt * 4000 && ch == 1 + (id % 2).toInt)
    assert(frames == (id % 50) + 20)
    val expect = (0 until (frames * ch).toInt).filter(_ % ch == 0)
      .map(i => ((id * 7 + i.toLong * 13) % 65536) - 32768).sum
    assert(sumC0 == expect)
  }
}
