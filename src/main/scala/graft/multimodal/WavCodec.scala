package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** A REAL audio codec for the one format that needs no native library:
  * RIFF/WAVE with 16-bit PCM. Together with [[PpmCodec]] this makes two
  * modalities' decode paths real byte-format parsers; only genuinely
  * codec-bound formats without a JDK reader (MP3, H.264) would slot
  * into the same dispatch arm as a JNI call.
  *
  * Format: `RIFF <size> WAVE`, then a chunk walk — `fmt ` (PCM tag,
  * channels, sample rate, block align, 16 bits/sample) and `data`
  * (little-endian interleaved int16 frames), with unknown chunks (LIST,
  * JUNK, …) skipped by their declared length, odd-length chunks padded
  * to the word boundary per the RIFF spec. */
object WavCodec {

  final case class WavAudio(
      sampleRate: Int, channels: Int, samples: Array[Short]) {
    def nFrames: Int = samples.length / channels
  }

  /** Encode interleaved int16 PCM as a WAV payload. A LIST chunk is
    * inserted before `data` so every fixture payload exercises the
    * parser's unknown-chunk skip, as real writers' metadata does. */
  def encode(sampleRate: Int, channels: Int, samples: Array[Short]): Array[Byte] = {
    require(channels > 0 && samples.length % channels == 0,
      s"interleaved samples must fill whole frames: ${samples.length} % $channels != 0")
    val listBody = "INFOgraft fixture!".getBytes("US-ASCII") // even length
    val dataLen = 2 * samples.length
    val riffLen = 4 + (8 + 16) + (8 + listBody.length) + (8 + dataLen)
    val bb = ByteBuffer.allocate(8 + riffLen).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(riffLen).put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1.toShort)                        // PCM
      .putShort(channels.toShort)
      .putInt(sampleRate)
      .putInt(sampleRate * channels * 2)          // byte rate
      .putShort((channels * 2).toShort)           // block align
      .putShort(16.toShort)                       // bits per sample
    bb.put("LIST".getBytes("US-ASCII")).putInt(listBody.length).put(listBody)
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(s => bb.putShort(s): Unit)
    bb.array()
  }

  /** Parse a WAV payload; throws IllegalArgumentException on malformed
    * input (same quarantine discipline as [[PpmCodec.decode]]). */
  def decode(bytes: Array[Byte]): WavAudio = {
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"malformed WAV: $msg")
    if (bytes.length < 12) fail("shorter than the RIFF header")
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val tag = new Array[Byte](4)
    def fourcc(): String = { bb.get(tag); new String(tag, "US-ASCII") }
    if (fourcc() != "RIFF") fail("bad magic, want RIFF")
    bb.getInt // declared riff length; trust the buffer bound instead
    if (fourcc() != "WAVE") fail("bad form type, want WAVE")
    var rate = -1; var channels = -1
    var samples: Array[Short] = null
    while (bb.remaining() >= 8) {
      val id = fourcc()
      val len = bb.getInt
      if (len < 0 || len > bb.remaining()) fail(s"chunk $id overruns payload")
      id match {
        case "fmt " =>
          if (rate >= 0) fail("duplicate fmt chunk")
          if (len < 16) fail("fmt chunk too short")
          val fmtEnd = bb.position() + len
          val audioFormat = bb.getShort
          if (audioFormat != 1) fail(s"unsupported audio format $audioFormat, want PCM")
          channels = bb.getShort.toInt
          rate = bb.getInt
          bb.getInt; bb.getShort // byte rate, block align: derived
          val bits = bb.getShort
          if (bits != 16) fail(s"unsupported bit depth $bits, want 16")
          bb.position(fmtEnd)
        case "data" =>
          if (samples != null) fail("duplicate data chunk")
          if (rate < 0) fail("data chunk before fmt")
          if (len % 2 != 0) fail("odd data length for int16 samples")
          samples = new Array[Short](len / 2)
          var i = 0
          while (i < samples.length) { samples(i) = bb.getShort; i += 1 }
        case _ =>
          bb.position(bb.position() + len + (len & 1)) // skip, word-aligned
      }
    }
    if (rate < 0) fail("missing fmt chunk")
    if (samples == null) fail("missing data chunk")
    if (channels <= 0 || samples.length % channels != 0)
      fail(s"ragged frames: ${if (samples == null) 0 else samples.length} samples, $channels channels")
    WavAudio(rate, channels, samples)
  }
}
