package graft.multimodal

/** IMA ADPCM (DVI4) — a REAL compressed-audio bitstream in pure integer
  * arithmetic: 16-bit PCM compressed 4:1 into 4-bit codes driving an
  * adaptive-step-size delta predictor (the codec used by WAV format 0x11,
  * QuickTime ima4, and VoIP DVI4). This closes the compressed-audio
  * modality the way PNG/JPEG closed images: the bytes are a real
  * interchange encoding, not a stub's arithmetic.
  *
  * The algorithm is the public IMA spec: an 89-entry step table, a
  * 4-bit code of (sign, 3 magnitude bits), reconstruction
  * `diff = (step·magnitude)/4 + step/8` via shifts, predictor clamped to
  * int16, step index adapted by the standard index table. Everything is
  * integer — encoder and decoder are bit-deterministic on any platform,
  * which is what lets the decode query carry an exact bounds verdict.
  *
  * Lossy by design: the contract is the JPEG-style error budget, plus
  * golden vectors in the spec pinning the state machine against
  * hand-computed transitions from the published tables.
  */
object AdpcmCodec {

  private val StepTable: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37, 41,
    45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173, 190,
    209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658, 724,
    796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066, 2272,
    2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894, 6484, 7132,
    7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289, 16818, 18500,
    20350, 22385, 24623, 27086, 29794, 32767)

  private val IndexTable: Array[Int] = Array(-1, -1, -1, -1, 2, 4, 6, 8)

  private def clampIdx(i: Int): Int = if (i < 0) 0 else if (i > 88) 88 else i
  private def clamp16(v: Int): Int =
    if (v < -32768) -32768 else if (v > 32767) 32767 else v

  /** Encode 16-bit samples to 4-bit codes (two per byte, low nibble
    * first — the IMA packing). State starts at (0, 0). */
  def encode(samples: Array[Short]): Array[Byte] = {
    val out = new Array[Byte]((samples.length + 1) / 2)
    var predictor = 0
    var index = 0
    var i = 0
    while (i < samples.length) {
      val step = StepTable(index)
      var diff = samples(i) - predictor
      var code = 0
      if (diff < 0) { code = 8; diff = -diff }
      // 3 magnitude bits: the standard successive-approximation quantize
      var d = step
      if (diff >= d) { code |= 4; diff -= d }
      d >>= 1
      if (diff >= d) { code |= 2; diff -= d }
      d >>= 1
      if (diff >= d) { code |= 1 }
      // decoder-mirrored reconstruction keeps predictor in lockstep
      var delta = step >> 3
      if ((code & 4) != 0) delta += step
      if ((code & 2) != 0) delta += step >> 1
      if ((code & 1) != 0) delta += step >> 2
      predictor = clamp16(if ((code & 8) != 0) predictor - delta else predictor + delta)
      index = clampIdx(index + IndexTable(code & 7))
      if (i % 2 == 0) out(i / 2) = (code & 0x0f).toByte
      else out(i / 2) = (out(i / 2) | (code << 4)).toByte
      i += 1
    }
    out
  }

  /** Decode `n` samples from packed 4-bit codes. */
  def decode(bytes: Array[Byte], n: Int): Array[Short] = {
    require(bytes.length >= (n + 1) / 2, s"need ${(n + 1) / 2} bytes for $n samples")
    val out = new Array[Short](n)
    var predictor = 0
    var index = 0
    var i = 0
    while (i < n) {
      val code =
        if (i % 2 == 0) bytes(i / 2) & 0x0f
        else (bytes(i / 2) >> 4) & 0x0f
      val step = StepTable(index)
      var delta = step >> 3
      if ((code & 4) != 0) delta += step
      if ((code & 2) != 0) delta += step >> 1
      if ((code & 1) != 0) delta += step >> 2
      predictor = clamp16(if ((code & 8) != 0) predictor - delta else predictor + delta)
      index = clampIdx(index + IndexTable(code & 7))
      out(i) = predictor.toShort
      i += 1
    }
    out
  }
}
