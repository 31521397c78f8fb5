package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** MJPEG-in-AVI — a REAL video container on the same RIFF chunk
  * discipline as [[WavCodec]]: `RIFF 'AVI '` wrapping a `hdrl` LIST
  * (`avih` main header + `strl`/`strh`+`strf` stream headers), a `movi`
  * LIST of `00dc` compressed-frame chunks (each a genuine interchange
  * JPEG, decoded downstream by the JDK's independent reader), and the
  * `idx1` frame index real muxers append.
  *
  * [[encode]] writes the spec shape; [[decode]] is a strict chunk walk —
  * unknown chunks skipped by declared length, odd-length chunks padded
  * to the word boundary, structural violations (overruns, missing
  * headers, frame-count mismatch) throw IllegalArgumentException with
  * the same quarantine discipline as every other codec here. The
  * reference consumes documents only
  * (`ETFQuarterlyHoldingsExtractor.py:117-127`); this is the
  * generalization layer's video-ingest path. */
object AviCodec {

  final case class AviVideo(width: Int, height: Int, frames: Seq[Array[Byte]])

  private def fourcc(s: String): Array[Byte] = s.getBytes("US-ASCII")

  /** One `id`+len+body chunk, word-padded per the RIFF spec. */
  private def chunk(id: String, body: Array[Byte]): Array[Byte] = {
    val pad = body.length & 1
    val bb = ByteBuffer.allocate(8 + body.length + pad).order(ByteOrder.LITTLE_ENDIAN)
    bb.put(fourcc(id)).putInt(body.length).put(body)
    bb.array()
  }

  private def list(kind: String, children: Array[Byte]): Array[Byte] = {
    val bb = ByteBuffer.allocate(12 + children.length).order(ByteOrder.LITTLE_ENDIAN)
    bb.put(fourcc("LIST")).putInt(4 + children.length).put(fourcc(kind)).put(children)
    bb.array()
  }

  def encode(width: Int, height: Int, fps: Int, frames: Seq[Array[Byte]]): Array[Byte] = {
    require(width > 0 && height > 0 && fps > 0 && frames.nonEmpty, "degenerate video")
    val avih = {
      val bb = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
      bb.putInt(1000000 / fps)          // dwMicroSecPerFrame
        .putInt(0).putInt(0)            // dwMaxBytesPerSec, dwPaddingGranularity
        .putInt(0x10)                   // dwFlags: AVIF_HASINDEX
        .putInt(frames.length)          // dwTotalFrames
        .putInt(0).putInt(1)            // dwInitialFrames, dwStreams
        .putInt(frames.map(_.length).max) // dwSuggestedBufferSize
        .putInt(width).putInt(height)
      bb.array()                        // 16 reserved bytes stay zero
    }
    val strh = {
      val bb = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
      bb.put(fourcc("vids")).put(fourcc("MJPG"))
        .putInt(0).putShort(0).putShort(0) // flags, priority, language
        .putInt(0)                      // initial frames
        .putInt(1).putInt(fps)          // scale, rate → fps frames/sec
        .putInt(0).putInt(frames.length)
        .putInt(frames.map(_.length).max)
        .putInt(-1)                     // quality: default
        .putInt(0)                      // sample size: varies
        .putShort(0).putShort(0)
        .putShort(width.toShort).putShort(height.toShort) // rcFrame
      bb.array()
    }
    val strf = {
      val bb = ByteBuffer.allocate(40).order(ByteOrder.LITTLE_ENDIAN)
      bb.putInt(40).putInt(width).putInt(height)
        .putShort(1).putShort(24)       // planes, bit count
        .put(fourcc("MJPG"))
        .putInt(width * height * 3)
        .putInt(0).putInt(0).putInt(0).putInt(0)
      bb.array()
    }
    val hdrl = list("hdrl",
      chunk("avih", avih) ++ list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val frameChunks = frames.map(f => chunk("00dc", f))
    val movi = list("movi", frameChunks.reduce(_ ++ _))
    val idx1 = {
      // offsets are relative to the start of the movi list's type fourcc
      val bb = ByteBuffer.allocate(16 * frames.length).order(ByteOrder.LITTLE_ENDIAN)
      var off = 4
      frames.indices.foreach { i =>
        bb.put(fourcc("00dc")).putInt(0x10).putInt(off).putInt(frames(i).length)
        off += frameChunks(i).length
      }
      chunk("idx1", bb.array())
    }
    val body = fourcc("AVI ") ++ hdrl ++ movi ++ idx1
    val out = ByteBuffer.allocate(8 + body.length).order(ByteOrder.LITTLE_ENDIAN)
    out.put(fourcc("RIFF")).putInt(body.length).put(body)
    out.array()
  }

  def decode(bytes: Array[Byte]): AviVideo = {
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"malformed AVI: $msg")
    if (bytes.length < 12) fail("shorter than the RIFF header")
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val tag = new Array[Byte](4)
    def cc(): String = { bb.get(tag); new String(tag, "US-ASCII") }
    if (cc() != "RIFF") fail("bad magic, want RIFF")
    val riffLen = bb.getInt
    if (riffLen < 4 || riffLen > bb.remaining()) fail("RIFF length overruns payload")
    if (cc() != "AVI ") fail("bad form type, want 'AVI '")
    var width = -1
    var height = -1
    var total = -1
    val frames = Seq.newBuilder[Array[Byte]]
    var nFrames = 0
    def walkHdrl(end: Int): Unit = while (bb.position() + 8 <= end) {
      val id = cc()
      val len = bb.getInt
      if (len < 0 || bb.position() + len > end) fail(s"chunk $id overruns hdrl")
      val next = bb.position() + len + (len & 1)
      id match {
        case "avih" =>
          if (len < 40) fail("avih too short")
          if (width >= 0) fail("duplicate avih")
          val base = bb.position()
          total = bb.getInt(base + 16)
          width = bb.getInt(base + 32)
          height = bb.getInt(base + 36)
          if (width <= 0 || height <= 0 || total <= 0)
            fail(s"degenerate avih: ${width}x$height, $total frames")
        case _ => () // strl LIST and friends: stream detail not needed
      }
      bb.position(next)
    }
    def walkMovi(end: Int): Unit = while (bb.position() + 8 <= end) {
      val id = cc()
      val len = bb.getInt
      if (len < 0 || bb.position() + len > end) fail(s"chunk $id overruns movi")
      val next = bb.position() + len + (len & 1)
      if (id.endsWith("dc") || id.endsWith("db")) {
        val f = new Array[Byte](len)
        bb.get(f)
        frames += f
        nFrames += 1
      }
      bb.position(next)
    }
    while (bb.remaining() >= 8) {
      val id = cc()
      val len = bb.getInt
      if (len < 0 || len > bb.remaining()) fail(s"chunk $id overruns payload")
      val next = bb.position() + len + (len & 1)
      if (id == "LIST") {
        if (len < 4) fail("LIST without a type")
        val kind = cc()
        val end = next - (len & 1)
        kind match {
          case "hdrl" => walkHdrl(end)
          case "movi" =>
            if (width < 0) fail("movi before avih")
            walkMovi(end)
          case _ => () // unknown list: skip wholesale
        }
      }
      // a final pad byte may legitimately be absent at EOF — clamp
      bb.position(math.min(next, bytes.length))
    }
    if (width < 0) fail("missing avih header")
    if (nFrames == 0) fail("missing movi frames")
    if (nFrames != total) fail(s"avih declares $total frames, movi carries $nFrames")
    AviVideo(width, height, frames.result())
  }
}
