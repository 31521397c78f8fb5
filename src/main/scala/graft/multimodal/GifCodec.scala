package graft.multimodal

/** From-scratch animated GIF89a writer + JDK-reader decode — the CONTAINER
  * modality done for real (reference behavior: media payloads are opaque
  * bytes the pipeline must decode before any feature extraction; see
  * `/root/reference` README "document pipeline" — the extractor's
  * equivalent step is parsing fetched payloads before tabulation).
  *
  * [[encode]] emits a structurally complete multi-frame GIF89a: header,
  * logical screen descriptor, a 256-entry grayscale global color table
  * (palette index i → RGB (i,i,i), so a decoded red channel IS the index
  * raster), and per frame a graphic control extension + image descriptor
  * + GIF-flavor variable-width LZW image data in 255-byte sub-blocks.
  * The LZW encoder is the real algorithm — prefix dictionary, 9→12-bit
  * code-width growth in lockstep with the decoder's table, clear-code
  * reset at 4096 — not the "literals with periodic clears" shortcut.
  *
  * [[decode]] hands the bytes to `javax.imageio`'s GIF plugin, an
  * implementation wholly independent of this writer (same discipline as
  * [[PngCodec]]: our encoder, the JDK's decoder — a bug in either side
  * breaks the round trip). Pure JDK, headless-safe, no native library.
  */
object GifCodec {

  final case class Frame(width: Int, height: Int, indices: Array[Byte])

  // ---- GIF-flavor LZW (variable 9..12-bit codes, LSB-first packing) ----

  private val MinCodeSize = 8 // full 256-entry palette
  private val ClearCode = 1 << MinCodeSize // 256
  private val EoiCode = ClearCode + 1 // 257
  private val MaxTableSize = 4096

  /** Real LZW over one frame's index raster. The dictionary maps
    * (prefix code, next byte) → code; the code width grows exactly when
    * the entry numbered 2^width is added (the decoder adds the same
    * entry one code later and grows BEFORE its next read, so widths stay
    * in sync), and a clear code resets the table when it fills. */
  private[multimodal] def lzwEncode(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var bitBuf = 0L
    var nBits = 0
    var codeSize = MinCodeSize + 1
    def emit(code: Int): Unit = {
      bitBuf |= code.toLong << nBits
      nBits += codeSize
      while (nBits >= 8) {
        out.write((bitBuf & 0xff).toInt)
        bitBuf >>>= 8
        nBits -= 8
      }
    }
    val dict = new java.util.HashMap[Integer, Integer](4096)
    var next = EoiCode + 1
    def reset(): Unit = { dict.clear(); next = EoiCode + 1; codeSize = MinCodeSize + 1 }
    emit(ClearCode)
    var prefix = -1
    var i = 0
    while (i < data.length) {
      val k = data(i) & 0xff
      if (prefix < 0) prefix = k
      else {
        val key = Integer.valueOf((prefix << 8) | k)
        val hit = dict.get(key)
        if (hit != null) prefix = hit.intValue()
        else {
          emit(prefix)
          dict.put(key, Integer.valueOf(next))
          // width grows when the entry VALUED 2^codeSize is added: the
          // JDK decoder adds the same entry one reception later and bumps
          // its width right before the next read (GIFImageReader:
          // `if (tableIndex == (1 << codeSize))`), so widths stay in sync
          if (next == (1 << codeSize) && codeSize < 12) codeSize += 1
          next += 1
          // table full (entry 4095 just added): clear IMMEDIATELY — the
          // decoder is one entry behind and must see the clear before any
          // code that would push its table past 4095
          if (next == MaxTableSize) { emit(ClearCode); reset() }
          prefix = k
        }
      }
      i += 1
    }
    if (prefix >= 0) emit(prefix)
    emit(EoiCode)
    if (nBits > 0) out.write((bitBuf & 0xff).toInt)
    out.toByteArray
  }

  private def le16(v: Int): Array[Byte] = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)

  /** Animated GIF89a from same-sized index frames over the grayscale
    * global palette. Frames must be non-empty and share (width, height)
    * (each pixel byte is a palette index, used as-is). */
  def encode(width: Int, height: Int, frames: Seq[Array[Byte]]): Array[Byte] = {
    require(width >= 1 && width <= 0xffff && height >= 1 && height <= 0xffff,
      s"bad dimensions ${width}x$height")
    require(frames.nonEmpty, "at least one frame")
    frames.foreach(f => require(f.length == width * height,
      s"frame raster ${f.length} != ${width * height}"))
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    // logical screen descriptor: global color table present, 8 bits/channel,
    // 2^(7+1)=256 entries
    out.write(le16(width)); out.write(le16(height))
    out.write(0xf7); out.write(0); out.write(0)
    var c = 0
    while (c < 256) { out.write(c); out.write(c); out.write(c); c += 1 }
    frames.foreach { raster =>
      // graphic control extension: disposal 1 (leave in place), no
      // transparency, 4/100 s delay — the animation metadata a real
      // multi-frame asset carries
      out.write(Array[Byte](0x21, 0xf9.toByte, 4, 0x04, 4, 0, 0, 0))
      // image descriptor: full-screen frame, no local table, not interlaced
      out.write(0x2c)
      out.write(le16(0)); out.write(le16(0))
      out.write(le16(width)); out.write(le16(height))
      out.write(0)
      out.write(MinCodeSize)
      val lzw = lzwEncode(raster)
      var off = 0
      while (off < lzw.length) {
        val n = math.min(255, lzw.length - off)
        out.write(n)
        out.write(lzw, off, n)
        off += n
      }
      out.write(0) // block terminator
    }
    out.write(0x3b) // trailer
    out.toByteArray
  }

  /** Decode via the JDK's own GIF plugin (independent LZW + container
    * walk). Returns every frame's dimensions and index raster (the red
    * channel of the decoded pixels — identical to the palette index
    * under the grayscale table). */
  def decode(bytes: Array[Byte]): Vector[Frame] = {
    ImageIo.noDiskCache
    val readers = javax.imageio.ImageIO.getImageReadersByFormatName("gif")
    require(readers.hasNext, "no GIF reader in this JDK")
    val reader = readers.next()
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      reader.setInput(iis, false, true)
      val n = reader.getNumImages(true)
      require(n >= 1, "no frames decoded")
      (0 until n).iterator.map { i =>
        val img = reader.read(i)
        val w = img.getWidth
        val h = img.getHeight
        val argb = img.getRGB(0, 0, w, h, null, 0, w)
        val idx = new Array[Byte](w * h)
        var p = 0
        while (p < idx.length) { idx(p) = ((argb(p) >> 16) & 0xff).toByte; p += 1 }
        Frame(w, h, idx)
      }.toVector
    } finally {
      reader.dispose()
      iis.close()
    }
  }
}
