package graft.multimodal

/** A REAL image codec for the one raster format that needs no native
  * library: binary PPM (P6). This replaces the byte-arithmetic stub for
  * the image decode path — the parser reads the actual on-disk format
  * (magic, comment-tolerant ASCII header, raw RGB raster) and everything
  * it reports (dimensions, maxval, channel sums) comes from the parsed
  * payload, not from metadata columns riding alongside it.
  *
  * Format (Netpbm spec): `P6` magic, then three ASCII decimal integers
  * (width, height, maxval ≤ 255 for the 1-byte-per-sample variant), any
  * of which may be separated by runs of whitespace and `#`-to-end-of-line
  * comments, then EXACTLY ONE whitespace byte, then `3*width*height` raw
  * sample bytes in R,G,B order, row-major.
  */
object PpmCodec {

  final case class PpmImage(width: Int, height: Int, maxval: Int, raster: Array[Byte])

  /** Encode a raster as binary PPM. The header deliberately includes a
    * comment line so every fixture payload exercises the parser's
    * comment-skipping path, and uses mixed separators (space + newline)
    * as real writers do. */
  def encode(width: Int, height: Int, maxval: Int, raster: Array[Byte]): Array[Byte] = {
    require(raster.length == 3 * width * height,
      s"raster must be 3*w*h bytes, got ${raster.length} for ${width}x$height")
    require(maxval > 0 && maxval <= 255, s"1-byte PPM needs 0<maxval<=255, got $maxval")
    val header = s"P6\n# graft fixture\n$width $height\n$maxval\n"
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val out = new Array[Byte](header.length + raster.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(raster, 0, out, header.length, raster.length)
    out
  }

  private def isSpace(b: Byte): Boolean =
    b == ' ' || b == '\n' || b == '\r' || b == '\t' || b == '\f' || b == 0x0b

  /** Parse a binary PPM payload. Throws IllegalArgumentException on
    * malformed input (bad magic, missing header fields, out-of-range
    * maxval, short raster) — a quarantine-read wrapper turns throws into
    * dropped rows at scale, same discipline as the PERMISSIVE parquet
    * path in [[graft.operators.Formats]]. */
  def decode(bytes: Array[Byte]): PpmImage = {
    var pos = 0
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"malformed PPM at byte $pos: $msg")
    def skipSeparators(): Unit = {
      var progressed = true
      while (progressed) {
        progressed = false
        while (pos < bytes.length && isSpace(bytes(pos))) { pos += 1; progressed = true }
        if (pos < bytes.length && bytes(pos) == '#') {
          while (pos < bytes.length && bytes(pos) != '\n') pos += 1
          progressed = true
        }
      }
    }
    def readInt(): Int = {
      skipSeparators()
      if (pos >= bytes.length || bytes(pos) < '0' || bytes(pos) > '9')
        fail("expected ASCII integer")
      var v = 0L
      while (pos < bytes.length && bytes(pos) >= '0' && bytes(pos) <= '9') {
        v = v * 10 + (bytes(pos) - '0')
        if (v > Int.MaxValue) fail("header integer overflow")
        pos += 1
      }
      v.toInt
    }
    if (bytes.length < 2 || bytes(0) != 'P' || bytes(1) != '6') fail("bad magic, want P6")
    pos = 2
    val w = readInt()
    val h = readInt()
    val maxval = readInt()
    if (w <= 0 || h <= 0) fail(s"non-positive dimensions ${w}x$h")
    if (maxval <= 0 || maxval > 255) fail(s"unsupported maxval $maxval")
    // exactly one whitespace byte between header and raster (spec); a
    // comment is not legal here
    if (pos >= bytes.length || !isSpace(bytes(pos))) fail("expected single separator before raster")
    pos += 1
    val n = 3 * w * h
    if (bytes.length - pos < n) fail(s"raster short: need $n bytes, have ${bytes.length - pos}")
    val raster = java.util.Arrays.copyOfRange(bytes, pos, pos + n)
    PpmImage(w, h, maxval, raster)
  }
}
