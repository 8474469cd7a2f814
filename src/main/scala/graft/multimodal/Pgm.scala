package graft.multimodal

/** A REAL image codec, dependency-free: binary PGM (P5) — the
  * grayscale sibling of [[Ppm]]: ASCII header `P5 <width> <height>
  * <maxval>` then a raw 1-byte-per-pixel raster. Decodes to the same
  * RGB [[Ppm.Image]] (gray replicated into all three channels) so
  * every downstream transform — features, resize, re-encode — works
  * unchanged on grayscale inputs.
  */
object Pgm {

  def encode(width: Int, height: Int, gray: Array[Byte]): Array[Byte] = {
    require(gray.length == width * height,
      s"raster size ${gray.length} != ${width}x$height")
    val header = s"P5\n$width $height\n255\n"
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val out = new Array[Byte](header.length + gray.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(gray, 0, out, header.length, gray.length)
    out
  }

  /** Parse a P5 image into an RGB [[Ppm.Image]]; None on anything
    * malformed (never throws — corrupt blobs are data, not errors).
    * Same header grammar as P6: comments (#...) and arbitrary
    * whitespace, one separator byte before the raster. */
  def decode(bytes: Array[Byte]): Option[Ppm.Image] = {
    if (bytes == null || bytes.length < 2 ||
      bytes(0) != 'P' || bytes(1) != '5') return None
    var i = 2
    def skipWs(): Unit = {
      var go = true
      while (go && i < bytes.length) {
        if (bytes(i) == '#') {
          while (i < bytes.length && bytes(i) != '\n') i += 1
        } else if (Character.isWhitespace(bytes(i))) i += 1
        else go = false
      }
    }
    def readInt(): Int = {
      skipWs()
      var v = -1
      while (i < bytes.length && bytes(i) >= '0' && bytes(i) <= '9') {
        v = math.max(v, 0) * 10 + (bytes(i) - '0'); i += 1
      }
      v
    }
    val w = readInt(); val h = readInt(); val maxv = readInt()
    i += 1 // exactly one whitespace byte separates maxval from raster
    // Long arithmetic: w and h are attacker-controlled; w*h can wrap Int
    val need = w.toLong * h.toLong
    if (w <= 0 || h <= 0 || maxv != 255 || need * 3L > Int.MaxValue ||
      bytes.length - i < need) return None
    val rgb = new Array[Byte]((need * 3L).toInt)
    var p = 0
    while (p < need.toInt) {
      val g = bytes(i + p)
      rgb(p * 3) = g; rgb(p * 3 + 1) = g; rgb(p * 3 + 2) = g
      p += 1
    }
    Some(Ppm.Image(w, h, rgb))
  }
}
