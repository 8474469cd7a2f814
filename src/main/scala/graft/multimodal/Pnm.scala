package graft.multimodal

/** Shared header grammar for the binary PNM family (P6 = [[Ppm]],
  * P5 = [[Pgm]]): magic, whitespace/comment handling, and decimal
  * fields — ONE definition so a grammar fix can never diverge between
  * the two codecs.
  */
private[multimodal] object Pnm {

  /** Parsed header: dimensions and the offset of the first raster
    * byte. `maxval` is validated to 255 here. */
  final case class Header(width: Int, height: Int, rasterStart: Int)

  /** Parse `P<digit> <width> <height> <maxval>` + one separator byte.
    * None on wrong magic, malformed/overflowing numbers, or a maxval
    * other than 255. Never throws — corrupt blobs are data. */
  def parseHeader(bytes: Array[Byte], magic: Char): Option[Header] = {
    if (bytes == null || bytes.length < 2 ||
      bytes(0) != 'P' || bytes(1) != magic) return None
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
    // Accumulate in Long and saturate: header fields are
    // attacker-controlled, and Int accumulation wraps on >32-bit
    // values (4294967297 reads as 1), silently bypassing the size
    // guards downstream. Saturated values fail the w/h range check.
    def readInt(): Long = {
      skipWs()
      var v = -1L
      while (i < bytes.length && bytes(i) >= '0' && bytes(i) <= '9') {
        if (v < Int.MaxValue)
          v = math.max(v, 0L) * 10L + (bytes(i) - '0')
        i += 1
      }
      v
    }
    val w = readInt(); val h = readInt(); val maxv = readInt()
    i += 1 // exactly one whitespace byte separates maxval from raster
    if (w <= 0 || w > Int.MaxValue || h <= 0 || h > Int.MaxValue ||
      maxv != 255L || i > bytes.length) None
    else Some(Header(w.toInt, h.toInt, i))
  }
}
