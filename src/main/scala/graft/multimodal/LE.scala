package graft.multimodal

/** Little-endian field readers shared by the binary codecs (WAV, BMP)
  * — one definition so byte-order plumbing cannot drift per format. */
private[multimodal] object LE {
  def u16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)

  /** Unsigned 32-bit as Long — the safe variant for size fields that
    * feed allocation/bounds arithmetic. */
  def u32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)

  /** Signed 32-bit (two's complement). */
  def s32(b: Array[Byte], i: Int): Int = u32(b, i).toInt
}
