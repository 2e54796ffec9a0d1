package graft.util

/** Lossy int↔byte quantization used for per-document field-length norms.
  *
  * Re-implements (from the published algorithm, not copied source) the
  * behavior of Lucene's `SmallFloat#intToByte4` / `byte4ToInt`
  * [U lucene/core/src/java/org/apache/lucene/util/SmallFloat.java]:
  * a 4-bit-mantissa floating-point byte. Values 0..15 are exact; larger
  * values keep the top 4 significant bits (≤ ~6.7% relative error).
  * BM25 scoring consumes the *decoded* (quantized) length, so score
  * identity with the reference requires this exact rounding behavior
  * (SURVEY.md §7.4).
  */
object SmallFloat {

  /** Encode a non-negative int into the 4-bit-mantissa byte. Monotone. */
  def intToByte4(i: Int): Byte = {
    require(i >= 0, s"only non-negative values accepted: $i")
    val numBits = 32 - Integer.numberOfLeadingZeros(i)
    if (numBits < 4) i.toByte
    else {
      val shift = numBits - 4
      val encoded = ((i >>> shift) & 0x07) | ((shift + 1) << 3)
      encoded.toByte
    }
  }

  /** Decode the quantized byte back to the representative int. */
  def byte4ToInt(b: Byte): Int = {
    val i = b & 0xFF
    val bits = i & 0x07
    val shift = (i >>> 3) - 1
    if (shift == -1) bits else (bits | 0x08) << shift
  }

  /** Decoded length per possible norm byte (Lucene's LENGTH_TABLE). */
  val LengthTable: Array[Int] = Array.tabulate(256)(i => byte4ToInt(i.toByte))
}
