package graft.util

import java.nio.ByteBuffer

/** Delta + variable-length integer codec for posting blocks.
  *
  * The reference packs postings as 128-entry blocks of delta-encoded
  * doc ids + term frequencies (FOR bit-packing with a VInt tail block)
  * [U lucene/core/.../codecs/lucene84/Lucene84PostingsWriter.java,
  * ForUtil.java]. BASELINE.json's north_star pins "delta-encoded
  * varint/PForDelta blocks" for OUR format — we pin delta-varint
  * (bytes are ours; only query results must match the reference,
  * SURVEY.md §2.3).
  */
object VarInt {

  /** Append an unsigned LEB128 varint. */
  def write(out: ByteBuilder, v0: Long): Unit = {
    var v = v0
    require(v >= 0, s"varint requires non-negative: $v0")
    while ((v & ~0x7FL) != 0L) {
      out += ((v & 0x7F) | 0x80).toByte
      v >>>= 7
    }
    out += v.toByte
  }

  /** Delta-encode a strictly increasing Long array (first value encoded
    * as delta from `base`). */
  def encodeDeltas(values: Array[Long], base: Long): Array[Byte] = {
    val out = new ByteBuilder(values.length * 2)
    var prev = base
    var i = 0
    while (i < values.length) {
      write(out, values(i) - prev)
      prev = values(i)
      i += 1
    }
    out.result()
  }

  def decodeDeltas(bytes: Array[Byte], n: Int, base: Long): Array[Long] = {
    val out = new Array[Long](n)
    var prev = base
    var pos = 0
    var i = 0
    while (i < n) {
      var shift = 0
      var v = 0L
      var b = bytes(pos); pos += 1
      while ((b & 0x80) != 0) {
        v |= (b & 0x7FL) << shift
        shift += 7
        b = bytes(pos); pos += 1
      }
      v |= (b & 0x7FL) << shift
      prev += v
      out(i) = prev
      i += 1
    }
    out
  }

  /** Plain (non-delta) varints, e.g. term frequencies. */
  def encodeInts(values: Array[Int]): Array[Byte] = {
    val out = new ByteBuilder(values.length * 2)
    var i = 0
    while (i < values.length) { write(out, values(i).toLong); i += 1 }
    out.result()
  }

  def decodeInts(bytes: Array[Byte], n: Int): Array[Int] = {
    val out = new Array[Int](n)
    var pos = 0
    var i = 0
    while (i < n) {
      var shift = 0
      var v = 0L
      var b = bytes(pos); pos += 1
      while ((b & 0x80) != 0) {
        v |= (b & 0x7FL) << shift
        shift += 7
        b = bytes(pos); pos += 1
      }
      v |= (b & 0x7FL) << shift
      out(i) = v.toInt
      i += 1
    }
    out
  }

  /** Per-doc position lists, each delta-encoded; lengths come from the
    * tf array (positions-per-doc == tf), mirroring the reference's
    * .pos stream layout [U Lucene84PostingsWriter]. */
  def encodePositions(positions: Array[Array[Int]]): Array[Byte] = {
    val out = new ByteBuilder(positions.length * 4)
    var d = 0
    while (d < positions.length) {
      val ps = positions(d)
      var prev = 0
      var i = 0
      while (i < ps.length) {
        write(out, (ps(i) - prev).toLong)
        prev = ps(i)
        i += 1
      }
      d += 1
    }
    out.result()
  }

  def decodePositions(bytes: Array[Byte], tfs: Array[Int]): Array[Array[Int]] = {
    val out = new Array[Array[Int]](tfs.length)
    var pos = 0
    var d = 0
    while (d < tfs.length) {
      val n = tfs(d)
      val ps = new Array[Int](n)
      var prev = 0
      var i = 0
      while (i < n) {
        var shift = 0
        var v = 0L
        var b = bytes(pos); pos += 1
        while ((b & 0x80) != 0) {
          v |= (b & 0x7FL) << shift
          shift += 7
          b = bytes(pos); pos += 1
        }
        v |= (b & 0x7FL) << shift
        prev += v.toInt
        ps(i) = prev
        i += 1
      }
      out(d) = ps
      d += 1
    }
    out
  }
}

/** Minimal growable byte buffer (avoids boxing of ArrayBuilder in hot loops). */
final class ByteBuilder(initial: Int) {
  private var buf = new Array[Byte](math.max(initial, 16))
  private var len = 0
  def +=(b: Byte): Unit = {
    if (len == buf.length) {
      val nb = new Array[Byte](buf.length * 2)
      System.arraycopy(buf, 0, nb, 0, len)
      buf = nb
    }
    buf(len) = b
    len += 1
  }
  def result(): Array[Byte] = java.util.Arrays.copyOf(buf, len)
  /** Bytes currently buffered (for RAM-budget accounting). */
  def size: Int = len
}
