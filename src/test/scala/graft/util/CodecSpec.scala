package graft.util

import org.scalatest.funsuite.AnyFunSuite

class CodecSpec extends AnyFunSuite {
  private val rnd = new scala.util.Random(42)

  test("delta varint round-trip for strictly ascending docIds") {
    (1 to 200).foreach { _ =>
      val n = 1 + rnd.nextInt(400)
      val xs = Array.fill(n)(math.abs(rnd.nextLong()) % (1L << 40))
        .distinct.sorted
      val enc = VarInt.encodeDeltas(xs, xs.head)
      assert(VarInt.decodeDeltas(enc, xs.length, xs.head).toSeq === xs.toSeq)
    }
  }

  test("plain varint round-trip for int arrays incl. extremes") {
    (1 to 200).foreach { _ =>
      val n = 1 + rnd.nextInt(300)
      val xs = Array.fill(n)(rnd.nextInt(Int.MaxValue)) ++ Array(0, 1, Int.MaxValue)
      val enc = VarInt.encodeInts(xs)
      assert(VarInt.decodeInts(enc, xs.length).toSeq === xs.toSeq)
    }
  }

  test("PFor round-trip: ascending docId deltas at 128-block sizes") {
    (1 to 300).foreach { _ =>
      val n = 1 + rnd.nextInt(128)
      val xs = Array.fill(n + 4)(math.abs(rnd.nextLong()) % (1L << 40))
        .distinct.sorted.take(math.max(n, 1))
      val enc = PFor.encodeDeltas(xs, xs.head)
      assert(PFor.decodeDeltas(enc, xs.length, xs.head).toSeq === xs.toSeq)
    }
  }

  test("PFor round-trip: tf ints with outliers (exception patches)") {
    (1 to 300).foreach { _ =>
      val n = 1 + rnd.nextInt(128)
      // mostly tiny values + a few huge outliers — the PFor sweet spot
      val xs = Array.fill(n)(
        if (rnd.nextInt(10) == 0) rnd.nextInt(Int.MaxValue) else 1 + rnd.nextInt(7))
      val enc = PFor.encodeInts(xs)
      assert(PFor.decodeInts(enc, xs.length).toSeq === xs.toSeq)
    }
    // edge widths: all-zero, all-equal, single value, 64-bit max deltas
    assert(PFor.decode(PFor.encode(Array.fill(100)(0L)), 100).forall(_ == 0L))
    assert(PFor.decode(PFor.encode(Array.fill(128)(5L)), 128).forall(_ == 5L))
    assert(PFor.decode(PFor.encode(Array(Long.MaxValue)), 1).head == Long.MaxValue)
    val mix = Array(0L, Long.MaxValue, 1L, (1L << 62) + 3L)
    assert(PFor.decode(PFor.encode(mix), 4).toSeq === mix.toSeq)
  }

  test("PFor packs small-delta blocks tighter than varint") {
    val xs = (0 until 128).scanLeft(1000000L)((a, _) => a + 1 + rnd.nextInt(3)).toArray
    val pfor = PFor.encodeDeltas(xs, xs.head)
    val vint = VarInt.encodeDeltas(xs, xs.head)
    assert(pfor.length < vint.length,
      s"pfor=${pfor.length} vint=${vint.length}")
  }

  test("positions round-trip (per-doc ascending lists, empty docs ok)") {
    (1 to 200).foreach { _ =>
      val docs = rnd.nextInt(50)
      val ps = Array.fill(docs)(
        Array.fill(1 + rnd.nextInt(20))(rnd.nextInt(100000)).distinct.sorted)
      val tfs = ps.map(_.length)
      val enc = VarInt.encodePositions(ps)
      val dec = VarInt.decodePositions(enc, tfs)
      assert(dec.map(_.toSeq).toSeq === ps.map(_.toSeq).toSeq)
    }
  }
}
