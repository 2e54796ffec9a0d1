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
