package graft.util

import org.scalatest.funsuite.AnyFunSuite

class SmallFloatSpec extends AnyFunSuite {
  private def cases: Iterator[Int] = {
    val rnd = new scala.util.Random(42)
    Iterator.range(0, 4096) ++
      Iterator.fill(5000)(rnd.nextInt(Int.MaxValue))
  }

  test("exact for 0..15 (4-bit mantissa free values)") {
    (0 to 15).foreach { i =>
      assert(SmallFloat.byte4ToInt(SmallFloat.intToByte4(i)) === i)
    }
  }

  test("idempotent: dec(enc(dec(b))) == dec(b) for all canonical bytes") {
    // bytes 232..255 are non-canonical (decode overflows int, exactly
    // as the reference's int arithmetic; encode never produces them)
    (0 until 256).foreach { i =>
      val decoded = SmallFloat.byte4ToInt(i.toByte)
      if (decoded >= 0)
        assert(SmallFloat.byte4ToInt(SmallFloat.intToByte4(decoded)) === decoded)
    }
  }

  test("monotone, rounds down, bounded relative error (<12.5%)") {
    cases.foreach { i =>
      val d = SmallFloat.byte4ToInt(SmallFloat.intToByte4(i))
      assert(d <= i)
      assert((SmallFloat.intToByte4(i) & 0xFF) <= (SmallFloat.intToByte4(i + 1) & 0xFF))
      if (i >= 16) assert((i - d).toDouble / i < 0.125)
    }
  }
}
