package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.KeyBytes

/** The whole merge-routing stack rests on KeyBytes being order-preserving:
  * unsigned byte comparison of the encodings must agree with the native
  * order of the values (signed longs; Spark UTF8String order for strings). */
class KeyBytesSpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(42)

  test("long encoding preserves signed order, including extremes") {
    val interesting = Seq(Long.MinValue, Long.MinValue + 1, -1L, 0L, 1L,
      Long.MaxValue - 1, Long.MaxValue)
    val xs = interesting ++ Seq.fill(2000)(rnd.nextLong())
    for (a <- interesting; b <- xs) {
      val got = math.signum(KeyBytes.compare(KeyBytes.fromLong(a), KeyBytes.fromLong(b)))
      assert(got === math.signum(java.lang.Long.compare(a, b)), s"$a vs $b")
    }
    val pairs = Seq.fill(5000)((rnd.nextLong(), rnd.nextLong()))
    pairs.foreach { case (a, b) =>
      val got = math.signum(KeyBytes.compare(KeyBytes.fromLong(a), KeyBytes.fromLong(b)))
      assert(got === math.signum(java.lang.Long.compare(a, b)), s"$a vs $b")
    }
  }

  test("string encoding matches Spark's UTF8String binary order") {
    def randStr(): String = {
      val n = rnd.nextInt(12)
      new String((0 until n).map { _ =>
        rnd.nextInt(4) match {
          case 0 => (rnd.nextInt(95) + 32).toChar       // ascii
          case 1 => (rnd.nextInt(0x7ff - 0x80) + 0x80).toChar // 2-byte utf8
          case 2 => (0x4e00 + rnd.nextInt(100)).toChar  // 3-byte utf8
          case _ => "0123456789abcdef-".charAt(rnd.nextInt(17)) // uuid-ish
        }
      }.toArray)
    }
    val pairs = Seq.fill(5000)((randStr(), randStr()))
    pairs.foreach { case (a, b) =>
      val got = math.signum(KeyBytes.compare(
        KeyBytes.fromString(a), KeyBytes.fromString(b)))
      val want = math.signum(
        org.apache.spark.unsafe.types.UTF8String.fromString(a)
          .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(b)))
      assert(got === want, s"${a.toList} vs ${b.toList}")
    }
  }

  test("expandNonCut is identity for disjoint ranges, absorbs straddles") {
    // ranges [0,9] [10,19] [20,29]: disjoint → identity
    def enc(i: Int) = KeyBytes.fromLong(i.toLong)
    val mins = Array(0, 10, 20); val maxs = Array(9, 19, 29)
    assert(KeyBytes.expandNonCut(3, i => enc(mins(i)), i => enc(maxs(i)), Set(1)) === Set(1))
    // straddle at both boundaries of unit 1 → transitive absorption
    val maxS = Array(10, 20, 29) // max(0)==min(1), max(1)==min(2)
    assert(KeyBytes.expandNonCut(3, i => enc(mins(i)), i => enc(maxS(i)), Set(0)) ===
      Set(0, 1, 2))
    // empty dirty set stays empty regardless of straddles
    assert(KeyBytes.expandNonCut(3, i => enc(mins(i)), i => enc(maxS(i)), Set.empty) ===
      Set.empty[Int])
  }
}
