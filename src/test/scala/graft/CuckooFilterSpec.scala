package graft

import graft.operators.{CuckooFilter, SeenFilter}
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

class CuckooFilterSpec extends AnyFunSuite {

  test("no false negatives at target load") {
    val n = 50000
    val cf = CuckooFilter.create(n)
    val keys = new Random(7).shuffle((1L to n.toLong).toVector)
    keys.foreach(cf.putLong)
    assert(!cf.overflowed)
    assert(cf.size == n)
    assert(keys.forall(cf.mightContainLong))
  }

  test("false positive rate is far below the bloom config's 1e-2") {
    val n = 50000
    val cf = CuckooFilter.create(n)
    (1L to n.toLong).foreach(cf.putLong)
    val probes = 100000
    val fp = (1 to probes).count(i => cf.mightContainLong(n + 1000000L + i))
    // 16-bit fingerprints, 4-slot buckets: theory ~ 2*4/2^16 = 1.2e-4
    assert(fp.toDouble / probes < 0.001, s"fpr=${fp.toDouble / probes}")
  }

  test("delete removes membership; re-insert restores it") {
    val cf = CuckooFilter.create(10000)
    (1L to 1000L).foreach(cf.putLong)
    (1L to 1000L).foreach(k => assert(cf.deleteLong(k)))
    assert(cf.size == 0)
    // after deleting every inserted key, residual hits are pure fingerprint
    // collisions — essentially none at this load
    val residual = (1L to 1000L).count(cf.mightContainLong)
    assert(residual < 5, s"residual=$residual")
    cf.putLong(42L)
    assert(cf.mightContainLong(42L))
  }

  test("merge folds disjoint filters; geometry mismatch rejected") {
    val a = CuckooFilter.create(20000)
    val b = CuckooFilter.create(20000)
    (1L to 5000L).foreach(a.putLong)
    (5001L to 10000L).foreach(b.putLong)
    a.mergeInPlace(b)
    assert(!a.overflowed)
    assert((1L to 10000L).forall(a.mightContainLong))
    assert(a.size == 10000)
    intercept[IllegalArgumentException](a.mergeInPlace(CuckooFilter.create(500000)))
  }

  test("overflow degrades to maybe-everything, never a false negative") {
    val tiny = CuckooFilter.create(64)
    (1L to 10000L).foreach(tiny.putLong)
    assert(tiny.overflowed)
    assert((1L to 10000L).forall(tiny.mightContainLong))
    assert(tiny.mightContainLong(999999999L)) // everything is maybe-seen
    assert(!tiny.deleteLong(1L)) // deletes refuse once degraded
  }

  test("SeenFilter factory wires both kinds; unknown kind rejected") {
    val bloom = SeenFilter.factory("bloom", 1000, 0.01)()
    val cuckoo = SeenFilter.factory("cuckoo", 1000, 0.01)()
    Seq(bloom, cuckoo).foreach { f =>
      (1L to 100L).foreach(f.putLong)
      assert((1L to 100L).forall(f.mightContainLong))
      val other = f match {
        case _: SeenFilter.BloomSeen => SeenFilter.factory("bloom", 1000, 0.01)()
        case _ => SeenFilter.factory("cuckoo", 1000, 0.01)()
      }
      (101L to 200L).foreach(other.putLong)
      f.mergeInPlace(other)
      assert((1L to 200L).forall(f.mightContainLong))
    }
    intercept[IllegalArgumentException](SeenFilter.factory("xor", 1000, 0.01))
  }
}
