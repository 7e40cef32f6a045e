package graft.sketch

import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable
import scala.util.Random

/** Round-2 kernel regressions: set_count(0) deletion semantics across
  * rebuilds, merge flag reconciliation, the mergeBy closure surface, and
  * the aligned zipItems enumeration. */
class CqfRound2Spec extends AnyFunSuite {

  test("setCount(hash, 0) deletes: iteration skips, grow rebuild stays well-formed") {
    // two keys sharing quotient 3 (q=4, r=8); zero the LARGER remainder —
    // the run's last entry, exactly the case where a rebuild's append
    // cursor used to drop the runend and corrupt the filter
    val cqf = Cqf(4, 12, invertible = false)
    val hLow = (3L << 8) | 5L
    val hHigh = (3L << 8) | 9L
    cqf.insertHash(hLow, 1L)
    cqf.insertHash(hHigh, 4L)
    cqf.setCountHash(hHigh, 0L)
    assert(cqf.queryHash(hLow) == 1L)
    assert(cqf.queryHash(hHigh) == 0L)
    assert(cqf.iterator.toList == List((hLow, 1L)))
    // force grow (rebuild through the iterator/append cursor)
    val rnd = new Random(1)
    val extra = mutable.Map[Long, Long](hLow -> 1L)
    while (cqf.quotientBits == 4) {
      val h = rnd.nextLong() & WangHash.mask(12)
      if (h != hHigh) {
        cqf.insertHash(h, 1L)
        extra(h) = extra.getOrElse(h, 0L) + 1L
      }
    }
    assert(cqf.queryHash(hHigh) == 0L, "deleted key resurfaced after grow")
    extra.foreach { case (h, c) =>
      assert(cqf.queryHash(h) == c, s"hash $h corrupted after grow")
    }
    assert(cqf.iterator.map(_._2).forall(_ > 0L))
    // merge with a zero-count entry present must also stay clean
    val other = Cqf(4, 12, invertible = false)
    other.insertHash(hHigh, 7L)
    other.setCountHash(hHigh, 0L)
    other.insertHash(hLow, 2L)
    cqf.mergeInPlace(other)
    assert(cqf.queryHash(hLow) == 3L)
    assert(cqf.queryHash(hHigh) == 0L)
  }

  test("setCount on absent key with count 0 is a no-op") {
    val cqf = Cqf(6, 20)
    cqf.setCount(123L, 0L)
    assert(cqf.count(123L) == 0L)
    assert(cqf.distinctCount == 0L)
  }

  test("merge reconciles invertible flag with AND") {
    val inv = Cqf(6, 30, invertible = true)
    (1L to 50L).foreach(inv.insert(_))
    val nonInv = Cqf(6, 30, invertible = false)
    nonInv.insertBytes("hello".getBytes, 3L)
    assert(inv.invertible)
    inv.mergeInPlace(nonInv)
    assert(!inv.invertible, "merging a byte-keyed sketch must clear invertible")
    intercept[IllegalArgumentException](inv.keyIterator)
    // merging an EMPTY non-invertible sketch keeps recoverability (no
    // unrecoverable keys were actually added)
    val inv2 = Cqf(6, 30, invertible = true)
    inv2.insert(9L)
    inv2.mergeInPlace(Cqf(6, 30, invertible = false))
    assert(inv2.invertible)
    assert(Cqf.merge(inv2, nonInv).invertible == false)
  }

  test("merge reconciles compact flag: compact + wide widens via rebuild") {
    val compact = Cqf(6, 30, invertible = true, compact = true)
    (1L to 40L).foreach(compact.insert(_))
    val wide = Cqf(6, 30, invertible = true, compact = false)
    (30L to 70L).foreach(wide.insert(_))
    compact.mergeInPlace(wide)
    assert(!compact.compact, "compact ∧ wide must widen")
    (1L to 29L).foreach(k => assert(compact.count(k) == 1L))
    (30L to 40L).foreach(k => assert(compact.count(k) == 2L))
    (41L to 70L).foreach(k => assert(compact.count(k) == 1L))
    // round-trip keeps the reconciled flags
    val rt = Cqf.deserialize(compact.serialize())
    assert(!rt.compact && rt.invertible)
  }

  test("mergeBy user closure: weighted combine against a Map oracle") {
    val rnd = new Random(42)
    val a = Cqf(8, 28)
    val b = Cqf(8, 28)
    val ma = mutable.Map.empty[Long, Long]
    val mb = mutable.Map.empty[Long, Long]
    for (_ <- 1 to 300) {
      val k = rnd.nextInt(200).toLong
      if (rnd.nextBoolean()) { a.insert(k); ma(k) = ma.getOrElse(k, 0L) + 1 }
      else { b.insert(k); mb(k) = mb.getOrElse(k, 0L) + 1 }
    }
    val weighted = Cqf.mergeBy(a, b, (x, y) => x + 2 * y)
    val keys = (ma.keySet ++ mb.keySet)
    keys.foreach { k =>
      val want = ma.getOrElse(k, 0L) + 2 * mb.getOrElse(k, 0L)
      assert(weighted.count(k) == want, s"key $k")
    }
    assert(weighted.totalCount == keys.toSeq.map(k =>
      ma.getOrElse(k, 0L) + 2 * mb.getOrElse(k, 0L)).sum)
  }

  test("mergeBy of compact filters keeps remainderBits <= 32 (no slot saturation)") {
    // regression: the result-sizing loop used to start at q=6 even for
    // compact (32-bit-slot) inputs with hashBits=40, giving remainderBits
    // = 34 — stored remainders saturated at 2^32-1 and distinct hashes
    // collapsed. A small intersection of two legal compact filters is
    // exactly the shape that triggered it.
    val a = Cqf(12, 40, invertible = true, compact = true)
    val b = Cqf(12, 40, invertible = true, compact = true)
    (1L to 200L).foreach(k => a.insert(k))
    (150L to 350L).foreach(k => b.insert(k, 2L))
    val inter = a.intersect(b)
    assert(inter.compact)
    assert(inter.hashBits - inter.quotientBits <= 32,
      s"remainderBits ${inter.hashBits - inter.quotientBits} overflow 32-bit slots")
    assert(inter.distinctCount == 51L)
    (150L to 200L).foreach(k => assert(inter.count(k) == 1L, s"key $k"))
    (1L to 149L).foreach(k => assert(inter.count(k) == 0L, s"key $k"))
    (201L to 350L).foreach(k => assert(inter.count(k) == 0L, s"key $k"))
    // diff on the same shapes
    val d = a.diff(b)
    assert(d.distinctCount == 149L && d.count(100L) == 1L && d.count(150L) == 0L)
  }

  test("zipItems: aligned full-outer enumeration matches two-map join") {
    val rnd = new Random(7)
    val a = Cqf(8, 28)
    val b = Cqf(8, 28)
    val ma = mutable.Map.empty[Long, Long]
    val mb = mutable.Map.empty[Long, Long]
    for (_ <- 1 to 500) {
      val k = rnd.nextInt(150).toLong
      if (rnd.nextInt(3) > 0) { a.insert(k); ma(k) = ma.getOrElse(k, 0L) + 1 }
      if (rnd.nextInt(3) == 0) { b.insert(k, 2L); mb(k) = mb.getOrElse(k, 0L) + 2 }
    }
    val zipped = Cqf.zipItems(a, b).toList
    // ascending hashes, no dups
    assert(zipped.map(_._1) == zipped.map(_._1).distinct.sorted)
    val got = zipped.map { case (h, ca, cb) => (WangHash.unhash(h, 28), ca, cb) }
      .map { case (k, ca, cb) => k -> ((ca, cb)) }.toMap
    val wantKeys = ma.keySet ++ mb.keySet
    assert(got.keySet == wantKeys)
    wantKeys.foreach { k =>
      assert(got(k) == ((ma.getOrElse(k, 0L), mb.getOrElse(k, 0L))), s"key $k")
    }
  }

  test("negative counts are rejected at every entry point") {
    val c = Cqf(8, 32, invertible = true, compact = false)
    c.insert(5L, 2L)
    intercept[IllegalArgumentException](c.insert(5L, -1L))
    intercept[IllegalArgumentException](c.insertHash(c.keyHash(5L), Long.MinValue))
    intercept[IllegalArgumentException](c.setCount(5L, -3L))
    assert(c.count(5L) == 2L)
    c.setCount(5L, 0L) // deletion by overwrite stays legal
    assert(c.count(5L) == 0L)
  }

  test("set_count grows instead of throwing when opening a count slot at capacity") {
    // fill a tiny filter to its load cap with multiplicity-1 keys, then
    // set_count on present keys to force count-slot creation: the
    // cushion cannot hold them all, so the path must grow (as insert
    // does), not escape with the kernel's internal FullException
    val c = Cqf(4, 20, invertible = true, compact = false)
    val keys = (0L until 14L).toArray
    keys.foreach(k => c.insert(k))
    keys.foreach(k => c.setCount(k, 1000L + k))
    keys.foreach(k => assert(c.count(k) == 1000L + k, s"key $k"))
  }

  test("corrupt serialized headers fail as clean parse errors") {
    val c = Cqf(8, 32, invertible = true, compact = false)
    (0L until 50L).foreach(k => c.insert(k))
    val ok = c.serialize()
    assert(Cqf.deserialize(ok).totalCount == 50L)
    // corrupt the meta long (quotientBits byte -> 255)
    val badQ = ok.clone(); badQ(8) = 0xff.toByte
    intercept[IllegalArgumentException](Cqf.deserialize(badQ))
    // truncated payload: length field no longer matches the buffer
    val trunc = java.util.Arrays.copyOf(ok, ok.length - 16)
    intercept[IllegalArgumentException](Cqf.deserialize(trunc))
    // forged compact flag with remainders wider than 32 bits: would
    // silently saturate distinct remainders together (false negatives)
    val cc = Cqf(10, 40, invertible = false, compact = true)
    (0L until 20L).foreach(k => cc.insert(k))
    val img = cc.serialize()
    // meta long at offset 8: qBits byte 0, hashBits byte 1 — widen
    // hashBits to 60 so hashBits - qBits = 50 > 32 with compact set
    val forged = img.clone(); forged(9) = 60.toByte
    val e = intercept[IllegalArgumentException](Cqf.deserialize(forged))
    assert(e.getMessage.contains("compact"), e.getMessage)
  }

  test("a hot last-quotient cluster crossing the cushion grows instead of crashing") {
    // quotient 1023 (the LAST at q=10) with count slots: each entry uses
    // 2 slots, so ~161 entries extend the run past numRealSlots while
    // occupiedSlots stays far under the 95% load cap — the insert that
    // lands exactly one past the final real slot must surface as
    // FullException -> grow, not ArrayIndexOutOfBounds (findFirstEmptySlot
    // and runEnd previously bounds-checked only their post-jump positions)
    val c = Cqf(10, 64, invertible = false, compact = false)
    var r = 0L
    while (r < 400L) {
      c.insertHash((1023L << 54) | r, 2L)
      r += 1
    }
    assert(c.distinctCount == 400L)
    assert(c.totalCount == 800L)
    assert(c.queryHash((1023L << 54) | 123L) == 2L)
    assert(c.queryHash((1023L << 54) | 399L) == 2L)
    assert(c.quotientBits > 10, "the cushion crossing must have forced a grow")
  }
}
