package graft.sketch

import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable
import scala.util.Random

/** Differential tests of the CQF kernel against an exact Map oracle —
  * the reference's own test strategy (/root/reference/src/main.rs:107-221)
  * plus the merge/serialization/grow properties it leaves untested.
  */
class CqfSpec extends AnyFunSuite {

  test("WangHash golden vectors and inverse") {
    // goldens computed independently (python) from the published Wang mix
    assert(WangHash.hash(0L, 32) == 4290886808L)
    assert(WangHash.hash(1L, 32) == 3079993582L)
    assert(WangHash.hash(12345L, 32) == 3735309896L)
    assert(WangHash.hash(12345L, 46) == 9038029359715L)
    assert(WangHash.hash(0L, 46) == 32931379264518L)
    assert(WangHash.hash(1L, 64) == 6614235796240398542L)
    assert(WangHash.hash(-1L, 64) == 2272383144869939092L)
    val rnd = new Random(7)
    for (bits <- Seq(16, 24, 32, 46, 63, 64); _ <- 1 to 500) {
      val v = rnd.nextLong() & WangHash.mask(bits)
      val h = WangHash.hash(v, bits)
      assert((h & WangHash.mask(bits)) == h)
      assert(WangHash.unhash(h, bits) == v, s"bits=$bits v=$v")
    }
  }

  private def fillAndCheck(q: Int, hashBits: Int, nKeys: Int,
      dupMod: Long, seed: Long, viaCounts: Boolean = false,
      compact: Boolean = false): Unit = {
    val rnd = new Random(seed)
    val cqf = Cqf(q, hashBits, invertible = true, compact = compact)
    val oracle = mutable.Map.empty[Long, Long]
    var i = 0
    while (i < nKeys) {
      var k = rnd.nextLong() & WangHash.mask(hashBits)
      if (dupMod > 0) k = k % dupMod
      val c = if (viaCounts) 1L + rnd.nextInt(5) else 1L
      cqf.insert(k, c)
      oracle(k) = oracle.getOrElse(k, 0L) + c
      i += 1
    }
    // point queries exact (invertible hash ⇒ no collisions)
    oracle.foreach { case (k, c) =>
      assert(cqf.count(k) == c, s"q=$q hb=$hashBits key=$k")
    }
    // absent keys ⇒ 0
    for (_ <- 1 to 200) {
      val k = rnd.nextLong() & WangHash.mask(hashBits)
      if (!oracle.contains(k)) assert(cqf.count(k) == 0L)
    }
    // enumeration: sorted by hash, keys recoverable, counts exact, complete
    var prev = -1L
    var n = 0
    cqf.iterator.foreach { case (h, c) =>
      assert(java.lang.Long.compareUnsigned(prev, h) < 0 || n == 0,
        "iteration not ascending")
      prev = h
      val k = WangHash.unhash(h, hashBits)
      assert(oracle(k) == c, s"enumerated count mismatch for key $k")
      n += 1
    }
    assert(n == oracle.size, s"enumerated $n of ${oracle.size} keys")
  }

  test("insert/query/enumerate vs Map oracle, unique-ish keys") {
    for (q <- Seq(8, 12, 16); hb <- Seq(q + 8, 46, 64))
      fillAndCheck(q, hb, nKeys = (0.90 * (1 << q)).toInt, dupMod = 0, seed = q * 100 + hb)
  }

  test("insert/query/enumerate vs Map oracle, heavy duplicates (counters)") {
    // mirrors the binary's % 10000 duplication (/root/reference/src/main.rs:96-105)
    for (q <- Seq(8, 12, 16); hb <- Seq(46, 64))
      fillAndCheck(q, hb, nKeys = (0.90 * (1 << q)).toInt, dupMod = 1000, seed = q + hb)
  }

  test("insert with count parameter > 1") {
    for (q <- Seq(8, 12); hb <- Seq(46, 64))
      fillAndCheck(q, hb, nKeys = (0.80 * (1 << q)).toInt, dupMod = 500,
        seed = 42 + q, viaCounts = true)
  }

  test("count=0 insert is a no-op") {
    val cqf = Cqf(8, 64)
    cqf.insert(5L, 0L)
    assert(cqf.count(5L) == 0L)
    assert(cqf.occupiedSlots == 0L)
  }

  test("setCount overwrites, inserts when absent") {
    val rnd = new Random(11)
    val cqf = Cqf(8, 46)
    val oracle = mutable.Map.empty[Long, Long]
    for (_ <- 1 to 150) {
      val k = rnd.nextLong() & WangHash.mask(46)
      val op = rnd.nextInt(3)
      if (op == 0) { cqf.insert(k, 3); oracle(k) = oracle.getOrElse(k, 0L) + 3 }
      else { val c = 1L + rnd.nextInt(10); cqf.setCount(k, c); oracle(k) = c }
    }
    oracle.foreach { case (k, c) => assert(cqf.count(k) == c) }
  }

  test("auto-grow: filter exceeds initial capacity and stays exact") {
    val cqf = Cqf(6, 64)
    val oracle = mutable.Map.empty[Long, Long]
    val rnd = new Random(99)
    for (_ <- 1 to 5000) {
      val k = rnd.nextLong() % 2000
      cqf.insert(k)
      oracle(k) = oracle.getOrElse(k, 0L) + 1
    }
    assert(cqf.quotientBits > 6)
    oracle.foreach { case (k, c) => assert(cqf.count(k) == c) }
    assert(cqf.iterator.size == oracle.size)
  }

  test("merge == sequential build; associative; any split") {
    val rnd = new Random(5)
    for (parts <- Seq(2, 3, 8)) {
      val keys = Array.fill(4000)(rnd.nextLong() % 3000)
      val seq = Cqf(8, 64)
      keys.foreach(seq.insert(_))
      val cqfs = Array.fill(parts)(Cqf(8, 64))
      keys.zipWithIndex.foreach { case (k, i) => cqfs(i % parts).insert(k) }
      // left fold merge
      val m1 = cqfs.map(c => Cqf.deserialize(c.serialize()))
        .reduceLeft((a, b) => a.mergeInPlace(b))
      // right fold merge (different association order)
      val m2 = cqfs.map(c => Cqf.deserialize(c.serialize()))
        .reduceRight((a, b) => b.mergeInPlace(a))
      val want = seq.iterator.toList
      assert(m1.iterator.toList == want, s"parts=$parts left fold")
      assert(m2.iterator.toList == want, s"parts=$parts right fold")
    }
  }

  test("merge of different quotientBits (post-grow partials)") {
    val rnd = new Random(21)
    val a = Cqf(6, 64)
    val b = Cqf(10, 64)
    val seq = Cqf(8, 64)
    val oracle = mutable.Map.empty[Long, Long]
    for (i <- 1 to 3000) {
      val k = rnd.nextLong() % 1500
      (if (i % 2 == 0) a else b).insert(k)
      seq.insert(k)
      oracle(k) = oracle.getOrElse(k, 0L) + 1
    }
    val m = a.mergeInPlace(b)
    assert(m.iterator.toList == seq.iterator.toList)
    oracle.foreach { case (k, c) => assert(m.count(k) == c) }
  }

  test("inserts after merge stay consistent (offset exactness)") {
    val rnd = new Random(31)
    val a = Cqf(6, 64); val b = Cqf(6, 64)
    val oracle = mutable.Map.empty[Long, Long]
    for (_ <- 1 to 800) {
      val k = rnd.nextLong() % 400
      a.insert(k); oracle(k) = oracle.getOrElse(k, 0L) + 1
    }
    for (_ <- 1 to 800) {
      val k = rnd.nextLong() % 400
      b.insert(k); oracle(k) = oracle.getOrElse(k, 0L) + 1
    }
    val m = a.mergeInPlace(b)
    for (_ <- 1 to 500) {
      val k = rnd.nextLong() % 800
      m.insert(k); oracle(k) = oracle.getOrElse(k, 0L) + 1
    }
    oracle.foreach { case (k, c) => assert(m.count(k) == c, s"key $k") }
    val keys = m.keyIterator.map(_._1).toSet
    assert(keys == oracle.keySet)
  }

  test("serialize/deserialize round-trip") {
    val rnd = new Random(13)
    val cqf = Cqf(10, 46)
    for (_ <- 1 to 900) cqf.insert(rnd.nextLong() & WangHash.mask(46), 1 + rnd.nextInt(3))
    val back = Cqf.deserialize(cqf.serialize())
    assert(back == cqf)
    assert(back.iterator.toList == cqf.iterator.toList)
  }

  test("intersect and diff via sorted zip") {
    val a = Cqf(8, 64); val b = Cqf(8, 64)
    val ma = mutable.Map.empty[Long, Long]; val mb = mutable.Map.empty[Long, Long]
    val rnd = new Random(17)
    for (_ <- 1 to 1000) { val k = rnd.nextInt(300).toLong; a.insert(k); ma(k) = ma.getOrElse(k, 0L) + 1 }
    for (_ <- 1 to 1000) { val k = (150 + rnd.nextInt(300)).toLong; b.insert(k); mb(k) = mb.getOrElse(k, 0L) + 1 }
    val inter = a.intersect(b)
    val dif = a.diff(b)
    (ma.keySet ++ mb.keySet).foreach { k =>
      val ca = ma.getOrElse(k, 0L); val cb = mb.getOrElse(k, 0L)
      assert(inter.count(k) == (if (ca > 0 && cb > 0) math.min(ca, cb) else 0L), s"intersect $k")
      assert(dif.count(k) == math.max(ca - cb, 0L), s"diff $k")
    }
  }

  test("mixed workload: inserts, setCount, merges, grow interleaved") {
    val rnd = new Random(123)
    var cqf = Cqf(6, 64)
    val oracle = mutable.Map.empty[Long, Long]
    for (round <- 1 to 6) {
      for (_ <- 1 to 700) {
        val k = rnd.nextLong() % (200 * round)
        val c = 1L + rnd.nextInt(4)
        cqf.insert(k, c); oracle(k) = oracle.getOrElse(k, 0L) + c
      }
      val other = Cqf(6, 64)
      for (_ <- 1 to 300) {
        val k = rnd.nextLong() % 500
        other.insert(k); oracle(k) = oracle.getOrElse(k, 0L) + 1
      }
      cqf = cqf.mergeInPlace(other)
      for (_ <- 1 to 50) {
        val k = rnd.nextLong() % 500
        val c = 1L + rnd.nextInt(9)
        cqf.setCount(k, c); oracle(k) = c
      }
    }
    oracle.foreach { case (k, c) => assert(cqf.count(k) == c, s"key $k") }
    assert(cqf.keyIterator.map(_._1).toSet == oracle.keySet)
    assert(cqf.totalCount == oracle.values.sum)
  }

  test("compact (u32-slot) mode: differential parity with wide mode") {
    // compact requires remainderBits <= 32, so hashBits <= q + 32
    for (q <- Seq(8, 12); hb <- Seq(q + 8, q + 32))
      fillAndCheck(q, hb, nKeys = (0.85 * (1 << q)).toInt, dupMod = 700,
        seed = 7 * q + hb, viaCounts = true, compact = true)
  }

  test("compact mode: merge, serde, grow, saturation") {
    val rnd = new Random(77)
    val a = Cqf(8, 32, invertible = true, compact = true)
    val b = Cqf(8, 32, invertible = true, compact = true)
    val oracle = mutable.Map.empty[Long, Long]
    for (_ <- 1 to 3000) {
      val k = (rnd.nextLong() & WangHash.mask(32)) % 600
      (if (rnd.nextBoolean()) a else b).insert(k)
      oracle(k) = oracle.getOrElse(k, 0L) + 1
    }
    val m = a.mergeInPlace(b)
    assert(m.compact)
    assert(m.quotientBits > 8) // grew
    oracle.foreach { case (k, c) => assert(m.count(k) == c) }
    val back = Cqf.deserialize(m.serialize())
    assert(back == m && back.compact)
    assert(m.sizeBytes < Cqf(m.quotientBits, 32).sizeBytes,
      "compact must be smaller than wide at equal q")
    // count saturation at 2^32-1 (reference U32Cqf truncates; we saturate)
    val s = Cqf(8, 32, invertible = true, compact = true)
    s.insert(5L, 0xffffffffL - 1)
    s.insert(5L, 10)
    assert(s.count(5L) == 0xffffffffL)
  }

  test("false-positive rate measured against the published bound") {
    // CQF paper (Pandey et al. SIGMOD'17): for random absent keys the
    // false-positive probability is δ ≈ n / 2^hash_bits. MEASURE the
    // rate at two hash widths and pin it inside [bound/2, 2x bound]
    // (δ·trials in the hundreds-to-thousands, so Poisson noise is a few
    // percent); also assert zero false negatives
    for ((hb, nKeys) <- Seq((16, 900), (20, 900))) {
      val cqf = Cqf(10, hb, invertible = false)
      val rnd = new Random(3 + hb)
      val present = mutable.Set.empty[Long]
      for (_ <- 1 to nKeys) {
        val k = rnd.nextLong()
        cqf.insertHash(WangHash.hash(k, hb), 1)
        present += WangHash.hash(k, hb)
      }
      present.foreach(h => assert(cqf.queryHash(h) > 0, "false negative!"))
      val bound = present.size.toDouble / (1L << hb).toDouble
      val trials = 200000
      var fp = 0
      for (_ <- 1 to trials) {
        // a fresh random 64-bit key is absent with probability ~1: the
        // filter claiming presence IS the false positive (its masked
        // hash collided with a present key's). The filter must also be
        // exact at the hash level: presence claims match the hash set
        val h = WangHash.hash(rnd.nextLong(), hb)
        val claimed = cqf.queryHash(h) > 0
        assert(claimed == present.contains(h),
          s"hash-level exactness violated at hb=$hb hash=$h")
        if (claimed) fp += 1
      }
      val rate = fp.toDouble / trials
      assert(rate <= 2.0 * bound,
        f"hb=$hb: FP rate $rate%.6f above 2x published bound $bound%.6f")
      assert(rate >= bound / 2.0,
        f"hb=$hb: FP rate $rate%.6f implausibly below bound $bound%.6f — test is vacuous")
    }
  }
}
