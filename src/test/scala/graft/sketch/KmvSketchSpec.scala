package graft.sketch

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Invariant tests for the bottom-k (KMV) distinct sketch. The structure
  * is a pure function of the distinct key SET (not of row order,
  * partitioning, or merge shape), so most checks are exact:
  *   - below capacity the retained set IS the distinct set (estimate,
  *     sample and jaccard all exact);
  *   - at capacity the retained hashes are exactly the k smallest of
  *     the full hash set (checked against a brute-force sort);
  *   - merge under any tree == build over the union, and merge is
  *     idempotent;
  *   - the estimator lands within published bounds on fixed-seed data.
  */
class KmvSketchSpec extends AnyFunSuite {

  private def build(keys: Seq[Long], k: Int = 64): KmvSketch = {
    val s = KmvSketch(k)
    keys.foreach(s.add)
    s
  }

  test("below capacity: exact distinct, full deterministic sample") {
    val s = KmvSketch(64)
    val keys = (0 until 40).map(i => (i % 20).toLong) // 20 distinct, repeated
    keys.foreach(s.add)
    assert(s.isExact)
    assert(s.size == 20)
    assert(s.estimateLong == 20L)
    assert(s.errBound == 0.0)
    val sampled = s.sample(64).map(_._1).toSet
    assert(sampled == (0 until 20).map(_.toLong).toSet)
  }

  test("at capacity: retained hashes are exactly the k smallest (brute force)") {
    val k = 32
    val keys = (0L until 5000L)
    val s = build(keys, k)
    assert(!s.isExact && s.size == k)
    val expect = keys
      .map(x => WangHash.mix64(x, KmvSketch.KeySeed) ^ Long.MinValue)
      .sorted.take(k).map(h => h ^ Long.MinValue).toVector
    // serialize writes raw hashes in ascending unsigned order
    val img = java.nio.ByteBuffer.wrap(s.serialize())
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    img.position(32)
    val got = Vector.fill(k) { val h = img.getLong(); img.getLong(); h }
    assert(got == expect)
  }

  test("insertion order and duplication never change the state") {
    val rnd = new Random(7)
    val keys = Vector.fill(3000)(rnd.nextLong() % 500)
    val a = build(keys, 48)
    val b = build(rnd.shuffle(keys ++ keys), 48)
    assert(a == b)
  }

  test("estimator within 4 standard errors on fixed-seed uniform keys") {
    val rnd = new Random(42)
    for (k <- Seq(64, 256, 1024)) {
      val n = 50000
      val keys = Vector.fill(n)(rnd.nextLong())
      val distinct = keys.distinct.size
      val s = build(keys, k)
      val rse = 1.0 / math.sqrt((k - 2).toDouble)
      assert(math.abs(s.estimate - distinct) <= 4 * rse * distinct,
        s"k=$k est=${s.estimate} true=$distinct")
      assert(s.errBound == rse)
    }
  }

  test("merge under random trees == sequential build; merge is idempotent") {
    val rnd = new Random(11)
    val keys = Vector.fill(8000)(rnd.nextLong() % 3000)
    val whole = build(keys, 96)
    for (trial <- 0 until 5) {
      val r = new Random(100 + trial)
      val parts = keys.groupBy(_ => r.nextInt(7)).values.toVector
      var sketches = r.shuffle(parts.map(p => build(p, 96)))
      while (sketches.size > 1) {
        val i = r.nextInt(sketches.size - 1)
        val merged = sketches(i).mergeInPlace(sketches(i + 1))
        sketches = (sketches.take(i) :+ merged) ++ sketches.drop(i + 2)
      }
      assert(sketches.head == whole, s"trial $trial")
    }
    assert(whole.copied.mergeInPlace(whole.copied) == whole)
  }

  test("serialization round-trips exactly (long and byte keys)") {
    val a = build((0L until 1000L).toVector, 40)
    assert(KmvSketch.deserialize(a.serialize()) == a)
    val b = KmvSketch(32)
    (0 until 500).foreach(i => b.addBytes(s"doc-${i % 90}".getBytes("UTF-8")))
    b.markTextKeys()
    val back = KmvSketch.deserialize(b.serialize())
    assert(back == b)
    assert(back.textKeys && back.bytesMode)
    assert(back.sample(5).map(t => new String(t._2, "UTF-8")).toSeq ==
      b.sample(5).map(t => new String(t._2, "UTF-8")).toSeq)
  }

  test("jaccard exact below capacity, within bound at capacity") {
    // A = [0, 600), B = [300, 900): true J = 300 / 900 = 1/3
    val aKeys = (0L until 600L)
    val bKeys = (300L until 900L)
    val aEx = build(aKeys, 1024)
    val bEx = build(bKeys, 1024)
    assert(aEx.isExact && bEx.isExact)
    assert(math.abs(aEx.jaccard(bEx) - 1.0 / 3.0) < 1e-12)
    assert(math.abs(bEx.jaccard(aEx) - 1.0 / 3.0) < 1e-12)
    // at capacity: k << distinct, bound ~ O(1/sqrt(k))
    val k = 256
    val aCap = build(aKeys.flatMap(x => Seq(x, x)), k)
    val bCap = build(bKeys, k)
    assert(!aCap.isExact && !bCap.isExact)
    assert(math.abs(aCap.jaccard(bCap) - 1.0 / 3.0) <= 4.0 / math.sqrt(k.toDouble),
      s"jaccard ${aCap.jaccard(bCap)}")
    // identical sketches: J == 1 exactly, disjoint: J == 0 exactly
    assert(aCap.jaccard(aCap.copied) == 1.0)
    val disj = build((100000L until 101000L), k)
    assert(build(aKeys, k).jaccard(disj) == 0.0)
    // empty-set conventions
    assert(KmvSketch(64).jaccard(KmvSketch(64)) == 1.0)
    assert(KmvSketch(1024).jaccard(aEx) == 0.0)
  }

  test("mixed exact/capacity jaccard stays sound") {
    // small exact side vs large capacity side with known overlap
    val small = build((0L until 100L), 256) // exact
    val big = build((50L until 5000L), 256) // at capacity
    val trueJ = 50.0 / 5000.0
    assert(math.abs(small.jaccard(big) - trueJ) <= 4.0 / math.sqrt(256.0))
  }

  test("empty accumulator adopts byte mode; text flag survives only when both text") {
    val empty = KmvSketch(32)
    val b = KmvSketch(32)
    Seq("x", "y", "z").foreach(s => b.addBytes(s.getBytes("UTF-8")))
    b.markTextKeys()
    val m = empty.mergeInPlace(b)
    assert(m.bytesMode && m.textKeys && m.size == 3)
    val raw = KmvSketch(32)
    raw.addBytes(Array[Byte](1, 2, 3)) // raw binary, NOT text
    val m2 = m.mergeInPlace(raw)
    assert(!m2.textKeys, "text flag must not survive a raw-binary merge")
  }

  test("mode mixing is rejected") {
    val s = KmvSketch(32)
    s.add(1L)
    intercept[IllegalArgumentException](s.addBytes("a".getBytes("UTF-8")))
    val b = KmvSketch(32)
    b.addBytes("a".getBytes("UTF-8"))
    intercept[IllegalArgumentException](s.mergeInPlace(b))
    // jaccard across modes would silently read ~0.0 (disjoint hash
    // domains) for identical underlying sets — same guard as merge
    intercept[IllegalArgumentException](s.jaccard(b))
    // k mismatch: a STATELESS side is a merge identity (adopts the other),
    // real state on both sides still rejects
    assert(KmvSketch(32).mergeInPlace(KmvSketch(64)).size == 0)
    val r32 = KmvSketch(32); r32.add(1L)
    val r64 = KmvSketch(64); r64.add(2L)
    intercept[IllegalArgumentException](r32.mergeInPlace(r64))
  }

  test("exactly k distinct keys: full but still exact; k+1st key flips it") {
    val k = 64
    val s = KmvSketch(k)
    (0L until k.toLong).foreach(s.add)
    assert(s.size == k)
    assert(s.isExact, "a full sketch that never dropped a hash is exact")
    assert(s.estimateLong == k.toLong && s.errBound == 0.0)
    // duplicates of retained keys change nothing, in either reject path
    (0L until k.toLong).foreach(s.add)
    assert(s.isExact && s.estimateLong == k.toLong)
    // round-trips: the wire image must carry the distinction (size alone
    // cannot tell full-but-exact from evicted)
    assert(KmvSketch.deserialize(s.serialize()).isExact)
    s.add(k.toLong) // 65th distinct key: either evicts or is rejected
    assert(!s.isExact && s.errBound > 0.0)
    assert(!KmvSketch.deserialize(s.serialize()).isExact)
  }

  test("merge tracks exactness: union == k stays exact, union > k does not") {
    val k = 64
    val a = build((0L until 32L), k)
    val b = build((32L until 64L), k)
    val m = a.copied.mergeInPlace(b)
    assert(m.size == k && m.isExact && m.estimateLong == 64L)
    // one extra distinct key anywhere in the tree poisons exactness
    val c = build(Seq(999L), k)
    val m2 = m.copied.mergeInPlace(c)
    assert(!m2.isExact)
    // and an evicted input propagates through a small union
    val ev = build((0L until 200L), k)
    assert(!ev.isExact)
    assert(!build(Seq(1L), k).mergeInPlace(ev.copied).isExact)
  }

  test("shallowCopied merge target leaves the source operand untouched") {
    val a = build((0L until 500L), 48)
    val b = build((300L until 800L), 48)
    val aImg = a.serialize()
    val u = a.shallowCopied.mergeInPlace(b)
    assert(u.size == 48)
    assert(java.util.Arrays.equals(a.serialize(), aImg),
      "mergeInPlace on a shallow copy must not write into the shared arrays")
  }

  test("hostile byte images are rejected before allocation") {
    val good = build((0L until 100L), 32).serialize()
    def corrupt(mut: java.nio.ByteBuffer => Unit): Array[Byte] = {
      val img = good.clone()
      mut(java.nio.ByteBuffer.wrap(img).order(java.nio.ByteOrder.LITTLE_ENDIAN))
      img
    }
    // bad magic
    intercept[IllegalArgumentException](
      KmvSketch.deserialize(corrupt(_.putLong(0, 0xdeadbeefL))))
    // k out of range / corrupt high word
    intercept[IllegalArgumentException](
      KmvSketch.deserialize(corrupt(_.putLong(8, 4L))))
    intercept[IllegalArgumentException](
      KmvSketch.deserialize(corrupt(_.putLong(8, (1L << 40) | 32L))))
    // size > k, size negative, hostile huge size on a tiny image
    intercept[IllegalArgumentException](
      KmvSketch.deserialize(corrupt(_.putLong(16, 33L))))
    intercept[IllegalArgumentException](
      KmvSketch.deserialize(corrupt(_.putLong(16, -1L))))
    // bad key mode
    intercept[IllegalArgumentException](
      KmvSketch.deserialize(corrupt(_.putLong(24, 3L))))
    // non-ascending hashes (swap the first two entries' hash words)
    intercept[IllegalArgumentException](KmvSketch.deserialize(corrupt { b =>
      val h0 = b.getLong(32); val h1 = b.getLong(48)
      b.putLong(32, h1); b.putLong(48, h0)
    }))
    // truncated image
    intercept[IllegalArgumentException](
      KmvSketch.deserialize(good.take(40)))
    // byte-key image with a hostile length
    val bs = KmvSketch(16)
    bs.addBytes("abc".getBytes("UTF-8"))
    val bimg = bs.serialize()
    val blen = java.nio.ByteBuffer.wrap(bimg).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    blen.putInt(32 + 16, Int.MaxValue) // length field of entry 0
    intercept[IllegalArgumentException](KmvSketch.deserialize(bimg))
    // every truncation point of a byte-mode image (including inside the
    // variable-length section) must reject cleanly, not BufferUnderflow
    val bimg2 = bs.serialize()
    var cut = bimg2.length - 1
    while (cut >= 8) {
      intercept[IllegalArgumentException](KmvSketch.deserialize(bimg2.take(cut)))
      cut -= 1
    }
    // forged evicted flag on a below-capacity image (`good` is full, so
    // the flag is legal there — forge it on a 10-entry sketch instead)
    val small = build((0L until 10L), 32).serialize()
    java.nio.ByteBuffer.wrap(small).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putLong(24, 4L) // evicted flag, size 10 < k 32
    intercept[IllegalArgumentException](KmvSketch.deserialize(small))
    // high garbage bits in the mode word
    intercept[IllegalArgumentException](
      KmvSketch.deserialize(corrupt(_.putLong(24, 1L << 32))))
  }
}
