package graft.sketch

import org.scalatest.funsuite.AnyFunSuite

/** CMS/Bloom pre-agg builders must be byte-identical to direct adds:
  * CMS counters sum and Bloom bits OR, both commutative, so table
  * deferral cannot change the final image. */
class PreAggSpec extends AnyFunSuite {

  private def keys(n: Int, vocab: Int, seed0: Long): Array[Long] = {
    var s = seed0
    Array.fill(n) {
      s ^= s << 13; s ^= s >>> 7; s ^= s << 17
      math.abs(s) % vocab
    }
  }

  test("cms builder bytes == direct bytes (long keys, incl. drain epochs)") {
    for ((n, vocab) <- Seq((200000, 5000), (400000, 300000))) {
      val ks = keys(n, vocab, 0xabcdefL)
      val direct = CountMinSketch(5, 2048)
      ks.foreach(direct.add(_))
      val b = new CmsBuilder(CountMinSketch(5, 2048))
      ks.foreach(b.add)
      assert(java.util.Arrays.equals(b.result().serialize(), direct.serialize()),
        s"n=$n vocab=$vocab")
    }
  }

  test("cms builder interleaves long and byte keys exactly") {
    val direct = CountMinSketch(5, 1024)
    val b = new CmsBuilder(CountMinSketch(5, 1024))
    var i = 0
    while (i < 50000) {
      val k = (i % 777).toLong
      direct.add(k)
      b.add(k)
      if (i % 3 == 0) {
        val bytes = s"s${i % 123}".getBytes("UTF-8")
        direct.addHash(WangHash.mixBytes(bytes, CountMinSketch.Seed1),
          WangHash.mixBytes(bytes, CountMinSketch.Seed2), 1L)
        b.addBytes(WangHash.mixBytes(bytes, CountMinSketch.Seed1),
          WangHash.mixBytes(bytes, CountMinSketch.Seed2))
      }
      i += 1
    }
    assert(java.util.Arrays.equals(b.result().serialize(), direct.serialize()))
  }

  test("bloom builder bytes == direct bytes; merge == sequential") {
    val ksA = keys(120000, 40000, 7L)
    val ksB = keys(120000, 40000, 8L)
    val direct = BloomSketch(1L << 16, 5)
    (ksA ++ ksB).foreach(direct.add(_))
    val a = new BloomBuilder(BloomSketch(1L << 16, 5))
    ksA.foreach(a.add)
    val b = new BloomBuilder(BloomSketch(1L << 16, 5))
    ksB.foreach(b.add)
    a.mergeInPlace(b)
    assert(java.util.Arrays.equals(a.result().serialize(), direct.serialize()))
  }

  test("power-of-two-strided raw keys do not cluster the table") {
    // CMS/Bloom tally user keys directly; ids with a 2^k stride all
    // share low bits. The Fibonacci slot hash must keep probes O(1) —
    // without it this test is quadratic (~10^10 probe steps) and hangs
    val n = 150000
    val direct = CountMinSketch(5, 2048)
    val b = new CmsBuilder(CountMinSketch(5, 2048))
    val t0 = System.nanoTime()
    var i = 0
    while (i < n) {
      val k = (i % 100000).toLong << 16
      direct.add(k)
      b.add(k)
      i += 1
    }
    val sec = (System.nanoTime() - t0) / 1e9
    assert(java.util.Arrays.equals(b.result().serialize(), direct.serialize()))
    assert(sec < 30.0, f"strided keys took $sec%.1f s — table is clustering")
  }

  test("packed layout: 40-bit keys stay packed, high-bit key migrates once") {
    val b = new CqfBuilder(Cqf(10, 40, invertible = true, compact = true))
    (0 until 10000).foreach(i => b.add((i % 700).toLong))
    assert(b.packedMode, "40-bit hashes must use the packed slot layout")
    val w = new CqfBuilder(Cqf(10, 64))
    w.add(1L) // hashBits=64: first hash has high bits set w.h.p.
    (0 until 10000).foreach(i => w.add((i % 700).toLong))
    assert(!w.packedMode, "64-bit hashes must migrate to the wide layout")
    assert(w.result().totalCount == 10001L)
  }

  test("mid-stream packed->wide migration loses no counts (CMS bytes)") {
    // raw user keys: small ints pack; the first key >= 2^40 migrates the
    // live table. Builder bytes must still equal direct adds.
    val direct = CountMinSketch(5, 2048)
    val b = new CmsBuilder(CountMinSketch(5, 2048))
    var i = 0
    while (i < 60000) {
      val k = if (i == 30000) (1L << 50) + 7 else (i % 900).toLong
      direct.add(k); b.add(k)
      i += 1
    }
    assert(!b.packedMode)
    assert(java.util.Arrays.equals(b.result().serialize(), direct.serialize()))
  }

  test("24-bit count overflow folds early; sums stay exact (CQF bytes)") {
    val direct = Cqf(10, 40, invertible = true, compact = true)
    val b = new CqfBuilder(Cqf(10, 40, invertible = true, compact = true))
    var s = 0x1234L
    var i = 0
    while (i < 5000) {
      s ^= s << 13; s ^= s >>> 7; s ^= s << 17
      val k = math.abs(s) % 97
      // counts straddling the 24-bit packed field, incl. > 2^24 at once
      val c = if (i % 17 == 0) (1L << 24) + (s & 0xffff) else (s & 0x7fffff)
      direct.insert(k, c); b.addHash(direct.keyHash(k), c)
      i += 1
    }
    assert(b.packedMode, "40-bit keys with big counts must stay packed")
    assert(java.util.Arrays.equals(b.result().serialize(), direct.serialize()))
  }

  test("negative counts are rejected before they can smear packed slots") {
    val b = new CqfBuilder(Cqf(10, 40, invertible = true, compact = true))
    b.addHash(42L, 3L)
    // a negative count OR-ed into a packed slot would overwrite the key
    // field with sign bits; the drain would then fold garbage silently
    intercept[IllegalArgumentException](b.addHash(42L, -1L))
    intercept[IllegalArgumentException](b.addHash(7L, Long.MinValue))
    assert(b.result().totalCount == 3L)
  }

  test("builders stay usable after result() (window eval pattern)") {
    val direct = CountMinSketch(3, 256)
    val b = new CmsBuilder(CountMinSketch(3, 256))
    var i = 0
    while (i < 3000) {
      direct.add((i % 41).toLong)
      b.add((i % 41).toLong)
      if (i % 250 == 0)
        assert(java.util.Arrays.equals(b.result().serialize(), direct.serialize()))
      i += 1
    }
    assert(java.util.Arrays.equals(b.result().serialize(), direct.serialize()))
  }
}
