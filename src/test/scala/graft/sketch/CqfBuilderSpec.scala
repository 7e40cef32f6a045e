package graft.sketch

import org.scalatest.funsuite.AnyFunSuite

/** The pre-aggregation builder must be observably indistinguishable from
  * direct per-token inserts — same content AND same serialized bytes
  * (CQF placement is canonical in content, so the bytes only diverge if
  * the builder loses or double-counts something). */
class CqfBuilderSpec extends AnyFunSuite {

  private def xorshift(s0: Long): Long = {
    var s = s0
    s ^= s << 13; s ^= s >>> 7; s ^= s << 17
    s
  }

  private def zipfTokens(n: Int, vocab: Int, seed0: Long): Array[Long] = {
    val a = new Array[Long](n)
    var seed = seed0
    var i = 0
    while (i < n) {
      seed = xorshift(seed)
      val u = (seed >>> 11).toDouble / 9007199254740992.0
      a(i) = (math.pow(u, 2.5) * vocab).toLong
      i += 1
    }
    a
  }

  test("byte-identical to direct inserts (zipf, wide and compact)") {
    for (compact <- Seq(false, true)) {
      val toks = zipfTokens(400000, 50000, 0xfeedbeefL)
      val direct = Cqf(10, 40, invertible = true, compact = compact)
      toks.foreach(direct.insert(_))
      val b = CqfBuilder(10, 40, invertible = true, compact = compact)
      toks.foreach(b.add)
      val built = b.result()
      assert(built.totalCount == toks.length)
      assert(java.util.Arrays.equals(built.serialize(), direct.serialize()),
        s"compact=$compact builder bytes differ from direct bytes")
    }
  }

  test("high-distinct stream crosses the max-table drain epochs") {
    // 300k distinct keys >> the 2^17-slot table: forces several full
    // drain+refill cycles; every count must survive them
    val n = 600000
    val direct = Cqf(10, 64)
    val b = CqfBuilder(10, 64)
    var i = 0
    while (i < n) {
      val k = i % 300000 // every key exactly twice
      direct.insert(k.toLong)
      b.add(k.toLong)
      i += 1
    }
    val built = b.result()
    assert(built.distinctCount == 300000L)
    assert(built.totalCount == n.toLong)
    assert(java.util.Arrays.equals(built.serialize(), direct.serialize()))
  }

  test("string keys route through the same byte-fold hash") {
    val keys = (0 until 5000).map(i => s"doc-${i % 700}".getBytes("UTF-8"))
    val direct = Cqf(8, 64, invertible = false)
    keys.foreach(direct.insertBytes(_))
    val b = CqfBuilder(8, 64, invertible = false)
    keys.foreach(b.addBytes)
    assert(java.util.Arrays.equals(b.result().serialize(), direct.serialize()))
  }

  test("result() keeps the builder usable (window-frame eval pattern)") {
    val b = CqfBuilder(8, 64)
    val direct = Cqf(8, 64)
    var i = 0
    while (i < 2000) {
      b.add(i % 37L)
      direct.insert(i % 37L)
      if (i % 100 == 0) {
        // eval mid-stream, as running window frames do
        assert(java.util.Arrays.equals(b.result().serialize(), direct.serialize()))
      }
      i += 1
    }
    assert(java.util.Arrays.equals(b.result().serialize(), direct.serialize()))
  }

  test("builder merge == sequential build (content)") {
    // bytes can differ here: mergeInPlace sizes the rebuild from the SUM
    // of both sides' occupancy (overlap double-counted), so its q may
    // exceed the sequential build's by one — a pre-existing Cqf merge
    // property, not a builder one. Content must be identical.
    val toksA = zipfTokens(120000, 20000, 1L)
    val toksB = zipfTokens(120000, 20000, 2L)
    val seq = Cqf(10, 40)
    (toksA ++ toksB).foreach(seq.insert(_))
    val a = CqfBuilder(10, 40)
    toksA.foreach(a.add)
    val b = CqfBuilder(10, 40)
    toksB.foreach(b.add)
    a.mergeInPlace(b)
    assert(a.result().iterator.sameElements(seq.iterator))
  }

  test("cardinality-dominated streams trip the bypass; bytes stay identical") {
    // ~all-distinct keys: the first max-cap drain must observe dup<1.25
    // and route subsequent tallies straight to the kernel
    val n = 200000
    val direct = Cqf(10, 64)
    val b = CqfBuilder(10, 64)
    var i = 0
    while (i < n) {
      direct.insert(i.toLong)
      b.add(i.toLong)
      i += 1
    }
    assert(b.bypassed, "expected the all-distinct stream to trip the bypass")
    // keep inserting AFTER the bypass, with duplicates: content must
    // still match a direct build exactly
    i = 0
    while (i < 50000) {
      direct.insert((i % 1000).toLong)
      b.add((i % 1000).toLong)
      i += 1
    }
    assert(java.util.Arrays.equals(b.result().serialize(), direct.serialize()))
  }

  test("duplicate-heavy streams never trip the bypass") {
    val b = CqfBuilder(10, 40, invertible = true, compact = true)
    zipfTokens(400000, 50000, 0x1234L).foreach(b.add)
    b.result()
    assert(!b.bypassed, "zipf stream must stay on the table path")
  }

  test("addBytes clears the invertible flag like Cqf.insertBytes (ADVICE r3)") {
    val b = CqfBuilder(8, 64, invertible = true)
    b.add(42L)
    assert(b.cqf.invertible, "long keys keep invertibility")
    b.addBytes("hello".getBytes("UTF-8"))
    assert(!b.cqf.invertible,
      "a byte-key write through the builder must drop the key-recovery claim")
    // and keyIterator must refuse, exactly as on the direct path
    intercept[IllegalArgumentException] { b.result().keyIterator.next() }
  }

  test("fromSortedHashesGrowing retries only capacity misses; real bugs escape") {
    // capacity retry: 3000 distinct hashes cannot fit at q=4, builder
    // must escalate q silently and produce the right content
    val hs = (0 until 3000).map(i => WangHash.hash(i.toLong, 40)).sorted
    val grown = Cqf.fromSortedHashesGrowing(
      () => hs.iterator.map(h => (h, 1L)), 4, 40,
      invertible = true, compact = true)
    assert(grown.distinctCount == 3000L)
    assert(hs.forall(grown.queryHash(_) == 1L))
    // a non-capacity failure mid-stream must escape on the FIRST attempt,
    // not be swallowed and re-attempted at escalating q (r3 ADVICE)
    var attempts = 0
    val boom = intercept[IllegalStateException] {
      Cqf.fromSortedHashesGrowing(
        () => { attempts += 1
          Iterator((5L, 1L)) ++ Iterator.fill[(Long, Long)](1) {
            throw new IllegalStateException("boom") } },
        8, 40, invertible = true, compact = true)
    }
    assert(boom.getMessage == "boom")
    assert(attempts == 1, "real bugs must not trigger capacity retries")
  }

  test("explicit counts sum; count=0 is a no-op; all-bits hashes are valid keys") {
    val b = CqfBuilder(8, 64)
    b.addHash(-1L, 3L) // 0xFFFF... must not collide with any empty marker
    b.addHash(0L, 2L)
    b.addHash(-1L, 0L)
    b.addHash(-1L, 4L)
    val c = b.result()
    assert(c.queryHash(-1L) == 7L)
    assert(c.queryHash(0L) == 2L)
    assert(c.distinctCount == 2L)
  }
}
