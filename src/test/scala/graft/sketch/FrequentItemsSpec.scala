package graft.sketch

import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable
import scala.util.Random

/** Invariant tests for the heavy-hitters summary (Misra-Gries counters +
  * global offset; SpaceSaving-equivalent upper bounds). The invariants
  * are deterministic guarantees, not statistical bounds, so every check
  * is exact:
  *   present key:  count <= true <= count + offset
  *   absent key:   true <= offset
  *   offset <= 2 * total / k
  * and they must survive arbitrary merge trees.
  */
class FrequentItemsSpec extends AnyFunSuite {

  private def zipfStream(n: Int, vocab: Int, seed: Long): Array[Long] = {
    val rnd = new Random(seed)
    Array.fill(n) {
      // skewed: rank ~ u^-3 over the vocab, plus a uniform tail
      if (rnd.nextDouble() < 0.7) {
        val u = rnd.nextDouble()
        (vocab * math.pow(u, 3.0)).toLong.min(vocab - 1L)
      } else rnd.nextInt(vocab).toLong
    }
  }

  private def exactCounts(xs: Seq[Long]): mutable.Map[Long, Long] = {
    val m = mutable.Map.empty[Long, Long].withDefaultValue(0L)
    xs.foreach(x => m(x) += 1L)
    m
  }

  private def checkInvariants(f: FrequentItems, truth: collection.Map[Long, Long],
      n: Long, label: String): Unit = {
    assert(f.total == n, s"$label: total")
    assert(f.offset <= 2L * n / f.k + 1,
      s"$label: offset ${f.offset} exceeds 2N/k = ${2L * n / f.k}")
    val present = f.entries.map(e => e._1 -> e._2).toMap
    truth.foreach { case (key, t) =>
      present.get(key) match {
        case Some(c) =>
          assert(c <= t, s"$label: count $c overestimates true $t for key $key")
          assert(c + f.offset >= t,
            s"$label: ub ${c + f.offset} underestimates true $t for key $key")
        case None =>
          assert(t <= f.offset,
            s"$label: absent key $key has true $t > offset ${f.offset}")
      }
      assert(f.estimate(key) >= t, s"$label: estimate lower than truth for $key")
      assert(f.lowerBound(key) <= t, s"$label: lowerBound above truth for $key")
    }
  }

  test("exact when distinct keys <= k (offset stays 0)") {
    val f = FrequentItems(64)
    val xs = (0 until 5000).map(i => (i % 50).toLong)
    xs.foreach(f.add(_))
    assert(f.offset == 0L)
    assert(f.size == 50)
    val truth = exactCounts(xs)
    f.entries.foreach { case (k, c, _) => assert(c == truth(k)) }
    assert(f.estimate(7L) == truth(7L))
    assert(f.estimate(999L) == 0L)
  }

  test("bounds and completeness on a skewed stream (several k)") {
    for (k <- Seq(8, 64, 512)) {
      val xs = zipfStream(200000, 20000, seed = k)
      val f = FrequentItems(k)
      xs.foreach(f.add(_))
      checkInvariants(f, exactCounts(xs), xs.length.toLong, s"k=$k")
    }
  }

  test("weighted inserts equal repeated inserts") {
    val a = FrequentItems(16)
    val b = FrequentItems(16)
    val rnd = new Random(7)
    for (_ <- 0 until 2000) {
      val key = rnd.nextInt(200).toLong
      val w = 1 + rnd.nextInt(5)
      a.add(key, w.toLong)
      var i = 0
      while (i < w) { b.add(key); i += 1 }
    }
    assert(a.total == b.total)
    // purges fire at the same new-key arrivals with identical counter
    // state, so the two builds are byte-identical, not just both-valid
    assert(java.util.Arrays.equals(a.serialize(), b.serialize()))
    checkInvariants(a, mutable.Map.empty, a.total, "weighted")
  }

  test("merge trees preserve every invariant (random partitions, random trees)") {
    val xs = zipfStream(120000, 8000, seed = 99L)
    val truth = exactCounts(xs)
    val rnd = new Random(123)
    for (trial <- 0 until 5) {
      val parts = 1 + rnd.nextInt(9)
      val sketches = Array.fill(parts)(FrequentItems(128))
      xs.foreach(x => sketches(rnd.nextInt(parts)).add(x))
      // fold in random order (arbitrary merge tree)
      val order = rnd.shuffle(sketches.toList)
      val merged = order.reduceLeft((a, b) => a.mergeInPlace(b))
      checkInvariants(merged, truth, xs.length.toLong, s"trial=$trial parts=$parts")
      // every key with true count > offset must be present
      val present = merged.entries.map(_._1).toSet
      truth.foreach { case (key, t) =>
        if (t > merged.offset)
          assert(present.contains(key), s"trial=$trial: heavy key $key (true=$t) missing")
      }
    }
  }

  test("serialization round-trips canonically; topK order is deterministic") {
    val f = FrequentItems(32)
    zipfStream(50000, 3000, 5L).foreach(f.add(_))
    val bytes = f.serialize()
    val g = FrequentItems.deserialize(bytes)
    assert(g == f)
    assert(java.util.Arrays.equals(g.serialize(), bytes), "canonical bytes")
    assert(g.topK(10).toSeq == f.topK(10).toSeq)
    assert(SketchMeta.kindOf(bytes).contains("ss"))
    val meta = SketchMeta.of(bytes)
    assert(meta.n == f.total && meta.param == f.k.toLong)
    assert(meta.errBound <= 2.0 / f.k + 1e-9)
  }

  test("byte keys: original strings reported; long/byte mixing rejected") {
    val f = FrequentItems(16)
    val words = Seq("alpha", "beta", "alpha", "gamma", "alpha", "beta")
    words.foreach(w => f.addBytes(w.getBytes("UTF-8")))
    assert(f.bytesMode)
    val top = f.topK(3)
    assert(new String(top(0)._3, "UTF-8") == "alpha" && top(0)._2 == 3L)
    assert(f.estimateBytes("alpha".getBytes("UTF-8")) == 3L)
    assert(f.estimateBytes("nope".getBytes("UTF-8")) == 0L)
    intercept[IllegalArgumentException] { f.add(42L) } // bytes sketch rejects longs
    val g = FrequentItems(16)
    g.add(1L)
    intercept[IllegalArgumentException] { g.addBytes("x".getBytes("UTF-8")) }
    // round-trip with bytes payloads
    val h = FrequentItems.deserialize(f.serialize())
    assert(h.estimateBytes("alpha".getBytes("UTF-8")) >= 3L)
    // byte-keyed and long-keyed sketches must not merge
    intercept[IllegalArgumentException] { g.copied.mergeInPlace(f) }
  }

  test("empty sketches merge as identities in any order") {
    val e1 = FrequentItems(32)
    val e2 = FrequentItems(32)
    val f = FrequentItems(32)
    (0 until 1000).foreach(i => f.add((i % 20).toLong))
    val viaLeft = e1.mergeInPlace(f.copied)
    assert(viaLeft == f)
    val viaRight = f.copied.mergeInPlace(e2)
    assert(viaRight == f)
    assert(FrequentItems(32).mergeInPlace(FrequentItems(32)).total == 0L)
    // k mismatch: a STATELESS side is a merge identity (adopts the other),
    // real state on both sides still rejects
    assert(FrequentItems(8).mergeInPlace(FrequentItems(16)).total == 0L)
    val r8 = FrequentItems(8); r8.add(1L)
    val r16 = FrequentItems(16); r16.add(2L)
    intercept[IllegalArgumentException](r8.mergeInPlace(r16))
  }

  test("textKeys flag: set by callers that know the input is UTF-8, survives serde, ANDs on merge") {
    val f = FrequentItems(8)
    f.markTextKeys()
    f.addBytes("hi".getBytes("UTF-8"))
    assert(f.textKeys)
    val g = FrequentItems.deserialize(f.serialize())
    assert(g.textKeys, "text flag must survive serialization")
    // merging with a raw-binary-keyed sketch drops the text claim
    val raw = FrequentItems(8)
    raw.addBytes(Array[Byte](0, -1, 7))
    assert(!raw.textKeys)
    assert(!g.mergeInPlace(raw).textKeys)
    // empty accumulator adopts the text mode wholesale
    assert(FrequentItems(8).mergeInPlace(f.copied).textKeys)
  }

  test("probes enforce key mode: cross-mode probes reject instead of returning offset") {
    val longs = FrequentItems(32) // k > distinct keys: exact, offset 0
    (1L to 20L).foreach(longs.add(_))
    val bytes = FrequentItems(8)
    Seq("alpha", "beta").foreach(w => bytes.addBytes(w.getBytes("UTF-8")))
    // probing across modes hashes in a disjoint domain — before the
    // guard it silently returned offset, a plausible but meaningless count
    intercept[IllegalArgumentException](bytes.estimate(1L))
    intercept[IllegalArgumentException](bytes.lowerBound(1L))
    intercept[IllegalArgumentException](longs.estimateBytes("alpha".getBytes("UTF-8")))
    intercept[IllegalArgumentException](longs.lowerBoundBytes("alpha".getBytes("UTF-8")))
    // matched-mode probes still answer; an empty sketch answers either mode
    assert(longs.estimate(1L) === 1L)
    assert(bytes.estimateBytes("alpha".getBytes("UTF-8")) === 1L)
    assert(bytes.lowerBoundBytes("beta".getBytes("UTF-8")) === 1L)
    assert(FrequentItems(8).estimate(5L) === 0L)
    assert(FrequentItems(8).estimateBytes("x".getBytes("UTF-8")) === 0L)
  }

  test("byte-mode image truncated inside the variable-length section rejects cleanly") {
    val f = FrequentItems(8)
    Seq("alpha", "beta", "gamma").foreach(w => f.addBytes(w.getBytes("UTF-8")))
    val img = f.serialize()
    // walk every truncation point of the tail: all must reject with the
    // corruption IllegalArgumentException, never a BufferUnderflow
    var cut = img.length - 1
    while (cut >= 8) {
      intercept[IllegalArgumentException](FrequentItems.deserialize(img.take(cut)))
      cut -= 1
    }
  }
}
