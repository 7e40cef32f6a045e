package graft.sketch

import org.scalatest.funsuite.AnyFunSuite

/** Hostile/corrupt byte images must fail with a clear exception from the
  * deserializer, never an opaque index/buffer error deep in a probe —
  * sketch bytes cross checkpoints and shuffles, so truncation and
  * cross-kind mixups are real user mistakes. */
class MalformedBytesSpec extends AnyFunSuite {

  private val deserializers: Seq[(String, Array[Byte] => Any)] = Seq(
    "cqf" -> (b => Cqf.deserialize(b)),
    "cqf_ref" -> (b => Cqf.importRefLayout(b)),
    "hll" -> (b => HllSketch.deserialize(b)),
    "cms" -> (b => CountMinSketch.deserialize(b)),
    "bloom" -> (b => BloomSketch.deserialize(b)),
    "td" -> (b => TDigest.deserialize(b)),
    "kll" -> (b => KllSketch.deserialize(b)),
    "ss" -> (b => FrequentItems.deserialize(b)))

  private def wellFormed: Map[String, Array[Byte]] = {
    val c = Cqf(6, 20); (1L to 50L).foreach(c.insert(_))
    val h = HllSketch(10); (1L to 50L).foreach(h.add)
    val cm = CountMinSketch(3, 64); (1L to 50L).foreach(cm.add(_))
    val bl = BloomSketch(1 << 10, 3); (1L to 50L).foreach(bl.add)
    val td = TDigest(50.0); (1 to 50).foreach(i => td.add(i.toDouble))
    val kl = KllSketch(64); (1 to 50).foreach(i => kl.add(i.toDouble))
    // bytes mode, so truncation cuts into the variable-length key
    // payloads — the structurally riskiest region
    val fi = FrequentItems(16)
    (1 to 50).foreach(i => fi.addBytes(s"key-${i % 20}".getBytes("UTF-8")))
    Map("cqf" -> c.serialize(), "cqf_ref" -> Cqf.exportRefLayout(c),
      "hll" -> h.serialize(), "cms" -> cm.serialize(),
      "bloom" -> bl.serialize(), "td" -> td.serialize(),
      "kll" -> kl.serialize(), "ss" -> fi.serialize())
  }

  private def expectClean(name: String, f: => Any): Unit = {
    val e = intercept[Exception](f)
    assert(e.isInstanceOf[IllegalArgumentException] ||
      e.isInstanceOf[java.nio.BufferUnderflowException] ||
      e.isInstanceOf[IllegalStateException],
      s"$name threw ${e.getClass.getName}: ${e.getMessage}")
  }

  test("garbage bytes are rejected by every deserializer") {
    val rnd = new scala.util.Random(9)
    val garbage = Array.fill(200)(rnd.nextInt().toByte)
    deserializers.foreach { case (n, d) => expectClean(n, d(garbage)) }
    deserializers.foreach { case (n, d) => expectClean(n, d(Array.emptyByteArray)) }
  }

  test("truncated images are rejected, not misread") {
    val ok = wellFormed
    deserializers.foreach { case (n, d) =>
      val whole = ok(n)
      // a valid header with the payload cut off must not yield a sketch
      // that silently lost content. intercept (NOT a catch-all around
      // fail()) so an accepting deserializer actually fails the test
      for (cut <- Seq(whole.length / 2, whole.length - 4)) {
        val t = java.util.Arrays.copyOf(whole, cut)
        withClue(s"$n accepted a truncated image ($cut/${whole.length} bytes): ") {
          intercept[Exception](d(t))
        }
      }
    }
  }

  test("frequent-items: forged header fields are rejected before narrowing or allocation") {
    val fi = FrequentItems(16)
    (1 to 50).foreach(i => fi.addBytes(s"key-${i % 20}".getBytes("UTF-8")))
    val whole = fi.serialize()
    def forged(off: Int, v: Long): Array[Byte] = {
      val b = whole.clone()
      java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        .putLong(off, v)
      b
    }
    // header layout: magic@0, k@8, size@16, total@24, offset@32, mode@40
    // k with a corrupt high word would narrow to a "valid" 16 via .toInt
    expectClean("ss k high-word", FrequentItems.deserialize(forged(8, (1L << 32) | 16L)))
    expectClean("ss k zero", FrequentItems.deserialize(forged(8, 0L)))
    // size > k violates the summary invariant even if it fits the image
    expectClean("ss size>k", FrequentItems.deserialize(forged(16, 17L)))
    // entry count whose fixed-width section exceeds the image must fail
    // up front, not on a multi-GB allocation or a deep buffer underflow
    expectClean("ss size huge", FrequentItems.deserialize(forged(16, 16L * 1024 * 1024)))
    // a negative key length other than the -1 null marker is corruption,
    // not a null key (previously any negative parsed as null)
    val kl = {
      val b = whole.clone()
      val buf = java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val n = buf.getLong(16).toInt
      buf.putInt(48 + 16 * n, -2) // first key-length slot
      b
    }
    expectClean("ss key length -2", FrequentItems.deserialize(kl))
  }

  test("cross-kind bytes are rejected") {
    // includes cqf_ref in BOTH directions: the reference image has no
    // magic word, so it is the deserializer most at risk of misparsing
    // foreign bytes (its guards are the size equation + header sanity)
    val ok = wellFormed
    for ((na, _) <- deserializers; (nb, db) <- deserializers if na != nb) {
      expectClean(s"$nb <- $na bytes", db(ok(na)))
    }
  }
}
