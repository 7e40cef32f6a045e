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
