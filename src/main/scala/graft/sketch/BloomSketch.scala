package graft.sketch

import java.nio.{ByteBuffer, ByteOrder}

/** Classic Bloom filter over an Array[Long] bitset with k double-hashed
  * probes (Kirsch-Mitzenmacher). No false negatives; FPR ≈ (1-e^{-kn/m})^k.
  * Mergeable by bitwise OR (same m, k).
  */
final class BloomSketch private (
    val numBits: Long,
    val numHashes: Int,
    private val words: Array[Long]
) extends Serializable {

  @inline private def probe(h1: Long, h2: Long, i: Int): Long = {
    val h = h1 + i.toLong * h2
    ((h % numBits) + numBits) % numBits
  }

  def addHash(h1: Long, h2: Long): Unit = {
    var i = 0
    while (i < numHashes) {
      val bit = probe(h1, h2, i)
      words((bit >>> 6).toInt) |= (1L << (bit & 63L))
      i += 1
    }
  }

  def add(key: Long): Unit =
    addHash(WangHash.mix64(key, BloomSketch.Seed1), WangHash.mix64(key, BloomSketch.Seed2))
  def addString(s: String): Unit = {
    val b = s.getBytes("UTF-8")
    addHash(WangHash.mixBytes(b, BloomSketch.Seed1), WangHash.mixBytes(b, BloomSketch.Seed2))
  }

  def mightContainHash(h1: Long, h2: Long): Boolean = {
    var i = 0
    while (i < numHashes) {
      val bit = probe(h1, h2, i)
      if ((words((bit >>> 6).toInt) & (1L << (bit & 63L))) == 0L) return false
      i += 1
    }
    true
  }

  def mightContain(key: Long): Boolean =
    mightContainHash(WangHash.mix64(key, BloomSketch.Seed1), WangHash.mix64(key, BloomSketch.Seed2))
  def mightContainString(s: String): Boolean = {
    val b = s.getBytes("UTF-8")
    mightContainHash(WangHash.mixBytes(b, BloomSketch.Seed1), WangHash.mixBytes(b, BloomSketch.Seed2))
  }

  /** Bits currently set — the structure-fill metric surfaced by
    * sketch_meta and the input to [[expectedFpp]]. */
  def setBits: Long = {
    var set = 0L
    var i = 0
    while (i < words.length) { set += java.lang.Long.bitCount(words(i)); i += 1 }
    set
  }

  /** Observed fill ratio → expected FPR for the current state. */
  def expectedFpp: Double =
    math.pow(setBits.toDouble / numBits.toDouble, numHashes.toDouble)

  /** Independent deep copy (bitset clone) — lets callers combine
    * cached/shared instances without mutating them. */
  def copied: BloomSketch = new BloomSketch(numBits, numHashes, words.clone())

  /** Bitwise-or union. Callers must use the RETURN VALUE: when this side
    * is stateless (no bits set) and the shapes mismatch, the result is a
    * COPY of `other` and `this` is left unchanged — a default-shape empty
    * sketch (e.g. a merge-agg's output for a whole-null group) is a legal
    * merge identity regardless of its shape; real state with mismatched
    * shape still rejects. */
  def mergeInPlace(other: BloomSketch): BloomSketch = {
    if (other.numBits != numBits || other.numHashes != numHashes) {
      if (other.setBits == 0L) return this
      if (setBits == 0L) return other.copied
    }
    require(other.numBits == numBits && other.numHashes == numHashes,
      "Bloom shape mismatch")
    var i = 0
    while (i < words.length) { words(i) |= other.words(i); i += 1 }
    this
  }

  def serialize(): Array[Byte] = {
    val buf = ByteBuffer.allocate(24 + 8 * words.length).order(ByteOrder.LITTLE_ENDIAN)
    buf.putLong(BloomSketch.Magic)
    buf.putLong(numBits)
    buf.putLong(numHashes.toLong)
    buf.asLongBuffer().put(words)
    buf.array()
  }

  override def equals(o: Any): Boolean = o match {
    case b: BloomSketch =>
      b.numBits == numBits && b.numHashes == numHashes &&
        java.util.Arrays.equals(b.words, words)
    case _ => false
  }
  override def hashCode(): Int = java.util.Arrays.hashCode(words)
}

object BloomSketch {
  private[sketch] final val Magic = 0x314d4c4254465247L // "GRFTBLM1"
  private[graft] final val Seed1 = 0x9747b28cL
  private[graft] final val Seed2 = 0x3c6ef372L

  def apply(numBits: Long = 1 << 16, numHashes: Int = 5): BloomSketch = {
    require(numBits >= 64 && numHashes >= 1 && numHashes <= 32)
    val roundBits = (numBits + 63) / 64 * 64
    // the Long word count truncated to Int silently wraps past 2^37 bits
    // (fromExpected at tens of billions of items): apply would "succeed"
    // with an undersized bitset and the first out-of-range probe throws —
    // reject tables that cannot be one JVM array (the CMS.apply rule)
    require(roundBits / 64 <= Int.MaxValue - 8,
      s"Bloom bitset too large: $numBits bits = ${roundBits / 64} words")
    new BloomSketch(roundBits, numHashes, new Array[Long]((roundBits / 64).toInt))
  }

  /** Sized for expected item count and target FPR (standard formulas). */
  def fromExpected(n: Long, fpp: Double): BloomSketch = {
    val m = math.ceil(-n.toDouble * math.log(fpp) / (math.log(2) * math.log(2))).toLong
    val k = math.max(1, math.round(m.toDouble / n.toDouble * math.log(2)).toInt)
    apply(math.max(64, m), math.min(k, 32))
  }

  def deserialize(bytes: Array[Byte]): BloomSketch = {
    require(bytes.length >= 24, s"bloom image too short: ${bytes.length} bytes")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(buf.getLong() == Magic, "bad Bloom magic")
    val bits = buf.getLong()
    val k = buf.getLong().toInt
    // header fields validated against the remaining payload BEFORE any
    // allocation sized from them (the KLL/HLL hardening rule): corrupt
    // bits would otherwise NegativeArraySize or wrap the word count to a
    // small positive and index out of bounds on the first probe
    require(bits >= 64 && bits % 64 == 0 && k >= 1 && k <= 32,
      s"corrupt bloom header: bits=$bits k=$k")
    require(bits / 64 * 8L == (bytes.length - 24).toLong,
      s"corrupt bloom payload: $bits bits vs ${bytes.length - 24} bytes")
    val words = new Array[Long]((bits / 64).toInt)
    buf.asLongBuffer().get(words)
    new BloomSketch(bits, k, words)
  }
}
