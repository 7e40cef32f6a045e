package graft.sketch

import java.nio.{ByteBuffer, ByteOrder}
import scala.collection.mutable.ArrayBuffer

/** KLL quantile sketch (Karnin, Lang, Liberty 2016) over doubles.
  * Levels of compactors: items at level i carry weight 2^i; level capacity
  * decays geometrically (c = 2/3) from k at the top. Compaction sorts a
  * full level and promotes every other item (random parity) to the level
  * above. Normalized rank error ≈ 1.33/k (one-sided ~1.65/k at 99%).
  * Merge = level-wise concatenation + re-compaction.
  *
  * Randomness: per-sketch xorshift PRNG seeded deterministically; sequences
  * diverge per compaction so bias cancels, while runs stay reproducible.
  */
final class KllSketch private (
    val k: Int,
    private val levels: ArrayBuffer[ArrayBuffer[Double]],
    private var _n: Long,
    private var rngState: Long
) extends Serializable {

  def n: Long = _n
  def numLevels: Int = levels.length

  // retained-item count and total capacity, maintained incrementally:
  // recomputing them per add() costs two O(levels) scans — the capacity
  // one with a math.pow PER LEVEL — on the kll_agg per-row hot path.
  // _items bumps on add and recomputes after compact/merge; capacity only
  // changes when the level count does.
  private var _items: Int = {
    var s = 0
    var i = 0
    while (i < levels.length) { s += levels(i).length; i += 1 }
    s
  }
  @transient private var _capLevels: Int = -1
  @transient private var _capTotal: Int = 0
  private def capacityCached: Int = {
    if (_capLevels != levels.length) {
      _capTotal = totalCapacity
      _capLevels = levels.length
    }
    _capTotal
  }

  /** Items currently retained across all compactor levels (vs [[n]]
    * items represented) — surfaced by sketch_meta. */
  def retainedItems: Int = _items

  /** retained / capacity — the structure-fill metric surfaced by
    * sketch_meta (compaction triggers just above 1.0). */
  def loadFraction: Double = _items.toDouble / capacityCached.toDouble

  @inline private def nextBit(): Boolean = {
    var x = rngState
    x ^= x << 13; x ^= x >>> 7; x ^= x << 17
    rngState = x
    (x & 1L) == 1L
  }

  private def capacity(level: Int, nLevels: Int): Int = {
    val depth = nLevels - 1 - level
    math.max(KllSketch.MinCap, math.ceil(k * math.pow(2.0 / 3.0, depth.toDouble)).toInt)
  }

  private def totalCapacity: Int = {
    var s = 0
    var i = 0
    while (i < levels.length) { s += capacity(i, levels.length); i += 1 }
    s
  }

  private def totalItems: Int = {
    var s = 0
    var i = 0
    while (i < levels.length) { s += levels(i).length; i += 1 }
    s
  }

  def add(x: Double): Unit = {
    require(!x.isNaN, "cannot add NaN to KLL")
    levels(0) += x
    _n += 1
    _items += 1
    _version += 1
    if (_items > capacityCached) compact()
  }

  private def compact(): Unit = {
    // _items maintained incrementally: each pass promotes m/2 items and
    // discards m/2, so the count drops by m/2 — no O(levels) recount per
    // pass (at MinCap width the bottom level compacts every few inserts,
    // so this loop IS the insert hot path's amortized tail)
    while (_items > capacityCached) {
      // find the lowest level at or over its capacity
      var lvl = 0
      var found = -1
      while (lvl < levels.length && found < 0) {
        if (levels(lvl).length >= capacity(lvl, levels.length)) found = lvl
        lvl += 1
      }
      if (found < 0) found = 0
      val buf = levels(found)
      if (buf.length < 2) return // nothing to compact; capacity rules prevent this
      val sorted = buf.toArray
      java.util.Arrays.sort(sorted)
      buf.clear()
      var m = sorted.length
      if (m % 2 == 1) { // odd leftover stays at this level (weight preserved)
        buf += sorted(m - 1)
        m -= 1
      }
      if (found + 1 >= levels.length) levels += new ArrayBuffer[Double]
      val up = levels(found + 1)
      var i = if (nextBit()) 1 else 0
      while (i < m) { up += sorted(i); i += 2 }
      _items -= m / 2
    }
  }

  /** Number of items ≤ x, estimated (weighted). */
  def rank(x: Double): Long = {
    var r = 0L
    var lvl = 0
    while (lvl < levels.length) {
      val w = 1L << lvl
      val buf = levels(lvl)
      var i = 0
      while (i < buf.length) {
        if (buf(i) <= x) r += w
        i += 1
      }
      lvl += 1
    }
    r
  }

  // quantile scratch, memoized across calls on an unmodified sketch (the
  // probe expressions cache the parsed sketch and may ask for many
  // quantiles); invalidated by add/merge/compact via _version
  @transient private var qVersion: Long = -1L
  @transient private var qValues: Array[Double] = _
  @transient private var qCumW: Array[Long] = _
  private var _version: Long = 0L

  private def sortedCumulative(): Unit = {
    if (qVersion == _version && qValues != null) return
    val m = totalItems
    val vs = new Array[Double](m)
    val ws = new Array[Long](m)
    var o = 0
    var lvl = 0
    while (lvl < levels.length) {
      val w = 1L << lvl
      val buf = levels(lvl)
      var i = 0
      while (i < buf.length) { vs(o) = buf(i); ws(o) = w; o += 1; i += 1 }
      lvl += 1
    }
    // primitive dual-array sort by value (weights ride along)
    def sortRange(lo0: Int, hi0: Int): Unit = {
      var lo = lo0
      var hi = hi0
      while (lo < hi) {
        val p = vs((lo + hi) >>> 1)
        var i = lo
        var j = hi
        while (i <= j) {
          while (vs(i) < p) i += 1
          while (vs(j) > p) j -= 1
          if (i <= j) {
            val tv = vs(i); vs(i) = vs(j); vs(j) = tv
            val tw = ws(i); ws(i) = ws(j); ws(j) = tw
            i += 1; j -= 1
          }
        }
        if (j - lo < hi - i) { if (lo < j) sortRange(lo, j); lo = i }
        else { if (i < hi) sortRange(i, hi); hi = j }
      }
    }
    if (m > 1) sortRange(0, m - 1)
    var cum = 0L
    var i = 0
    while (i < m) { cum += ws(i); ws(i) = cum; i += 1 }
    qValues = vs
    qCumW = ws
    qVersion = _version
  }

  /** Quantile at q in [0,1]: binary search over the memoized cumulative
    * weights (no boxed tuple sort per call). */
  def quantile(q: Double): Double = {
    if (_n == 0) return Double.NaN
    sortedCumulative()
    val totalW = qCumW(qCumW.length - 1)
    val target = math.min(totalW.toDouble, math.max(0.0, q * totalW))
    // first index with cumW >= target
    var lo = 0
    var hi = qCumW.length - 1
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (qCumW(mid) >= target) hi = mid else lo = mid + 1
    }
    qValues(lo)
  }

  /** Independent deep copy (per-level buffer clones) — lets callers combine
    * cached/shared instances without mutating them. */
  def copied: KllSketch =
    new KllSketch(k, levels.map(_.clone()), _n, rngState)

  /** Level-wise union + compact. Callers must use the RETURN VALUE: when
    * this side is stateless (n == 0) and the k parameters mismatch, the
    * result is a COPY of `other` and `this` is left unchanged — a
    * default-k empty sketch (e.g. a merge-agg's output for a whole-null
    * group) is a legal merge identity regardless of its k; real state
    * with mismatched k still rejects. */
  def mergeInPlace(other: KllSketch): KllSketch = {
    if (other.k != k) {
      if (other._n == 0L) return this
      if (_n == 0L) return other.copied
    }
    require(other.k == k, s"KLL k mismatch: $k vs ${other.k}")
    _version += 1
    while (levels.length < other.levels.length) levels += new ArrayBuffer[Double]
    var lvl = 0
    while (lvl < other.levels.length) {
      levels(lvl) ++= other.levels(lvl)
      lvl += 1
    }
    _items = totalItems // one exact recount; compact() maintains it after
    _n += other._n
    rngState ^= other.rngState * 0x9e3779b97f4a7c15L
    if (rngState == 0L) rngState = KllSketch.DefaultSeed
    compact()
    this
  }

  def serialize(): Array[Byte] = {
    val nItems = totalItems
    val buf = ByteBuffer.allocate(8 * (5 + levels.length) + 8 * nItems)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.putLong(KllSketch.Magic)
    buf.putLong(k.toLong)
    buf.putLong(_n)
    buf.putLong(rngState)
    buf.putLong(levels.length.toLong)
    levels.foreach(l => buf.putLong(l.length.toLong))
    levels.foreach(_.foreach(buf.putDouble))
    buf.array()
  }

  override def toString: String = s"KllSketch(k=$k, n=${_n}, levels=${levels.map(_.length).mkString(",")})"
}

object KllSketch {
  private[sketch] final val Magic = 0x314c4c4b54465247L // "GRFTKLL1"
  // Minimum compactor width 8 (the Apache DataSketches choice), not the
  // theoretical minimum 2: a deep sketch's bottom level sits at MinCap,
  // so MinCap bounds how many inserts fit between compaction passes —
  // at 2, virtually EVERY insert compacted (measured 1.78 M inserts/s);
  // at 8 the pass amortizes over ~4 inserts and the error bound only
  // tightens (wider compactors lose less rank information).
  private final val MinCap = 8
  private[sketch] final val DefaultSeed = 0x5deece66dL

  def apply(k: Int = 200): KllSketch = {
    require(k >= 8 && k <= 65535)
    new KllSketch(k, ArrayBuffer(new ArrayBuffer[Double]), 0L, DefaultSeed)
  }

  def deserialize(bytes: Array[Byte]): KllSketch = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(buf.getLong() == Magic, "bad KLL magic")
    val k = buf.getLong().toInt
    val n = buf.getLong()
    val rng = buf.getLong()
    val nLevels = buf.getLong().toInt
    // validate header fields against the remaining payload before any
    // allocation sized from them (corrupt nLevels/lens would otherwise
    // OOM or BufferUnderflow instead of failing as a clean parse error)
    require(k >= 8 && k <= (1 << 20), s"corrupt KLL header: k=$k")
    require(n >= 0L, s"corrupt KLL header: n=$n")
    require(nLevels >= 0 && nLevels.toLong * 8 <= buf.remaining(),
      s"corrupt KLL header: nLevels=$nLevels for ${buf.remaining()} bytes")
    val lens = Array.fill(nLevels)(buf.getLong().toInt)
    require(lens.forall(_ >= 0) &&
      lens.foldLeft(0L)(_ + _) * 8 == buf.remaining(),
      s"corrupt KLL payload: level lengths ${lens.mkString(",")} vs " +
      s"${buf.remaining()} bytes")
    // n and the retained items must agree on emptiness: n > 0 with zero
    // items would crash quantile() with an index -1 lookup, n == 0 with
    // items would fabricate nonzero ranks — either way corrupt, not valid
    require((n == 0L) == lens.forall(_ == 0),
      s"corrupt KLL image: n=$n with ${lens.sum} retained items")
    val levels = new ArrayBuffer[ArrayBuffer[Double]](nLevels)
    lens.foreach { len =>
      val l = new ArrayBuffer[Double](len)
      var i = 0
      while (i < len) { l += buf.getDouble(); i += 1 }
      levels += l
    }
    if (levels.isEmpty) levels += new ArrayBuffer[Double]
    new KllSketch(k, levels, n, if (rng == 0) DefaultSeed else rng)
  }
}
