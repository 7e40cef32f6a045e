package graft.sketch

import java.nio.{ByteBuffer, ByteOrder}
import java.util.Arrays

/** Merging t-digest (Dunning & Ertl, "Computing extremely accurate
  * quantiles using t-digests"). Centroids sized by the k1 scale function
  * k(q) = (c / 2π)·asin(2q-1), which bounds centroid weight near the tails
  * so extreme quantiles stay accurate. Buffered inserts amortize the merge;
  * digests merge by feeding centroids through the same compressor, so the
  * structure is associative-mergeable (order affects centroids slightly but
  * quantile error stays within the t-digest bound).
  */
final class TDigest private (
    val compression: Double,
    private var means: Array[Double],
    private var weights: Array[Double],
    private var nCentroids: Int,
    private var bufMeans: Array[Double],
    private var bufWeights: Array[Double],
    private var nBuf: Int,
    private var _totalWeight: Double,
    private var _min: Double,
    private var _max: Double
) extends Serializable {

  def totalWeight: Double = { compress(); _totalWeight }
  def min: Double = _min
  def max: Double = _max
  def centroidCount: Int = { compress(); nCentroids }

  def add(x: Double, w: Double = 1.0): Unit = {
    require(!x.isNaN, "cannot add NaN to t-digest")
    // a NaN weight makes compress's running total NaN (every later
    // quantile/cdf silently NaN); a non-positive weight corrupts the
    // weighted-mean centroid update
    require(w > 0.0, s"t-digest weight must be positive, got $w")
    if (nBuf == bufMeans.length) compress()
    bufMeans(nBuf) = x
    bufWeights(nBuf) = w
    nBuf += 1
    if (x < _min) _min = x
    if (x > _max) _max = x
  }

  /** Independent deep copy — lets callers combine cached/shared instances
    * without mutating them (mergeInPlace compresses + appends in place). */
  def copied: TDigest = new TDigest(compression, means.clone(), weights.clone(),
    nCentroids, bufMeans.clone(), bufWeights.clone(), nBuf, _totalWeight, _min, _max)

  /** Centroid re-feed merge. Callers must use the RETURN VALUE: when this
    * side is stateless and the compressions mismatch, the result is a
    * COPY of `other` and `this` is left unchanged — a default-compression
    * empty digest (e.g. a merge-agg's output for a whole-null group) is a
    * legal merge identity; real state with mismatched compression rejects
    * (silently re-clustering a c=1000 digest through a c=20 compressor
    * would quietly cost ~7x quantile accuracy — the sibling kernels'
    * mismatch rule). */
  def mergeInPlace(other: TDigest): TDigest = {
    if (other.compression != compression) {
      compress(); other.compress()
      if (other.nCentroids == 0) return this
      if (nCentroids == 0) return other.copied
      require(other.compression == compression,
        s"t-digest compression mismatch: $compression vs ${other.compression}")
    }
    other.compress()
    var i = 0
    while (i < other.nCentroids) {
      add(other.means(i), other.weights(i))
      i += 1
    }
    if (other._min < _min) _min = other._min
    if (other._max > _max) _max = other._max
    this
  }

  /** k1 scale function. */
  @inline private def kScale(q: Double): Double =
    compression / (2.0 * math.Pi) * math.asin(2.0 * math.min(1.0, math.max(0.0, q)) - 1.0)

  /** In-place dual-array quicksort by (mean, weight) — primitive arrays
    * only, no boxed index sort on the compaction hot path. The (mean,
    * weight) tie-break makes the order (and thus the resulting centroid
    * list) deterministic: items with identical pairs are interchangeable. */
  private def dualSort(ms: Array[Double], ws: Array[Double], lo0: Int, hi0: Int): Unit = {
    var lo = lo0
    var hi = hi0
    while (lo < hi) {
      // median-of-three pivot guards the sorted/reverse-sorted buffers
      val mid = (lo + hi) >>> 1
      @inline def less(i: Int, j: Int): Boolean =
        ms(i) < ms(j) || (ms(i) == ms(j) && ws(i) < ws(j))
      @inline def swap(i: Int, j: Int): Unit = {
        val tm = ms(i); ms(i) = ms(j); ms(j) = tm
        val tw = ws(i); ws(i) = ws(j); ws(j) = tw
      }
      if (less(mid, lo)) swap(mid, lo)
      if (less(hi, lo)) swap(hi, lo)
      if (less(hi, mid)) swap(hi, mid)
      val pm = ms(mid)
      val pw = ws(mid)
      var i = lo
      var j = hi
      while (i <= j) {
        while (ms(i) < pm || (ms(i) == pm && ws(i) < pw)) i += 1
        while (ms(j) > pm || (ms(j) == pm && ws(j) > pw)) j -= 1
        if (i <= j) { swap(i, j); i += 1; j -= 1 }
      }
      // recurse into the smaller half, loop on the larger (O(log n) stack)
      if (j - lo < hi - i) {
        if (lo < j) dualSort(ms, ws, lo, j)
        lo = i
      } else {
        if (i < hi) dualSort(ms, ws, i, hi)
        hi = j
      }
    }
  }

  /** Merge buffer + centroids into a fresh centroid list. The existing
    * centroid list is already mean-sorted, so only the insert buffer is
    * sorted (primitive dual-array quicksort) and the two runs are merged
    * with two cursors — no index boxing, sort cost on the buffer only. */
  def compress(): Unit = {
    if (nBuf == 0) return
    dualSort(bufMeans, bufWeights, 0, nBuf - 1)
    val n = nCentroids + nBuf
    val sm = new Array[Double](n)
    val sw = new Array[Double](n)
    var ci = 0
    var bi = 0
    var oi = 0
    var total = 0.0
    while (ci < nCentroids || bi < nBuf) {
      val takeC = bi >= nBuf || (ci < nCentroids &&
        (means(ci) < bufMeans(bi) ||
          (means(ci) == bufMeans(bi) && weights(ci) <= bufWeights(bi))))
      if (takeC) { sm(oi) = means(ci); sw(oi) = weights(ci); ci += 1 }
      else { sm(oi) = bufMeans(bi); sw(oi) = bufWeights(bi); bi += 1 }
      total += sw(oi)
      oi += 1
    }
    val outM = new Array[Double](n)
    val outW = new Array[Double](n)
    var out = 0
    var curM = sm(0)
    var curW = sw(0)
    var wSoFar = 0.0
    var i = 1
    while (i < n) {
      val proposed = curW + sw(i)
      val q0 = wSoFar / total
      val q2 = (wSoFar + proposed) / total
      if (kScale(q2) - kScale(q0) <= 1.0) {
        // absorb into current centroid (weighted mean)
        curM = curM + (sm(i) - curM) * sw(i) / proposed
        curW = proposed
      } else {
        outM(out) = curM; outW(out) = curW; out += 1
        wSoFar += curW
        curM = sm(i); curW = sw(i)
      }
      i += 1
    }
    outM(out) = curM; outW(out) = curW; out += 1
    means = Arrays.copyOf(outM, out)
    weights = Arrays.copyOf(outW, out)
    nCentroids = out
    nBuf = 0
    _totalWeight = total
  }

  /** Quantile estimate at q in [0,1] via midpoint interpolation. */
  def quantile(q: Double): Double = {
    compress()
    if (nCentroids == 0) return Double.NaN
    if (nCentroids == 1) return means(0)
    val target = q * _totalWeight
    if (target <= weights(0) / 2.0) {
      // interpolate between min and first centroid midpoint
      val m0 = weights(0) / 2.0
      return _min + (means(0) - _min) * math.max(0.0, target) / math.max(m0, 1e-12)
    }
    var cum = 0.0
    var i = 0
    while (i < nCentroids) {
      val mid = cum + weights(i) / 2.0
      val nextMid =
        if (i == nCentroids - 1) _totalWeight
        else cum + weights(i) + weights(i + 1) / 2.0
      if (target <= nextMid) {
        if (i == nCentroids - 1) {
          val span = _totalWeight - mid
          val frac = if (span <= 0) 1.0 else (target - mid) / span
          return means(i) + (_max - means(i)) * math.min(1.0, math.max(0.0, frac))
        } else {
          val span = nextMid - mid
          val frac = if (span <= 0) 0.0 else (target - mid) / span
          return means(i) + (means(i + 1) - means(i)) * math.min(1.0, math.max(0.0, frac))
        }
      }
      cum += weights(i)
      i += 1
    }
    _max
  }

  /** Approximate CDF: fraction of mass ≤ x. */
  def cdf(x: Double): Double = {
    compress()
    if (nCentroids == 0) return Double.NaN
    if (x <= _min) return 0.0
    if (x >= _max) return 1.0
    var cum = 0.0
    var i = 0
    while (i < nCentroids) {
      val m = means(i)
      if (x < m) {
        val prevM = if (i == 0) _min else means(i - 1)
        val prevCum = if (i == 0) 0.0 else cum - weights(i - 1) / 2.0
        val thisCum = cum + weights(i) / 2.0
        val frac = if (m - prevM <= 0) 1.0 else (x - prevM) / (m - prevM)
        return math.min(1.0, math.max(0.0, (prevCum + (thisCum - prevCum) * frac) / _totalWeight))
      }
      cum += weights(i)
      i += 1
    }
    // tail: x between the last centroid mean and _max — interpolate like
    // the head branch does from _min, instead of snapping to 1.0 (which
    // made cdf(quantile(q)) overshoot for q near 1)
    val lastMean = means(nCentroids - 1)
    val lastMid = _totalWeight - weights(nCentroids - 1) / 2.0
    val span = _max - lastMean
    val frac = if (span <= 0) 1.0 else (x - lastMean) / span
    math.min(1.0, math.max(0.0,
      (lastMid + (_totalWeight - lastMid) * frac) / _totalWeight))
  }

  def serialize(): Array[Byte] = {
    compress()
    val buf = ByteBuffer.allocate(8 * (5 + 2 * nCentroids)).order(ByteOrder.LITTLE_ENDIAN)
    buf.putLong(TDigest.Magic)
    buf.putDouble(compression)
    buf.putLong(nCentroids.toLong)
    buf.putDouble(_min)
    buf.putDouble(_max)
    var i = 0
    while (i < nCentroids) { buf.putDouble(means(i)); buf.putDouble(weights(i)); i += 1 }
    buf.array()
  }
}

object TDigest {
  private[sketch] final val Magic = 0x3147445454465247L // "GRFTTDG1"

  def apply(compression: Double = 100.0): TDigest = {
    require(compression >= 20 && compression <= 10000)
    val bufCap = math.max(64, (4 * compression).toInt)
    new TDigest(compression, new Array[Double](0), new Array[Double](0), 0,
      new Array[Double](bufCap), new Array[Double](bufCap), 0, 0.0,
      Double.PositiveInfinity, Double.NegativeInfinity)
  }

  def deserialize(bytes: Array[Byte]): TDigest = {
    require(bytes.length >= 40, s"t-digest image too short: ${bytes.length} bytes")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(buf.getLong() == Magic, "bad TDigest magic")
    val compression = buf.getDouble()
    val nLong = buf.getLong()
    val mn = buf.getDouble()
    val mx = buf.getDouble()
    // header fields validated against the remaining payload BEFORE any
    // allocation sized from them (the KLL/HLL hardening rule): a corrupt
    // count would otherwise NegativeArraySize, OOM, or BufferUnderflow
    require(compression >= 20 && compression <= 10000,
      s"corrupt t-digest header: compression=$compression")
    require(nLong >= 0L && nLong * 16L == (bytes.length - 40).toLong,
      s"corrupt t-digest header: $nLong centroids vs ${bytes.length - 40} payload bytes")
    val n = nLong.toInt
    val means = new Array[Double](n)
    val weights = new Array[Double](n)
    var i = 0
    var total = 0.0
    while (i < n) {
      means(i) = buf.getDouble(); weights(i) = buf.getDouble()
      total += weights(i); i += 1
    }
    val bufCap = math.max(64, (4 * compression).toInt)
    new TDigest(compression, means, weights, n,
      new Array[Double](bufCap), new Array[Double](bufCap), 0, total, mn, mx)
  }
}
