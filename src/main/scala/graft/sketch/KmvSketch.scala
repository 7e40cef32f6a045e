package graft.sketch

import java.nio.{ByteBuffer, ByteOrder}

/** Mergeable bottom-k (K-Minimum-Values) distinct sketch: retains the k
  * smallest distinct 64-bit key hashes ever seen, each with its original
  * key, giving three things the sibling families cannot:
  *
  *  - a distinct-count estimate `(k-1)/u_k` (Bar-Yossef et al. 2002 /
  *    Beyer et al. SIGMOD'07 unbiased form; relative std err ≈
  *    1/sqrt(k-2)) that is EXACT until the first hash is dropped —
  *    i.e. whenever at most k distinct keys were seen (the retained
  *    set is then the whole key set; tracked explicitly, so a sketch
  *    holding exactly k distinct keys still answers exactly);
  *  - a deterministic uniform sample over DISTINCT keys (hash-order
  *    bottom-k is an order-invariant sample — the same keys survive no
  *    matter how rows are partitioned, making samples reproducible
  *    across cluster sizes, unlike reservoir sampling);
  *  - set-resemblance: bottom-k Jaccard estimation between two sketches
  *    (Broder 1997 / Cohen & Kaplan 2007), exact when both sides are
  *    below capacity.
  *
  * The union of two sketches is the bottom-k of the combined hash sets,
  * so merge is associative, commutative and — uniquely among the graft
  * families — IDEMPOTENT (merge(s, s) == s): re-merging a checkpoint
  * shard twice cannot skew the state.
  *
  * Reference analog: the multiplicity-counting workload
  * (/root/reference/src/main.rs:96-105) answers "how often"; this family
  * answers "how many distinct / which representatives / how similar",
  * the audit-side questions of the same token pipelines.
  *
  * Representation: parallel arrays sorted ascending by FLIPPED hash
  * (hash ^ Long.MinValue, so signed order == unsigned raw order). The
  * per-row hot path is a single compare against the current k-th min
  * (reject); accepted inserts decay as k·ln(n/k), so the O(k) insertion
  * shift amortizes to noise. Merge is a linear two-pointer walk.
  *
  * Keys: canonical longs hash through mix64; string/binary keys fold
  * through mixBytes and keep their first-seen bytes for reporting
  * (same key policy as [[FrequentItems]], including the textKeys rule:
  * only known-UTF-8 keys may render as strings).
  */
final class KmvSketch private (
    val k: Int,
    private var hashes: Array[Long], // flipped, sorted asc, [0, _size)
    private var keys: Array[Long], // original long key, or byte-fold
    private var keyBytes: Array[Array[Byte]], // null unless bytes mode
    private var _size: Int,
    private var _bytesMode: Boolean,
    private var _textKeys: Boolean,
    private var _evicted: Boolean
) extends Serializable {

  def size: Int = _size
  def bytesMode: Boolean = _bytesMode
  def textKeys: Boolean = _textKeys
  /** Declare the byte keys UTF-8 text (callers that know the input type). */
  def markTextKeys(): Unit = _textKeys = true

  /** True while the retained set IS the full distinct-key set: no
    * distinct hash was ever dropped (by capacity eviction or merge
    * truncation), so every derived answer (estimate, sample, jaccard)
    * is exact. Tracked explicitly — a sketch that saw EXACTLY k
    * distinct keys is full yet still exact, and the evicted state is a
    * pure function of the distinct key set (the first drop can only
    * happen where the union first exceeds k, under any merge tree). */
  def isExact: Boolean = !_evicted

  def add(key: Long): Unit = {
    require(!_bytesMode,
      "cannot mix long and byte keys in one kmv sketch")
    addHashed(WangHash.mix64(key, KmvSketch.KeySeed) ^ Long.MinValue, key, null)
  }

  def addBytes(b: Array[Byte]): Unit = {
    if (!_bytesMode) {
      require(_size == 0, "cannot mix long and byte keys in one kmv sketch")
      _bytesMode = true
      keyBytes = new Array[Array[Byte]](k)
    }
    val fold = WangHash.mixBytes(b, KmvSketch.KeySeed)
    addHashed(WangHash.mix64(fold, KmvSketch.KeySeed) ^ Long.MinValue, fold, b)
  }

  /** Insert a flipped hash with its payload; O(1) reject when at capacity
    * and not below the current k-th min, O(log k + k·memmove) otherwise. */
  private def addHashed(h: Long, key: Long, kb: Array[Byte]): Unit = {
    if (_size == k && h >= hashes(k - 1)) {
      // rejected at capacity: exactness is lost only if this hash is
      // genuinely new (a duplicate of a retained hash changes nothing);
      // the O(log k) check runs only while still exact — once evicted,
      // the hot path is back to the single compare above
      if (!_evicted && !containsHash(h)) _evicted = true
      return
    }
    var lo = 0
    var hi = _size
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (hashes(mid) < h) lo = mid + 1 else hi = mid
    }
    if (lo < _size && hashes(lo) == h) return // duplicate hash
    if (_size == k) _evicted = true // the current k-th min gets dropped
    val moved = (if (_size == k) k - 1 else _size) - lo
    if (moved > 0) {
      System.arraycopy(hashes, lo, hashes, lo + 1, moved)
      System.arraycopy(keys, lo, keys, lo + 1, moved)
      if (_bytesMode) System.arraycopy(keyBytes, lo, keyBytes, lo + 1, moved)
    }
    hashes(lo) = h
    keys(lo) = key
    if (_bytesMode) keyBytes(lo) = kb
    if (_size < k) _size += 1
  }

  /** Distinct-count estimate: exact `size` below capacity, else the
    * unbiased KMV estimator (k-1)/u_k with u_k the k-th smallest hash
    * normalized to (0, 1]. */
  def estimate: Double =
    if (!_evicted) _size.toDouble // exact even at _size == k
    else {
      // k-th min as a fraction of 2^64: the stored FLIPPED value is
      // (unsigned raw − 2^63) in signed terms, so adding 2^63 recovers
      // the raw magnitude; +1 keeps u in (0, 1] even for raw hash 0
      // (bias 2^-64, far below the estimator's RSE)
      val u = (hashes(k - 1).toDouble + 9.223372036854776E18 + 1.0) /
        1.8446744073709552E19
      (k - 1).toDouble / u
    }

  def estimateLong: Long = math.round(estimate)

  /** Published relative-standard-error bound of the estimator; 0 while
    * exact. */
  def errBound: Double =
    if (isExact) 0.0 else 1.0 / math.sqrt((k - 2).toDouble)

  /** Up to n retained entries in ascending hash order (a deterministic,
    * order- and partitioning-invariant uniform sample over distinct
    * keys). Fields: (key, firstSeenBytes|null). */
  def sample(n: Int): Array[(Long, Array[Byte])] = {
    val m = math.min(n, _size)
    val out = new Array[(Long, Array[Byte])](m)
    var i = 0
    while (i < m) {
      out(i) = (keys(i), if (_bytesMode) keyBytes(i) else null)
      i += 1
    }
    out
  }

  private def isEmpty: Boolean = _size == 0

  /** Independent deep copy, so shared/cached instances can be combined
    * without mutation. */
  def copied: KmvSketch = new KmvSketch(k, hashes.clone(), keys.clone(),
    if (keyBytes == null) null else keyBytes.clone(),
    _size, _bytesMode, _textKeys, _evicted)

  /** Fresh object SHARING the operand arrays — safe as a mergeInPlace
    * target because merge only REASSIGNS the array fields (it allocates
    * fresh output arrays and never writes into its inputs). Used by the
    * cached-operand union path to skip cloning up to three k-length
    * arrays that the merge would immediately discard. */
  private[graft] def shallowCopied: KmvSketch =
    new KmvSketch(k, hashes, keys, keyBytes, _size, _bytesMode, _textKeys, _evicted)

  /** Bottom-k of the union of both hash sets — associative, commutative,
    * idempotent. Requires equal k (one accuracy contract per column),
    * and matching key mode unless one side is empty. */
  def mergeInPlace(other: KmvSketch): KmvSketch = {
    require(other.k == k, s"kmv k mismatch: $k vs ${other.k}")
    if (other.isEmpty) return this
    if (isEmpty) {
      if (_bytesMode != other._bytesMode) {
        _bytesMode = other._bytesMode
        keyBytes = if (_bytesMode) new Array[Array[Byte]](k) else null
      }
      _textKeys = other._textKeys
    }
    require(_bytesMode == other._bytesMode,
      "cannot merge long-keyed and byte-keyed kmv sketches")
    _textKeys = _textKeys && other._textKeys
    val nh = new Array[Long](k)
    val nk = new Array[Long](k)
    val nb = if (_bytesMode) new Array[Array[Byte]](k) else null
    var i = 0
    var j = 0
    var m = 0
    while (m < k && (i < _size || j < other._size)) {
      val takeLeft = j >= other._size ||
        (i < _size && hashes(i) <= other.hashes(j))
      if (takeLeft) {
        nh(m) = hashes(i); nk(m) = keys(i)
        if (_bytesMode) nb(m) = keyBytes(i)
        if (j < other._size && other.hashes(j) == hashes(i)) {
          if (_bytesMode && nb(m) == null) nb(m) = other.keyBytes(j)
          j += 1
        }
        i += 1
      } else {
        nh(m) = other.hashes(j); nk(m) = other.keys(j)
        if (_bytesMode) nb(m) = other.keyBytes(j)
        j += 1
      }
      m += 1
    }
    // exactness after a merge: lost if either input had already lost it,
    // or the combined hash set overflowed k here (remaining elements are
    // strictly above the last taken hash, so any leftover means the
    // union is genuinely larger than k)
    _evicted = _evicted || other._evicted ||
      (m == k && (i < _size || j < other._size))
    hashes = nh; keys = nk; keyBytes = nb; _size = m
    this
  }

  @inline private def containsHash(h: Long): Boolean = {
    var lo = 0
    var hi = _size
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (hashes(mid) < h) lo = mid + 1 else hi = mid
    }
    lo < _size && hashes(lo) == h
  }

  /** Bottom-k Jaccard resemblance estimate against `other` (must share
    * this sketch's hash seed — all graft kmv sketches do). Exact while
    * both sides are exact; otherwise the classic estimator
    * |X ∩ A ∩ B| / |X| with X the min(kA,kB) smallest distinct hashes
    * of the union — every x ∈ X is below both sides' retention
    * thresholds, so membership tests are exact. Empty-set convention:
    * J(∅,∅)=1, J(∅,S)=0. */
  def jaccard(other: KmvSketch): Double = {
    if (isEmpty && other.isEmpty) return 1.0
    if (isEmpty || other.isEmpty) return 0.0
    val cap =
      if (isExact && other.isExact) Int.MaxValue
      else math.min(k, other.k)
    var i = 0
    var j = 0
    var union = 0
    var both = 0
    while (union < cap && (i < _size || j < other._size)) {
      val takeLeft = j >= other._size ||
        (i < _size && hashes(i) <= other.hashes(j))
      if (takeLeft) {
        if (j < other._size && other.hashes(j) == hashes(i)) { both += 1; j += 1 }
        i += 1
      } else j += 1
      union += 1
    }
    both.toDouble / union.toDouble
  }

  def serialize(): Array[Byte] = {
    var bytesLen = 0
    if (_bytesMode) {
      var i = 0
      while (i < _size) {
        bytesLen += 4 + (if (keyBytes(i) == null) 0 else keyBytes(i).length)
        i += 1
      }
    }
    val buf = ByteBuffer.allocate(32 + 16 * _size + bytesLen)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.putLong(KmvSketch.Magic)
    buf.putLong(k.toLong)
    buf.putLong(_size.toLong)
    // low 2 bits: key mode (0 = long keys, 1 = raw binary, 2 = UTF-8
    // text); bit 2: evicted (exactness lost) — needed on the wire
    // because a full-but-exact sketch (exactly k distinct keys) is
    // indistinguishable from an evicted one by size alone
    buf.putLong((if (!_bytesMode) 0L else if (_textKeys) 2L else 1L) |
      (if (_evicted) 4L else 0L))
    var i = 0
    while (i < _size) {
      buf.putLong(hashes(i) ^ Long.MinValue) // raw hash on the wire
      buf.putLong(keys(i))
      i += 1
    }
    if (_bytesMode) {
      i = 0
      while (i < _size) {
        val b = keyBytes(i)
        if (b == null) buf.putInt(-1) else { buf.putInt(b.length); buf.put(b) }
        i += 1
      }
    }
    buf.array()
  }

  override def equals(o: Any): Boolean = o match {
    case s: KmvSketch =>
      s.k == k && s._size == _size && s._bytesMode == _bytesMode &&
        java.util.Arrays.equals(s.serialize(), serialize())
    case _ => false
  }
  override def hashCode(): Int =
    (k, _size, if (_size == 0) 0L else hashes(0)).hashCode()

  override def toString: String =
    s"KmvSketch(k=$k, size=${_size}, exact=$isExact, est=$estimateLong)"
}

object KmvSketch {
  private[sketch] final val Magic = 0x31564d4b54465247L // "GRFTKMV1"
  private[graft] final val KeySeed = 0x5851f42d4c957f2dL

  def apply(k: Int = 1024): KmvSketch = {
    require(k >= 16 && k <= (1 << 20), s"k must be in [16, 2^20], got $k")
    new KmvSketch(k, new Array[Long](k), new Array[Long](k), null, 0,
      _bytesMode = false, _textKeys = false, _evicted = false)
  }

  def deserialize(bytes: Array[Byte]): KmvSketch = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(buf.remaining() >= 32, "kmv image truncated: no header")
    require(buf.getLong() == Magic, "bad kmv magic")
    // validate the RAW longs BEFORE any .toInt narrowing — a corrupt high
    // word must be rejected, not silently truncated into a "valid" value
    val kL = buf.getLong()
    require(kL >= 16L && kL <= (1L << 20), s"corrupt kmv: k=$kL")
    val k = kL.toInt
    val nL = buf.getLong()
    require(nL >= 0L && nL <= kL, s"corrupt kmv: size=$nL k=$kL")
    val n = nL.toInt
    val modeWord = buf.getLong()
    val mode = modeWord & 3L
    require(modeWord >= 0L && (modeWord & ~7L) == 0L && mode <= 2L,
      s"corrupt kmv: mode word $modeWord")
    val evicted = (modeWord & 4L) != 0L
    // an evicted sketch is necessarily full; a flag claiming eviction on
    // a below-capacity image is a forgery
    require(!evicted || nL == kL,
      s"corrupt kmv: evicted flag with size=$nL < k=$kL")
    // the fixed-width section must fit before any entry allocation: a
    // hostile n with a tiny image must fail cleanly up front
    require(bytes.length >= 32 + 16L * n,
      s"kmv image truncated: $n entries need ${32 + 16L * n} bytes, got ${bytes.length}")
    val s = apply(k)
    if (mode >= 1L) {
      s._bytesMode = true
      s._textKeys = mode == 2L
      s.keyBytes = new Array[Array[Byte]](k)
    }
    var prev = Long.MinValue
    var first = true
    var i = 0
    while (i < n) {
      val h = buf.getLong() ^ Long.MinValue // flipped
      // canonical form is strictly ascending: enforces both sortedness
      // and hash distinctness in one check
      require(first || h > prev, "corrupt kmv: hashes not strictly ascending")
      first = false
      prev = h
      s.hashes(i) = h
      s.keys(i) = buf.getLong()
      i += 1
    }
    if (mode >= 1L) {
      i = 0
      while (i < n) {
        // the per-entry length int itself must be present — a byte-mode
        // image truncated inside the variable-length section must reject
        // with the same clean error as any other corruption, not escape
        // as a BufferUnderflowException
        require(buf.remaining() >= 4,
          s"kmv image truncated: entry $i/$n has no length field")
        val len = buf.getInt()
        // bound BEFORE allocating: a corrupt length must fail cleanly,
        // not OOM on a multi-GB allocation attempt. -1 is the only legal
        // null marker (the serializer writes nothing else negative).
        require(len == -1 || (len >= 0 && len <= buf.remaining()),
          s"corrupt kmv: key length $len (${buf.remaining()} bytes remain)")
        if (len >= 0) { val b = new Array[Byte](len); buf.get(b); s.keyBytes(i) = b }
        i += 1
      }
    }
    s._size = n
    s._evicted = evicted
    s
  }
}
