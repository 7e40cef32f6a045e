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
  * Representation: a sorted base (parallel arrays ascending by FLIPPED
  * hash — hash ^ Long.MinValue, so signed order == unsigned raw order)
  * plus an unsorted acceptance buffer compacted by periodic merge. The
  * per-row hot path is a single compare against the current k-th min
  * (reject) or an O(log k) base-duplicate check; genuinely new
  * candidates append in O(1) and pay amortized O(log k) at compaction
  * (accepted inserts decay as k·ln(n/k), so compactions fade to noise
  * as the stream grows). Merge is a linear two-pointer walk over two
  * compacted bases.
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

  // Acceptance buffer: unsorted candidate (hash, key[, bytes]) triples
  // with hash strictly below the current retention threshold (the base
  // k-th min once the base is full; unconditional while it is not).
  // Accepted inserts are O(1) appends; a periodic merge-compaction
  // (stable sort + two-pointer merge with the sorted base) replaces the
  // old per-accept O(k) insertion-sort memmove, which made the initial
  // fill alone O(k^2). Lazily allocated: deserialized probe-side
  // instances never allocate it, and flush() on an empty buffer is a
  // pure read (no writes), keeping shared cached sketches race-free.
  private var bufH: Array[Long] = null
  private var bufK: Array[Long] = null
  private var bufB: Array[Array[Byte]] = null
  private var bufN: Int = 0

  def size: Int = { flush(); _size }
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
  def isExact: Boolean = { flush(); !_evicted }

  def add(key: Long): Unit = {
    require(!_bytesMode,
      "cannot mix long and byte keys in one kmv sketch")
    addHashed(WangHash.mix64(key, KmvSketch.KeySeed) ^ Long.MinValue, key, null)
  }

  def addBytes(b: Array[Byte]): Unit = {
    if (!_bytesMode) {
      require(_size == 0 && bufN == 0,
        "cannot mix long and byte keys in one kmv sketch")
      _bytesMode = true
      keyBytes = new Array[Array[Byte]](k)
      // bufB allocation rides the lazy bufH allocation in addHashed:
      // the require above guarantees no buffer exists yet here
    }
    val fold = WangHash.mixBytes(b, KmvSketch.KeySeed)
    addHashed(WangHash.mix64(fold, KmvSketch.KeySeed) ^ Long.MinValue, fold, b)
  }

  /** Insert a flipped hash with its payload. O(1) reject once the base
    * is full (a single compare against the base k-th min — any h at or
    * above it can never enter the bottom-k, and the eviction check is
    * free: h above the base max is necessarily NEW, h equal to it a
    * duplicate). Base-duplicates reject in O(log size); genuinely new
    * candidates append to the buffer in O(1) and amortize to O(log k)
    * through the periodic merge-compaction in [[flush]]. */
  private def addHashed(h: Long, key: Long, kb: Array[Byte]): Unit = {
    if (_size == k && h >= hashes(k - 1)) {
      // at/above the base max: everything in the base is <= hashes(k-1),
      // so h > max is a new hash that will never be retained (exactness
      // lost), h == max the retained maximum itself (no-op)
      if (h != hashes(k - 1)) _evicted = true
      return
    }
    // duplicate of a retained base entry? O(log size) reject keeps
    // duplicate-heavy streams out of the buffer entirely
    var lo = 0
    var hi = _size
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (hashes(mid) < h) lo = mid + 1 else hi = mid
    }
    if (lo < _size && hashes(lo) == h) return
    if (bufH == null) {
      val cap = math.min(k, KmvSketch.MaxBufCap)
      bufH = new Array[Long](cap)
      bufK = new Array[Long](cap)
      if (_bytesMode) bufB = new Array[Array[Byte]](cap)
    }
    bufH(bufN) = h
    bufK(bufN) = key
    if (_bytesMode) bufB(bufN) = kb
    bufN += 1
    if (bufN == bufH.length) flush()
  }

  /** Merge-compact the acceptance buffer into the sorted base: stable
    * sort of the buffer (first-seen wins on duplicate hashes, matching
    * the old insertion-sort semantics), then a two-pointer merge with
    * the base keeping the k smallest distinct hashes. A pure read
    * (no field writes) when the buffer is empty, so concurrently shared
    * deserialized sketches (probe caches) stay race-free. */
  private def flush(): Unit = {
    if (bufN == 0) return
    // stable index sort by hash (bottom-up merge sort on an int index
    // array): ~bufN log bufN, amortized O(log k) per accepted insert
    val n = bufN
    var idx = new Array[Int](n)
    var tmp = new Array[Int](n)
    var i = 0
    while (i < n) { idx(i) = i; i += 1 }
    var width = 1
    while (width < n) {
      var lo = 0
      while (lo < n - width) {
        val mid = lo + width
        val hi = math.min(lo + 2 * width, n)
        var a = lo; var b = mid; var o = lo
        while (a < mid && b < hi) {
          // <= keeps the left (earlier-seen) side on equal hashes
          if (bufH(idx(a)) <= bufH(idx(b))) { tmp(o) = idx(a); a += 1 }
          else { tmp(o) = idx(b); b += 1 }
          o += 1
        }
        while (a < mid) { tmp(o) = idx(a); a += 1; o += 1 }
        while (b < hi) { tmp(o) = idx(b); b += 1; o += 1 }
        System.arraycopy(tmp, lo, idx, lo, hi - lo)
        lo += 2 * width
      }
      width <<= 1
    }
    val ord = idx // every pass copies the merged runs back into idx
    // two-pointer merge of base [0, _size) and sorted buffer, dedup on
    // equal hashes (base wins over buffer; earlier buffer entry wins
    // within the buffer), capped at k
    val nh = new Array[Long](k)
    val nk = new Array[Long](k)
    val nb = if (_bytesMode) new Array[Array[Byte]](k) else null
    var bi = 0 // base cursor
    var ci = 0 // buffer cursor (via ord)
    var m = 0
    var prev = 0L
    var any = false
    while (m < k && (bi < _size || ci < n)) {
      val takeBase = ci >= n || (bi < _size && hashes(bi) <= bufH(ord(ci)))
      val (h, key, kb) =
        if (takeBase) { val r = (hashes(bi), keys(bi),
          if (_bytesMode) keyBytes(bi) else null); bi += 1; r }
        else { val j = ord(ci); val r = (bufH(j), bufK(j),
          if (_bytesMode) bufB(j) else null); ci += 1; r }
      if (any && h == prev) () // duplicate hash: first taken wins
      else {
        nh(m) = h; nk(m) = key
        if (_bytesMode) nb(m) = kb
        prev = h; any = true
        m += 1
      }
    }
    // leftovers: skip duplicates of the last kept hash before declaring
    // eviction — remaining candidates at m == k mean the distinct union
    // exceeded k
    if (m == k) {
      while (bi < _size && hashes(bi) == prev) bi += 1
      while (ci < n && bufH(ord(ci)) == prev) ci += 1
      if (bi < _size || ci < n) _evicted = true
    }
    hashes = nh; keys = nk; keyBytes = nb; _size = m
    bufN = 0
    if (_bytesMode) java.util.Arrays.fill(bufB.asInstanceOf[Array[AnyRef]], null)
  }

  /** Distinct-count estimate: exact `size` below capacity, else the
    * unbiased KMV estimator (k-1)/u_k with u_k the k-th smallest hash
    * normalized to (0, 1]. */
  def estimate: Double = {
    flush()
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
    flush()
    val m = math.min(n, _size)
    val out = new Array[(Long, Array[Byte])](m)
    var i = 0
    while (i < m) {
      out(i) = (keys(i), if (_bytesMode) keyBytes(i) else null)
      i += 1
    }
    out
  }

  private def isEmpty: Boolean = _size == 0 && bufN == 0

  /** Independent deep copy, so shared/cached instances can be combined
    * without mutation. */
  def copied: KmvSketch = {
    flush()
    new KmvSketch(k, hashes.clone(), keys.clone(),
      if (keyBytes == null) null else keyBytes.clone(),
      _size, _bytesMode, _textKeys, _evicted)
  }

  /** Fresh object SHARING the operand arrays — safe as a mergeInPlace
    * target because merge only REASSIGNS the array fields (it allocates
    * fresh output arrays and never writes into its inputs). Used by the
    * cached-operand union path to skip cloning up to three k-length
    * arrays that the merge would immediately discard. The caller's
    * operand must be compacted (deserialized instances always are) —
    * a pending buffer would otherwise flush into the shared arrays. */
  private[graft] def shallowCopied: KmvSketch = {
    require(bufN == 0, "shallowCopied requires a compacted sketch")
    new KmvSketch(k, hashes, keys, keyBytes, _size, _bytesMode, _textKeys, _evicted)
  }

  /** Bottom-k of the union of both hash sets — associative, commutative,
    * idempotent. Requires equal k (one accuracy contract per column),
    * and matching key mode unless one side is empty. */
  def mergeInPlace(other: KmvSketch): KmvSketch = {
    // Callers must use the RETURN VALUE: when this side is stateless
    // (nothing retained, never evicted) and the k parameters mismatch,
    // the result is a COPY of `other` and `this` is left unchanged — a
    // default-k empty sketch (e.g. a merge-agg's output for a whole-null
    // group) is a legal merge identity regardless of its k; real state
    // with mismatched k still rejects.
    if (other.k != k) {
      flush(); other.flush()
      if (other._size == 0 && !other._evicted) return this
      if (_size == 0 && !_evicted) return other.copied
    }
    require(other.k == k, s"kmv k mismatch: $k vs ${other.k}")
    flush()
    other.flush()
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


  /** Bottom-k Jaccard resemblance estimate against `other` (must share
    * this sketch's hash seed — all graft kmv sketches do). Exact while
    * both sides are exact; otherwise the classic estimator
    * |X ∩ A ∩ B| / |X| with X the min(kA,kB) smallest distinct hashes
    * of the union — every x ∈ X is below both sides' retention
    * thresholds, so membership tests are exact. Empty-set convention:
    * J(∅,∅)=1, J(∅,S)=0. */
  def jaccard(other: KmvSketch): Double = {
    flush()
    other.flush()
    if (isEmpty && other.isEmpty) return 1.0
    if (isEmpty || other.isEmpty) return 0.0
    // the same mode guard merge applies: long keys and byte keys hash in
    // disjoint domains, so comparing across modes would silently report
    // ~0.0 ("completely dissimilar") for identical underlying sets
    require(_bytesMode == other._bytesMode,
      "cannot compare long-keyed and byte-keyed kmv sketches")
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
    flush()
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
      // serialize() flushes both sides, so compare canonical images only
      s.k == k && s._bytesMode == _bytesMode &&
        java.util.Arrays.equals(s.serialize(), serialize())
    case _ => false
  }
  override def hashCode(): Int = {
    flush()
    (k, _size, if (_size == 0) 0L else hashes(0)).hashCode()
  }

  override def toString: String = {
    flush()
    s"KmvSketch(k=$k, size=${_size}, exact=$isExact, est=$estimateLong)"
  }
}

object KmvSketch {
  // "GRFTKMV2": v2 added the evicted flag (mode-word bit 2). The magic
  // was BUMPED with it because a v1 image that had genuinely evicted
  // (size == k, no flag bit existed) would deserialize under v2 rules as
  // full-but-exact and silently misreport kmv_distinct as exactly k —
  // a stale v1 image must fail loudly ("bad kmv magic"), not misparse.
  private[sketch] final val Magic = 0x32564d4b54465247L // "GRFTKMV2"
  private[graft] final val KeySeed = 0x5851f42d4c957f2dL
  /** Acceptance-buffer cap: full k below this, clamped above it so the
    * huge-k end (k up to 2^20) does not double its memory footprint. */
  private final val MaxBufCap = 8192

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
