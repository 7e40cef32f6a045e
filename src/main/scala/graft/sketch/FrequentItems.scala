package graft.sketch

import java.nio.{ByteBuffer, ByteOrder}

/** Mergeable heavy-hitters summary: Misra-Gries counters with an explicit
  * global error offset — the mergeable-summaries form (Agarwal, Cormode,
  * Huang, Phillips, Wei, Yi, PODS'12) of the SpaceSaving / stream-summary
  * sketch (Metwally, Agrawal, El Abbadi 2005). The reference's whole
  * workload is multiplicity counting over heavy-dup token streams
  * (/root/reference/src/main.rs:96-105); this is its natural top-k
  * companion: one pass, k counters, associative merge — so "find the
  * heavy keys" never needs an all-distinct-keys scan.
  *
  * State: at most `k` (key → count) counters plus one `offset`.
  * - insert adds exact weight to the key's counter;
  * - when a new key would exceed `k` counters, PURGE: subtract the median
  *   counter value from every counter, drop the non-positive, add the
  *   median to `offset`;
  * - merge sums matched counters, unions the rest, adds offsets, then
  *   purges back down to `k`.
  *
  * Invariants (hold under any merge tree — each purge of m removes
  * ≥ m·(size/2) counted mass, and total counted mass ≤ N):
  * - present key: true − offset ≤ count ≤ true
  * - absent  key: true ≤ offset
  * - offset ≤ 2·N/k  (the published bound; ε = 2/k)
  * So `count + offset` is the SpaceSaving-style upper bound, `count` the
  * lower bound, and EVERY key with true count > offset is present —
  * candidate enumeration for heavy hitters is complete by construction.
  *
  * Keys are canonical longs; byte/string keys fold through a 64-bit hash
  * (same folding policy as CMS/Bloom) and keep their first-seen bytes
  * alongside the counter so top-k can report the original key.
  */
final class FrequentItems private (
    val k: Int,
    private var cap: Int, // power of two, > k
    private var mapKeys: Array[Long],
    private var mapCounts: Array[Long],
    private var mapUsed: Array[Boolean],
    private var mapBytes: Array[Array[Byte]], // null unless bytes mode
    private var _size: Int,
    private var _total: Long,
    private var _offset: Long,
    private var _bytesMode: Boolean,
    private var _textKeys: Boolean
) extends Serializable {

  def size: Int = _size
  def total: Long = _total
  /** Max undercount of any counter; max true count of any absent key. */
  def offset: Long = _offset
  def bytesMode: Boolean = _bytesMode
  /** True when the byte keys are known to be UTF-8 text (string-typed
    * input): only then may reporting surfaces render them as strings —
    * arbitrary binary keys (fingerprints) would come out as mojibake. */
  def textKeys: Boolean = _textKeys
  /** Declare the byte keys UTF-8 text (callers that know the input type,
    * e.g. a string-typed aggregate child). */
  def markTextKeys(): Unit = _textKeys = true

  @inline private def slotOf(key: Long): Int = {
    val mask = cap - 1
    var s = (WangHash.mix64(key, 0x9e3779b97f4a7c15L) & mask.toLong).toInt
    while (mapUsed(s) && mapKeys(s) != key) s = (s + 1) & mask
    s
  }

  private def insertAt(s: Int, key: Long, count: Long, bytes: Array[Byte]): Unit = {
    mapUsed(s) = true
    mapKeys(s) = key
    mapCounts(s) = count
    if (_bytesMode) mapBytes(s) = bytes
    _size += 1
  }

  /** Count `w` occurrences of canonical long key `key`. */
  def add(key: Long, w: Long = 1L): Unit = {
    require(!_bytesMode,
      "cannot mix long and byte keys in one frequent-items sketch")
    addKeyed(key, null, w)
  }

  /** Byte-key path: identity is the 64-bit fold (CMS/Bloom folding
    * policy); original bytes ride along for reporting. */
  def addBytes(b: Array[Byte], w: Long = 1L): Unit = {
    if (!_bytesMode) {
      require(_size == 0 && _total == 0L,
        "cannot mix long and byte keys in one frequent-items sketch")
      _bytesMode = true
      mapBytes = new Array[Array[Byte]](cap)
    }
    addKeyed(WangHash.mixBytes(b, FrequentItems.KeySeed), b, w)
  }

  private def addKeyed(key: Long, bytes: Array[Byte], w: Long): Unit = {
    if (w <= 0L) { require(w == 0L, s"negative weight $w"); return }
    _total += w
    val s = slotOf(key)
    if (mapUsed(s)) mapCounts(s) += w
    else {
      if (_size >= k) { purge(); addNewAfterPurge(key, bytes, w); return }
      insertAt(s, key, w, bytes)
    }
  }

  /** purge() rebuilt the map, so the probe position must be recomputed;
    * the purge may also have dropped everything (uniform counts), in
    * which case the map is empty and the insert always fits (k >= 1). */
  private def addNewAfterPurge(key: Long, bytes: Array[Byte], w: Long): Unit = {
    val s = slotOf(key)
    insertAt(s, key, w, bytes)
  }

  /** Subtract the (lower) median counter from all counters, drop the
    * non-positive, fold the median into `offset`. Leaves ≤ ceil(k/2)
    * counters, so the amortized insert cost stays O(1). */
  private def purge(): Unit = {
    val cs = new Array[Long](_size)
    var i = 0
    var j = 0
    while (i < cap) { if (mapUsed(i)) { cs(j) = mapCounts(i); j += 1 }; i += 1 }
    java.util.Arrays.sort(cs)
    val m = math.max(1L, cs((cs.length - 1) / 2)) // lower median, >= 1
    _offset += m
    // rebuild wholesale: linear-probe deletion via tombstones would decay
    // under the constant churn of evictions
    val oldKeys = mapKeys; val oldCounts = mapCounts
    val oldUsed = mapUsed; val oldBytes = mapBytes
    mapKeys = new Array[Long](cap)
    mapCounts = new Array[Long](cap)
    mapUsed = new Array[Boolean](cap)
    if (_bytesMode) mapBytes = new Array[Array[Byte]](cap)
    _size = 0
    i = 0
    while (i < cap) {
      if (oldUsed(i) && oldCounts(i) > m) {
        val s = slotOf(oldKeys(i))
        insertAt(s, oldKeys(i), oldCounts(i) - m,
          if (_bytesMode) oldBytes(i) else null)
      }
      i += 1
    }
  }

  // probing across key modes hashes in a DISJOINT domain and would
  // silently return offset — a plausible but meaningless count — so the
  // probe API enforces the mode the same way kmv_jaccard does. An empty
  // sketch answers either mode (offset is the same for any key).
  @inline private def requireLongMode(): Unit = require(!_bytesMode,
    "long-key probe of a byte-keyed frequent-items sketch")
  @inline private def requireBytesMode(): Unit = require(_bytesMode || _size == 0,
    "byte-key probe of a long-keyed frequent-items sketch")
  @inline private def estimateCanonical(key: Long): Long = {
    val s = slotOf(key)
    if (mapUsed(s)) mapCounts(s) + _offset else _offset
  }
  /** Upper-bound estimate (the SpaceSaving count): count + offset when
    * present, offset when absent. */
  def estimate(key: Long): Long = { requireLongMode(); estimateCanonical(key) }
  def estimateBytes(b: Array[Byte]): Long = {
    requireBytesMode()
    estimateCanonical(WangHash.mixBytes(b, FrequentItems.KeySeed))
  }
  /** Lower bound: guaranteed-at-least count (0 when absent). */
  def lowerBound(key: Long): Long = {
    requireLongMode()
    val s = slotOf(key)
    if (mapUsed(s)) mapCounts(s) else 0L
  }
  def lowerBoundBytes(b: Array[Byte]): Long = {
    requireBytesMode()
    val s = slotOf(WangHash.mixBytes(b, FrequentItems.KeySeed))
    if (mapUsed(s)) mapCounts(s) else 0L
  }

  /** Entries ordered by count desc, then key asc — deterministic given
    * sketch content. Fields: (key, count, firstSeenBytes|null). */
  def entries: Array[(Long, Long, Array[Byte])] = {
    val out = new Array[(Long, Long, Array[Byte])](_size)
    var i = 0
    var j = 0
    while (i < cap) {
      if (mapUsed(i))
        { out(j) = (mapKeys(i), mapCounts(i), if (_bytesMode) mapBytes(i) else null); j += 1 }
      i += 1
    }
    java.util.Arrays.sort(out, (a: (Long, Long, Array[Byte]), b: (Long, Long, Array[Byte])) => {
      val c = java.lang.Long.compare(b._2, a._2)
      if (c != 0) c else java.lang.Long.compare(a._1, b._1)
    })
    out
  }

  def topK(n: Int): Array[(Long, Long, Array[Byte])] = entries.take(n)

  /** Independent deep copy, so shared/cached instances can be combined
    * without mutation. */
  def copied: FrequentItems = new FrequentItems(k, cap,
    mapKeys.clone(), mapCounts.clone(), mapUsed.clone(),
    if (mapBytes == null) null else mapBytes.clone(),
    _size, _total, _offset, _bytesMode, _textKeys)

  /** An empty sketch (no entries, no counted mass) carries no key-mode
    * information: it merges into / absorbs anything. */
  private def isEmpty: Boolean = _size == 0 && _total == 0L

  /** Misra-Gries union. Callers must use the RETURN VALUE: when this side
    * is empty with zero offset and the k parameters mismatch, the result
    * is a COPY of `other` and `this` is left unchanged — a default-k
    * empty sketch (e.g. a merge-agg's output for a whole-null group) is a
    * legal merge identity regardless of its k; real state (or a nonzero
    * offset, which carries error mass) with mismatched k still rejects. */
  def mergeInPlace(other: FrequentItems): FrequentItems = {
    if (other.k != k) {
      if (other.isEmpty && other._offset == 0L) return this
      if (isEmpty && _offset == 0L) return other.copied
    }
    require(other.k == k,
      s"frequent-items k mismatch: $k vs ${other.k}")
    if (other.isEmpty) { _offset += other._offset; return this }
    if (isEmpty) {
      // empty accumulator adopts the other's key mode wholesale
      if (_bytesMode != other._bytesMode) {
        _bytesMode = other._bytesMode
        mapBytes = if (_bytesMode) new Array[Array[Byte]](cap) else null
      }
      _textKeys = other._textKeys
    }
    require(_bytesMode == other._bytesMode,
      "cannot merge long-keyed and byte-keyed frequent-items sketches")
    // text-rendering survives only when BOTH sides are known text
    _textKeys = _textKeys && other._textKeys
    var i = 0
    while (i < other.cap) {
      if (other.mapUsed(i)) {
        val key = other.mapKeys(i)
        val s = slotOf(key)
        if (mapUsed(s)) {
          mapCounts(s) += other.mapCounts(i)
          if (_bytesMode && mapBytes(s) == null) mapBytes(s) = other.mapBytes(i)
        } else if (_size < k) {
          insertAt(s, key, other.mapCounts(i),
            if (other._bytesMode) other.mapBytes(i) else null)
        } else {
          purge()
          val s2 = slotOf(key)
          if (mapUsed(s2)) mapCounts(s2) += other.mapCounts(i)
          else insertAt(s2, key, other.mapCounts(i),
            if (other._bytesMode) other.mapBytes(i) else null)
        }
      }
      i += 1
    }
    _total += other._total
    _offset += other._offset
    this
  }

  def serialize(): Array[Byte] = {
    val es = entries // canonical order -> canonical bytes
    var bytesLen = 0
    if (_bytesMode) {
      var i = 0
      while (i < es.length) {
        bytesLen += 4 + (if (es(i)._3 == null) 0 else es(i)._3.length)
        i += 1
      }
    }
    val buf = ByteBuffer.allocate(48 + 16 * es.length + bytesLen)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.putLong(FrequentItems.Magic)
    buf.putLong(k.toLong)
    buf.putLong(es.length.toLong)
    buf.putLong(_total)
    buf.putLong(_offset)
    // key mode: 0 = long keys, 1 = raw binary keys, 2 = UTF-8 text keys
    buf.putLong(if (!_bytesMode) 0L else if (_textKeys) 2L else 1L)
    var i = 0
    while (i < es.length) { buf.putLong(es(i)._1); buf.putLong(es(i)._2); i += 1 }
    if (_bytesMode) {
      i = 0
      while (i < es.length) {
        val b = es(i)._3
        if (b == null) buf.putInt(-1) else { buf.putInt(b.length); buf.put(b) }
        i += 1
      }
    }
    buf.array()
  }

  override def equals(o: Any): Boolean = o match {
    case f: FrequentItems =>
      f.k == k && f._total == _total && f._offset == _offset &&
        f._bytesMode == _bytesMode &&
        java.util.Arrays.equals(f.serialize(), serialize())
    case _ => false
  }
  override def hashCode(): Int =
    (k, _size, _total, _offset).hashCode()

  override def toString: String =
    s"FrequentItems(k=$k, size=${_size}, total=${_total}, offset=${_offset})"
}

object FrequentItems {
  private[sketch] final val Magic = 0x3153464354465247L // "GRFTCFS1"
  private[graft] final val KeySeed = 0x27d4eb2f165667c5L

  def apply(k: Int = 256): FrequentItems = {
    require(k >= 1 && k <= (1 << 22), s"k must be in [1, 2^22], got $k")
    // capacity 2x k (power of two): load factor <= 0.5 keeps linear
    // probing short even at exactly k live counters
    var cap = 8
    while (cap < 2 * k) cap <<= 1
    new FrequentItems(k, cap, new Array[Long](cap), new Array[Long](cap),
      new Array[Boolean](cap), null, 0, 0L, 0L, _bytesMode = false,
      _textKeys = false)
  }

  def deserialize(bytes: Array[Byte]): FrequentItems = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(buf.remaining() >= 48, "frequent-items image truncated: no header")
    require(buf.getLong() == Magic, "bad frequent-items magic")
    // validate the RAW longs BEFORE any .toInt narrowing — a corrupt high
    // word must be rejected, not silently truncated into a "valid" value
    val kL = buf.getLong()
    require(kL >= 1L && kL <= (1L << 22), s"corrupt frequent-items: k=$kL")
    val k = kL.toInt
    val nL = buf.getLong()
    require(nL >= 0L && nL <= kL, s"corrupt frequent-items: size=$nL k=$kL")
    val n = nL.toInt
    val total = buf.getLong()
    val offset = buf.getLong()
    // `mode` doubles as the format discriminator: 0/1/2 are the only
    // values this (first-release) format writes; anything else is a
    // future format or corruption and must fail here, not misparse
    val mode = buf.getLong()
    require(mode >= 0L && mode <= 2L, s"corrupt frequent-items: key mode $mode")
    val bytesMode = mode >= 1L
    require(total >= 0L && offset >= 0L,
      s"corrupt frequent-items: total=$total offset=$offset")
    // the fixed-width section must fit before any entry allocation: a
    // hostile n with a tiny image must fail cleanly up front
    require(bytes.length >= 48 + 16L * n,
      s"frequent-items image truncated: $n entries need ${48 + 16L * n} bytes, got ${bytes.length}")
    val f = apply(k)
    val ks = new Array[Long](n)
    val cs = new Array[Long](n)
    var i = 0
    while (i < n) {
      ks(i) = buf.getLong(); cs(i) = buf.getLong()
      require(cs(i) > 0L, s"corrupt frequent-items: count ${cs(i)}")
      i += 1
    }
    if (bytesMode) {
      f._bytesMode = true
      f._textKeys = mode == 2L
      f.mapBytes = new Array[Array[Byte]](f.cap)
    }
    i = 0
    while (i < n) {
      val kb = if (bytesMode) {
        // the length int itself must be present — a byte-mode image
        // truncated inside the variable-length section must reject with
        // the same clean error as any other corruption, not escape as a
        // BufferUnderflowException
        require(buf.remaining() >= 4,
          s"frequent-items image truncated: entry $i/$n has no length field")
        val len = buf.getInt()
        // bound BEFORE allocating: a corrupt length must fail cleanly,
        // not OOM on a multi-GB allocation attempt. -1 is the only legal
        // null marker (the serializer writes nothing else negative).
        require(len == -1 || (len >= 0 && len <= buf.remaining()),
          s"corrupt frequent-items: key length $len (${buf.remaining()} bytes remain)")
        if (len < 0) null
        else { val b = new Array[Byte](len); buf.get(b); b }
      } else null
      val s = f.slotOf(ks(i))
      require(!f.mapUsed(s), "corrupt frequent-items: duplicate key")
      f.insertAt(s, ks(i), cs(i), kb)
      i += 1
    }
    f._total = total
    f._offset = offset
    f
  }
}
