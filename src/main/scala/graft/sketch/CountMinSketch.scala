package graft.sketch

import java.nio.{ByteBuffer, ByteOrder}

/** Count-min sketch (Cormode & Muthukrishnan 2005): depth x width Long
  * matrix, overestimate-only point queries with error ≤ εN at
  * width = ceil(e/ε) with probability 1-δ at depth = ceil(ln 1/δ).
  * Mergeable by element-wise sum.
  */
final class CountMinSketch private (
    val depth: Int,
    val width: Int,
    private val table: Array[Long],
    private var _total: Long
) extends Serializable {

  def total: Long = _total

  @inline private def bucket(row: Int, h1: Long, h2: Long): Int = {
    val h = h1 + row.toLong * h2
    (((h % width) + width) % width).toInt
  }

  def addHash(h1: Long, h2: Long, count: Long): Unit = {
    var r = 0
    while (r < depth) {
      table(r * width + bucket(r, h1, h2)) += count
      r += 1
    }
    _total += count
  }

  def add(key: Long, count: Long = 1L): Unit =
    addHash(WangHash.mix64(key, CountMinSketch.Seed1),
      WangHash.mix64(key, CountMinSketch.Seed2), count)
  def addString(s: String, count: Long): Unit = {
    val b = s.getBytes("UTF-8")
    addHash(WangHash.mixBytes(b, CountMinSketch.Seed1),
      WangHash.mixBytes(b, CountMinSketch.Seed2), count)
  }

  def estimateHash(h1: Long, h2: Long): Long = {
    var min = Long.MaxValue
    var r = 0
    while (r < depth) {
      val v = table(r * width + bucket(r, h1, h2))
      if (v < min) min = v
      r += 1
    }
    min
  }

  def estimate(key: Long): Long =
    estimateHash(WangHash.mix64(key, CountMinSketch.Seed1),
      WangHash.mix64(key, CountMinSketch.Seed2))
  def estimateString(s: String): Long = {
    val b = s.getBytes("UTF-8")
    estimateHash(WangHash.mixBytes(b, CountMinSketch.Seed1),
      WangHash.mixBytes(b, CountMinSketch.Seed2))
  }

  /** Counters holding a nonzero value — the structure-fill metric
    * surfaced by sketch_meta. */
  def nonzeroCounters: Int = {
    var nz = 0
    var i = 0
    while (i < table.length) { if (table(i) != 0L) nz += 1; i += 1 }
    nz
  }

  /** Independent deep copy (cell-table clone) — lets callers combine
    * cached/shared instances without mutating them. */
  def copied: CountMinSketch = new CountMinSketch(depth, width, table.clone(), _total)

  /** Cell-wise sum. Callers must use the RETURN VALUE: when this side is
    * stateless (zero total, all cells zero) and the shapes mismatch, the
    * result is a COPY of `other` and `this` is left unchanged — a
    * default-shape empty sketch (e.g. a merge-agg's output for a
    * whole-null group) is a legal merge identity regardless of its shape;
    * real state with mismatched shape still rejects. */
  def mergeInPlace(other: CountMinSketch): CountMinSketch = {
    if (other.depth != depth || other.width != width) {
      if (other._total == 0L && other.nonzeroCounters == 0) return this
      if (_total == 0L && nonzeroCounters == 0) return other.copied
    }
    require(other.depth == depth && other.width == width,
      s"CMS shape mismatch: ${depth}x$width vs ${other.depth}x${other.width}")
    var i = 0
    while (i < table.length) { table(i) += other.table(i); i += 1 }
    _total += other._total
    this
  }

  def serialize(): Array[Byte] = {
    val buf = ByteBuffer.allocate(32 + 8 * table.length).order(ByteOrder.LITTLE_ENDIAN)
    buf.putLong(CountMinSketch.Magic)
    buf.putLong(depth.toLong)
    buf.putLong(width.toLong)
    buf.putLong(_total)
    buf.asLongBuffer().put(table)
    buf.array()
  }

  override def equals(o: Any): Boolean = o match {
    case c: CountMinSketch =>
      c.depth == depth && c.width == width && c._total == _total &&
        java.util.Arrays.equals(c.table, table)
    case _ => false
  }
  override def hashCode(): Int = java.util.Arrays.hashCode(table)
}

object CountMinSketch {
  private[sketch] final val Magic = 0x31534d4354465247L // "GRFTCMS1"
  private[graft] final val Seed1 = 0x1b873593L
  private[graft] final val Seed2 = 0x5bd1e995L

  def apply(depth: Int = 5, width: Int = 2048): CountMinSketch = {
    require(depth >= 1 && depth <= 32 && width >= 8)
    // Int-multiply of accepted params can overflow (e.g. fromError with
    // eps ~ 5e-9 gives width ~ 543M; 5*543M > 2^31) — size in Long and
    // reject tables that cannot be one JVM array
    val cells = depth.toLong * width
    require(cells <= Int.MaxValue - 8,
      s"CMS table too large: depth=$depth x width=$width = $cells cells")
    new CountMinSketch(depth, width, new Array[Long](cells.toInt), 0L)
  }

  /** Sized from error targets: overestimate ≤ eps*N with prob 1-delta. */
  def fromError(eps: Double, delta: Double): CountMinSketch =
    apply(math.ceil(math.log(1.0 / delta)).toInt,
      math.ceil(math.E / eps).toInt)

  def deserialize(bytes: Array[Byte]): CountMinSketch = {
    require(bytes.length >= 32, s"CMS image too short: ${bytes.length} bytes")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(buf.getLong() == Magic, "bad CMS magic")
    val d = buf.getLong()
    val w = buf.getLong()
    val total = buf.getLong()
    // header fields validated against the remaining payload BEFORE any
    // allocation sized from them (the KLL/HLL hardening rule): corrupt
    // d*w would otherwise overflow the Int multiply, NegativeArraySize,
    // OOM, or BufferUnderflow — and d=0 would estimate Long.MaxValue
    require(d >= 1 && d <= 32 && w >= 8, s"corrupt CMS header: depth=$d width=$w")
    require(d * w * 8L == (bytes.length - 32).toLong,
      s"corrupt CMS payload: ${d}x$w cells vs ${bytes.length - 32} bytes")
    val table = new Array[Long]((d * w).toInt)
    buf.asLongBuffer().get(table)
    new CountMinSketch(d.toInt, w.toInt, table, total)
  }
}
