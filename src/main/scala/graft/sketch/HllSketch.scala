package graft.sketch

import java.nio.{ByteBuffer, ByteOrder}

/** Dense HyperLogLog (Flajolet et al. 2007) with linear-counting small-range
  * correction. From scratch (no DataSketches): 2^p byte registers; relative
  * standard error ≈ 1.04/sqrt(2^p). Mergeable by register max — the CQF
  * reference's merge-associativity contract (BASELINE.json north_rule)
  * applies to every sibling sketch.
  */
final class HllSketch private (val p: Int, private val registers: Array[Byte])
    extends Serializable {
  require(p >= 4 && p <= 18, s"HLL precision must be in [4,18], got $p")
  def m: Int = 1 << p

  def addHash(h: Long): Unit = {
    val idx = (h >>> (64 - p)).toInt
    val w = h << p
    // rho = leading zeros of the remaining 64-p bits, +1; w==0 ⇒ max value
    val rho = (if (w == 0L) 64 - p else java.lang.Long.numberOfLeadingZeros(w)) + 1
    val r = math.min(rho, 64 - p + 1).toByte
    if (registers(idx) < r) registers(idx) = r
  }

  def add(key: Long): Unit = addHash(WangHash.mix64(key, HllSketch.Seed))
  def addString(s: String): Unit =
    addHash(WangHash.mixBytes(s.getBytes("UTF-8"), HllSketch.Seed))

  def estimate: Double = {
    val mD = m.toDouble
    var sum = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      val r = registers(i)
      // 2^-r via shift: r is a small non-negative int (<= 64-p+1), so
      // 1.0/(1L << r) is bit-exact and ~10x cheaper than Math.pow —
      // hll_estimate runs per probed row, paying all 2^p registers each
      sum += 1.0 / (1L << r).toDouble
      if (r == 0) zeros += 1
      i += 1
    }
    val alpha =
      if (m == 16) 0.673
      else if (m == 32) 0.697
      else if (m == 64) 0.709
      else 0.7213 / (1.0 + 1.079 / mD)
    val raw = alpha * mD * mD / sum
    if (raw <= 2.5 * mD && zeros > 0) mD * math.log(mD / zeros) // linear counting
    else raw
  }

  def cardinality: Long = math.round(estimate)

  /** Registers holding a nonzero rho — the structure-fill metric
    * surfaced by sketch_meta (a fresh sketch reads 0.0, a saturated
    * one approaches 1.0). */
  def nonzeroRegisters: Int = {
    var nz = 0
    var i = 0
    while (i < m) { if (registers(i) != 0) nz += 1; i += 1 }
    nz
  }

  /** Independent deep copy (register-array clone) — lets callers combine
    * cached/shared instances without mutating them. */
  def copied: HllSketch = new HllSketch(p, registers.clone())

  /** Register-max union. Callers must use the RETURN VALUE: when this
    * side is stateless (all registers zero) and the precisions mismatch,
    * the result is a COPY of `other` and `this` is left unchanged — a
    * default-precision empty sketch (e.g. a merge-agg's output for a
    * whole-null group) is a legal merge identity regardless of its p;
    * real state with mismatched p still rejects. */
  def mergeInPlace(other: HllSketch): HllSketch = {
    if (other.p != p) {
      if (other.nonzeroRegisters == 0) return this
      if (nonzeroRegisters == 0) return other.copied
    }
    require(other.p == p, s"HLL precision mismatch: $p vs ${other.p}")
    var i = 0
    while (i < m) {
      if (other.registers(i) > registers(i)) registers(i) = other.registers(i)
      i += 1
    }
    this
  }

  def serialize(): Array[Byte] = {
    val buf = ByteBuffer.allocate(16 + m).order(ByteOrder.LITTLE_ENDIAN)
    buf.putLong(HllSketch.Magic)
    buf.putLong(p.toLong)
    buf.put(registers)
    buf.array()
  }

  override def equals(o: Any): Boolean = o match {
    case h: HllSketch => h.p == p && java.util.Arrays.equals(h.registers, registers)
    case _ => false
  }
  override def hashCode(): Int = java.util.Arrays.hashCode(registers)
}

object HllSketch {
  private[sketch] final val Magic = 0x314c4c4854465247L // "GRFTHLL1"
  private[graft] final val Seed = 0x48c4b06aL

  def apply(p: Int = 12): HllSketch = new HllSketch(p, new Array[Byte](1 << p))

  def deserialize(bytes: Array[Byte]): HllSketch = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(buf.getLong() == Magic, "bad HLL magic")
    val p = buf.getLong().toInt
    // header validation before allocation: corrupt p would OOM (p ~ 60)
    // or wrap (1 << p negative) instead of failing as a clean parse error
    // p <= 18 is the CONSTRUCTOR invariant: admitting 19..21 here would
    // still allocate up to 2 MB before the constructor's require fires,
    // and the error would no longer name the input as a corrupt header
    require(p >= 4 && p <= 18, s"corrupt HLL header: p=$p")
    require(buf.remaining() == (1 << p),
      s"corrupt HLL payload: ${buf.remaining()} register bytes for p=$p")
    val regs = new Array[Byte](1 << p)
    buf.get(regs)
    // payload semantics, not just shape: every register is a rho value in
    // [0, 64-p+1] (addHash's own clamp). A forged register >= 64 would
    // wrap the shift-based 1.0/(1L << r) estimate (shift mod 64) and a
    // negative byte would drive it negative — both yield plausible-
    // looking nonsense instead of a parse error.
    val maxRho = 64 - p + 1
    var i = 0
    while (i < regs.length) {
      require(regs(i) >= 0 && regs(i) <= maxRho,
        s"corrupt HLL payload: register $i = ${regs(i)} outside [0, $maxRho]")
      i += 1
    }
    new HllSketch(p, regs)
  }
}
