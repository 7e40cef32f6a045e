package graft.functions

import graft.sketch.WangHash
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Vector / signature expressions for similarity search and near-dup
  * detection. Single-pass over ArrayData (no boxing, no explode), so each
  * is one tight loop per row — the mapPartitions-free path for 100 TB.
  */

/** Cosine similarity of two float/double arrays (one fused pass).
  * Codegen-capable (not CodegenFallback): this is the inner loop of
  * brute-force ANN scoring (|corpus| x |queries| evaluations), so the
  * generated code calls [[compute]] directly on unboxed ArrayData. */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression with DirectCallCodegen2 {
  override def prettyName: String = "cosine_sim"
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    VecChecks.both(VecChecks.numericArray(left.dataType, prettyName),
      VecChecks.numericArray(right.dataType, prettyName))
  @transient private lazy val getL = CosineSim.getter(left.dataType)
  @transient private lazy val getR = CosineSim.getter(right.dataType)
  def compute(x: ArrayData, y: ArrayData): Double = {
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xi = getL(x, i); val yi = getR(y, i)
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    if (nx == 0.0 || ny == 0.0) 0.0 else dot / math.sqrt(nx * ny)
  }
  override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSim =
    copy(left = l, right = r)
}

object CosineSim {
  /** THE numeric-array element getter (shared by CosineSim, VecLshBucket,
    * VecMeanAgg and the agg layer's array updater): covers every
    * NumericType the analysis-time checks admit, so an accepted type can
    * never crash per-row. */
  private[graft] def getter(dt: DataType): (ArrayData, Int) => Double = dt match {
    case ArrayType(FloatType, _) => (a, i) => a.getFloat(i).toDouble
    case ArrayType(DoubleType, _) => (a, i) => a.getDouble(i)
    case ArrayType(IntegerType, _) => (a, i) => a.getInt(i).toDouble
    case ArrayType(LongType, _) => (a, i) => a.getLong(i).toDouble
    case ArrayType(ShortType, _) => (a, i) => a.getShort(i).toDouble
    case ArrayType(ByteType, _) => (a, i) => a.getByte(i).toDouble
    case ArrayType(d: DecimalType, _) =>
      (a, i) => a.getDecimal(i, d.precision, d.scale).toDouble
    case other => throw new IllegalArgumentException(s"numeric array getter: bad type $other")
  }
}

/** Analysis-time input checks shared by the vector/text expressions: an
  * unchecked array type reaches UnsafeArrayData with the wrong element
  * stride and reads garbage VALUES (not an error) — e.g. getLong over
  * 4-byte-packed ints. */
private[functions] object VecChecks {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  import TypeCheckResult._
  def stringArray(dt: DataType, fn: String): TypeCheckResult = dt match {
    case ArrayType(StringType, _) => TypeCheckSuccess
    case other => TypeCheckFailure(s"$fn requires array<string>, got $other")
  }
  def numericArray(dt: DataType, fn: String): TypeCheckResult = dt match {
    case ArrayType(_: NumericType, _) => TypeCheckSuccess
    case other => TypeCheckFailure(s"$fn requires array<numeric>, got $other")
  }
  def longArray(dt: DataType, fn: String): TypeCheckResult = dt match {
    case ArrayType(LongType, _) => TypeCheckSuccess
    case other => TypeCheckFailure(s"$fn requires array<bigint>, got $other")
  }
  def intArg(dt: DataType, fn: String, what: String): TypeCheckResult = dt match {
    case IntegerType => TypeCheckSuccess
    case other => TypeCheckFailure(s"$fn: $what must be INT, got $other")
  }
  def both(a: TypeCheckResult, b: => TypeCheckResult): TypeCheckResult =
    if (a != TypeCheckSuccess) a else b
}

/** Shared direct-call codegen: `ev.value = ref.compute(args...)` — keeps
  * these compute-heavy expressions inside WholeStageCodegen without the
  * per-row InternalRow boxing a CodegenFallback would add (they sit in
  * the inner loops of the dedup/ANN pipelines). One thin trait per
  * arity because defineCodeGen is protected in each base class. */
private[functions] trait DirectCallCodegen extends UnaryExpression {
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("expr", this, getClass.getName)
    defineCodeGen(ctx, ev, a => s"$ref.compute($a)")
  }
}

private[functions] trait DirectCallCodegen2 extends BinaryExpression {
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("expr", this, getClass.getName)
    defineCodeGen(ctx, ev, (a, b) => s"$ref.compute($a, $b)")
  }
}

private[functions] trait DirectCallCodegen3 extends TernaryExpression {
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("expr", this, getClass.getName)
    defineCodeGen(ctx, ev, (a, b, c) => s"$ref.compute($a, $b, $c)")
  }
}

/** Random-hyperplane LSH signature: `nPlanes` sign bits packed into a Long.
  * Plane j's component i is a deterministic pseudo-gaussian derived from
  * mix64(seed, j, i) (sum of two uniforms, good enough for sign-LSH).
  * Vectors with high cosine land in equal buckets with prob (1 - θ/π)^n. */
case class VecLshBucket(left: Expression, right: Expression, seed: Long)
    extends BinaryExpression with DirectCallCodegen2 {
  override def prettyName: String = "vec_lsh_bucket"
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    VecChecks.both(VecChecks.numericArray(left.dataType, prettyName),
      VecChecks.intArg(right.dataType, prettyName, "nPlanes"))
  @transient private lazy val get = CosineSim.getter(left.dataType)
  // plane components depend only on (seed, plane, dim): materialize them
  // once per task instead of re-mixing 64x per row element
  @transient private var planeCache: Array[Array[Double]] = _
  @transient private var planeDims: Int = -1
  private def planes(nPlanes: Int, n: Int): Array[Array[Double]] = {
    if (planeCache == null || planeCache.length != nPlanes || planeDims != n) {
      planeCache = Array.tabulate(nPlanes, n) { (j, i) =>
        val h = WangHash.mix64(j.toLong << 32 | i.toLong, seed)
        // two 21-bit uniforms in [-1,1), summed: zero-mean, symmetric
        val u1 = ((h & 0x1fffffL).toDouble / 0x100000L.toDouble) - 1.0
        val u2 = (((h >>> 21) & 0x1fffffL).toDouble / 0x100000L.toDouble) - 1.0
        u1 + u2
      }
      planeDims = n
    }
    planeCache
  }
  def compute(x: ArrayData, nPlanes: Int): Long = {
    // the signature is one packed Long: planes beyond 64 would wrap the
    // bit shift (JVM shift-count mod 64) and silently alias onto the
    // low bits — reject instead of producing wrong buckets
    require(nPlanes >= 1 && nPlanes <= 64,
      s"vec_lsh_bucket: nPlanes must be in [1, 64], got $nPlanes")
    val n = x.numElements()
    val ps = planes(nPlanes, n)
    var sig = 0L
    var j = 0
    while (j < nPlanes) {
      val p = ps(j)
      var dot = 0.0
      var i = 0
      while (i < n) { dot += get(x, i) * p(i); i += 1 }
      if (dot >= 0) sig |= (1L << j)
      j += 1
    }
    sig
  }
  override def nullSafeEval(vec: Any, nPlanesAny: Any): Any =
    compute(vec.asInstanceOf[ArrayData], nPlanesAny.asInstanceOf[Int])
  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecLshBucket =
    copy(left = l, right = r)
}

/** 64-bit SimHash over an array of strings (tokens or shingles): bit b of
  * the output is the sign of sum over tokens of (+1/-1 by bit b of the
  * token's hash). Near-identical documents differ in few bits. One pass:
  * per token one mix, then 64 counter updates. */
case class SimHash64(child: Expression)
    extends UnaryExpression with DirectCallCodegen {
  override def prettyName: String = "simhash64"
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    VecChecks.stringArray(child.dataType, prettyName)
  def compute(arr: ArrayData): Long = {
    val n = arr.numElements()
    val counts = new Array[Int](64)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = WangHash.mixBytes(arr.getUTF8String(i).getBytes, 0x5f3759dfL)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }
  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])
  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(child = c)
}

/** MinHash signature: `nHashes` 64-bit minima over the token/shingle set,
  * hash j = mix64(tokenHash, seed_j). Returns array<long>. */
case class MinHashSig(left: Expression, right: Expression)
    extends BinaryExpression with DirectCallCodegen2 {
  override def prettyName: String = "minhash_sig"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    VecChecks.both(VecChecks.stringArray(left.dataType, prettyName),
      VecChecks.intArg(right.dataType, prettyName, "nHashes"))
  def compute(arr: ArrayData, nHashes: Int): ArrayData = {
    // nHashes < 1 would NegativeArraySizeException (or emit a zero-length
    // signature every LSH band slices out of range) — reject like
    // vec_lsh_bucket rejects its plane count
    require(nHashes >= 1, s"minhash_sig: nHashes must be >= 1, got $nHashes")
    val mins = Array.fill(nHashes)(Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val base = WangHash.mixBytes(arr.getUTF8String(i).getBytes, 0x2545f491L)
        var j = 0
        while (j < nHashes) {
          val h = WangHash.mix64(base, 0x9e3779b97f4a7c15L * (j + 1))
          if (h < mins(j)) mins(j) = h
          j += 1
        }
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(mins)
  }
  override def nullSafeEval(v: Any, nh: Any): Any =
    compute(v.asInstanceOf[ArrayData], nh.asInstanceOf[Int])
  override protected def withNewChildrenInternal(l: Expression, r: Expression): MinHashSig =
    copy(left = l, right = r)
}

/** Distinct-set overlap of two string arrays in one pass:
  * struct(inter, uni). Replaces size(array_intersect) +
  * size(array_union), which materialize both result arrays — this is the
  * inner loop of blocked n-gram Jaccard over candidate pairs. */
case class SetOverlap(left: Expression, right: Expression)
    extends BinaryExpression with DirectCallCodegen2 {
  override def prettyName: String = "set_overlap"
  override def dataType: DataType = SetOverlap.schema
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    VecChecks.both(VecChecks.stringArray(left.dataType, prettyName),
      VecChecks.stringArray(right.dataType, prettyName))
  def compute(x: ArrayData, y: ArrayData): org.apache.spark.sql.catalyst.InternalRow = {
    val sa = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String]()
    var i = 0
    val nx = x.numElements()
    while (i < nx) {
      if (!x.isNullAt(i)) sa.add(x.getUTF8String(i))
      i += 1
    }
    val seenB = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String]()
    var inter = 0
    var onlyB = 0
    i = 0
    val ny = y.numElements()
    while (i < ny) {
      if (!y.isNullAt(i)) {
        val v = y.getUTF8String(i)
        if (seenB.add(v)) {
          if (sa.contains(v)) inter += 1 else onlyB += 1
        }
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(inter, sa.size() + onlyB)
  }
  override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SetOverlap =
    copy(left = l, right = r)
}
object SetOverlap {
  val schema: StructType = new StructType()
    .add("inter", IntegerType, nullable = false)
    .add("uni", IntegerType, nullable = false)
}

/** Fused string-free MinHash over word k-shingles: one pass hashes each
  * token once, combines rolling k-windows polynomially, and keeps
  * `nHashes` minima — no shingle strings are ever materialized (the
  * naive pipeline builds O(n·k) characters per document). */
case class ShingleMinHash(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with DirectCallCodegen3 {
  override def prettyName: String = "shingle_minhash"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    VecChecks.both(VecChecks.stringArray(first.dataType, prettyName),
      VecChecks.both(VecChecks.intArg(second.dataType, prettyName, "k"),
        VecChecks.intArg(third.dataType, prettyName, "nHashes")))
  def compute(arr: ArrayData, k: Int, nHashes: Int): ArrayData = {
    // k < 1 makes every window hash the same constant (the inner j < k
    // loop never runs) — every document would get an IDENTICAL signature
    // and LSH dedup would silently collapse the whole corpus into one
    // cluster; nHashes < 1 crashes Array.fill. Reject both.
    require(k >= 1, s"shingle_minhash: k must be >= 1, got $k")
    require(nHashes >= 1, s"shingle_minhash: nHashes must be >= 1, got $nHashes")
    val n = arr.numElements()
    val mins = Array.fill(nHashes)(Long.MaxValue)
    if (n >= k) {
      val th = new Array[Long](n)
      var i = 0
      while (i < n) {
        th(i) =
          if (arr.isNullAt(i)) 0L
          else WangHash.mixBytes(arr.getUTF8String(i).getBytes, 0x2545f491L)
        i += 1
      }
      i = 0
      while (i + k <= n) {
        var sh = 0xcbf29ce484222325L
        var j = 0
        while (j < k) { sh = sh * 0x100000001b3L + th(i + j); j += 1 }
        val base = WangHash.mix64(sh, 0x1f83d9abL)
        var h = base
        var m = 0
        while (m < nHashes) {
          h = WangHash.mix64(base, 0x9e3779b97f4a7c15L * (m + 1))
          if (h < mins(m)) mins(m) = h
          m += 1
        }
        i += 1
      }
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(mins)
  }
  override def nullSafeEval(tokens: Any, kAny: Any, nhAny: Any): Any =
    compute(tokens.asInstanceOf[ArrayData], kAny.asInstanceOf[Int],
      nhAny.asInstanceOf[Int])
  override protected def withNewChildrenInternal(a: Expression, b: Expression,
      c: Expression): ShingleMinHash = copy(first = a, second = b, third = c)
}

/** Sorted distinct 64-bit hashes of the word k-shingles of a token array —
  * the per-row precomputation for exact Jaccard: each document is hashed
  * once, pairs then compare longs (see SortedLongOverlap). */
case class ShingleHashSet(left: Expression, right: Expression)
    extends BinaryExpression with DirectCallCodegen2 {
  override def prettyName: String = "shingle_hash_set"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    VecChecks.both(VecChecks.stringArray(left.dataType, prettyName),
      VecChecks.intArg(right.dataType, prettyName, "k"))
  def compute(arr: ArrayData, k: Int): ArrayData = {
    // k < 1 would make the n < k guard unreachable and every document
    // share the constant empty-window hash — silent total collapse of
    // exact Jaccard (inter == uni == 1 for every pair)
    require(k >= 1, s"shingle_hash_set: k must be >= 1, got $k")
    val n = arr.numElements()
    if (n < k)
      return org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(new Array[Long](0))
    val th = new Array[Long](n)
    var i = 0
    while (i < n) {
      th(i) =
        if (arr.isNullAt(i)) 0L
        else WangHash.mixBytes(arr.getUTF8String(i).getBytes, 0x2545f491L)
      i += 1
    }
    val out = new Array[Long](n - k + 1)
    i = 0
    while (i + k <= n) {
      var sh = 0xcbf29ce484222325L
      var j = 0
      while (j < k) { sh = sh * 0x100000001b3L + th(i + j); j += 1 }
      out(i) = WangHash.mix64(sh, 0x1f83d9abL)
      i += 1
    }
    java.util.Arrays.sort(out)
    // dedupe in place
    var w = 0
    i = 0
    while (i < out.length) {
      if (w == 0 || out(i) != out(w - 1)) { out(w) = out(i); w += 1 }
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(java.util.Arrays.copyOf(out, w))
  }
  override def nullSafeEval(tokens: Any, kAny: Any): Any =
    compute(tokens.asInstanceOf[ArrayData], kAny.asInstanceOf[Int])
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ShingleHashSet =
    copy(left = l, right = r)
}

/** Overlap of two SORTED distinct long arrays by two-pointer walk:
  * struct(inter, uni). Zero allocation; ~1e6+ pairs/sec/core. */
case class SortedLongOverlap(left: Expression, right: Expression)
    extends BinaryExpression with DirectCallCodegen2 {
  override def prettyName: String = "sorted_long_overlap"
  override def dataType: DataType = SetOverlap.schema
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    VecChecks.both(VecChecks.longArray(left.dataType, prettyName),
      VecChecks.longArray(right.dataType, prettyName))
  def compute(x: ArrayData, y: ArrayData): org.apache.spark.sql.catalyst.InternalRow = {
    val nx = x.numElements()
    val ny = y.numElements()
    var i = 0; var j = 0; var inter = 0
    while (i < nx && j < ny) {
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv == yv) { inter += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(inter, nx + ny - inter)
  }
  override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SortedLongOverlap =
    copy(left = l, right = r)
}

/** Pack an int array into little-endian 4-byte-per-element BINARY — the
  * physical layout trick for token columns: parquet reads primitive
  * binary through the vectorized reader (one contiguous byte copy per
  * row), where array<int> goes through row-by-row nested assembly. The
  * logical schema stays array<int>; packing is an optional storage
  * transform for scan-bound jobs (see BASELINE.md scan-path analysis). */
case class PackIntsLE(child: Expression)
    extends UnaryExpression with DirectCallCodegen {
  override def prettyName: String = "pack_ints"
  override def dataType: DataType = BinaryType
  def compute(arr: ArrayData): Array[Byte] = {
    val n = arr.numElements()
    // null elements are SKIPPED (not written as 0) so that
    // cqf_agg_packed(pack_ints(x)) == cqf_agg(x) — the array aggregate
    // skips nulls too
    var cnt = 0
    var i = 0
    while (i < n) { if (!arr.isNullAt(i)) cnt += 1; i += 1 }
    val out = new Array[Byte](4 * cnt)
    var o = 0
    i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val v = arr.getInt(i)
        out(o) = v.toByte
        out(o + 1) = (v >>> 8).toByte
        out(o + 2) = (v >>> 16).toByte
        out(o + 3) = (v >>> 24).toByte
        o += 4
      }
      i += 1
    }
    out
  }
  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(IntegerType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pack_ints requires array<int>, got $other")
    }
  override protected def withNewChildInternal(c: Expression): PackIntsLE =
    copy(child = c)
}

/** Nearest-centroid assignment against a plan-embedded codebook: returns
  * the index (0-based) of the centroid with the highest cosine similarity
  * to the input vector, ties to the lowest index. The codebook is tiny
  * (nCells x dim doubles) and ships inside the serialized expression with
  * the task binary — the IVF corpus assignment is therefore ONE
  * codegen-friendly pass with no shuffle, replacing the former
  * crossJoin(corpus x centroids) + Window argmax which materialized
  * nCells copies of the corpus through an exchange.
  * Centroids are L2-normalized once per task, so per row the argmax over
  * cosine reduces to an argmax over dot products. */
case class NearestCentroid(child: Expression, centroids: Seq[Seq[Double]])
    extends UnaryExpression {
  override def prettyName: String = "nearest_centroid"
  override def dataType: DataType = IntegerType
  // an empty codebook would silently assign every row to nonexistent
  // cell 0; a non-numeric-array child would pass analysis and die at the
  // first row inside the getter (VecChecks is the family convention)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (centroids.isEmpty)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName: the codebook must be non-empty")
    else VecChecks.numericArray(child.dataType, prettyName)
  @transient private lazy val get = CosineSim.getter(child.dataType)
  @transient private lazy val normed: Array[Array[Double]] =
    centroids.map { c =>
      val a = c.toArray
      var ss = 0.0
      var i = 0
      while (i < a.length) { ss += a(i) * a(i); i += 1 }
      val inv = if (ss == 0.0) 0.0 else 1.0 / math.sqrt(ss)
      val out = new Array[Double](a.length)
      i = 0
      while (i < a.length) { out(i) = a(i) * inv; i += 1 }
      out
    }.toArray
  def compute(v: ArrayData): Int = {
    val n = v.numElements()
    var best = 0
    var bestDot = Double.NegativeInfinity
    var j = 0
    while (j < normed.length) {
      val c = normed(j)
      val m = math.min(n, c.length)
      var dot = 0.0
      var i = 0
      while (i < m) { dot += get(v, i) * c(i); i += 1 }
      if (dot > bestDot) { bestDot = dot; best = j }
      j += 1
    }
    best
  }
  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("nearestCentroid", this, classOf[NearestCentroid].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.compute($v);")
  }
  override protected def withNewChildInternal(c: Expression): NearestCentroid =
    copy(child = c)
}

/** CLEARLY-MARKED STUB (multimodal): "decode" an opaque binary blob into
  * media metadata. Real deployments replace this with an actual codec
  * behind the same schema; here the decode is a deterministic fake derived
  * from the bytes (image/audio libraries are unavailable in this
  * environment). The Spark-side plumbing — BinaryType column in, typed
  * struct out, one pass per blob — is the real, tested part. */
case class FakeMediaDecode(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "fake_media_decode"
  override def dataType: DataType = FakeMediaDecode.schema
  override def nullSafeEval(v: Any): Any = {
    val bytes = v.asInstanceOf[Array[Byte]]
    val h = WangHash.mixBytes(bytes, 0x6d656469L) // STUB: metadata from hash
    val width = 64 + ((h & 0x3ffL) % 960L).toInt
    val height = 64 + (((h >>> 10) & 0x3ffL) % 960L).toInt
    val channels = 1 + (((h >>> 20) & 3L) % 3L).toInt
    org.apache.spark.sql.catalyst.InternalRow(
      width, height, channels, bytes.length.toLong, h)
  }
  override protected def withNewChildInternal(c: Expression): FakeMediaDecode =
    copy(child = c)
}
object FakeMediaDecode {
  val schema: StructType = new StructType()
    .add("width", IntegerType).add("height", IntegerType)
    .add("channels", IntegerType).add("num_bytes", LongType)
    .add("checksum", LongType)
}
