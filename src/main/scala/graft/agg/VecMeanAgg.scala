package graft.agg

import java.nio.{ByteBuffer, ByteOrder}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Element-wise mean of a numeric-array column (array<double> out) — the
  * distributed centroid computation for spherical k-means over embedding
  * columns (IVF codebook refinement) and a generally useful vector
  * pipeline aggregate. Buffer = [count, sum_0..sum_{d-1}] doubles;
  * partial/final split like every graft sketch agg, so the shuffle carries
  * one (d+1)-double buffer per group per partition, never the vectors.
  * Rows shorter than the first-seen dimensionality contribute to their
  * prefix; longer rows extend the buffer (ragged inputs tolerated). */
case class VecMeanAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[Array[Double]] {
  override def prettyName: String = "vec_mean_agg"
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  // the shared getter covers EVERY NumericType checkInputDataTypes
  // admits (a local copy drifted and crashed on array<short>/<decimal>)
  @transient private lazy val get: (ArrayData, Int) => Double =
    graft.functions.CosineSim.getter(child.dataType)

  // buffer(0) = row count, buffer(1..) = element sums; null = nothing seen
  override def createAggregationBuffer(): Array[Double] = null

  override def update(buffer: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) return buffer
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var buf = buffer
    if (buf == null) buf = new Array[Double](n + 1)
    else if (buf.length < n + 1) buf = java.util.Arrays.copyOf(buf, n + 1)
    buf(0) += 1.0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) buf(i + 1) += get(arr, i)
      i += 1
    }
    buf
  }

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    if (a == null) return b
    if (b == null) return a
    val (big, small) = if (a.length >= b.length) (a, b) else (b, a)
    var i = 0
    while (i < small.length) { big(i) += small(i); i += 1 }
    big
  }

  override def eval(buffer: Array[Double]): Any = {
    if (buffer == null || buffer(0) == 0.0)
      return new GenericArrayData(Array.emptyDoubleArray)
    val n = buffer(0)
    val out = new Array[Double](buffer.length - 1)
    var i = 0
    while (i < out.length) { out(i) = buffer(i + 1) / n; i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buffer: Array[Double]): Array[Byte] = {
    if (buffer == null) return Array.emptyByteArray
    val bb = ByteBuffer.allocate(8 * buffer.length).order(ByteOrder.LITTLE_ENDIAN)
    bb.asDoubleBuffer().put(buffer)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    if (bytes.isEmpty) return null
    val out = new Array[Double](bytes.length / 8)
    ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN).asDoubleBuffer().get(out)
    out
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: NumericType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vec_mean_agg requires an array<numeric> column, got $other")
  }
  override def withNewMutableAggBufferOffset(o: Int): VecMeanAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): VecMeanAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): VecMeanAgg =
    copy(child = c.head)
}
