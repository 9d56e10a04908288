package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Element-wise vector aggregation — the embedding POOLING kernel: mean
  * of a group's vectors per position (chunk embeddings → document
  * embedding, members → cluster centroid). A dense (sum[dim], n) buffer
  * with MAP-SIDE PARTIAL aggregation: each partition contributes ONE
  * dim-length vector per group to the exchange, so shuffle volume is
  * O(groups × dim × partitions) regardless of corpus size — the
  * explode-to-(group, pos) formulation shuffles |corpus| × dim rows and
  * sorts them back, unusable at 100 TB.
  *
  * Contract: all vectors in a group must share one non-zero length
  * (ragged or dim-0 input is a data bug — the aggregate FAILS loudly
  * rather than silently zero-padding) and elements must be non-null (same rationale); null
  * ARRAYS are skipped like any aggregate skips null input rows. Sums run
  * in double (deterministic given Spark's within-group accumulation
  * order at fixed partitioning; round the result for cross-engine
  * comparison, as every double-aggregation gate here does).
  */
object VectorAggregates {

  /** Mutable (sum[dim], n) accumulator; dim fixes itself on first add. */
  final class VecMeanBuffer {
    var sums: Array[Double] = null
    var n: Long = 0L

    def add(xs: Array[Double]): Unit = {
      // Zero-length vectors are rejected as loudly as ragged ones: a
      // dim-0 buffer would serialize identically to the EMPTY buffer
      // (dim=0, sums=null on the way back), so whether the group returns
      // [] or null — and whether n survives — would depend on whether
      // partial-aggregate serialization happened to run. The require
      // keeps the invariant sums == null ⟺ n == 0 that merge relies on.
      require(xs.length > 0,
        "graft_vec_mean: zero-length vector (data bug; filter or impute first)")
      if (sums == null) sums = new Array[Double](xs.length)
      require(xs.length == sums.length,
        s"graft_vec_mean: ragged vectors in one group (${xs.length} vs ${sums.length})")
      var i = 0
      while (i < xs.length) { sums(i) += xs(i); i += 1 }
      n += 1L
    }

    // other.sums == null implies other.n == 0 (add() rejects dim-0
    // vectors), so skipping a sum-less side never drops a count.
    def merge(other: VecMeanBuffer): Unit =
      if (other.sums != null) {
        if (sums == null) { sums = other.sums.clone(); n = other.n }
        else {
          require(other.sums.length == sums.length,
            s"graft_vec_mean: ragged vectors in one group (${other.sums.length} vs ${sums.length})")
          var i = 0
          while (i < sums.length) { sums(i) += other.sums(i); i += 1 }
          n += other.n
        }
      }
  }

  /** graft_vec_mean(vec) -> array<double>: per-position mean of the
    * group's vectors; null for a group whose every vector was null.
    */
  case class VecMean(child: Expression,
                     mutableAggBufferOffset: Int = 0,
                     inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[VecMeanBuffer] {

    override def children: Seq[Expression] = Seq(child)
    override def nullable: Boolean = true
    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case ArrayType(_: NumericType, _) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"graft_vec_mean requires a numeric array, got $other")
      }

    private def elemType: NumericType =
      child.dataType.asInstanceOf[ArrayType].elementType.asInstanceOf[NumericType]

    override def createAggregationBuffer(): VecMeanBuffer = new VecMeanBuffer

    override def update(buffer: VecMeanBuffer, input: InternalRow): VecMeanBuffer = {
      val v = child.eval(input)
      if (v != null) {
        val arr = v.asInstanceOf[ArrayData]
        val n = arr.numElements()
        val xs = new Array[Double](n)
        var i = 0
        while (i < n) {
          require(!arr.isNullAt(i),
            "graft_vec_mean: null element inside a vector (data bug; filter or impute first)")
          xs(i) = elemType match {
            case FloatType => arr.getFloat(i).toDouble
            case DoubleType => arr.getDouble(i)
            case IntegerType => arr.getInt(i).toDouble
            case LongType => arr.getLong(i).toDouble
            case ShortType => arr.getShort(i).toDouble
            case ByteType => arr.getByte(i).toDouble
            case d: DecimalType => arr.getDecimal(i, d.precision, d.scale).toDouble
          }
          i += 1
        }
        buffer.add(xs)
      }
      buffer
    }

    override def merge(buffer: VecMeanBuffer, other: VecMeanBuffer): VecMeanBuffer = {
      buffer.merge(other)
      buffer
    }

    override def eval(buffer: VecMeanBuffer): Any =
      if (buffer.sums == null) null
      else {
        val out = new Array[Any](buffer.sums.length)
        var i = 0
        while (i < out.length) { out(i) = buffer.sums(i) / buffer.n; i += 1 }
        new GenericArrayData(out)
      }

    override def serialize(buffer: VecMeanBuffer): Array[Byte] = {
      val dim = if (buffer.sums == null) 0 else buffer.sums.length
      val bb = ByteBuffer.allocate(12 + dim * 8)
      bb.putLong(buffer.n).putInt(dim)
      var i = 0
      while (i < dim) { bb.putDouble(buffer.sums(i)); i += 1 }
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): VecMeanBuffer = {
      val bb = ByteBuffer.wrap(bytes)
      val buf = new VecMeanBuffer
      buf.n = bb.getLong
      val dim = bb.getInt
      if (dim > 0) {
        buf.sums = new Array[Double](dim)
        var i = 0
        while (i < dim) { buf.sums(i) = bb.getDouble; i += 1 }
      }
      buf
    }

    override def withNewMutableAggBufferOffset(newOffset: Int): VecMean =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): VecMean =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): VecMean =
      copy(child = newChildren(0))
    override def prettyName: String = "graft_vec_mean"
  }

  /** Column form: per-position mean of the group's vectors. */
  def vecMean(vec: Column): Column =
    GraftShims.column(
      VecMean(GraftShims.expression(vec)).toAggregateExpression())
}
