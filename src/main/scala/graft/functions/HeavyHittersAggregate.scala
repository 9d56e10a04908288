package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Misra–Gries heavy-hitters sketch as a map-side-combinable aggregate —
  * the frequent-items member of the sketch family (HLL approx-distinct,
  * HDR quantiles) a 100 TB profiling pass needs.
  *
  * Why not `groupBy(item).count`: exact counting shuffles EVERY distinct
  * key — at web scale the key space (tokens, hosts, user ids) is itself
  * corpus-sized. The sketch keeps at most `k` counters per partition, so
  * the exchange carries O(k × partitions) rows regardless of
  * cardinality, and the classic mergeable-summaries bound survives the
  * merge tree: for stream length n, every estimate satisfies
  * `true − n/(k+1) ≤ est ≤ true`. Hence any item with true count
  * ≥ n/(k+1) is GUARANTEED present in the sketch — the sketch is a
  * candidate SUPERSET for any frequency threshold f once k + 1 > 1/f.
  *
  * The sketch's exact counter values depend on partitioning (the bound
  * does not), so gate-facing results never expose them directly:
  * [[graft.ops.Profile.heavyHitters]] uses the sketch as pass-1
  * candidates and re-counts them exactly in pass 2 — deterministic
  * output, sketch-sized shuffles.
  */
object HeavyHittersAggregate {

  /** Bounded counter map: at most k items. Decrement-all on overflow is
    * amortized O(1) per element (every decrement round is paid for by
    * the insertions it cancels). Keys are boxed Long or UTF8String —
    * the caller owns copying any buffer-backed key BEFORE it goes in.
    */
  final class MgBuffer(val k: Int) {
    val counts = new java.util.HashMap[AnyRef, Long](k * 2)

    def add(item: AnyRef, by: Long): Unit = {
      val cur = counts.get(item)
      if (cur != 0L || counts.containsKey(item)) counts.put(item, cur + by)
      else if (counts.size < k) counts.put(item, by)
      else {
        // Decrement every counter by the new item's weight (classic MG
        // generalized to weighted adds); drop non-positive counters. The
        // new item is "absorbed" by the same decrement.
        val min = math.min(by, minCount())
        val it = counts.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          val nv = e.getValue - min
          if (nv <= 0) it.remove() else e.setValue(nv)
        }
        val rem = by - min
        if (rem > 0 && counts.size < k) counts.put(item, rem)
      }
    }

    private def minCount(): Long = {
      var m = Long.MaxValue
      val it = counts.values().iterator()
      while (it.hasNext) { val v = it.next(); if (v < m) m = v }
      if (m == Long.MaxValue) 0L else m
    }

    /** Mergeable-summaries merge: sum counters, then if over k keep the
      * top k after subtracting the (k+1)-th largest count (errors add).
      */
    def merge(other: MgBuffer): Unit = {
      val it = other.counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val cur = counts.get(e.getKey)
        counts.put(e.getKey, cur + e.getValue)
      }
      if (counts.size > k) {
        val vals = new Array[Long](counts.size)
        var i = 0
        val vit = counts.values().iterator()
        while (vit.hasNext) { vals(i) = vit.next(); i += 1 }
        java.util.Arrays.sort(vals)
        val cut = vals(vals.length - k - 1) // (k+1)-th largest
        val eit = counts.entrySet().iterator()
        while (eit.hasNext) {
          val e = eit.next()
          val nv = e.getValue - cut
          if (nv <= 0) eit.remove() else e.setValue(nv)
        }
      }
    }
  }

  /** misra_gries(item, k) -> array<struct<item, est long>> (item keeps
    * the child's key type: integrals widen to long, strings stay
    * string), ordered est desc then item asc (a deterministic ORDER for
    * whatever counter set the partitioning produced; the set itself is
    * partitioning-dependent — see the object doc for why that is fine).
    *
    * `weightExpr` generalizes to WEIGHTED adds (classic MG handles them
    * with the same bound over total weight instead of row count): the
    * sketch-state fold of [[graft.ops.Profile]] replays already-sketched
    * (item, est) counters as weighted inserts — the mergeable-summaries
    * merge, expressed as this same aggregate. Default weight 1 is the
    * plain row-count form. Null or non-positive weights contribute
    * nothing, like a null item.
    */
  case class MisraGries(itemExpr: Expression, weightExpr: Expression, k: Int,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[MgBuffer] {

    require(k > 0, "k must be positive")

    private def stringKeyed: Boolean = itemExpr.dataType == StringType
    private def keyType: DataType = if (stringKeyed) StringType else LongType

    override def children: Seq[Expression] = Seq(itemExpr, weightExpr)
    override def nullable: Boolean = false
    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("item", keyType, nullable = false),
      StructField("est", LongType, nullable = false))), containsNull = false)

    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      (itemExpr.dataType, weightExpr.dataType) match {
        case (LongType | IntegerType | ShortType | ByteType | StringType,
              LongType | IntegerType | ShortType | ByteType) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case (other, LongType | IntegerType | ShortType | ByteType) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"graft_misra_gries requires an integral or string item column, got $other")
        case (_, otherW) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"graft_misra_gries requires an integral weight column, got $otherW")
      }

    override def createAggregationBuffer(): MgBuffer = new MgBuffer(k)

    override def update(buffer: MgBuffer, input: InternalRow): MgBuffer = {
      val v = itemExpr.eval(input)
      if (v != null) {
        val w = weightExpr.eval(input) match {
          case null => 0L
          case n: Number => n.longValue()
        }
        if (w > 0L) {
          val key: AnyRef = v match {
            // UTF8String from an UnsafeRow points into a reused buffer —
            // clone BEFORE storing or every stored key silently mutates.
            case s: org.apache.spark.unsafe.types.UTF8String => s.clone()
            case n: Number => Long.box(n.longValue())
            case other => other.asInstanceOf[AnyRef]
          }
          buffer.add(key, w)
        }
      }
      buffer
    }

    override def merge(buffer: MgBuffer, other: MgBuffer): MgBuffer = {
      buffer.merge(other)
      buffer
    }

    private def keyLess(a: AnyRef, b: AnyRef): Boolean = (a, b) match {
      case (x: java.lang.Long, y: java.lang.Long) => x < y
      case (x: org.apache.spark.unsafe.types.UTF8String,
            y: org.apache.spark.unsafe.types.UTF8String) => x.compareTo(y) < 0
      case _ => sys.error(s"unexpected key types: ${a.getClass}, ${b.getClass}")
    }

    override def eval(buffer: MgBuffer): Any = {
      val entries = new Array[(AnyRef, Long)](buffer.counts.size)
      var i = 0
      val it = buffer.counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        entries(i) = (e.getKey, e.getValue); i += 1
      }
      val sorted = entries.sortWith { case ((ia, ea), (ib, eb)) =>
        ea > eb || (ea == eb && keyLess(ia, ib))
      }
      new GenericArrayData(sorted.map { case (item, est) =>
        InternalRow(item, est): Any
      })
    }

    override def serialize(buffer: MgBuffer): Array[Byte] = {
      if (!stringKeyed) {
        val bb = ByteBuffer.allocate(8 + buffer.counts.size * 16)
        bb.putInt(buffer.k).putInt(buffer.counts.size)
        val it = buffer.counts.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          bb.putLong(e.getKey.asInstanceOf[java.lang.Long]).putLong(e.getValue)
        }
        bb.array()
      } else {
        val it0 = buffer.counts.entrySet().iterator()
        var bytes = 0
        while (it0.hasNext) {
          bytes += 12 + it0.next().getKey
            .asInstanceOf[org.apache.spark.unsafe.types.UTF8String].numBytes()
        }
        val bb = ByteBuffer.allocate(8 + bytes)
        bb.putInt(buffer.k).putInt(buffer.counts.size)
        val it = buffer.counts.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          val sb = e.getKey.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes
          bb.putInt(sb.length)
          bb.put(sb)
          bb.putLong(e.getValue)
        }
        bb.array()
      }
    }

    override def deserialize(bytes: Array[Byte]): MgBuffer = {
      val bb = ByteBuffer.wrap(bytes)
      val buf = new MgBuffer(bb.getInt)
      val n = bb.getInt
      var i = 0
      if (!stringKeyed) {
        while (i < n) { buf.counts.put(Long.box(bb.getLong), bb.getLong); i += 1 }
      } else {
        while (i < n) {
          val len = bb.getInt
          val sb = new Array[Byte](len)
          bb.get(sb)
          buf.counts.put(
            org.apache.spark.unsafe.types.UTF8String.fromBytes(sb), bb.getLong)
          i += 1
        }
      }
      buf
    }

    override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): MisraGries =
      copy(itemExpr = newChildren(0), weightExpr = newChildren(1))
    override def prettyName: String = "graft_misra_gries"
  }

  /** Column form: the ≤ k surviving (item, est) counters. */
  def misraGries(item: Column, k: Int): Column =
    GraftShims.column(
      MisraGries(GraftShims.expression(item),
        org.apache.spark.sql.catalyst.expressions.Literal(1L), k)
        .toAggregateExpression())

  /** Weighted column form — the sketch-fold path (see the class doc). */
  def misraGriesWeighted(item: Column, weight: Column, k: Int): Column =
    GraftShims.column(
      MisraGries(GraftShims.expression(item), GraftShims.expression(weight), k)
        .toAggregateExpression())
}
