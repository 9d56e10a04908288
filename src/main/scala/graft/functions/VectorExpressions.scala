package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Custom Catalyst expressions for vector math — the one place the
  * built-in surface genuinely can't express the computation efficiently
  * (SURVEY.md §7.4 preference order: compose > custom Expression > custom
  * plan > mapPartitions):
  *
  *  - array higher-order functions (`aggregate`/`zip_with`) are
  *    CodegenFallback: interpreted, one lambda dispatch + array allocation
  *    per call — measured ~13 us per 64-dim dot on the O(n^2) near-dup
  *    join;
  *  - a statically unrolled `element_at` chain IS codegen'd but produces
  *    a giant expression whose generated method blows past the JIT's
  *    HugeMethodLimit, so it runs as interpreted bytecode — measured 3x
  *    WORSE than the HOF form.
  *
  * [[DotProduct]] emits a compact loop over the two `ArrayData` buffers:
  * small JIT-friendly bytecode, no allocation, no dispatch.
  */
object VectorExpressions {

  /** `dot(a, b)` over two numeric arrays, accumulated in double.
    * Null array or null element -> null (matches the HOF
    * `aggregate(zip_with(...))` semantics). Arrays of different lengths
    * dot over the common prefix.
    */
  case class DotProduct(left: Expression, right: Expression)
      extends BinaryExpression {

    override def dataType: DataType = DoubleType

    /** Null when either array is null OR either array may CONTAIN nulls
      * (a null element nulls the dot). Without the containsNull term,
      * codegen hard-wires isNull=false and the element-null branch is
      * dead code.
      */
    override def nullable: Boolean = {
      def elemNullable(e: Expression): Boolean = e.dataType match {
        case ArrayType(_, cn) => cn
        case _ => true
      }
      left.nullable || right.nullable || elemNullable(left) || elemNullable(right)
    }

    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      (left.dataType, right.dataType) match {
        case (ArrayType(l: NumericType, _), ArrayType(r: NumericType, _)) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case _ =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"dot requires two numeric arrays, got ${left.dataType} and ${right.dataType}")
      }
    }

    private def elemType(e: Expression): NumericType =
      e.dataType.asInstanceOf[ArrayType].elementType.asInstanceOf[NumericType]

    override def nullSafeEval(a: Any, b: Any): Any = {
      val (la, ra) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
      val n = math.min(la.numElements(), ra.numElements())
      val (lt, rt) = (elemType(left), elemType(right))
      var acc = 0.0
      var i = 0
      while (i < n) {
        if (la.isNullAt(i) || ra.isNullAt(i)) return null
        acc += numeric(la, i, lt) * numeric(ra, i, rt)
        i += 1
      }
      acc
    }

    private def numeric(ad: ArrayData, i: Int, t: NumericType): Double = t match {
      case FloatType => ad.getFloat(i).toDouble
      case DoubleType => ad.getDouble(i)
      case IntegerType => ad.getInt(i).toDouble
      case LongType => ad.getLong(i).toDouble
      case ShortType => ad.getShort(i).toDouble
      case ByteType => ad.getByte(i).toDouble
      case d: DecimalType => ad.getDecimal(i, d.precision, d.scale).toDouble
    }

    private def getterFor(t: NumericType, buf: String, idx: String): String = t match {
      case FloatType => s"(double) $buf.getFloat($idx)"
      case DoubleType => s"$buf.getDouble($idx)"
      case IntegerType => s"(double) $buf.getInt($idx)"
      case LongType => s"(double) $buf.getLong($idx)"
      case ShortType => s"(double) $buf.getShort($idx)"
      case ByteType => s"(double) $buf.getByte($idx)"
      case d: DecimalType => s"$buf.getDecimal($idx, ${d.precision}, ${d.scale}).toDouble()"
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val (lt, rt) = (elemType(left), elemType(right))
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val acc = ctx.freshName("acc")
        // When the expression is non-nullable (both arrays and their
        // elements are), `ev.isNull` is the FalseLiteral — an assignment
        // to it would not compile and Janino would silently demote the
        // whole stage to interpreted execution. Elements can't be null
        // there, so the check is dead anyway.
        val nullCheck =
          if (nullable)
            s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
          else ""
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $acc = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  $nullCheck
           |  $acc += (${getterFor(lt, a, i)}) * (${getterFor(rt, b, i)});
           |}
           |${ev.value} = $acc;
         """.stripMargin
      })
    }

    override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)

    override def prettyName: String = "graft_dot"
  }

  /** Column-level fast dot product (codegen'd loop, see [[DotProduct]]).
    * Bit-identical to the HOF form (same left-to-right accumulation).
    */
  def dotFast(a: Column, b: Column): Column =
    GraftShims.column(DotProduct(
      GraftShims.expression(a), GraftShims.expression(b)))

  /** Symmetric int8 quantization of a numeric vector in ONE pass:
    * struct(scale: double, q: array<int>) with
    * `scale = 127.0 / max(abs(x))` and `q_i = floor(x_i * scale + 0.5)`
    * (floor(x+0.5) — NOT half-even/half-up `round` — because floor is
    * bit-identical across engines, so an independent replica can verify
    * the quantized codes exactly). An all-zero or empty vector gets
    * scale 0 and all-zero codes. Null array or null element -> null.
    *
    * This is the storage-/bandwidth-side primitive of embedding search at
    * 100 TB: 4x smaller vectors, with the exact-rescore tier reading the
    * original floats. Codes are emitted as int (not tinyint) so gate
    * results stack into BIGINT-friendly oracles; the range is [-127,127].
    * The composed HOF form (`transform` + `aggregate`) is CodegenFallback
    * — interpreted per element; this is one compact codegen'd loop.
    */
  case class Int8Quantize(child: Expression)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

    override def dataType: DataType = StructType(Seq(
      StructField("scale", DoubleType, nullable = false),
      StructField("q", ArrayType(IntegerType, containsNull = false), nullable = false)))

    override def nullable: Boolean = child.nullable || (child.dataType match {
      case ArrayType(_, cn) => cn
      case _ => true
    })

    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case ArrayType(_: NumericType, _) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"graft_int8_quantize requires a numeric array, got $other")
      }

    private def elemType: NumericType =
      child.dataType.asInstanceOf[ArrayType].elementType.asInstanceOf[NumericType]

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val xs = new Array[Double](n)
      var i = 0
      while (i < n) {
        if (arr.isNullAt(i)) return null
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
      VectorExpressions.quantizeRow(xs)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val getter: (String, String) => String = (buf, idx) => elemType match {
        case FloatType => s"(double) $buf.getFloat($idx)"
        case DoubleType => s"$buf.getDouble($idx)"
        case IntegerType => s"(double) $buf.getInt($idx)"
        case LongType => s"(double) $buf.getLong($idx)"
        case ShortType => s"(double) $buf.getShort($idx)"
        case ByteType => s"(double) $buf.getByte($idx)"
        case d: DecimalType => s"$buf.getDecimal($idx, ${d.precision}, ${d.scale}).toDouble()"
      }
      nullSafeCodeGen(ctx, ev, a => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val xs = ctx.freshName("xs")
        // See DotProduct.doGenCode: `ev.isNull` is unassignable when the
        // expression is non-nullable (and elements can't be null then).
        val nullCheck =
          if (nullable) s"if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }"
          else ""
        val result =
          if (nullable)
            s"""${ev.value} = ${ev.isNull}
               |  ? null
               |  : graft.functions.VectorExpressions.quantizeRow($xs);""".stripMargin
          else s"${ev.value} = graft.functions.VectorExpressions.quantizeRow($xs);"
        s"""
           |int $n = $a.numElements();
           |double[] $xs = new double[$n];
           |for (int $i = 0; $i < $n; $i++) {
           |  $nullCheck
           |  $xs[$i] = ${getter(a, i)};
           |}
           |$result
         """.stripMargin
      })
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)

    override def prettyName: String = "graft_int8_quantize"
  }

  /** All random-hyperplane LSH bucket ids for a vector in ONE pass:
    * `tables` hash tables of `nbits` sign bits each, planes supplied as a
    * flattened `[table][bit][pos]` coefficient array. Semantically
    * identical to `tables x nbits` independent [[DotProduct]]-vs-literal-
    * plane sign tests (same left-to-right double accumulation over the
    * `min(|vec|, dim)` prefix; a null element zeroes every bucket exactly
    * as a null dot falls into the `otherwise(0)` branch of the unfused
    * form) — but the vector is loaded from its ArrayData ONCE instead of
    * `tables x nbits` times, and the generated code is one compact
    * triple loop instead of `tables x nbits` unrolled loop bodies. At
    * nbits 17 x 3 tables the unfused form emits 51 loops per row — the
    * fused kernel measured materially cheaper on the bucket-build stage
    * of multi-million-vector corpora and keeps the method far below the
    * JIT HugeMethodLimit.
    */
  case class LshBuckets(child: Expression, planes: Array[Double],
                        tables: Int, nbits: Int, dim: Int)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

    require(planes.length == tables * nbits * dim,
      s"planes length ${planes.length} != tables*nbits*dim ${tables * nbits * dim}")

    override def dataType: DataType = ArrayType(LongType, containsNull = false)

    override def nullable: Boolean = child.nullable

    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case ArrayType(_: NumericType, _) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"graft_lsh_buckets requires a numeric array, got $other")
      }

    private def elemType: NumericType =
      child.dataType.asInstanceOf[ArrayType].elementType.asInstanceOf[NumericType]

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = math.min(arr.numElements(), dim)
      val xs = new Array[Double](n)
      var i = 0
      while (i < n) {
        // Null element -> every per-bit dot is null -> every bit falls in
        // the unfused form's otherwise(0) branch -> all buckets 0.
        if (arr.isNullAt(i)) return zeroBuckets(tables)
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
      VectorExpressions.lshBucketsRow(xs, planes, tables, nbits, dim)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val planesRef = ctx.addReferenceObj("lshPlanes", planes, "double[]")
      val getter: (String, String) => String = (buf, idx) => elemType match {
        case FloatType => s"(double) $buf.getFloat($idx)"
        case DoubleType => s"$buf.getDouble($idx)"
        case IntegerType => s"(double) $buf.getInt($idx)"
        case LongType => s"(double) $buf.getLong($idx)"
        case ShortType => s"(double) $buf.getShort($idx)"
        case ByteType => s"(double) $buf.getByte($idx)"
        case d: DecimalType => s"$buf.getDecimal($idx, ${d.precision}, ${d.scale}).toDouble()"
      }
      nullSafeCodeGen(ctx, ev, a => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val xs = ctx.freshName("xs")
        val anyNull = ctx.freshName("anyNull")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $dim);
           |boolean $anyNull = false;
           |double[] $xs = new double[$n];
           |for (int $i = 0; $i < $n; $i++) {
           |  if ($a.isNullAt($i)) { $anyNull = true; break; }
           |  $xs[$i] = ${getter(a, i)};
           |}
           |${ev.value} = $anyNull
           |  ? graft.functions.VectorExpressions.zeroBuckets($tables)
           |  : graft.functions.VectorExpressions.lshBucketsRow($xs, $planesRef, $tables, $nbits, $dim);
         """.stripMargin
      })
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)

    // The synthesized case-class equals compares the Array[Double] field
    // by REFERENCE, so two semantically identical LshBuckets never
    // compared equal — defeating canonicalization / common-subexpression
    // elimination (never wrong results, just missed reuse). Compare plane
    // CONTENTS instead; the array stays an array for the hot-loop kernel.
    override def equals(other: Any): Boolean = other match {
      case o: LshBuckets =>
        tables == o.tables && nbits == o.nbits && dim == o.dim &&
          child == o.child && java.util.Arrays.equals(planes, o.planes)
      case _ => false
    }

    override def hashCode(): Int =
      java.util.Objects.hash(child, Int.box(tables), Int.box(nbits),
        Int.box(dim), Int.box(java.util.Arrays.hashCode(planes)))

    override def prettyName: String = "graft_lsh_buckets"
  }

  /** graft_nearest_centroid(vec): argmax-cosine centroid id over a
    * SMALL literal centroid set — the k-means assignment kernel. The
    * composed form (array_max over k struct(cosine, -id) branches with
    * typedLit arrays) generates an expression so large the stage falls
    * out of codegen into interpreted eval (measured 45 s vs 2 s on a
    * 200 k-vector assignment at sf10); this kernel is a fixed-size
    * generated loop with the centroid matrix attached as a reference
    * object, so code size is independent of k and dim.
    *
    * Exact cosine semantics of the composed form, bit-for-bit: the row
    * norm is computed once (same left-to-right accumulation as
    * [[DotProduct]]), each score is `dot / (|v|·|c|)` with |c|
    * precomputed from the same doubles, zero-norm pairs score -2.0
    * (below any cosine), ties go to the SMALLEST centroid id (ids must
    * arrive sorted ascending; first-strict-max keeps the earliest).
    * Null array -> null; a null ELEMENT scores every pair -2 -> the
    * smallest id, like the composed coalesce(cosine, -2) did.
    */
  case class NearestCentroid(child: Expression, ids: Array[Long],
                             cents: Array[Array[Double]])
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

    require(ids.nonEmpty && ids.length == cents.length,
      s"graft_nearest_centroid: ${ids.length} ids vs ${cents.length} centroids")
    require(ids.zip(ids.tail).forall { case (a, b) => a < b },
      "graft_nearest_centroid: ids must be strictly ascending (tie contract)")

    // Recomputed per JVM after deserialization — deterministic from cents.
    private lazy val norms: Array[Double] = cents.map { c =>
      var s = 0.0; var i = 0
      while (i < c.length) { s += c(i) * c(i); i += 1 }
      math.sqrt(s)
    }

    override def dataType: DataType = LongType
    override def nullable: Boolean = child.nullable

    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case ArrayType(_: NumericType, _) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"graft_nearest_centroid requires a numeric array, got $other")
      }

    private def elemType: NumericType =
      child.dataType.asInstanceOf[ArrayType].elementType.asInstanceOf[NumericType]

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val xs = new Array[Double](n)
      var i = 0
      while (i < n) {
        if (arr.isNullAt(i)) return ids(0)
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
      VectorExpressions.nearestCentroidRow(xs, cents, norms, ids)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val centsRef = ctx.addReferenceObj("kmCents", cents, "double[][]")
      val normsRef = ctx.addReferenceObj("kmNorms", norms, "double[]")
      val idsRef = ctx.addReferenceObj("kmIds", ids, "long[]")
      val getter: (String, String) => String = (buf, idx) => elemType match {
        case FloatType => s"(double) $buf.getFloat($idx)"
        case DoubleType => s"$buf.getDouble($idx)"
        case IntegerType => s"(double) $buf.getInt($idx)"
        case LongType => s"(double) $buf.getLong($idx)"
        case ShortType => s"(double) $buf.getShort($idx)"
        case ByteType => s"(double) $buf.getByte($idx)"
        case d: DecimalType => s"$buf.getDecimal($idx, ${d.precision}, ${d.scale}).toDouble()"
      }
      nullSafeCodeGen(ctx, ev, a => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val xs = ctx.freshName("xs")
        val anyNull = ctx.freshName("anyNull")
        s"""
           |int $n = $a.numElements();
           |boolean $anyNull = false;
           |double[] $xs = new double[$n];
           |for (int $i = 0; $i < $n; $i++) {
           |  if ($a.isNullAt($i)) { $anyNull = true; break; }
           |  $xs[$i] = ${getter(a, i)};
           |}
           |${ev.value} = $anyNull
           |  ? $idsRef[0]
           |  : graft.functions.VectorExpressions.nearestCentroidRow($xs, $centsRef, $normsRef, $idsRef);
         """.stripMargin
      })
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)

    // Content equality for the array fields (see LshBuckets note).
    override def equals(other: Any): Boolean = other match {
      case o: NearestCentroid =>
        child == o.child && java.util.Arrays.equals(ids, o.ids) &&
          cents.length == o.cents.length &&
          cents.indices.forall(j => java.util.Arrays.equals(cents(j), o.cents(j)))
      case _ => false
    }

    override def hashCode(): Int =
      java.util.Objects.hash(child, Int.box(java.util.Arrays.hashCode(ids)),
        Int.box(cents.map(java.util.Arrays.hashCode).sum))

    override def prettyName: String = "graft_nearest_centroid"
  }

  /** Kernel shared by [[NearestCentroid]]'s eval and codegen paths:
    * cosine argmax with first-strict-max tie-break (= smallest id for
    * ascending ids); zero-norm pairs score -2.0. A row whose dimension
    * differs from a centroid's fails loudly (the graft_vec_mean ragged
    * contract) instead of silently truncating the dot product.
    */
  def nearestCentroidRow(xs: Array[Double], cents: Array[Array[Double]],
                         norms: Array[Double], ids: Array[Long]): Long = {
    var ss = 0.0
    var i = 0
    while (i < xs.length) { ss += xs(i) * xs(i); i += 1 }
    val nv = math.sqrt(ss)
    var best = Double.NegativeInfinity
    var bestId = ids(0)
    var j = 0
    while (j < cents.length) {
      val c = cents(j)
      require(xs.length == c.length,
        s"graft_nearest_centroid: vector dim ${xs.length} != centroid dim ${c.length}" +
          " (ragged corpus)")
      val m = c.length
      var d = 0.0
      var t = 0
      while (t < m) { d += xs(t) * c(t); t += 1 }
      val nn = nv * norms(j)
      val score = if (nn > 0) d / nn else -2.0
      if (score > best) { best = score; bestId = ids(j) }
      j += 1
    }
    bestId
  }

  /** Column-level nearest-centroid assignment (see [[NearestCentroid]]). */
  def nearestCentroid(vec: Column, ids: Array[Long],
                      cents: Array[Array[Double]]): Column =
    GraftShims.column(NearestCentroid(GraftShims.expression(vec), ids, cents))

  /** Kernel shared by [[LshBuckets]]'s eval and codegen paths: one bucket
    * id per table, bit b of table t set iff the (t,b) plane's dot with the
    * vector prefix is strictly positive.
    */
  def lshBucketsRow(xs: Array[Double], planes: Array[Double],
                    tables: Int, nbits: Int, dim: Int): ArrayData = {
    val out = new Array[Long](tables)
    val n = xs.length
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var b = 0
      while (b < nbits) {
        val base = (t * nbits + b) * dim
        var acc = 0.0
        var p = 0
        while (p < n) { acc += xs(p) * planes(base + p); p += 1 }
        if (acc > 0) bucket |= 1L << b
        b += 1
      }
      out(t) = bucket
      t += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  /** All-zero bucket array (the null-element result — see [[LshBuckets]]). */
  def zeroBuckets(tables: Int): ArrayData =
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(new Array[Long](tables))

  /** Column-level fused multi-table LSH bucketing (see [[LshBuckets]]). */
  def lshBuckets(vec: Column, planes: Array[Double], tables: Int,
                 nbits: Int, dim: Int): Column =
    GraftShims.column(LshBuckets(GraftShims.expression(vec), planes, tables, nbits, dim))

  /** Kernel shared by [[Int8Quantize]]'s eval and codegen paths. */
  def quantizeRow(xs: Array[Double]): InternalRow = {
    var maxAbs = 0.0
    var i = 0
    while (i < xs.length) {
      val a = math.abs(xs(i))
      if (a > maxAbs) maxAbs = a
      i += 1
    }
    val scale = if (maxAbs > 0.0) 127.0 / maxAbs else 0.0
    val q = new Array[Any](xs.length)
    i = 0
    while (i < xs.length) {
      q(i) = math.floor(xs(i) * scale + 0.5).toInt
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(Array[Any](
      scale, new org.apache.spark.sql.catalyst.util.GenericArrayData(q)))
  }

  /** Column-level int8 quantization (see [[Int8Quantize]]). */
  def int8Quantize(vec: Column): Column =
    GraftShims.column(Int8Quantize(GraftShims.expression(vec)))
}
