package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression for the vector hot path.
  *
  * `zip_with` + `aggregate` evaluate a lambda per element through the
  * interpreted HigherOrderFunction machinery — ~70 µs per 64-dim pair,
  * which dominates all-pairs similarity. This expression stays inside
  * whole-stage codegen: a tight primitive double loop, no per-element
  * allocation (~100× less per-pair overhead).
  *
  * Accumulation order is left-to-right, IDENTICAL to the
  * aggregate(zip_with(...)) formulation and to DuckDB's
  * list_cosine_similarity pass — double-for-double the same results, so
  * oracle parity is unaffected.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  // call sites (VectorFunctions.dotp) cast both inputs to array<double>;
  // ExpectsInputTypes is private[sql] so typing is enforced there instead
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
        |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        |double $s = 0.0;
        |for (int $i = 0; $i < $n; $i++) {
        |  $s += $a.getDouble($i) * $b.getDouble($i);
        |}
        |${ev.value} = $s;
      """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** v ++ flatten(v vᵀ) — the d + d² moment vector one PCA/covariance pass
  * posexplodes and decimal-sums. The nested-transform formulation
  * (`flatten(transform(v, x => transform(v, y => x*y)))`) evaluates an
  * interpreted lambda per CELL (d² per row, with d inner array
  * allocations); this is one eval per row with a tight double loop.
  * Entry order (v first, then row-major outer) and the x*y IEEE products
  * are identical, so the downstream exact-decimal sums are unchanged.
  */
case class SelfOuterWithVec(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  import org.apache.spark.sql.types.ArrayType

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val d = v.numElements()
    val x = new Array[Double](d)
    var i = 0
    while (i < d) { x(i) = v.getDouble(i); i += 1 }
    val out = new Array[Double](d + d * d)
    System.arraycopy(x, 0, out, 0, d)
    var k = d
    i = 0
    while (i < d) {
      val xi = x(i)
      var j = 0
      while (j < d) { out(k) = xi * x(j); j += 1; k += 1 }
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def withNewChildInternal(newChild: Expression): SelfOuterWithVec =
    copy(child = newChild)
}

object VectorFunctions {
  import org.apache.spark.sql.functions.col
  import org.apache.spark.sql.types.ArrayType

  /** Codegen'd dot product over two array<double> columns (inputs cast). */
  def dotp(a: Column, b: Column): Column =
    Bridge.column(DotProduct(
      Bridge.expression(a.cast(ArrayType(DoubleType))),
      Bridge.expression(b.cast(ArrayType(DoubleType)))))

  /** v ++ flatten(v vᵀ) in one per-row eval (input cast to array<double>). */
  def selfOuterWithVec(v: Column): Column =
    Bridge.column(SelfOuterWithVec(
      Bridge.expression(v.cast(ArrayType(DoubleType)))))

  /** Element-wise vector-sum aggregate over array<double> (inputs cast).
    * Map-side partial aggregation reduces each partition to ONE buffer per
    * group, so k-means training shuffles k·partitions rows instead of the
    * n·dim rows a posexplode/groupBy formulation moves — at 100 TB the
    * Lloyd iteration becomes scan-bound, not shuffle-bound.
    */
  def vectorSum(v: Column): Column = {
    import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression
    val agg = VectorSumAgg(Bridge.expression(v.cast(ArrayType(DoubleType))))
    Bridge.column(agg.toAggregateExpression())
  }
}

/** Typed-buffer aggregate: element-wise sum of array<double>. Buffer is a
  * primitive double array sized on first input; null/absent inputs are
  * skipped; empty group → empty array (callers pair it with count()).
  */
case class VectorSumAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate[Array[Double]]
  with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {

  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.util.GenericArrayData
  import org.apache.spark.sql.types.ArrayType

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Double] = Array.emptyDoubleArray

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val b = if (buf.length == 0) new Array[Double](n) else buf
    var i = 0
    val m = math.min(n, b.length)
    while (i < m) { b(i) += arr.getDouble(i); i += 1 }
    b
  }

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    if (a.length == 0) return b
    if (b.length == 0) return a
    var i = 0
    val m = math.min(a.length, b.length)
    while (i < m) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Double]): Any =
    new GenericArrayData(buf.map(x => x: Any))

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getDouble)
  }

  override def withNewMutableAggBufferOffset(offset: Int): VectorSumAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): VectorSumAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): VectorSumAgg =
    copy(child = newChild)
}
