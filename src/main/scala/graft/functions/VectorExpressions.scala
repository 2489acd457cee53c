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

object VectorFunctions {
  import org.apache.spark.sql.functions.col
  import org.apache.spark.sql.types.ArrayType

  /** Codegen'd dot product over two array<double> columns (inputs cast). */
  def dotp(a: Column, b: Column): Column =
    Bridge.column(DotProduct(
      Bridge.expression(a.cast(ArrayType(DoubleType))),
      Bridge.expression(b.cast(ArrayType(DoubleType)))))
}
