package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, Decimal, DecimalType}
import org.apache.spark.unsafe.types.UTF8String

/** Polyglot money-string → Decimal(38,10), one eval per row — the native
  * form of the reference's _clean_numeric_string + _fix_separators +
  * _to_decimal chain (reference src/transform.py:43-86).
  *
  * The Column-expression formulation re-evaluates its argument ~1300×
  * per row (each helper references its input many times and CSE cannot
  * hoist across when-branches); this expression runs the chain once.
  * Semantics are pinned by ParsersSpec's unit cases, PropertySpec's 200
  * generated formats, and the f4/e2e oracle queries.
  *
  * Contract (null on anything unparseable):
  *  - trim; "(x)" → negative
  *  - strip currency symbols $ € ₽, NBSP, spaces
  *  - '.' and ',' both present → the later one is the decimal point
  *  - ',' only → decimal iff exactly one comma with ≤3 trailing digits,
  *    else thousands separator
  */
case class ParseMoney(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = DecimalType(38, 10)

  private def fixSeparators(s: String): String = {
    val lastDot = s.lastIndexOf('.')
    val lastComma = s.lastIndexOf(',')
    if (lastDot >= 0 && lastComma >= 0) {
      if (lastDot > lastComma) s.replace(",", "")
      else s.replace(".", "").replace(",", ".")
    } else if (lastComma >= 0) {
      val parts = s.split(",", -1)
      if (parts.length == 2 && parts(1).length <= 3) s.replace(",", ".")
      else s.replace(",", "")
    } else s
  }

  override protected def nullSafeEval(input: Any): Any = {
    val t = input.asInstanceOf[UTF8String].toString.trim
    if (t.isEmpty) return null
    val neg = t.length >= 2 && t.charAt(0) == '(' && t.charAt(t.length - 1) == ')'
    val unwrapped = if (neg) t.substring(1, t.length - 1).trim else t
    val sb = new java.lang.StringBuilder(unwrapped.length)
    var i = 0
    while (i < unwrapped.length) {
      val c = unwrapped.charAt(i)
      if (c != '$' && c != '\u20ac' && c != '\u20bd' && c != ' ' && c != '\u00a0') sb.append(c)
      i += 1
    }
    if (sb.length == 0) return null
    try {
      val bd = new java.math.BigDecimal(fixSeparators(sb.toString))
      val d = Decimal(if (neg) bd.negate() else bd)
      if (d.changePrecision(38, 10)) d else null
    } catch { case _: NumberFormatException => null }
  }

  override protected def withNewChildInternal(newChild: Expression): ParseMoney =
    copy(child = newChild)
}
