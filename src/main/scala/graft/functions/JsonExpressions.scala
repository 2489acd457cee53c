package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.MapData
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Canonical JSON of a map<string,string>, byte-parity with CPython's
  * json.dumps(obj, sort_keys=True, ensure_ascii=False,
  * separators=(",",":")) — the reference's content-hash input
  * (src/utils.py:14-19 in the reference). One eval per row.
  *
  * Python's escaping contract, implemented exactly: `"` and `\` escaped,
  * control chars use the two-char forms \b \t \n \f \r where they exist
  * and \u00XX otherwise; all other characters (incl. non-ASCII) raw.
  * Keys sort by Unicode code point — UTF8String's binary order, which is
  * code-point order for valid UTF-8.
  *
  * The previous formulation — to_json(map_from_entries(array_sort(
  * map_entries(m)))) — matched on the observed corpus but delegated
  * escaping to Jackson and paid an interpreted comparator per entry pair;
  * this expression IS the contract.
  */
abstract class SortedKeyJson extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType

  /** ensure_ascii: non-ASCII chars → \\uXXXX (surrogate halves escaped
    * separately, matching CPython for astral chars).
    */
  protected def asciiOnly: Boolean
  /** default separators (", ", ": ") vs compact (",", ":") */
  protected def spaced: Boolean

  private def appendEscaped(sb: java.lang.StringBuilder, s: String): Unit = {
    sb.append('"')
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      (c: @annotation.switch) match {
        case '"' => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\b' => sb.append("\\b")
        case '\t' => sb.append("\\t")
        case '\n' => sb.append("\\n")
        case '\f' => sb.append("\\f")
        case '\r' => sb.append("\\r")
        case _ =>
          if (c < ' ' || (asciiOnly && c > '~')) sb.append(f"\\u${c.toInt}%04x")
          else sb.append(c)
      }
      i += 1
    }
    sb.append('"')
  }

  override protected def nullSafeEval(input: Any): Any = {
    val m = input.asInstanceOf[MapData]
    val n = m.numElements()
    val keys = m.keyArray(); val vals = m.valueArray()
    val idx = Array.range(0, n) // binary compare = code-point order
      .sortWith((a, b) => keys.getUTF8String(a).compareTo(keys.getUTF8String(b)) < 0)
    val sb = new java.lang.StringBuilder(64)
    sb.append('{')
    var first = true
    idx.foreach { i =>
      if (!first) { sb.append(','); if (spaced) sb.append(' ') }
      first = false
      appendEscaped(sb, keys.getUTF8String(i).toString)
      sb.append(':')
      if (spaced) sb.append(' ')
      if (vals.isNullAt(i)) sb.append("null")
      else appendEscaped(sb, vals.getUTF8String(i).toString)
    }
    sb.append('}')
    UTF8String.fromString(sb.toString)
  }
}

case class CanonicalJson(child: Expression) extends SortedKeyJson {
  override protected def asciiOnly: Boolean = false
  override protected def spaced: Boolean = false
  override protected def withNewChildInternal(newChild: Expression): CanonicalJson =
    copy(child = newChild)
}

/** json.dumps(r, sort_keys=True) with DEFAULTS — ensure_ascii=True and
  * separators (", ", ": ") — the reference's SHA-256 row-hash input
  * (main.py:191-192), which differs from the compact MD5 flavor for any
  * non-ASCII payload.
  */
case class PyDefaultJson(child: Expression) extends SortedKeyJson {
  override protected def asciiOnly: Boolean = true
  override protected def spaced: Boolean = true
  override protected def withNewChildInternal(newChild: Expression): PyDefaultJson =
    copy(child = newChild)
}
