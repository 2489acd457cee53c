package graft.functions

import java.time.{LocalDate, LocalDateTime, ZoneOffset}

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.DateTimeUtils
import org.apache.spark.sql.types.{DataType, TimestampType}
import org.apache.spark.unsafe.types.UTF8String

/** Polyglot timestamp parsing, one eval per row — the native form of the
  * reference's _to_timestamptz format ladder (src/transform.py:18-40):
  * ISO-8601 first (aware offsets converted to UTC), then d.M.yyyy
  * [H:m:s], then M/d/yyyy BEFORE d/M/yyyy (first-match-wins, so
  * "03/04/2023" is March 4 and "16/07/2023" falls through to July 16).
  * Unparseable → null.
  *
  * ISO and dotted-date forms delegate to Spark's own
  * DateTimeUtils.stringToTimestamp (dotted digits re-ordered to ISO
  * first), so results are bit-identical to the to_timestamp Column
  * ladder this replaces; ParsersSpec asserts the agreement.
  */
case class ParseTimestamp(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = TimestampType

  private val dottedRe = "^(\\d{1,2})\\.(\\d{1,2})\\.(\\d{4})($| .*$)".r
  private val slashRe = "^(\\d{1,2})/(\\d{1,2})/(\\d{4})$".r
  private val compactIsoRe = "^(\\d{4})(\\d{2})(\\d{2})$".r

  /** yyyy- prefix is enough: Spark's stringToTimestamp is lenient on
    * month/day digit counts, so non-zero-padded ISO like "2023-4-5"
    * (reference strptime %Y-%m-%d accepts it) parses too.
    */
  private def isoLike(s: String): Boolean =
    s.length >= 6 && s.charAt(4) == '-' && s.substring(0, 4).forall(_.isDigit)

  private def utcMicros(s: String): Any =
    DateTimeUtils.stringToTimestamp(UTF8String.fromString(s), ZoneOffset.UTC)
      .map(_.asInstanceOf[AnyRef]).orNull

  private def dateMicros(year: Int, month: Int, day: Int): Any =
    try {
      LocalDate.of(year, month, day).toEpochDay *
        org.apache.spark.sql.catalyst.util.DateTimeConstants.MICROS_PER_DAY
    } catch { case _: java.time.DateTimeException => null }

  override protected def nullSafeEval(input: Any): Any = {
    val t = input.asInstanceOf[UTF8String].toString.trim
    if (t.isEmpty) return null
    if (isoLike(t)) return utcMicros(t)
    t match {
      case compactIsoRe(y, m, d) =>
        // compact ISO "20230405" (dateutil isoparse accepts it; Spark's
        // stringToTimestamp would read it as a single huge year)
        dateMicros(y.toInt, m.toInt, d.toInt)
      case dottedRe(d, m, y, rest) =>
        // re-order to ISO and reuse Spark's native parser (validates the
        // date and handles the optional time part identically)
        utcMicros(s"$y-$m-$d$rest")
      case slashRe(a, b, y) =>
        val first = dateMicros(y.toInt, a.toInt, b.toInt) // M/d/yyyy
        if (first != null) first else dateMicros(y.toInt, b.toInt, a.toInt) // d/M/yyyy
      case _ => null
    }
  }

  override protected def withNewChildInternal(newChild: Expression): ParseTimestamp =
    copy(child = newChild)
}
