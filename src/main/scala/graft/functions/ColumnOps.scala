package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.IntegralDivide
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.graftbridge.Bridge

/** Small Column combinators shared across queries and streaming. */
object ColumnOps {

  /** Exact integer division (SQL `DIV`). Column `/` is double division:
    * a ~2^60 ns-epoch long loses up to ~128 ns converting to double, so
    * `(ts / 1000L).cast(long)` can land on the wrong microsecond near a
    * boundary. IntegralDivide stays in long arithmetic.
    */
  def intDiv(a: Column, divisor: Long): Column =
    Bridge.column(new IntegralDivide(Bridge.expression(a), Bridge.expression(lit(divisor))))
}
