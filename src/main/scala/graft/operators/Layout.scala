package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Morton (Z-order) interleave of two 32-bit keys → one 64-bit sort key.
  * Sorting by the Z value clusters rows that are close in BOTH dimensions
  * into the same file/row group, so min/max statistics prune scans for
  * predicates on EITHER key — a row-major sort gives pruning on the
  * leading key only. (Delta's OPTIMIZE ZORDER, Iceberg's sort orders.)
  */
case class ZValue(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any =
    Layout.morton(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZValue =
    copy(left = newLeft, right = newRight)
}

object Layout {

  /** spread the low 32 bits of x across the even bit positions */
  private def spread(x0: Long): Long = {
    var x = x0 & 0xffffffffL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** Morton code: bits of a and b interleaved (a even, b odd). */
  def morton(a: Long, b: Long): Long = spread(a) | (spread(b) << 1)

  def zvalue(a: Column, b: Column): Column =
    Bridge.column(ZValue(
      Bridge.expression(a.cast(LongType)), Bridge.expression(b.cast(LongType))))

  /** Cluster a table by the Z-order of two keys: range-partition and sort
    * by the interleaved value, so each output partition (→ parquet file /
    * row group) covers a tight hyper-rectangle in (a, b) space.
    */
  def zorderBy(df: DataFrame, a: Column, b: Column, numPartitions: Int = 0): DataFrame = {
    val n = if (numPartitions > 0) numPartitions
      else df.sparkSession.sparkContext.defaultParallelism
    val z = zvalue(a, b)
    df.withColumn("__z", z)
      .repartitionByRange(n, org.apache.spark.sql.functions.col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }
}
