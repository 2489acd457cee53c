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

/** Hilbert-curve index of two 31-bit keys → one 62-bit sort key. The
  * Hilbert curve visits every cell of the (a, b) grid through ADJACENT
  * cells only — unlike Morton, whose quadrant jumps can put one sorted run
  * across two far-apart rectangles — so equal-size key ranges cover
  * tighter hyper-rectangles and min/max pruning cuts more files.
  * (Delta's OPTIMIZE ZORDER BY uses Hilbert for the same reason.)
  */
case class HilbertValue(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any =
    Layout.hilbert(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertValue =
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

  /** Hilbert d-index via the standard xy2d walk (Hamilton's compact
    * algorithm): per bit plane, accumulate the quadrant's arc length and
    * rotate/reflect the frame. Inputs clamp to 31 bits (order 31 → the
    * index fits in 62 bits).
    */
  def hilbert(a0: Long, b0: Long): Long = {
    val mask = (1L << 31) - 1
    var x = a0 & mask
    var y = b0 & mask
    var d = 0L
    var s = 1L << 30
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) { // rotate the lower quadrant
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  def hilbertValue(a: Column, b: Column): Column =
    Bridge.column(HilbertValue(
      Bridge.expression(a.cast(LongType)), Bridge.expression(b.cast(LongType))))

  /** Cluster a table by the Z-order of two keys: range-partition and sort
    * by the interleaved value, so each output partition (→ parquet file /
    * row group) covers a tight hyper-rectangle in (a, b) space.
    */
  def zorderBy(df: DataFrame, a: Column, b: Column, numPartitions: Int = 0): DataFrame =
    clusterBy(df, zvalue(a, b), numPartitions)

  /** Same clustering through the Hilbert index — tighter average spans at
    * unaligned range boundaries (PipelineOpsSpec quantifies vs Morton).
    */
  def hilbertBy(df: DataFrame, a: Column, b: Column, numPartitions: Int = 0): DataFrame =
    clusterBy(df, hilbertValue(a, b), numPartitions)

  private def clusterBy(df: DataFrame, key: Column, numPartitions: Int): DataFrame = {
    val n = if (numPartitions > 0) numPartitions
      else df.sparkSession.sparkContext.defaultParallelism
    df.withColumn("__z", key)
      .repartitionByRange(n, org.apache.spark.sql.functions.col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }
}
