package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression}
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

/** 3-key Hilbert index (Skilling's n-dimensional transpose algorithm) —
  * for marts queried by three independent predicates, e.g. (day, client,
  * type). 21 bits per key → the index fits in 63 bits.
  */
case class Hilbert3Value(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with CodegenFallback {
  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any, c: Any): Any =
    Layout.hilbert3(a.asInstanceOf[Long], b.asInstanceOf[Long], c.asInstanceOf[Long])

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Hilbert3Value =
    copy(first = newFirst, second = newSecond, third = newThird)
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

  /** n-dimensional Hilbert index via Skilling's transpose algorithm
    * ("Programming the Hilbert curve", AIP Conf. Proc. 707, 2004): the
    * input coordinates are transformed in place (inverse-undo + Gray
    * encode per bit plane), then the index is the bit-interleave of the
    * transformed coordinates, most-significant plane first. dims·bits
    * must fit a long's 63 usable bits (3 dims → up to 21 bits/key).
    */
  def hilbertN(coords0: Array[Long], bits: Int): Long = {
    val n = coords0.length
    require(n * bits <= 63, s"$n dims x $bits bits overflow a long")
    val mask = (1L << bits) - 1
    val x = coords0.map(_ & mask)
    // inverse undo
    var q = 1L << (bits - 1)
    while (q > 1) {
      val p = q - 1
      var i = 0
      while (i < n) {
        if ((x(i) & q) != 0) x(0) ^= p
        else { val t = (x(0) ^ x(i)) & p; x(0) ^= t; x(i) ^= t }
        i += 1
      }
      q >>= 1
    }
    // Gray encode
    var i = 1
    while (i < n) { x(i) ^= x(i - 1); i += 1 }
    var t = 0L
    q = 1L << (bits - 1)
    while (q > 1) { if ((x(n - 1) & q) != 0) t ^= q - 1; q >>= 1 }
    i = 0
    while (i < n) { x(i) ^= t; i += 1 }
    // interleave: plane-major, dim 0 most significant within each plane
    var d = 0L
    var plane = bits - 1
    while (plane >= 0) {
      i = 0
      while (i < n) { d = (d << 1) | ((x(i) >> plane) & 1L); i += 1 }
      plane -= 1
    }
    d
  }

  /** Inverse of hilbertN: index → original coordinates (same Skilling
    * transpose walk, run backwards). Used by the spec to prove the curve
    * is a bijection whose consecutive cells are grid-adjacent.
    */
  def hilbertNInverse(d: Long, dims: Int, bits: Int): Array[Long] = {
    val n = dims
    val x = new Array[Long](n)
    // de-interleave
    var plane = bits - 1
    var pos = n * bits - 1
    while (plane >= 0) {
      var i = 0
      while (i < n) { x(i) |= ((d >> pos) & 1L) << plane; pos -= 1; i += 1 }
      plane -= 1
    }
    // Gray decode
    var t = x(n - 1) >> 1
    var i = n - 1
    while (i > 0) { x(i) ^= x(i - 1); i -= 1 }
    x(0) ^= t
    // undo excess work
    var q = 2L
    val top = 2L << (bits - 1)
    while (q != top) {
      val p = q - 1
      i = n - 1
      while (i >= 0) {
        if ((x(i) & q) != 0) x(0) ^= p
        else { t = (x(0) ^ x(i)) & p; x(0) ^= t; x(i) ^= t }
        i -= 1
      }
      q <<= 1
    }
    x
  }

  def hilbert3(a: Long, b: Long, c: Long, bits: Int = 21): Long =
    hilbertN(Array(a, b, c), bits)

  def hilbert3Value(a: Column, b: Column, c: Column): Column =
    Bridge.column(Hilbert3Value(Bridge.expression(a.cast(LongType)),
      Bridge.expression(b.cast(LongType)), Bridge.expression(c.cast(LongType))))

  /** Three-key clustering through the n-dimensional Hilbert index. */
  def hilbert3By(df: DataFrame, a: Column, b: Column, c: Column,
      numPartitions: Int = 0): DataFrame =
    clusterBy(df, hilbert3Value(a, b, c), numPartitions)

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
