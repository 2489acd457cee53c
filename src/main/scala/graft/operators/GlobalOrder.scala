package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global-order computations.
  *
  * `Window.orderBy(...)` with no partition key collapses the whole dataset
  * into ONE task — correct, and a 100 TB deadlock. The scalable shape is
  * two-phase: range-repartition by the order key (so partition i holds a
  * contiguous key range), cumulate WITHIN each partition, then add each
  * partition's prefix offset (a per-partition total — one tiny aggregate,
  * broadcast back). Same result as the global window, parallel everywhere.
  */
object GlobalOrder {

  /** df + `cum`: running total of `value` over the global `order` —
    * every partition works independently; only numPartitions scalar
    * totals cross the cluster.
    */
  def cumSum(df: DataFrame, order: Column, value: Column,
      numPartitions: Int = 0): DataFrame = {
    val n = if (numPartitions > 0) numPartitions
      else df.sparkSession.sparkContext.defaultParallelism
    val parted = df.repartitionByRange(n, order)
      .withColumn("__pid", spark_partition_id())
    val wLocal = Window.partitionBy(col("__pid")).orderBy(order)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = parted.withColumn("__local_cum", sum(value).over(wLocal))
    // prefix offset per partition: totals are numPartitions rows — the
    // unpartitioned window here runs over that tiny set only
    val wPrefix = Window.orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    val offsets = local.groupBy(col("__pid"))
      .agg(sum(value).as("__ptotal"))
      .withColumn("__offset", coalesce(sum(col("__ptotal")).over(wPrefix), lit(0)))
      .select(col("__pid"), col("__offset"))
    local.join(broadcast(offsets), Seq("__pid"))
      .withColumn("cum", col("__local_cum") + col("__offset"))
      .drop("__pid", "__local_cum")
  }
}
