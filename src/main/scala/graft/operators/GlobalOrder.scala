package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

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

  /** df + `cum`: running total of `value` over the global `order`.
    *
    * Integral values take the narrow path: range-repartition +
    * sortWithinPartitions + a mapPartitions running sum — ONE full-data
    * shuffle. (A window partitioned by `spark_partition_id` would re-hash
    * the whole dataset a second time: Spark cannot know the range exchange
    * already satisfies that distribution.) Non-integral values fall back
    * to the per-partition window flavor — two shuffles, still never a
    * single-task global window.
    */
  def cumSum(df: DataFrame, order: Column, value: Column,
      numPartitions: Int = 0): DataFrame = {
    val n = if (numPartitions > 0) numPartitions
      else df.sparkSession.sparkContext.defaultParallelism
    val integral = df.select(value).schema.head.dataType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    if (integral) cumSumNarrow(df, order, value, n)
    else cumSumViaWindow(df, order, value, n)
  }

  private def cumSumNarrow(df: DataFrame, order: Column, value: Column,
      n: Int): DataFrame = {
    val spark = df.sparkSession
    val prepared = df
      .withColumn("__v", value.cast(LongType))
      .repartitionByRange(n, order)
      .sortWithinPartitions(order)
    val schema = prepared.schema
    val vIdx = schema.fieldIndex("__v")
    // ONE RDD instance (the zipWithIndex pattern): its range boundaries
    // are sampled once and its shuffle files are written once, so the
    // totals job and the cumulate job see IDENTICAL partitions. Two
    // separate DataFrame branches would re-execute repartitionByRange,
    // whose boundary sampling is seeded by RDD id — two executions can
    // split rows differently and mis-align the prefix offsets.
    val rdd = prepared.rdd
    val totals = rdd.mapPartitionsWithIndex { (i, it) =>
      var t = 0L
      it.foreach(r => if (!r.isNullAt(vIdx)) t += r.getLong(vIdx))
      Iterator(i -> t)
    }.collect().sortBy(_._1)
    val offsets = totals.scanLeft(0L)(_ + _._2).init // exclusive prefix sums
    val bc = spark.sparkContext.broadcast(offsets)
    val out = rdd.mapPartitionsWithIndex { (i, it) =>
      var acc = bc.value(i)
      it.map { r =>
        if (!r.isNullAt(vIdx)) acc += r.getLong(vIdx)
        Row.fromSeq(r.toSeq :+ acc)
      }
    }
    spark.createDataFrame(out, schema.add("cum", LongType)).drop("__v")
  }

  /** Fallback for non-integral values (decimal money sums). CAVEAT: the
    * offsets branch re-references the range exchange — correctness relies
    * on exchange reuse keeping both branches' boundaries identical (see
    * NOTES.md on repartitionByRange nondeterminism). No current caller
    * takes this path; extend the RDD flavor before routing decimals here.
    */
  private def cumSumViaWindow(df: DataFrame, order: Column, value: Column,
      n: Int): DataFrame = {
    val parted = df.repartitionByRange(n, order)
      .withColumn("__pid", spark_partition_id())
    val wLocal = Window.partitionBy(col("__pid")).orderBy(order)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = parted.withColumn("__local_cum", sum(value).over(wLocal))
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
