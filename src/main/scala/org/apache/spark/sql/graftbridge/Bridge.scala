package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression converters. Spark 4 moved these behind
  * `private[sql]` (org.apache.spark.sql.classic.ExpressionUtils), so this
  * one-file bridge lives under org.apache.spark.sql — the standard pattern
  * for extension libraries that add native Catalyst expressions.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Block until every queued listener event is delivered — the metrics
    * a SparkListener accumulates are only consistent after the bus
    * drains (`SparkContext.listenerBus` is private[spark]; this shim
    * lives inside org.apache.spark, the standard extension pattern).
    */
  def drainListenerBus(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty()

  /** The query's RDD of INTERNAL rows — `df.rdd` pays a full
    * InternalRow → external Row conversion (every UTF8String decoded to
    * java.lang.String, every array copied into a Seq) that the suffix
    * neighbor-LCP scans were spending most of their time in; this keeps
    * rows in Tungsten format. CAUTION: iterators reuse row objects —
    * callers must copy() anything they hold across next().
    */
  def toInternalRdd(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow] =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]].queryExecution.toRdd

  /** Wrap an RDD of InternalRows as a DataFrame (the inverse of
    * `toInternalRdd`; `createDataFrame(RDD[Row])` would re-serialize
    * every row through the external format).
    */
  def internalCreateDataFrame(spark: org.apache.spark.sql.SparkSession,
      rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
      schema: org.apache.spark.sql.types.StructType): org.apache.spark.sql.DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema)

  /** Planned scan-task count of a pure file-scan pipeline, from the
    * PHYSICAL plan's leaves — the number Spark's bin-packing actually
    * produced (small files pack many-per-split, large files split by
    * maxPartitionBytes; `df.inputFiles.length` gets both wrong). Driver
    * metadata only: building FileScanRDD lists files and packs splits but
    * launches no job, and `sparkPlan` (pre-AQE) means no shuffle stage can
    * materialize. Returns None when the plan is not narrow-over-file-scans
    * (exchanges, cached or local relations) — callers fall back.
    */
  def scanSplits(df: org.apache.spark.sql.DataFrame): Option[Int] = {
    import org.apache.spark.sql.catalyst.plans.logical.{Filter, Project}
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.datasources.LogicalRelation
    val qe = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]].queryExecution
    // gate on the LOGICAL plan: only narrow pipelines over a file relation
    // qualify — anything that will plan an exchange (aggregate, join,
    // repartition, window) changes the output partitioning, so the scan's
    // split count is not the answer. (sparkPlan can't be probed for
    // exchanges: EnsureRequirements inserts them at the prepare stage.)
    val narrow = qe.optimizedPlan.collect { case p => p }.forall {
      case _: Project | _: Filter | _: LogicalRelation => true
      case _ => false
    }
    if (!narrow) return None
    val leaves = qe.sparkPlan.collectLeaves()
    if (leaves.nonEmpty && leaves.forall(_.isInstanceOf[FileSourceScanExec]))
      Some(leaves.map(_.asInstanceOf[FileSourceScanExec].inputRDD.getNumPartitions).sum)
    else None
  }
}
