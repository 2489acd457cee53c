package graft.operators

import org.apache.spark.sql.DataFrame

/** Parallelism repair for CPU-heavy narrow stages over small-split inputs.
  *
  * A parquet scan parallelizes at row-group granularity; a single-row-group
  * file yields ONE task, so an expensive per-row projection (normalize,
  * money parsing, text sketching) runs on one core regardless of cluster
  * size. `fan` round-robin repartitions to the session's default
  * parallelism ONLY when the scan is under-split — on a real lake (row
  * groups ≫ cores) it is a structural no-op, so the 100 TB plan never pays
  * an extra shuffle. The shuffle it does add at small scale moves the raw
  * bytes once and buys cores× speedup on the narrow stage that follows.
  */
object Par {
  def fan(df: DataFrame): DataFrame = {
    // Streaming plans pass through: micro-batches are already split by the
    // source, and df.rdd would throw on an unresolved stream.
    if (df.isStreaming) return df
    val target = df.sparkSession.sparkContext.defaultParallelism
    // Split count from the physical plan's file-scan leaves (driver
    // metadata, no job, no AQE stage materialization — Bridge.scanSplits).
    // Non-file plans (cached/local/joined) fall back to the RDD count:
    // those are exactly the plans where rdd conversion is cheap and fan
    // is a rarely-hit defensive path.
    val splits = org.apache.spark.sql.graftbridge.Bridge.scanSplits(df)
      .getOrElse(df.rdd.getNumPartitions)
    if (splits >= target) df else df.repartition(target)
  }
}
