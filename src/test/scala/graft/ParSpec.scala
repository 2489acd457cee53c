package graft

import org.apache.spark.sql.functions._

import graft.operators.Par

/** Par.fan contract: repair under-split file scans, leave well-split scans
  * and streaming plans alone. The split estimate comes from the physical
  * plan's file-scan leaves (Bridge.scanSplits) — the count Spark's
  * bin-packing actually produced — because `inputFiles.length` overcounts
  * packed small files (a 32-tiny-file table scans as ~1 task, and fanning
  * decisions made from the file count silently serialized the CPU-heavy
  * normalize stage).
  */
class ParSpec extends SparkTestBase {
  import spark.implicits._

  private def partitions(df: org.apache.spark.sql.DataFrame): Int =
    df.rdd.getNumPartitions

  test("fan repairs a single-file scan to session parallelism") {
    val dir = java.nio.file.Files.createTempDirectory("fan_one").toString
    spark.range(0, 10000).select($"id", ($"id" % 7).as("v"))
      .coalesce(1).write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
    assert(partitions(Par.fan(df)) == spark.sparkContext.defaultParallelism)
  }

  test("fan repairs MANY tiny files that bin-pack into few scan splits") {
    val dir = java.nio.file.Files.createTempDirectory("fan_packed").toString
    spark.range(0, 10000).select($"id", ($"id" % 7).as("v"))
      .repartition(32).write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
    // 32 tiny files pack into fewer scan tasks than cores — the file
    // count alone would claim the scan is already parallel
    assert(df.inputFiles.length >= 4)
    val scanned = org.apache.spark.sql.graftbridge.Bridge.scanSplits(df)
    assert(scanned.isDefined)
    if (scanned.get < spark.sparkContext.defaultParallelism)
      assert(partitions(Par.fan(df)) == spark.sparkContext.defaultParallelism)
  }

  test("fan is a no-op on a well-split scan") {
    val dir = java.nio.file.Files.createTempDirectory("fan_split").toString
    spark.range(0, 50000).select($"id", ($"id" % 7).as("v"))
      .coalesce(1).write.mode("overwrite").parquet(dir)
    val old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    val oldCost = spark.conf.get("spark.sql.files.openCostInBytes")
    try {
      // force the single file to split into more tasks than cores
      spark.conf.set("spark.sql.files.maxPartitionBytes", "4096")
      spark.conf.set("spark.sql.files.openCostInBytes", "0")
      val df = spark.read.parquet(dir)
      val splits = org.apache.spark.sql.graftbridge.Bridge.scanSplits(df).get
      assert(splits >= spark.sparkContext.defaultParallelism)
      assert(Par.fan(df) eq df) // no repartition inserted
    } finally {
      spark.conf.set("spark.sql.files.maxPartitionBytes", old)
      spark.conf.set("spark.sql.files.openCostInBytes", oldCost)
    }
  }

  test("fan passes a streaming DataFrame through untouched") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[Long]
    val df = ms.toDF()
    assert(df.isStreaming)
    assert(Par.fan(df) eq df)
  }

  test("scanSplits declines non-file and exchange-bearing plans") {
    import org.apache.spark.sql.graftbridge.Bridge
    val local = Seq(1L, 2L).toDF("v")
    assert(Bridge.scanSplits(local).isEmpty)
    val dir = java.nio.file.Files.createTempDirectory("fan_ex").toString
    spark.range(0, 100).toDF("id").write.mode("overwrite").parquet(dir)
    val agg = spark.read.parquet(dir).groupBy($"id").count()
    assert(Bridge.scanSplits(agg).isEmpty)
  }
}
