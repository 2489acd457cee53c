package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated TPC-H-ish star schema
  * (`/root/testdata/sf*`, see TESTDATA.md). All engine queries take the
  * scale-factor directory as a parameter so the same code runs at any SF —
  * and, on a real cluster, against a 100 TB lake path.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, table: String): DataFrame =
    spark.read.parquet(s"$sfDir/$table.parquet")

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** events with `ts` normalized to the engine contract: BIGINT UTC
    * nanoseconds. Driver-generated files have stored `ts` as int64
    * timestamp[ns] (Spark reads the unsupported-nanos physical int64 as
    * LongType) and as timestamp[us] (Spark reads TIMESTAMP/TIMESTAMP_NTZ)
    * across rounds; both normalize here so every query and stream sees
    * long-ns. NTZ→TZ cast is numerically identity under the project-wide
    * UTC session timezone (GraftSession).
    */
  def events(s: SparkSession, d: String): DataFrame =
    normalizeEventTs(load(s, d, "events"))

  /** Normalize a `ts` column to BIGINT UTC nanoseconds whatever its
    * stored physical type (shared by the Tables accessor and the
    * path-based CLI commands).
    */
  def normalizeEventTs(raw: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, unix_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    raw.schema("ts").dataType match {
      case LongType => raw
      case TimestampType => raw.withColumn("ts", unix_micros(col("ts")) * 1000L)
      case TimestampNTZType =>
        raw.withColumn("ts", unix_micros(col("ts").cast(TimestampType)) * 1000L)
      case other => throw new IllegalStateException(s"unexpected events.ts type: $other")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Register every table as a temp view so `spark.sql` works too
    * (events goes through the ts-normalizing accessor).
    */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach { n =>
      val df = if (n == "events") events(spark, sfDir) else load(spark, sfDir, n)
      df.createOrReplaceTempView(n)
    }
}
