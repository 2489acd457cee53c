package graft

import org.apache.spark.sql.SparkSession

/** Central SparkSession factory — every entry point (Verify, Bench, tests)
  * builds its session here so the engine-critical confs are applied once:
  *
  *  - shuffle.partitions: defaults to the local core count (32) but is
  *    an env knob (SPARK_GRAFT_SHUFFLE_PARTITIONS) — a cluster deployment
  *    sets it to ~2-3× total cores (or leaves AQE coalescing to shrink
  *    from a higher initial value); nothing in the engine assumes 32.
  *  - AQE on: runtime re-plan (broadcast promotion, skew-join splitting,
  *    partition coalescing) — the 100 TB safety net.
  *  - ansi=false: the reference engine's coercion contract is
  *    null-on-unparseable (src/transform.py:18-105 in the reference);
  *    ANSI mode would throw instead.
  *  - nanosAsLong: the `events` table carries TIMESTAMP(NANOS) which
  *    Spark's vectorized reader otherwise rejects; we read ns-as-long and
  *    convert explicitly (Tables/EventsView).
  *  - session timezone UTC: reference normalizes all timestamps to UTC
  *    (src/transform.py:22-37).
  */
object GraftSession {
  def builder(master: String = s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]"): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName("graft")
      // native engine expressions (graft_dot, …) available from SQL
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS",
          sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.ansi.enabled", "false")
      // reference dict-comprehension semantics: later duplicate key wins
      // (src/transform.py:112 in the reference)
      .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
      // OFF: Spark 4.1's UnionExec claims its children's common hash
      // partitioning when this is on, but a union CONCATENATES child
      // partitions (two 32-bucket scans -> 64 partitions, the same key in
      // two of them), so downstream aggregates/joins skip the exchange
      // they still need — dropDuplicates over a union of two identically
      // bucketed tables silently kept duplicates (caught by the index
      // merge specs; probe: union 500 rows, dedup "250" returned 375).
      .config("spark.sql.unionOutputPartitioning", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.compression.codec", "zstd")
      .config("spark.ui.enabled", "false")

  def get(): SparkSession = {
    val spark = builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
