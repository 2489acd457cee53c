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
      // AQE sizes post-shuffle partitions by BYTES; the dedup/verify
      // stages carry CPU-dense rows (shingle/embedding arrays where one
      // MB costs ~100× its scan time in intersects), so the default 1 MB
      // coalesce floor folds them onto 1-2 cores (measured: 2-4.5 s
      // single-task verify stages while 31 cores idle). Lower the floor
      // so the max(totalBytes/parallelism, floor) rule keeps parallelism;
      // at cluster scale totalBytes/parallelism ≫ any floor, so this only
      // matters exactly where it should — small/CPU-dense shuffles.
      // 128k, not lower: an A/B at 64k clawed back ~1s on each iterative
      // many-stage query (pagerank rounds, drift windows) whose per-round
      // shuffles are byte-tiny AND cpu-cheap — there AQE's byte model is
      // right and over-splitting just multiplies task overhead. 128k keeps
      // ~95% of the verify-stage win at half the iteration tax.
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_AQE_MIN_PARTITION_SIZE", "128k"))
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // The whole-stage-codegen class cache holds 100 entries by default;
      // a session that runs the full 228-query suite generates far more
      // fragments than that, so each timed run recompiles fragments its
      // warmup already compiled (Janino, ~10-50 ms per fragment, driver-
      // side). Scale-neutral: it bounds a driver-side metadata cache, not
      // a data path; 10k compiled classes is tens of MB of metaspace.
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "10000"))
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
