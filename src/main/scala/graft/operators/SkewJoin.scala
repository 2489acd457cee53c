package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salting for skewed equi-joins (SURVEY §7.4: "salting for skew").
  *
  * AQE's skew-join split (enabled in GraftSession) handles most skew at
  * runtime by splitting oversized partitions; explicit salting is the
  * deterministic fallback for the cases AQE can't fix — e.g. a single
  * join key holding >1 executor's worth of rows, or a skewed aggregation
  * upstream of the join.
  *
  * Shape: scatter the big side's hot keys across `salt` sub-keys with a
  * deterministic hash of a discriminator column; replicate the small side
  * once per sub-key. Join cardinality is unchanged; the hot key's rows now
  * land on `salt` partitions instead of one.
  */
object SkewJoin {

  /** Inner equi-join on `key` with the LEFT side scattered.
    * `discriminator` must be a left column that varies within a key group
    * (any high-cardinality column works; the row's identity column is
    * ideal). `salt` multiplies the right side's row count — keep it small
    * (8-64) and the right side the smaller input.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      discriminator: String, salt: Int = 16): DataFrame = {
    require(salt > 0)
    val sl = left.withColumn("__salt", pmod(xxhash64(col(discriminator)), lit(salt.toLong)))
    val sr = right.withColumn("__salt", explode(sequence(lit(0L), lit(salt.toLong - 1))))
    sl.join(sr, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase aggregation for skewed group keys: partial-aggregate on
    * (key, salt), then final-aggregate on key. Spark's hash aggregate
    * already does map-side partials; this shape is for aggregates where
    * the PARTIAL state itself is heavy per key (e.g. collect-style or
    * high-cardinality distinct counts under one hot group).
    */
  def saltedCountDistinct(df: DataFrame, key: String, distinctCol: String,
      salt: Int = 16): DataFrame =
    df.withColumn("__salt", pmod(xxhash64(col(distinctCol)), lit(salt.toLong)))
      .groupBy(col(key), col("__salt"))
      .agg(countDistinct(col(distinctCol)).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as("n_distinct"))
}
