package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deterministic, mergeable, ENGINE-PORTABLE sketches — exact-twin
  * siblings of the Spark-built-in approximate aggregations (a7
  * `approx_count_distinct`, a13 `approx_percentile`), whose HLL++ /
  * KLL buffers are engine-private by construction and can only ever be
  * error-gated. These are built on the md5-derived 48-bit hash the t24
  * Count-Min sketch proved bit-replayable in DuckDB, so the SKETCH
  * ITSELF — synopsis, sample, estimate — sits under the oracle gate
  * (a23/a24), not just an error band.
  *
  * Scale shape: both sketches are bottom-k selections — one narrow
  * hash projection, then a partial per-partition top-k under the
  * exchange (Spark plans ORDER BY h LIMIT k as TakeOrderedAndProject
  * and the per-group rank as a WindowGroupLimit), k rows emerge.
  * Mergeability is structural: bottom-k(A ∪ B) = bottom-k(bottom-k(A)
  * ∪ bottom-k(B)), so shard synopses fold EXACTLY — the same estimate
  * at any layout, unlike HLL register merges which are exact only in
  * register space.
  *
  * KMV estimator (Bar-Yossef et al. 2002): with the k minimum distinct
  * hash values uniform on [0, 2^48), the k-th smallest h_k estimates
  * the density — est = (k−1) · 2^48 / h_k, rsd ≈ 1/√(k−2).
  */
object Sketches {

  /** 2^48 — the hash domain size (12 hex digits of md5 → always
    * positive in a signed 64-bit in BOTH engines; the d3/t24 protocol).
    */
  val HashDomain: Double = 281474976710656.0

  /** Salted 48-bit uniform hash of a column's string form. */
  def hash48(c: Column, salt: String): Column =
    conv(substring(md5(concat(lit(salt + ":"), c.cast(StringType))), 1, 12), 16, 10)
      .cast(LongType)

  /** The KMV synopsis: the k smallest DISTINCT hash values of `c` —
    * the mergeable artifact (union two synopses, dedup, keep the k
    * smallest == the synopsis of the union corpus; spec-pinned).
    */
  def kmvSynopsis(df: DataFrame, c: Column, k: Int, salt: String): DataFrame =
    df.select(hash48(c, salt).as("h")).distinct().orderBy(col("h")).limit(k)

  /** Distinct-count estimate from a synopsis, as a 1-row frame: exact
    * below capacity (the synopsis IS the distinct hash set),
    * floor((k−1)·2^48/h_k) at capacity — one double division, identical
    * in any engine given the same k hashes.
    */
  def kmvEstimate(synopsis: DataFrame, k: Int, outName: String): DataFrame =
    synopsis.agg(max(col("h")).as("hk"), count(lit(1)).as("n"))
      .select(when(col("n") < k, col("n"))
        .otherwise(floor(lit((k - 1).toDouble) * lit(HashDomain)
          / col("hk").cast(DoubleType)).cast(LongType))
        .cast(LongType).as(outName))

  /** One-shot KMV distinct estimate of a column. */
  def kmvDistinct(df: DataFrame, c: Column, k: Int, salt: String,
      outName: String): DataFrame =
    kmvEstimate(kmvSynopsis(df, c, k, salt), k, outName)

  /** Per-group bottom-k sample: the k rows with the smallest salted
    * hash of `key` within each group — a deterministic, mergeable
    * uniform sample (the hash is a fixed random permutation of the
    * rows; its k smallest per group are order- and layout-free).
    * Output (g, v, h).
    */
  def bottomKSample(df: DataFrame, groupCol: Column, key: Column, v: Column,
      k: Int, salt: String): DataFrame = {
    val w = Window.partitionBy(col("g")).orderBy(col("h"))
    df.select(groupCol.as("g"), v.as("v"), hash48(key, salt).as("h"))
      .withColumn("srn", row_number().over(w)).filter(col("srn") <= k)
      .drop("srn")
  }

  /** Quantile estimates from a per-group bottom-k sample: rank the
    * sample by (value, hash) — a TOTAL order, so value ties cannot
    * reorder between engines — and read the value at rank ceil(q·n_g).
    * Groups smaller than k are sampled whole, so their quantiles are
    * EXACT. Standard quartiles are exact binary fractions, so the rank
    * index q·n_g computes engine-identically.
    */
  def bottomKQuantiles(sample: DataFrame, qs: Seq[Double]): DataFrame = {
    val wr = Window.partitionBy(col("g")).orderBy(col("v"), col("h"))
    val wc = Window.partitionBy(col("g"))
    sample
      .withColumn("rn", row_number().over(wr))
      .withColumn("cnt", count(lit(1)).over(wc))
      .groupBy(col("g"))
      .agg(qCol(qs.head), qs.tail.map(qCol): _*)
  }

  private def qCol(q: Double): Column =
    max(when(col("rn") === ceil(lit(q) * col("cnt")), col("v")))
      .cast(DoubleType).as(s"q${(q * 100).toInt}")
}
