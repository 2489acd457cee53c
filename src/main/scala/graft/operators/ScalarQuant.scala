package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** int8 scalar quantization of embedding columns (FAISS SQ8 shape): one
  * per-dimension (lo, hi) training pass, then a narrow encode of every
  * vector to 256-level codes — 4× smaller than float32 at ~1e-3 error,
  * the storage layout a billion-vector ANN corpus actually ships.
  *
  * Scale shape: training aggregates dim rows (percentile-free min/max —
  * exact, associative, one shuffle of dim-keyed partials) and collects
  * only dim doubles to the driver, like the k-means centroid path
  * (IvfIndex.scala). Encoding is a pure per-row transform against the
  * broadcast range literals — zero shuffle over the corpus.
  *
  * Arithmetic parity: codes and error stats use the identical IEEE
  * double op sequence the DuckDB oracle runs — cast-to-double first,
  * then (v−lo)·255/(hi−lo)+0.5 floored; never float intermediates.
  */
object ScalarQuant {

  /** Per-dimension (lo, hi) over the corpus, index order. Collect is
    * dim-bounded (KB), the FAISS training shape.
    */
  def trainRanges(embs: DataFrame, embCol: String = "embedding"): Array[(Double, Double)] =
    embs.select(posexplode(col(embCol)).as(Seq("pos", "v")))
      .groupBy(col("pos"))
      .agg(min(col("v")).as("lo"), max(col("v")).as("hi"))
      .orderBy(col("pos"))
      .collect()
      .map(r => (r.getFloat(1).toDouble, r.getFloat(2).toDouble))

  /** Encode vectors to int8 codes plus per-element dequantization error
    * in integer micro units. Fully narrow: the ranges ride along as
    * array literals, vd is materialized once (plan-size discipline —
    * NOTES.md), and no shuffle touches the corpus.
    */
  def quantize(embs: DataFrame, ranges: Array[(Double, Double)],
      embCol: String = "embedding"): DataFrame = {
    val lo = typedLit(ranges.map(_._1))
    val hi = typedLit(ranges.map(_._2))
    def loI(i: Column) = element_at(lo, i + 1)
    def hiI(i: Column) = element_at(hi, i + 1)
    embs
      .withColumn("vd", transform(col(embCol), v => v.cast(DoubleType)))
      .withColumn("codes", transform(col("vd"), (v, i) =>
        when(hiI(i) > loI(i),
          floor((v - loI(i)) * lit(255.0) / (hiI(i) - loI(i)) + lit(0.5)))
          .otherwise(lit(0L))))
      .withColumn("err_micro", transform(col("codes"), (c, i) =>
        floor(abs(loI(i) + c * (hiI(i) - loI(i)) / lit(255.0)
          - element_at(col("vd"), i + 1)) * lit(1000000.0))))
  }

  /** Dequantized double vector from int8 codes (code 0 lands on lo, so
    * constant dims need no special case).
    */
  def dequantize(codes: Column, ranges: Array[(Double, Double)]): Column = {
    val lo = typedLit(ranges.map(_._1))
    val hi = typedLit(ranges.map(_._2))
    transform(codes, (c, i) =>
      element_at(lo, i + 1)
        + c * (element_at(hi, i + 1) - element_at(lo, i + 1)) / lit(255.0))
  }

  /** Approximate top-k cosine search over SQ8 codes with exact re-rank
    * (FAISS SQ8 search shape): the approximate pass scans the codes —
    * the 4×-smaller representation a 100 TB vector corpus actually keeps
    * hot — against the broadcast query batch, a bounded per-partition
    * pre-prune + ranking window keeps k·refine candidates per query, and
    * ONLY that output-sized shortlist joins back to the float vectors
    * for exact scoring. Fully deterministic (ties break on neighbor_id),
    * so unlike the hash-seeded ANN paths this one is oracle-checkable.
    */
  def sq8TopK(queries: DataFrame, candidates: DataFrame,
      ranges: Array[(Double, Double)], k: Int, refine: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import Similarity.{dot => dotp}
    val asD = (c: Column) => c.cast(ArrayType(DoubleType))
    val q = broadcast(queries
      .select(col("vec_id").as("query_id"), asD(col("embedding")).as("qv"))
      .withColumn("qn2", dotp(col("qv"), col("qv"))))
    val codes = quantize(candidates, ranges)
      .select(col("vec_id").as("neighbor_id"), col("codes"))
      .withColumn("cv", dequantize(col("codes"), ranges))
      .withColumn("cn2", dotp(col("cv"), col("cv")))
      .drop("codes")
    val scored = q.join(codes, col("query_id") =!= col("neighbor_id"))
      .withColumn("acos", dotp(col("qv"), col("cv")) / sqrt(col("qn2") * col("cn2")))
    val wa = Window.partitionBy(col("query_id"))
      .orderBy(col("acos").desc, col("neighbor_id"))
    // narrow projection + rank filter: partial WindowGroupLimit bounds
    // the shortlist shuffle (the dequantized vectors stay behind)
    val shortlist = scored.select(col("query_id"), col("neighbor_id"), col("acos"))
      .withColumn("rn", row_number().over(wa)).filter(col("rn") <= k * refine)
      .select(col("query_id"), col("neighbor_id"))
    val exact = candidates
      .select(col("vec_id").as("neighbor_id"), asD(col("embedding")).as("ev"))
      .withColumn("en2", dotp(col("ev"), col("ev")))
    val rer = shortlist
      .join(exact, Seq("neighbor_id"))
      .join(q, Seq("query_id"))
      .withColumn("cos", dotp(col("qv"), col("ev")) / sqrt(col("qn2") * col("en2")))
    val we = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    rer.withColumn("rn2", row_number().over(we)).filter(col("rn2") <= k)
      .select(col("query_id"), col("neighbor_id"),
        col("cos").cast(DecimalType(18, 6)).cast(DoubleType).as("cos"))
  }
}
