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
}
