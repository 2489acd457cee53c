package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Data Selection via Importance Resampling (DSIR — Xie et al., NeurIPS
  * 2023): pick raw-corpus documents that look like a small target domain
  * by importance weights under two bag-of-hashed-ngram models.
  *
  *   1. hash every word unigram + bigram into B buckets (feature
  *      extraction — one narrow corpus pass);
  *   2. fit add-one-smoothed bucket distributions p (target docs) and
  *      q (full raw corpus) — two B-bounded hash aggregations;
  *   3. per-doc importance weight log w(d) = Σ_features ln(p_b / q_b)
  *      — a broadcast join of the KB-sized ratio table onto the
  *      feature stream plus one doc_id aggregation;
  *   4. resample without replacement via Gumbel top-k on the log
  *      weights, with the repo's deterministic content-hash uniforms
  *      (mx4's sampling doctrine) standing in for RNG draws.
  *
  * Scale shape at 100 TB: the only corpus-sized stages are the feature
  * explode (narrow) and the per-doc weight aggregation (one shuffle on
  * doc_id); everything distribution-shaped is bucket-bounded (B rows)
  * and broadcast. The top-k is a TakeOrdered, never a global sort.
  *
  * Oracle parity: bucket ids use the md5-16-bit trick (NOTES.md), counts
  * are exact integers, each bucket's ln ratio rounds through
  * DECIMAL(18,6) once (the t15 doctrine) and per-doc sums are exact
  * decimal adds — micro-nat outputs hash-match DuckDB exactly.
  *
  * Reference anchor: the reference pipeline has source filters + manual
  * allowlists (src/transform.py:176-206); DSIR is the statistical
  * generalization a pretraining-data deployment of the same engine needs.
  */
object Dsir {

  /** md5-derived 16-bit bucket of a gram string, mod `b` — the
    * cross-engine-stable hash (DuckDB: CAST(concat('0x', substr(md5)))).
    */
  private def bucketOf(g: Column, b: Int): Column =
    conv(substring(md5(g), 1, 4), 16, 10).cast(LongType) % b

  /** (doc_id, bucket) feature OCCURRENCES: hashed word unigrams +
    * bigrams over the normalized text. Occurrences, not distincts — the
    * bag-of-ngrams models count multiplicity.
    */
  def features(docs: DataFrame, b: Int): DataFrame =
    features(docs, b, Nil)

  /** As `features`, carrying `extra` doc-level columns through the
    * explode (narrow — evaluated once per doc row, not per gram).
    */
  def features(docs: DataFrame, b: Int, extra: Seq[String]): DataFrame = {
    val norm = TextDedup.normalizeText(col("text"))
    val words = split(norm, " ")
    val unigrams = filter(words, w => length(w) > 0)
    // bigrams = every 2-token window of the normalized text, one native
    // eval per doc (SpanArray) — the transform/element_at/concat_ws
    // lambda it replaces evaluated interpreted per POSITION. Equal by
    // construction: normalized text has single-space separators, so the
    // window set matches the old sequence-indexed concat exactly (a
    // 1-word doc yields the same empty array the old guard produced).
    val bigrams = graft.functions.TextSketches.spanArray(norm, 2)
    Par.fan(docs)
      .select(col("doc_id") +: extra.map(col) :+ explode(concat(unigrams, bigrams)).as("g"): _*)
      .select(col("doc_id") +: extra.map(col) :+ bucketOf(col("g"), b).as("bucket"): _*)
  }

  /** Per-bucket add-one-smoothed log-likelihood ratio
    * ln(p_target(b) / p_raw(b)) as DECIMAL(18,6) — one ln per bucket.
    * Only buckets observed in the raw corpus appear (unobserved buckets
    * are never referenced by any document's features).
    */
  def bucketLogRatios(feats: DataFrame, targetIds: DataFrame, b: Int): DataFrame = {
    val tCnt = feats.join(targetIds, Seq("doc_id"), "left_semi")
      .groupBy(col("bucket")).agg(count(lit(1)).as("c_t"))
    val rCnt = feats.groupBy(col("bucket")).agg(count(lit(1)).as("c_r"))
    ratiosFromCounts(rCnt.join(tCnt, Seq("bucket"), "left")
      .na.fill(0L, Seq("c_t")), b)
  }

  /** Both bucket models from ONE pass over a feature stream that carries
    * an `is_t` target flag: c_r counts every occurrence, c_t only the
    * target slice — identical counts to the two-aggregation formulation
    * without re-reading the stream.
    */
  def bucketLogRatiosFlagged(feats: DataFrame, b: Int): DataFrame =
    ratiosFromCounts(feats.groupBy(col("bucket"))
      .agg(count(lit(1)).as("c_r"),
        sum(when(col("is_t"), 1L).otherwise(0L)).as("c_t")), b)

  private def ratiosFromCounts(counts: DataFrame, b: Int): DataFrame = {
    val nT = counts.agg(sum(col("c_t")).as("n_t"))
    val nR = counts.agg(sum(col("c_r")).as("n_r"))
    counts
      .crossJoin(broadcast(nT)).crossJoin(broadcast(nR))
      // double-division sequence mirrored verbatim in the oracle —
      // integer-product formulations would overflow BIGINT at corpus
      // scale, so the ratio is assembled from two exact-int-to-double
      // divisions and one IEEE multiply before the single ln
      .select(col("bucket"),
        log(((col("c_t") + lit(1L)).cast(DoubleType) / (col("c_r") + lit(1L))) *
          ((col("n_r") + lit(b.toLong)).cast(DoubleType) / (col("n_t") + lit(b.toLong))))
          .cast(DecimalType(18, 6)).as("lnr6"))
  }

  /** Per-doc DSIR importance weights against a target predicate:
    * (doc_id, n_feats, weight_micro). weight_micro is the exact-decimal
    * feature-sum of ln ratios in integer micro-nats.
    */
  def importanceWeights(docs: DataFrame, targetPred: Column,
      b: Int = 4096): DataFrame = {
    // ONE feature explode serves both the model fit and the scoring
    // join: the target flag rides through the explode (narrow), the
    // stream is materialized once (localCheckpoint — at 100 TB this is
    // "persist the feature table", the DedupIndexStore doctrine), and
    // both bucket models come from a single conditional aggregation.
    // The naive shape re-exploded the corpus three times.
    val feats = features(docs.withColumn("is_t", targetPred), b, Seq("is_t"))
      .localCheckpoint(true)
    val lnr = bucketLogRatiosFlagged(feats, b)
    feats.join(broadcast(lnr), Seq("bucket"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_feats"), sum(col("lnr6")).as("s6"))
      .select(col("doc_id"), col("n_feats"),
        expr("CAST(s6 * 1000000 AS BIGINT)").as("weight_micro"))
  }

  /** Gumbel top-k importance RESAMPLING (the paper's sampling step,
    * derandomized): key = log-weight + Gumbel(content-hash uniform);
    * the k largest keys are a without-replacement sample ∝ w. The
    * uniform is the md5-16-bit value of a salted doc_id — reproducible
    * across engines and runs (mx4's deterministic-sampling doctrine).
    */
  def resample(docs: DataFrame, targetPred: Column, k: Int,
      b: Int = 4096): DataFrame = {
    val w = importanceWeights(docs, targetPred, b)
    val u = (conv(substring(md5(concat(lit("dsir:"),
      col("doc_id").cast(StringType))), 1, 4), 16, 10).cast(DoubleType) +
      lit(0.5)) / lit(65536.0)
    val gumbelMicro = floor(-log(-log(u)) * lit(1000000.0)).cast(LongType)
    w.select(col("doc_id"), col("weight_micro"),
        (col("weight_micro") + gumbelMicro).as("key_micro"))
      .orderBy(col("key_micro").desc, col("doc_id")).limit(k)
  }
}
