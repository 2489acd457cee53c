package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Maximal Marginal Relevance diversity rerank (Carbonell & Goldstein,
  * SIGIR 1998) — the post-retrieval step every search/RAG stack runs so
  * a result page isn't five near-copies of the same document:
  *
  *   pick argmax_cand  λ·rel(cand) − (1−λ)·max_{s∈selected} sim(cand, s)
  *
  * greedily k times. The greedy is inherently sequential in k, so the
  * loop is UNROLLED — k is a page-size constant (5–20), and each step
  * touches only CANDIDATE-scale rows (queries × pool size, thousands at
  * most): an anti-join to drop already-picked candidates, a join against
  * the picked set plus the pairwise-similarity table for the max-sim
  * term, and a per-query argmax that plans as a WindowGroupLimit. The
  * corpus itself is never touched here — candidate generation (BM25,
  * ANN, the lexical shortlist) happens upstream at corpus scale.
  *
  * Everything is INTEGER arithmetic: relevance and similarity arrive in
  * exact micro units (n-gram Jaccard micros, BM25 millis), λ is in
  * millis, and the MMR score is a BIGINT product-difference — so the
  * selection is bit-identical across engines, runs, and partitionings
  * (ties break on cand_id). Per-step localCheckpoints keep the unrolled
  * plan flat instead of k-deep.
  *
  * Reference anchor: the reference's ordered exports (main.py:142-217
  * deterministic ORDER BY) are the degenerate λ=1 case; the diversity
  * term is what a retrieval deployment of this engine adds.
  */
object Mmr {

  /** Greedy MMR over a bounded candidate pool.
    *
    * @param cands (query_id, cand_id, rel_micro) — the per-query pool
    * @param sims  (id_a, id_b, sim_micro) canonical id_a < id_b pairs;
    *              absent pairs score 0 (disjoint candidates)
    * @param k     page size (selections per query; unrolled)
    * @param lambdaMilli relevance weight λ in millis (700 = 0.7)
    * @return (query_id, step, cand_id, rel_micro, maxsim_micro, mmr_score)
    */
  def rerank(cands: DataFrame, sims: DataFrame, k: Int,
      lambdaMilli: Long): DataFrame = {
    val wSel = Window.partitionBy(col("query_id"))
      .orderBy(col("mmr_score").desc, col("cand_id"))
    def pick(scored: DataFrame, step: Int): DataFrame =
      scored.withColumn("rn", row_number().over(wSel)).filter(col("rn") === 1)
        .select(col("query_id"), lit(step.toLong).as("step"), col("cand_id"),
          col("rel_micro"), col("maxsim_micro"), col("mmr_score"))
    val simsC = sims.select(col("id_a"), col("id_b"), col("sim_micro"))
    var selected = pick(cands
      .withColumn("maxsim_micro", lit(0L))
      .withColumn("mmr_score", lit(lambdaMilli) * col("rel_micro")), 1)
      .localCheckpoint(true)
    for (step <- 2 to k) {
      val rem = cands.join(
        selected.select(col("query_id"), col("cand_id")),
        Seq("query_id", "cand_id"), "left_anti")
      val scored = rem
        .join(selected.select(col("query_id"), col("cand_id").as("sel_id")),
          Seq("query_id"))
        .withColumn("pa", least(col("cand_id"), col("sel_id")))
        .withColumn("pb", greatest(col("cand_id"), col("sel_id")))
        .join(simsC.select(col("id_a").as("pa"), col("id_b").as("pb"),
          col("sim_micro")), Seq("pa", "pb"), "left")
        .groupBy(col("query_id"), col("cand_id"), col("rel_micro"))
        .agg(max(coalesce(col("sim_micro"), lit(0L))).as("maxsim_micro"))
        .withColumn("mmr_score", lit(lambdaMilli) * col("rel_micro") -
          lit(1000L - lambdaMilli) * col("maxsim_micro"))
      selected = selected.unionByName(pick(scored, step)).localCheckpoint(true)
    }
    selected
  }
}
