package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Byte-pair-encoding TRAINING primitives at corpus scale — the missing
  * piece between token counting (t1) and a trained tokenizer. Real BPE
  * trainers (GPT-2, SentencePiece) never walk the corpus per merge: they
  * compress to the DISTINCT-WORD frequency table once, then iterate over
  * that (vocabulary-sized, not corpus-sized) state. That is exactly the
  * shape here:
  *
  *  - `wordFreq` — one corpus pass, one hash agg (the only corpus-sized
  *    stage; at 100 TB this is the same shuffle as t5's vocab count);
  *  - `pairCounts` — adjacent symbol pairs exploded over DISTINCT words,
  *    weighted by word frequency: vocabulary-sized work per iteration;
  *  - `mergeStep` — apply the best pair as a single-symbol rewrite and
  *    recount: the body of the training loop, again vocabulary-sized.
  *    The best pair is a 1-row aggregate (deterministic tie-break on the
  *    pair string) carried as a broadcast, never driver logic inside the
  *    plan.
  *
  * Pair/merge arithmetic is pure integer counting, so the DuckDB oracle
  * hash-matches exactly. The merged symbol is '§' (absent from the
  * normalized corpus by construction — normalizeText lowercases and the
  * probe asserts absence), so one merge keeps symbols 1-char and the
  * pair machinery closed under iteration.
  *
  * Reference anchor: the reference counts whitespace tokens during
  * normalization (src/transform.py:108-146 word handling); this extends
  * that counting doctrine to subword vocabulary induction.
  */
object Bpe {

  /** Distinct words with corpus frequencies (words of ≥ 2 chars — BPE
    * pairs need two symbols).
    */
  def wordFreq(docs: DataFrame): DataFrame =
    Par.fan(docs)
      .select(explode(split(TextDedup.normalizeText(col("text")), " ")).as("w"))
      .filter(length(col("w")) >= 2)
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))

  private def pairsOf(wf: DataFrame): DataFrame =
    wf.select(col("freq"), explode(
        transform(sequence(lit(1), length(col("w")) - 1),
          i => col("w").substr(i, lit(2)))).as("pair"))
      .groupBy(col("pair")).agg(sum(col("freq")).as("n"))

  /** Top-k adjacent-pair counts over the corpus — iteration 0 of BPE
    * training. Deterministic: count desc, pair asc.
    */
  def pairCounts(docs: DataFrame, k: Int): DataFrame =
    pairsOf(wordFreq(docs))
      .orderBy(col("n").desc, col("pair")).limit(k)

  /** One BPE merge iteration: rewrite the best pair to '§' in every
    * word (left-to-right non-overlapping, the BPE contract) and recount
    * pairs. Output: the post-merge top-k pair table plus the merge that
    * was applied (constant columns `merged_pair`, `merged_n`) — the
    * record a trainer appends to its merges list.
    */
  def mergeStep(docs: DataFrame, k: Int): DataFrame = {
    val wf = wordFreq(docs)
    val best = pairsOf(wf)
      .orderBy(col("n").desc, col("pair")).limit(1)
      .select(col("pair").as("merged_pair"), col("n").as("merged_n"))
    val rewritten = wf.crossJoin(broadcast(best))
      .select(expr("replace(w, merged_pair, '§')").as("w"), col("freq"),
        col("merged_pair"), col("merged_n"))
      .filter(length(col("w")) >= 2)
    rewritten
      .select(col("merged_pair"), col("merged_n"), col("freq"), explode(
          transform(sequence(lit(1), length(col("w")) - 1),
            i => col("w").substr(i, lit(2)))).as("pair"))
      .groupBy(col("merged_pair"), col("merged_n"), col("pair"))
      .agg(sum(col("freq")).as("n"))
      .orderBy(col("n").desc, col("pair")).limit(k)
  }
}
