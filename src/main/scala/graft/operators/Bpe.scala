package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  // ───── full training loop + tokenizer application (round 7) ─────
  //
  // bpe1/bpe2 above keep symbols single-char via the '§' placeholder —
  // fine for one merge, wrong for a trainer (real symbols are arbitrary
  // byte sequences, and two merge paths that produce the same sequence
  // must alias, the GPT-2/SentencePiece contract). The loop below holds
  // each word as an ARRAY of symbol strings instead.

  /** Word split into 1-char symbol strings (split("", -1) keeps a
    * trailing empty token — filtered).
    */
  private def charSyms(w: Column): Column =
    filter(split(w, ""), s => length(s) > 0)

  /** One merge application pass over a symbol array: left-to-right
    * non-overlapping rewrite of each adjacent (l, r) to the single symbol
    * l||r — the BPE contract. Implemented as a left fold (`aggregate`):
    * merge the incoming symbol into the accumulator's last element exactly
    * when that element equals `l` and the incoming one equals `r`. The
    * fold IS non-overlapping: a merge output l||r can never equal l
    * (r is nonempty), so a symbol just produced by this pass can never
    * match again as the left side of the same merge.
    */
  def mergePass(syms: Column, l: Column, r: Column): Column =
    aggregate(syms, array().cast(ArrayType(StringType)),
      (acc, s) => when(size(acc) > 0 && element_at(acc, -1) === l && s === r,
          concat(slice(acc, lit(1), size(acc) - 1), array(concat(l, r))))
        .otherwise(concat(acc, array(s))))

  /** Corpus-weighted adjacent symbol-pair counts of a (syms, freq) state
    * table — the per-iteration aggregate of the training loop.
    * Vocabulary-sized work: the state has one row per DISTINCT word.
    */
  private def adjacentPairs(state: DataFrame): DataFrame =
    state.filter(size(col("syms")) >= 2)
      .select(col("freq"), explode(
        transform(sequence(lit(1), size(col("syms")) - 1),
          i => struct(element_at(col("syms"), i).as("l"),
            element_at(col("syms"), i + 1).as("r")))).as("p"))
      .groupBy(col("p").getField("l").as("l"), col("p").getField("r").as("r"))
      .agg(sum(col("freq")).as("n"))

  /** The full BPE training loop: `nMerges` merges over the
    * vocabulary-sized symbol state. Per iteration the only driver-side
    * data is the 1-row best pair (the k-means-centroid shape — KB, never
    * data-scale); the state is localCheckpointed each round so the plan
    * stays one-iteration deep regardless of nMerges. Ties break count
    * desc then (l, r) ascending — deterministic across engines (binary
    * string order both sides). Stops early if no pair remains.
    * Returns the ordered merge list (step, l, r, pre-merge count).
    */
  def trainMergesList(docs: DataFrame, nMerges: Int): Seq[(Long, String, String, Long)] = {
    var state = wordFreq(docs)
      .select(charSyms(col("w")).as("syms"), col("freq"))
      .localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    var step = 1
    var exhausted = false
    while (!exhausted && step <= nMerges) {
      val best = adjacentPairs(state)
        .orderBy(col("n").desc, col("l"), col("r")).limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val (l, r, n) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += ((step.toLong, l, r, n))
        val next = state
          .select(mergePass(col("syms"), lit(l), lit(r)).as("syms"), col("freq"))
          .localCheckpoint(true)
        state.unpersist()
        state = next
        step += 1
      }
    }
    state.unpersist()
    merges.toSeq
  }

  /** `trainMergesList` as a DataFrame — (step, l, r, n), ordered. */
  def trainMerges(docs: DataFrame, nMerges: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    trainMergesList(docs, nMerges).toDF("step", "l", "r", "n")
  }

  /** Token count per DISTINCT word under a trained merge list — encoding
    * cost is vocabulary-sized regardless of corpus size. The merge list
    * folds into nested `mergePass` projections (one narrow pass, no
    * shuffles beyond the distinct).
    */
  def encodeVocab(words: DataFrame, merges: Seq[(String, String)]): DataFrame = {
    val symsN = merges.foldLeft(charSyms(col("w"))) {
      case (c, (l, r)) => mergePass(c, lit(l), lit(r))
    }
    words.select(col("w"), size(symsN).cast(LongType).as("n_tokens_w"))
  }

  /** Train `nMerges` merges, encode the corpus, and report per-doc token
    * counts + fertility (tokens per 1000 words) — the tokenizer-fit
    * signal a curation pipeline uses to spot hard-to-tokenize text.
    * Scale shape: encode the DISTINCT-word table (vocabulary-sized),
    * then documents join the encoded vocab broadcast — tokenizer vocabs
    * are bounded (10^5..10^6 rows), so the broadcast is always safe and
    * the doc pass stays shuffle-free up to the final doc_id aggregate.
    */
  def encodeFertility(docs: DataFrame, nMerges: Int): DataFrame = {
    val merges = trainMergesList(docs, nMerges).map(m => (m._2, m._3))
    val words = Par.fan(docs)
      .select(col("doc_id"),
        explode(split(TextDedup.normalizeText(col("text")), " ")).as("w"))
      .filter(length(col("w")) >= 1)
    val enc = encodeVocab(words.select(col("w")).distinct(), merges)
    words.join(broadcast(enc), Seq("w"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"), sum(col("n_tokens_w")).as("n_tokens"))
      .select(col("doc_id"), col("n_words"), col("n_tokens"),
        expr("n_tokens * 1000 DIV n_words").as("fertility_permille"))
  }
}
