package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Unigram-style subword tokenizer APPLICATION — the second tokenizer
  * family beside BPE (`Bpe`): greedy longest-match encoding of each word
  * under a GIVEN piece vocabulary (the SentencePiece/WordPiece serving
  * path). Training a unigram LM proper is EM over float likelihoods
  * (would be no_oracle); the deterministic faces are
  *
  *  - a count-derived piece vocabulary (`pieceVocab`): top-k multi-char
  *    substrings by corpus occurrence weight — integer counting with a
  *    total-order tie-break, so the vocab is bit-reproducible;
  *  - greedy longest-match encoding (`encodeVocab`): at each position
  *    consume the longest vocab piece (2..4 chars), else one char. A
  *    word always tokenizes (single chars are implicit vocab), the scan
  *    is deterministic, and token counts hash-match an oracle replaying
  *    the same scan.
  *
  * Scale shape mirrors `Bpe.encodeVocab`: every stage after the one
  * corpus-sized word explode is DISTINCT-WORD-sized (the tokenizer-
  * application doctrine — corpora repeat words; vocabularies are
  * bounded). The piece table is top-k bounded and broadcast; the greedy
  * scan is ONE codegen'd `aggregate` fold per distinct word, no UDF, no
  * shuffle beyond the word-frequency hash agg. Fertility output is
  * bpe4's exact schema, so the two tokenizer families compare per doc
  * and per source (TokenizerSpec pins the comparison).
  *
  * Reference anchor: the reference counts whitespace tokens during
  * normalization (src/transform.py:108-146); this is the second subword
  * extension of that counting surface, beside `Bpe`.
  */
object Unigram {

  /** Longest piece the greedy matcher considers (and the vocabulary
    * stores) — 4 chars keeps the candidate explode at 3 rows per word
    * position, the WordPiece-at-small-vocab regime.
    */
  val maxPieceLen = 4

  /** Deterministic piece vocabulary: the k most frequent substrings of
    * length 2..`maxPieceLen` over the corpus word stream, weighted by
    * word frequency (count desc, piece asc — a total order, so the cut
    * is stable across engines and partitionings). Distinct-word-sized
    * work: the corpus is touched once via `Bpe.wordFreq`.
    */
  def pieceVocab(docs: DataFrame, k: Int): DataFrame =
    Bpe.wordFreq(docs)
      .select(col("freq"), col("w"),
        explode(sequence(lit(1), length(col("w")))).as("pos"))
      .select(col("freq"), col("w"), col("pos"),
        explode(sequence(lit(2), lit(maxPieceLen))).as("l"))
      .withColumn("piece", col("w").substr(col("pos"), col("l")))
      // substr truncates at the word end — a truncated candidate would
      // alias a legitimate shorter piece, so keep exact-length ones only
      .filter(length(col("piece")) === col("l"))
      .groupBy(col("piece")).agg(sum(col("freq")).as("n"))
      .orderBy(col("n").desc, col("piece")).limit(k)

  /** Per-word position→longest-match-length map against a bounded
    * vocabulary: the shared first stage of the greedy scan (`encodeVocab`)
    * and the usage replay (`consumedPieces`). Broadcast join against the
    * top-k piece table; distinct-word-sized throughout.
    */
  private def matchMap(words: DataFrame, vocab: DataFrame): DataFrame = {
    val matches = words
      .select(col("w"), explode(sequence(lit(1), length(col("w")))).as("pos"))
      .select(col("w"), col("pos"),
        explode(sequence(lit(2), lit(maxPieceLen))).as("l"))
      .withColumn("piece", col("w").substr(col("pos"), col("l")))
      .filter(length(col("piece")) === col("l"))
      .join(broadcast(vocab.select(col("piece"))), Seq("piece"))
      .groupBy(col("w"), col("pos")).agg(max(col("l")).as("mlen"))
    matches.groupBy(col("w"))
      .agg(map_from_entries(collect_list(struct(col("pos"), col("mlen")))).as("m"))
  }

  /** Greedy longest-match token count per distinct word. Two stages:
    * (1) per (word, position), the longest vocab piece starting there —
    * a broadcast join against the bounded vocab, aggregated to a
    * position→length map; (2) the greedy scan itself as ONE `aggregate`
    * fold over positions 1..len: the accumulator carries (next match
    * position, tokens so far) and steps only when the fold index reaches
    * the match position — left-to-right longest-match exactly, in
    * whole-stage codegen, no UDF.
    */
  def encodeVocab(words: DataFrame, vocab: DataFrame): DataFrame = {
    val marr = matchMap(words, vocab)
    words.join(marr, Seq("w"), "left")
      .withColumn("n_tokens_w",
        aggregate(sequence(lit(1), length(col("w"))),
          struct(lit(1).as("pos"), lit(0L).as("cnt")),
          (acc, x) => when(x === acc.getField("pos"),
              struct((acc.getField("pos") +
                  coalesce(element_at(col("m"), x), lit(1))).as("pos"),
                (acc.getField("cnt") + lit(1L)).as("cnt")))
            .otherwise(acc),
          acc => acc.getField("cnt")))
      .select(col("w"), col("n_tokens_w"))
  }

  /** The pieces the greedy scan actually CONSUMES, one row per consumed
    * multi-char step per distinct word — the E-step observation of the
    * hard-EM trainer. Same fold as `encodeVocab`, but the accumulator
    * collects the match positions instead of counting them; the consumed
    * piece is re-derived from (position, map) after the explode, so the
    * fold state stays a flat int array.
    */
  def consumedPieces(words: DataFrame, vocab: DataFrame): DataFrame = {
    val marr = matchMap(words, vocab)
    words.join(marr, Seq("w"), "left")
      .withColumn("ps",
        aggregate(sequence(lit(1), length(col("w"))),
          struct(lit(1).as("pos"), array().cast("array<int>").as("ps")),
          (acc, x) => when(x === acc.getField("pos"),
              struct((acc.getField("pos") +
                  coalesce(element_at(col("m"), x), lit(1))).as("pos"),
                concat(acc.getField("ps"), array(x)).as("ps")))
            .otherwise(acc),
          acc => acc.getField("ps")))
      .select(col("w"), col("m"), explode(col("ps")).as("cpos"))
      .withColumn("ml", coalesce(element_at(col("m"), col("cpos")), lit(1)))
      .filter(col("ml") >= 2)
      .select(col("w"), col("w").substr(col("cpos"), col("ml")).as("piece"))
  }

  /** Hard-EM vocabulary refinement (the SentencePiece prune idea with
    * the EM hardened to the greedy segmenter, so every quantity is an
    * integer and the whole trainer sits under the hash gate):
    * seed with the `k0` most frequent candidate pieces, segment the
    * corpus under them (E-step), count how often each piece is actually
    * CONSUMED weighted by word frequency, and keep the `k` most used
    * (M-step; usage desc, piece asc — a total order). Long candidates
    * cannibalize their substrings' raw counts but only earn usage when
    * the scan truly picks them — the refined vocabulary differs from the
    * count-top-k one exactly where raw frequency overstates utility.
    */
  def hardEmVocab(docs: DataFrame, k0: Int, k: Int): DataFrame = {
    val wf = Bpe.wordFreq(docs)
    val cand = pieceVocab(docs, k0)
    consumedPieces(wf.select(col("w")), cand)
      .join(wf, Seq("w"))
      .groupBy(col("piece")).agg(sum(col("freq")).as("usage"))
      .orderBy(col("usage").desc, col("piece")).limit(k)
  }

  /** Per-doc token counts + fertility (tokens per 1000 words) under the
    * top-k piece vocabulary — bpe4's exact output schema, so the two
    * tokenizer families compare row for row.
    */
  def encodeFertility(docs: DataFrame, k: Int): DataFrame =
    fertilityUnder(docs, pieceVocab(docs, k))

  /** `encodeFertility` under the hard-EM-refined vocabulary. */
  def hardEmFertility(docs: DataFrame, k0: Int, k: Int): DataFrame =
    fertilityUnder(docs, hardEmVocab(docs, k0, k))

  private def fertilityUnder(docs: DataFrame, vocab: DataFrame): DataFrame = {
    val words = Par.fan(docs)
      .select(col("doc_id"),
        explode(split(TextDedup.normalizeText(col("text")), " ")).as("w"))
      .filter(length(col("w")) >= 1)
    val enc = encodeVocab(words.select(col("w")).distinct(), vocab)
    words.join(broadcast(enc), Seq("w"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"), sum(col("n_tokens_w")).as("n_tokens"))
      .select(col("doc_id"), col("n_words"), col("n_tokens"),
        expr("n_tokens * 1000 DIV n_words").as("fertility_permille"))
  }
}
