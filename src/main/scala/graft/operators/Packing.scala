package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Greedy sequence packing — the training-batch packer t7's chunked
  * assignment approximates.
  *
  * Greedy first-fit-sequential: walk docs in deterministic doc_id order,
  * fill the current sequence until the next doc would overflow `budget`,
  * then start a new one. Unlike the chunked DIV assignment a greedy
  * sequence NEVER overflows (an oversized doc gets a singleton sequence) —
  * the invariant a trainer actually needs from a packer.
  *
  * The walk is sequential by nature, so the distributed shape is
  * two-level: (1) GlobalOrder.cumSum (range-partition + per-partition
  * prefix + broadcast offsets — no global window) carves the corpus into
  * contiguous token RANGES of `seqsPerRange` budgets each; (2) one
  * flatMapGroups per range runs the sequential greedy walk over its
  * bounded slice (≤ seqsPerRange·budget tokens — memory-safe by
  * construction). Greedy state resets at range boundaries, costing at most
  * one partially-filled sequence per range — fraction 1/seqsPerRange of
  * the output, tunable.
  */
object Packing {

  /** docs(doc_id, n_tokens) → (doc_id, n_tokens, seq_range, seq_in_range):
    * a valid greedy packing; (seq_range, seq_in_range) is the sequence key.
    */
  def greedyPack(docs: DataFrame, budget: Long, seqsPerRange: Int = 64): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    require(budget > 0 && seqsPerRange > 0)
    val rangeBudget = budget * seqsPerRange
    val ranged = GlobalOrder.cumSum(
        docs.select(col("doc_id").cast(LongType), col("n_tokens").cast(LongType)),
        col("doc_id"), col("n_tokens"))
      .select(col("doc_id"), col("n_tokens"),
        expr(s"(cum - n_tokens) DIV $rangeBudget").as("range_id"))
      .as[(Long, Long, Long)]
    ranged
      .groupByKey(_._3)
      .flatMapGroups { (rid: Long, it: Iterator[(Long, Long, Long)]) =>
        // a range holds ≤ rangeBudget tokens (+1 spill doc) — bounded
        val rows = it.toArray.sortBy(_._1)
        var seq = 0L
        var fill = 0L
        rows.iterator.map { case (docId, n, _) =>
          if (fill > 0 && fill + n > budget) { seq += 1; fill = 0L }
          fill += n
          (docId, n, rid, seq)
        }
      }
      .toDF("doc_id", "n_tokens", "seq_range", "seq_in_range")
  }

  /** Deterministic global training shuffle: every doc gets a reproducible
    * pseudo-random position (rank of md5(seed || ':' || id) — new seed,
    * new permutation, same engine-independent answer), and shards are
    * CONTIGUOUS chunks of that shuffled order — so each shard is an
    * unbiased 1/numShards sample AND a reader consuming shards in order
    * replays the full permutation (the shuffle-then-split shape every
    * pretraining export uses).
    *
    * Scale: the rank is GlobalOrder.cumSum over the hash key — range
    * repartition + per-partition prefix + broadcast offsets, never a
    * single-task global window; the total count rides in as a 1-row
    * broadcast. Hash-order ranking also means adjacent input rows land in
    * random ranges, so the range exchange is skew-free by construction.
    * (BIGINT headroom: (pos-1)·numShards needs pos·shards < 2^63 —
    * fine past 10^15 docs.)
    */
  def deterministicShuffle(docs: DataFrame, idCol: String, seed: String,
      numShards: Int): DataFrame = {
    require(numShards > 0)
    val keyed = docs.select(col(idCol),
      md5(concat(lit(seed), lit(":"), col(idCol).cast("string"))).as("skey"))
    val total = keyed.agg(count(lit(1)).as("n"))
    GlobalOrder.cumSum(keyed, struct(col("skey"), col(idCol)), lit(1))
      .withColumnRenamed("cum", "pos")
      .crossJoin(broadcast(total))
      .select(col(idCol), col("pos"),
        expr(s"((pos - 1) * $numShards) DIV n").cast(LongType).as("shard"))
  }
}
