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
}
