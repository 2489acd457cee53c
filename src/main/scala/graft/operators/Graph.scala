package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics beyond connected components (TextDedup.
  * connectedComponents): deterministic INTEGER PageRank — the
  * importance/centrality signal web-corpus curation ranks domains by.
  *
  * rank'(v) = 0.15 + 0.85 · Σ_{u→v} rank(u)/outdeg(u), in exact micro
  * units with integer division and a FIXED iteration count — every
  * arithmetic step is a Long op, so the result is bit-identical across
  * engines, runs, and partitionings (the d7/w6 exactness doctrine for
  * an iterative float algorithm).
  *
  * Shape at scale: the edge table materializes once and is scanned per
  * iteration; the rank and degree tables are NODE-sized and broadcast
  * into that scan, and the only shuffle per iteration is one
  * aggregation keyed by dst. Nodes with no inbound edges drop out of
  * the next frontier — supply bidirectional edges for undirected
  * semantics (every node then keeps indegree ≥ 1).
  */
object Graph {

  /** @param edges (src, dst) directed edges, pre-deduplicated
    * @param iters fixed power-iteration count
    * @return (node, r) ranks in integer micro units
    */
  def pageRankMicro(edges0: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1)
    val edges = edges0.select(col("src"), col("dst")).localCheckpoint(true)
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
      .localCheckpoint(true)
    var ranks = deg.select(col("src").as("node"), lit(1000000L).as("r"))
    for (_ <- 1 to iters) {
      ranks = edges
        .join(broadcast(ranks.withColumnRenamed("node", "src")), Seq("src"))
        .join(broadcast(deg), Seq("src"))
        .groupBy(col("dst").as("node"))
        .agg(sum(expr("r DIV outdeg")).as("inflow"))
        .select(col("node"),
          (lit(150000L) + expr("(850 * inflow) DIV 1000")).as("r"))
        .localCheckpoint(true)
    }
    ranks
  }
}
