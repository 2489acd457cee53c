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

  /** PERSONALIZED PageRank — seed-set expansion: teleport mass goes
    * only to `seeds`, so rank flows outward from a trusted set and
    * decays with graph distance. Over a document near-dup/similarity
    * graph this is the "expand from curated seeds" selection technique
    * (seed-and-expand corpus bootstrapping): score(v) ranks how firmly
    * v sits in the seeds' neighborhood; unreachable nodes stay at 0.
    *
    *   r'(v) = 150000·[v ∈ S] + 850 · Σ_{u→v} r(u)/outdeg(u) / 1000
    *
    * Same integer exactness and same scale shape as `pageRankMicro`,
    * plus one broadcast left-join per iteration so zero-inflow seeds
    * keep their teleport mass.
    */
  def personalizedPageRankMicro(edges0: DataFrame, seeds: DataFrame,
      iters: Int): DataFrame = {
    require(iters >= 1)
    val edges = edges0.select(col("src"), col("dst")).localCheckpoint(true)
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
      .localCheckpoint(true)
    val nodes = edges.select(col("src").as("node")).distinct()
      .join(seeds.select(col("node"), lit(1L).as("is_seed")), Seq("node"), "left")
      .na.fill(0L, Seq("is_seed"))
      .localCheckpoint(true)
    var ranks = nodes.select(col("node"),
      (col("is_seed") * lit(1000000L)).as("r"))
    for (_ <- 1 to iters) {
      val inflow = edges
        .join(broadcast(ranks.withColumnRenamed("node", "src")), Seq("src"))
        .join(broadcast(deg), Seq("src"))
        .groupBy(col("dst").as("node"))
        .agg(sum(expr("r DIV outdeg")).as("inflow"))
      ranks = nodes
        .join(broadcast(inflow), Seq("node"), "left")
        .na.fill(0L, Seq("inflow"))
        .select(col("node"), (col("is_seed") * lit(150000L) +
          expr("(850 * inflow) DIV 1000")).as("r"))
        .localCheckpoint(true)
    }
    nodes.join(ranks, Seq("node")).select(col("node"), col("is_seed"), col("r"))
  }
}
