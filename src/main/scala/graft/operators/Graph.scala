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
  * Shape at scale (the Pregel shape): the edge fabric hash-partitions by
  * `src` ONCE and pins in the block cache (MEMORY_AND_DISK — the cached
  * plan keeps its outputPartitioning, which a checkpoint would drop), so
  * every iteration's joins against it are co-partitioned; the
  * per-iteration cost is at most one NODE-sized shuffle (the rank table
  * re-entering the pinned layout + the dst aggregation) — never an
  * EDGE-sized shuffle and never an unbounded broadcast.
  *
  * Broadcast is SIZE-GATED, never forced blindly: rank/degree tables
  * grow linearly with the corpus (a document graph at the 100 TB target
  * is 10⁸–10⁹ nodes), so an unconditional broadcast hint would hit
  * Spark's 8 GB broadcast ceiling and the driver's memory long before
  * that. The per-iteration rank table is a checkpoint (no catalyst
  * stats), so Spark's own auto-broadcast can't see its size — instead
  * the MEASURED node count (already materialized for the cache pin)
  * gates the hint: ≤ `broadcastNodeCap` nodes (~tens of MB) → broadcast
  * replicate-map join, above → co-partitioned sort-merge join. PlanSpec
  * pins both sides of the gate.
  *
  * Nodes with no inbound edges drop out of the next frontier — supply
  * bidirectional edges for undirected semantics (every node then keeps
  * indegree ≥ 1).
  */
object Graph {

  /** Node-count ceiling for broadcasting the per-iteration rank/degree
    * tables: 4 M nodes × ~16 B ≈ 64 MB per executor — comfortably real
    * for any cluster this engine targets, two orders of magnitude under
    * Spark's 8 GB broadcast hard cap.
    */
  val broadcastNodeCap: Long = 4000000L

  /** Pin the iteration fabric, size-gated. Small graphs (node count ≤
    * `cap`): plain checkpoints — the iterations broadcast the node
    * tables, so pre-partitioning the edges would only add a shuffle and
    * a cache build nothing reads twice. Large graphs: edges AND degrees
    * hash-partition by src and pin in the block cache (the cached plan
    * keeps its outputPartitioning, which a checkpoint drops), both
    * materialized NOW (an unmaterialized cache plans as an open adaptive
    * subtree whose partitioning is unknown, so every iteration would
    * conservatively re-exchange the edge side). Returns (edges, deg,
    * small). Caches are released by the public entry points once final
    * ranks materialize (unpersist on a checkpoint is a no-op).
    */
  private[graft] def pinned(edges0: DataFrame,
      cap: Long = broadcastNodeCap): (DataFrame, DataFrame, Boolean) = {
    val eCk = edges0.select(col("src"), col("dst")).localCheckpoint(true)
    val deg = eCk.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
      .localCheckpoint(true)
    if (deg.count() <= cap) (eCk, deg, true)
    else {
      val edges = eCk.repartition(col("src")).persist()
      val degP = deg.repartition(col("src")).persist()
      edges.count(); degP.count()
      (edges, degP, false)
    }
  }

  /** One lazy power-iteration step — the per-iteration plan the contract
    * test pins. `small` is the size gate: when the node tables are
    * measured-small they ride a broadcast replicate-map join (the fast
    * plan Spark's auto-broadcast would pick if a checkpoint carried
    * stats); otherwise the joins run co-partitioned against the pinned
    * src layout (no exchange on the edge side, no broadcast), and the
    * only required exchange is the dst-keyed aggregation's.
    */
  private[graft] def inflowStep(edges: DataFrame, deg: DataFrame,
      ranks: DataFrame, small: Boolean): DataFrame = {
    def gate(df: DataFrame): DataFrame = if (small) broadcast(df) else df
    edges
      .join(gate(ranks.withColumnRenamed("node", "src")), Seq("src"))
      .join(gate(deg), Seq("src"))
      .groupBy(col("dst").as("node"))
      .agg(sum(expr("r DIV outdeg")).as("inflow"))
  }

  /** @param edges (src, dst) directed edges, pre-deduplicated
    * @param iters fixed power-iteration count
    * @return (node, r) ranks in integer micro units
    */
  def pageRankMicro(edges0: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1)
    val (edges, deg, small) = pinned(edges0)
    var ranks = deg.select(col("src").as("node"), lit(1000000L).as("r"))
    for (_ <- 1 to iters) {
      // localCheckpoint truncates the iterative lineage so plan size
      // stays constant across iterations
      ranks = inflowStep(edges, deg, ranks, small)
        .select(col("node"),
          (lit(150000L) + expr("(850 * inflow) DIV 1000")).as("r"))
        .localCheckpoint(true)
    }
    edges.unpersist(); deg.unpersist()
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
    * The node universe is src ∪ dst ∪ seeds: on a DIRECTED graph a
    * dst-only sink reachable from the seeds still accumulates inflow,
    * and a seed with no out-edges still keeps its teleport mass — a
    * src-only universe would silently drop both. Same integer exactness
    * and same pinned-layout / size-gated-broadcast scale shape as
    * `pageRankMicro`, plus one left-join per iteration so zero-inflow
    * seeds keep their teleport mass.
    */
  def personalizedPageRankMicro(edges0: DataFrame, seeds: DataFrame,
      iters: Int): DataFrame = {
    require(iters >= 1)
    val (edges, deg, small) = pinned(edges0)
    val nodes = edges.select(col("src").as("node"))
      .unionByName(edges.select(col("dst").as("node")))
      .unionByName(seeds.select(col("node")))
      .distinct()
      .join(seeds.select(col("node"), lit(1L).as("is_seed")), Seq("node"), "left")
      .na.fill(0L, Seq("is_seed"))
      .localCheckpoint(true)
    def gate(df: DataFrame): DataFrame = if (small) broadcast(df) else df
    var ranks = nodes.select(col("node"),
      (col("is_seed") * lit(1000000L)).as("r"))
    for (_ <- 1 to iters) {
      val inflow = inflowStep(edges, deg, ranks, small)
      ranks = nodes
        .join(gate(inflow), Seq("node"), "left")
        .na.fill(0L, Seq("inflow"))
        .select(col("node"), (col("is_seed") * lit(150000L) +
          expr("(850 * inflow) DIV 1000")).as("r"))
        .localCheckpoint(true)
    }
    val out = nodes.join(ranks, Seq("node"))
      .select(col("node"), col("is_seed"), col("r"))
      .localCheckpoint(true)
    edges.unpersist(); deg.unpersist()
    out
  }
}
