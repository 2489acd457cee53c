package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.VectorFunctions.dotp

/** IVF (inverted-file) approximate nearest neighbor: a k-means coarse
  * quantizer partitions the corpus into cells; a query probes only its
  * `nprobe` nearest cells and rescores exactly inside them.
  *
  * Scale notes (100 TB): training collects only k×dim doubles per Lloyd
  * iteration to the driver (centroids — KB, not data); assignment is a
  * narrow pass with broadcast centroids; search shuffles on the cell id,
  * so cost is corpus/k × nprobe per query instead of the full corpus.
  * Against the hyperplane-LSH variant: IVF adapts to the data
  * distribution (cells follow density), at the price of a training pass.
  */
object IvfIndex {

  private def asDouble(v: Column): Column = v.cast(ArrayType(DoubleType))

  /** Squared-distance argmin over broadcast centroids, as one expression:
    * argmin_c (|c|² − 2·v·c) — |v|² is constant per row. Ties break to the
    * lower cell id via lexicographic struct ordering.
    */
  private def nearestCell(v: Column, centroids: Array[Array[Double]]): Column = {
    val scored = centroids.zipWithIndex.map { case (c, i) =>
      val c2 = c.map(x => x * x).sum
      struct((lit(c2) - lit(2.0) * dotp(v, typedLit(c.toSeq))).as("d"), lit(i).as("cell"))
    }
    array_min(array(scored: _*)).getField("cell")
  }

  /** `nprobe` nearest cells per row, as an array column (shared with
    * PqIndex.ivfPqTopK for the IVFPQ composition).
    */
  def nearestCellsPublic(v: Column, centroids: Array[Array[Double]], nprobe: Int): Column =
    nearestCells(v, centroids, nprobe)

  private def nearestCells(v: Column, centroids: Array[Array[Double]], nprobe: Int): Column = {
    val scored = centroids.zipWithIndex.map { case (c, i) =>
      val c2 = c.map(x => x * x).sum
      struct((lit(c2) - lit(2.0) * dotp(v, typedLit(c.toSeq))).as("d"), lit(i).as("cell"))
    }
    transform(slice(array_sort(array(scored: _*)), 1, nprobe), s => s.getField("cell"))
  }

  /** Lloyd's k-means on the embedding column. Deterministic: seeds from
    * the k lowest vec_ids; per iteration only (cell, dim)-sums reach the
    * driver. Empty cells keep their previous centroid.
    */
  def fit(emb0: DataFrame, k: Int, iters: Int = 5): Array[Array[Double]] = {
    // each Lloyd iteration re-scans the corpus — cache it for training
    val emb = emb0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val v = asDouble(col("embedding"))
    var centroids: Array[Array[Double]] = emb
      .orderBy(col("vec_id")).limit(k)
      .select(v.as("v")).collect()
      .map(_.getSeq[Double](0).toArray)
    val dim = centroids.head.length
    for (_ <- 1 to iters) {
      // vectorSum partial-aggregates map-side: each partition contributes
      // ONE (cell, dim-array) buffer per cell — k·partitions shuffled rows,
      // never n·dim (the posexplode formulation this replaces)
      val stats = emb.select(nearestCell(v, centroids).as("cell"), v.as("v"))
        .groupBy(col("cell"))
        .agg(graft.functions.VectorFunctions.vectorSum(col("v")).as("s"),
          count(lit(1)).as("n"))
        .collect()
      val sums = Array.fill(k, dim)(0.0)
      val counts = Array.fill(k)(0L)
      stats.foreach { r =>
        val c = r.getAs[Int]("cell")
        val s = r.getSeq[Double](1)
        var d = 0
        while (d < math.min(dim, s.length)) { sums(c)(d) = s(d); d += 1 }
        counts(c) = r.getAs[Long]("n")
      }
      centroids = centroids.zipWithIndex.map { case (old, c) =>
        if (counts(c) == 0L) old else sums(c).map(_ / counts(c))
      }
    }
    emb.unpersist()
    centroids
  }

  /** Cell assignment for a trained quantizer — the clustering view of the
    * index: (vec_id, cell). Narrow, broadcast centroids.
    */
  def assignCells(emb: DataFrame, centroids: Array[Array[Double]]): DataFrame = {
    val v = asDouble(col("embedding"))
    emb.select(col("vec_id"), nearestCell(v, centroids).as("cell"))
  }

  /** The materialized index: (neighbor_id, nv, cell) rows a production
    * deployment persists and queries many times. Appending a new vector
    * batch is THIS projection over the batch unioned onto the stored
    * index — centroids stay frozen (the FAISS add-after-train shape), so
    * incremental build == batch build by construction, and the existing
    * index is never recomputed (PipelineOpsSpec pins the equality).
    */
  def buildIndex(corpus: DataFrame, centroids: Array[Array[Double]]): DataFrame = {
    val cv = asDouble(col("embedding"))
    corpus.select(col("vec_id").as("neighbor_id"), cv.as("nv"),
      nearestCell(cv, centroids).as("cell"))
  }

  /** Approximate top-k over a prebuilt index (see `buildIndex`). */
  def ivfTopKIndexed(queries: DataFrame, index: DataFrame,
      centroids: Array[Array[Double]], k: Int, nprobe: Int = 4): DataFrame = {
    val cv = asDouble(col("embedding"))
    val queryProbes = queries.select(col("vec_id").as("query_id"), cv.as("qv"),
        explode(nearestCells(cv, centroids, nprobe)).as("cell"))
    val scored = queryProbes.join(index, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      // zero-norm guard: Spark's desc ordering ranks NaN ABOVE every real
      // cosine, so a direction-less vector would silently win the top-k —
      // pin its cosine to -1 (ranks last, neighbor_id tie-break)
      .withColumn("cos", nanvl(dotp(col("qv"), col("nv")) /
        sqrt(dotp(col("qv"), col("qv")) * dotp(col("nv"), col("nv"))), lit(-1.0)))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    scored.select(col("query_id"), col("neighbor_id"), col("cos"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select(col("query_id"), col("neighbor_id"),
        col("cos").cast(DecimalType(18, 6)).cast(DoubleType).as("cos"))
  }

  /** Approximate top-k: probe the query's `nprobe` nearest cells, exact
    * cosine rescoring within them only.
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      kClusters: Int = 16, nprobe: Int = 4, iters: Int = 5): DataFrame = {
    val centroids = fit(corpus, kClusters, iters)
    ivfTopKIndexed(queries, buildIndex(corpus, centroids), centroids, k, nprobe)
  }

  // ───── decimal-exact coarse quantizer (the ann3 serving flavor) ─────
  //
  // Lloyd's floats make the coarse cells engine-private: an independent
  // engine replaying the training drifts on summation order, so the
  // query can only be rows-only checked. This flavor swaps the trainer
  // for the label-centroid quantizer (exact DECIMAL(18,6) per-dim sums,
  // ONE double division — Similarity.labelCentroids, the emb2/sem1
  // protocol) and assigns by argmax cosine, making centroids, cell
  // assignments and therefore the whole IVF query bit-reproducible by
  // the DuckDB oracle — ann3 graduates to hash-green. The price: cells
  // follow the label structure instead of adapting k-means-style to
  // density; the recall@10 gate is re-pinned on these cells
  // (PipelineOpsSpec), so the quality claim stays honest. The Lloyd
  // trainer above remains the coarse stage of IVFPQ (ann5), where
  // residual codebooks genuinely want adapted cells.

  def fitExact(corpus: DataFrame): Array[(Int, Array[Double])] =
    Similarity.labelCentroids(corpus)

  // ───── decimal-exact Lloyd (the cl1 graduation) ─────
  //
  // The double Lloyd (`fit`) is engine-private: summation order changes
  // the trained centroids, so a clustering query over it can only be
  // rows-only checked. This flavor makes the WHOLE Lloyd trajectory
  // engine-portable, while KEEPING the adaptive cells that `fitExact`
  // gives up: (1) assignment compares DECIMAL(18,6)-ROUNDED Euclidean
  // distances with ties to the lower cell id — robust to the ~1e-15
  // summation-order noise either engine carries (the d5/sem1 cosine
  // protocol applied to the argmin itself); (2) the update step is the
  // labelCentroids decimal-sum mean — order-exact by construction;
  // (3) empty cells keep their previous centroid. Every iteration is
  // therefore bit-reproducible by an independent engine replaying the
  // same fixed iteration count, which is what cl1's DuckDB oracle does
  // (iterations UNROLLED into chained CTE blocks — SQL disallows
  // aggregates in a recursive term, and `iters` is a constant anyway).

  private def distRounded(v: Column, c: Array[Double]): Column = {
    // |v−c|² via the native dotp expansion (|v|² − 2v·c + |c|²) — the
    // nearestCell pattern; the cancellation form can dip ~−1e-16 for
    // v ≈ c, so clamp before the sqrt (DuckDB's direct Σ(x−c)² is ≥ 0;
    // the DECIMAL(18,6) rounding absorbs the ≤1e-8 path difference)
    val c2 = c.map(x => x * x).sum
    sqrt(greatest(dotp(v, v) - lit(2.0) * dotp(v, typedLit(c.toSeq)) + lit(c2),
      lit(0.0))).cast(DecimalType(18, 6))
  }

  private def nearestCellExact(v: Column, cents: Array[Array[Double]]): Column = {
    val scored = cents.zipWithIndex.map { case (c, i) =>
      struct(distRounded(v, c).as("d6"), lit(i).as("cell"))
    }
    array_min(array(scored.toIndexedSeq: _*)).getField("cell")
  }

  /** Engine-portable Lloyd: seeds from the k lowest vec_ids, fixed
    * `iters` rounds of rounded-argmin assignment + decimal-mean update.
    * Layout-free AND oracle-replayable — the same trajectory at any
    * partitioning or engine (cl1 is hash-green on it).
    */
  def fitExactLloyd(emb0: DataFrame, k: Int, iters: Int): Array[Array[Double]] = {
    val emb = emb0.select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var cents: Array[Array[Double]] = emb.orderBy(col("vec_id")).limit(k)
      .select(col("v")).collect().map(_.getSeq[Double](0).toArray)
    for (_ <- 1 to iters) {
      val stats = emb
        .select(nearestCellExact(col("v"), cents).as("cell"), posexplode(col("v")))
        .groupBy(col("cell"), col("pos"))
        .agg(sum(col("col").cast(DecimalType(18, 6))).as("s6"),
          count(lit(1)).as("n"))
        .collect()
      val next = cents.map(_.clone) // empty cells keep their centroid
      stats.foreach { r =>
        next(r.getInt(0))(r.getInt(1)) = r.getDecimal(2).doubleValue / r.getLong(3)
      }
      cents = next
    }
    emb.unpersist()
    cents
  }

  /** Assignment under an exact-Lloyd quantizer — the rounded-argmin the
    * trainer itself uses, so train + assign replay identically.
    */
  def assignCellsExact(emb: DataFrame, cents: Array[Array[Double]]): DataFrame =
    emb.select(col("vec_id"),
      nearestCellExact(asDouble(col("embedding")), cents).as("cell"))

  /** The rounded argmin as a raw column — for composition into other
    * operators' projections (the IVFPQ cell stage).
    */
  def nearestCellExactPublic(v: Column, cents: Array[Array[Double]]): Column =
    nearestCellExact(v, cents)

  /** `nprobe` nearest cells under the rounded protocol (the exact
    * flavor of `nearestCells`): full sqrt distances cast DECIMAL(18,6),
    * ties to the lower cell id — engine-portable probe selection, so an
    * oracle replays the same cell set a query scans.
    */
  def nearestCellsExact(v: Column, cents: Array[Array[Double]],
      nprobe: Int): Column = {
    val scored = cents.zipWithIndex.map { case (c, i) =>
      struct(distRounded(v, c).as("d6"), lit(i).as("cell"))
    }
    transform(slice(array_sort(array(scored.toIndexedSeq: _*)), 1, nprobe),
      s => s.getField("cell"))
  }

  /** The materialized exact-cell index — same (neighbor_id, nv, cell)
    * contract as `buildIndex`, cells = argmax-cosine label centroid
    * (ties to the lower cell id). Frozen-quantizer appends compose
    * exactly as in the Lloyd flavor: assignment is a pure per-row
    * projection given fixed centroids.
    */
  def buildIndexExact(corpus: DataFrame,
      cents: Array[(Int, Array[Double])]): DataFrame =
    Similarity.assignCells(corpus, cents)
      .select(col("vec_id").as("neighbor_id"), col("emb").as("nv"), col("cell"))

  /** `nprobe` nearest cells by cosine (desc, ties to the lower cell id)
    * — the probing order the oracle replays with a row_number window.
    */
  private def nearestCellsByCos(v: Column,
      cents: Array[(Int, Array[Double])], nprobe: Int): Column = {
    val scored = cents.map { case (cell, c) =>
      val c2 = c.map(x => x * x).sum // same left-to-right sum as norm2
      // a zero-norm query (or degenerate centroid) yields 0/0 = NaN,
      // whose sort position differs between Spark and an oracle engine —
      // pin it to cosine -1 so direction-less vectors probe the lowest
      // cell ids deterministically instead of breaking parity
      struct(nanvl(lit(-1.0) * (dotp(v, typedLit(c.toSeq)) /
        sqrt(dotp(v, v) * lit(c2))), lit(1.0)).as("negcs"), lit(cell).as("cell"))
    }
    transform(slice(array_sort(array(scored.toIndexedSeq: _*)), 1, nprobe),
      s => s.getField("cell"))
  }

  /** Approximate top-k over a prebuilt exact-cell index: probe the
    * query's `nprobe` nearest cells by cosine, exact cosine rescoring
    * within them, DECIMAL(18,6)-rounded output (the proven ann1/d5
    * rendering). Plan shape identical to `ivfTopKIndexed`: narrow probe
    * explode, one join on the cell id, per-query top-k window.
    *
    * Default nprobe = 6: the exact quantizer has one cell per LABEL (10
    * on the test corpora — coarser than Lloyd's k = 16), so a 4-cell
    * probe under-covers; 6 cells holds recall@10 ≥ 0.82 at sf0.01
    * (gate pinned ≥ 0.75 in PipelineOpsSpec). At deployment scale the
    * label vocabulary — and with it the cell count — grows while nprobe
    * stays fixed, so the probed fraction shrinks, not the recall story.
    */
  def ivfTopKIndexedExact(queries: DataFrame, index: DataFrame,
      cents: Array[(Int, Array[Double])], k: Int, nprobe: Int = 6): DataFrame = {
    val cv = asDouble(col("embedding"))
    val queryProbes = queries.select(col("vec_id").as("query_id"), cv.as("qv"),
        explode(nearestCellsByCos(cv, cents, nprobe)).as("cell"))
    val scored = queryProbes.join(index, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      // zero-norm guard: Spark's desc ordering ranks NaN ABOVE every real
      // cosine, so a direction-less vector would silently win the top-k —
      // pin its cosine to -1 (ranks last, neighbor_id tie-break)
      .withColumn("cos", nanvl(dotp(col("qv"), col("nv")) /
        sqrt(dotp(col("qv"), col("qv")) * dotp(col("nv"), col("nv"))), lit(-1.0)))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    scored.select(col("query_id"), col("neighbor_id"), col("cos"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select(col("query_id"), col("neighbor_id"),
        col("cos").cast(DecimalType(18, 6)).cast(DoubleType).as("cos"))
  }
}
