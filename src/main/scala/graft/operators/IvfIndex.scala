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
      .withColumn("cos", dotp(col("qv"), col("nv")) /
        sqrt(dotp(col("qv"), col("qv")) * dotp(col("nv"), col("nv"))))
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
}
