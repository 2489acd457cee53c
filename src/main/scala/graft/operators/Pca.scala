package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType}

import graft.functions.VectorFunctions

/** Principal-component analysis for embedding columns — the standard
  * pre-quantization transform (FAISS `PCAMatrix`): rotate vectors into the
  * directions of maximal variance, keep the top k, and PQ/IVF downstream
  * sees most of the signal in a quarter of the dimensions.
  *
  * Scale shape: ONE distributed aggregation computes n, Σv and Σvvᵀ
  * (element-wise partial aggregation via VectorSumAgg — executors stream
  * rows through a d²-double buffer, the driver receives a single d×d
  * matrix, KB for d=64). The eigen-decomposition is cyclic Jacobi on that
  * d×d matrix — O(d³) driver-side, independent of row count, same shape
  * as IVF's k-means (driver holds centroids, never rows). Projection is a
  * narrow map: k dot products per row against broadcast literal
  * components. Nothing here grows with the table; at 100 TB fit on a
  * sample (`df.sample`) and project the full table — the model is the
  * same KBs either way.
  */
object Pca {

  /** mean: d; components: k rows of d (orthonormal, variance-descending);
    * eigenvalues: the matching variances; trace: total variance (Σ all d
    * eigenvalues) so `explained(i) = eigenvalues(i) / trace`.
    */
  final case class PcaModel(
      mean: Array[Double],
      components: Array[Array[Double]],
      eigenvalues: Array[Double],
      trace: Double)

  /** Fit the top-`k` principal components of `vecCol` (array<numeric>). */
  def fit(df: DataFrame, vecCol: String, k: Int): PcaModel = {
    val v = col(vecCol).cast(ArrayType(DoubleType))
    // per-row outer product vvᵀ flattened row-major; VectorSumAgg folds it
    // element-wise so the shuffle carries one d² buffer per partition
    val outer = flatten(transform(v, x => transform(v, y => x * y)))
    val r = df.agg(
      count(lit(1)).as("n"),
      VectorFunctions.vectorSum(v).as("s"),
      VectorFunctions.vectorSum(outer).as("ss")).head()
    val n = r.getAs[Long]("n").toDouble
    require(n > 1, "PCA needs at least two vectors")
    val s = r.getAs[Seq[Double]]("s").toArray
    val ss = r.getAs[Seq[Double]]("ss").toArray
    val d = s.length
    val mean = s.map(_ / n)
    // covariance = E[vvᵀ] − μμᵀ
    val cov = Array.tabulate(d, d)((i, j) => ss(i * d + j) / n - mean(i) * mean(j))
    val (eigVals, eigVecs) = jacobiEigen(cov)
    val order = eigVals.indices.sortBy(i => -eigVals(i)).take(k)
    // stabilize sign: largest-|component| coordinate made positive, so the
    // model (and every projection) is deterministic across runs
    val comps = order.map { i =>
      val c = eigVecs(i)
      val m = c.indices.maxBy(j => math.abs(c(j)))
      if (c(m) < 0) c.map(-_) else c
    }.toArray
    PcaModel(mean, comps, order.map(eigVals).toArray, eigVals.sum)
  }

  /** Append pc1..pck projection columns: pcᵢ = (v − μ)·cᵢ, computed as
    * v·cᵢ − μ·cᵢ with the μ·cᵢ scalar folded at plan time — one native
    * DotProduct per component, no per-row mean subtraction array.
    */
  def project(df: DataFrame, vecCol: String, model: PcaModel): DataFrame = {
    val v = col(vecCol).cast(ArrayType(DoubleType))
    val cols = model.components.zipWithIndex.map { case (c, i) =>
      val meanDot = model.mean.lazyZip(c).map(_ * _).sum
      (VectorFunctions.dotp(v, typedLit(c.toSeq)) - lit(meanDot)).as(s"pc${i + 1}")
    }
    df.select(df.columns.map(col) ++ cols: _*)
  }

  /** Reconstruct from the k projections: v̂ = μ + Σ pcᵢ·cᵢ (spec hook —
    * with k = d reconstruction is exact up to float error, and
    * reconstruction MSE falls as k grows).
    */
  def reconstruct(projected: DataFrame, model: PcaModel): Column = {
    val k = model.components.length
    val d = model.mean.length
    val terms = Array.tabulate(d) { j =>
      (0 until k).foldLeft(lit(model.mean(j))) { (acc, i) =>
        acc + col(s"pc${i + 1}") * lit(model.components(i)(j))
      }
    }
    array(terms: _*)
  }

  /** Cyclic Jacobi eigen-decomposition of a symmetric matrix. Returns
    * (eigenvalues, eigenvectors) with eigenvectors(i) the unit vector for
    * eigenvalues(i), unordered. O(d³) per sweep; converges quadratically —
    * d=64 finishes in a handful of sweeps, microseconds of driver time.
    */
  private[graft] def jacobiEigen(
      m: Array[Array[Double]], maxSweeps: Int = 50): (Array[Double], Array[Array[Double]]) = {
    val n = m.length
    val a = m.map(_.clone)
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    def offNorm: Double = {
      var s = 0.0
      var p = 0
      while (p < n) { var q = p + 1; while (q < n) { s += a(p)(q) * a(p)(q); q += 1 }; p += 1 }
      s
    }
    var sweep = 0
    while (sweep < maxSweeps && offNorm > 1e-20) {
      var p = 0
      while (p < n - 1) {
        var q = p + 1
        while (q < n) {
          val apq = a(p)(q)
          if (math.abs(apq) > 1e-300) {
            val theta = (a(q)(q) - a(p)(p)) / (2 * apq)
            val t =
              if (theta == 0.0) 1.0
              else math.signum(theta) / (math.abs(theta) + math.sqrt(theta * theta + 1))
            val c = 1.0 / math.sqrt(t * t + 1)
            val s = t * c
            var k = 0
            while (k < n) { // A ← JᵀAJ, rotation in the (p,q) plane
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - s * akq
              a(k)(q) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < n) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - s * aqk
              a(q)(k) = s * apk + c * aqk
              k += 1
            }
            k = 0
            while (k < n) { // V ← VJ accumulates the eigenvectors
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - s * vkq
              v(k)(q) = s * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    (Array.tabulate(n)(i => a(i)(i)), Array.tabulate(n)(i => Array.tabulate(n)(j => v(j)(i))))
  }
}
