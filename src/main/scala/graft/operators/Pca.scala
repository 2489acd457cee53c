package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DecimalType, DoubleType}

import graft.functions.VectorFunctions

/** Principal-component analysis for embedding columns — the standard
  * pre-quantization transform (FAISS `PCAMatrix`): rotate vectors into the
  * directions of maximal variance, keep the top k, and PQ/IVF downstream
  * sees most of the signal in a quarter of the dimensions.
  *
  * Scale shape: ONE distributed aggregation computes n, Σv and Σvvᵀ
  * as order-exact decimal element sums (map-side partial aggregation —
  * the exchange carries ≤ d+d² rows per partition, the driver receives
  * a single d×d matrix, KB for d=64). The eigen-decomposition is cyclic Jacobi on that
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

  /** Sufficient statistics of a PCA fit — n, Σv, Σvvᵀ — with the sums
    * carried as order-exact DECIMAL(18,6) element sums (the
    * labelCentroids doctrine): identical for ANY partitioning of the
    * rows, and foldable across shards bit-for-bit (`merge`). The 1e-6
    * per-element rounding moves covariance entries by ≤ 1e-6/n — far
    * below the float error the eigen-solve already carries — and buys
    * layout-free determinism plus an EXACT distributed fit in exchange
    * (the double `VectorSumAgg` fold this replaces depended on
    * partition order). The outer product explodes to d + d² positions
    * per row, but map-side partial aggregation absorbs the rows — the
    * exchange carries ≤ (d + d²) rows per partition, the same shuffle
    * shape as the centroid trains.
    */
  final case class PcaStats(n: Long, s: Array[java.math.BigDecimal],
      ss: Array[java.math.BigDecimal]) {
    def merge(o: PcaStats): PcaStats = {
      require(s.length == o.s.length,
        s"PcaStats.merge needs matching dims: ${s.length} vs ${o.s.length}")
      PcaStats(n + o.n,
        s.lazyZip(o.s).map(_.add(_)).toArray,
        ss.lazyZip(o.ss).map(_.add(_)).toArray)
    }
  }

  /** One aggregation pass: v and its flattened outer product explode
    * to d + d² positions, decimal-summed per position.
    */
  def stats(df: DataFrame, vecCol: String): PcaStats = {
    val v = col(vecCol).cast(ArrayType(DoubleType))
    val d = df.select(size(v).as("d")).head().getInt(0)
    // one native eval per row (graft.functions.SelfOuterWithVec) — the
    // nested-transform outer product ran an interpreted lambda per CELL
    val rows = df.select(posexplode(
        graft.functions.VectorFunctions.selfOuterWithVec(v)))
      .groupBy(col("pos"))
      .agg(sum(col("col").cast(DecimalType(18, 6))).as("sum6"),
        count(lit(1)).as("n"))
      .collect()
    require(rows.length == d + d * d,
      s"ragged vectors: ${rows.length} positions for dim $d")
    val n = rows.head.getLong(2)
    require(rows.forall(_.getLong(2) == n),
      "ragged vectors: position counts differ")
    val byPos = rows.map(r => r.getInt(0) -> r.getDecimal(1)).toMap
    PcaStats(n, Array.tabulate(d)(byPos), Array.tabulate(d * d)(i => byPos(d + i)))
  }

  /** The driver-side tail shared by every fit face: covariance from the
    * exact statistics, Jacobi eigen-solve, sign-stabilized components.
    */
  def fitFromStats(st: PcaStats, k: Int): PcaModel = {
    require(st.n > 1, "PCA needs at least two vectors")
    val n = st.n.toDouble
    val d = st.s.length
    val mean = st.s.map(_.doubleValue / n)
    val ss = st.ss.map(_.doubleValue)
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

  /** Fit the top-`k` principal components of `vecCol` (array<numeric>). */
  def fit(df: DataFrame, vecCol: String, k: Int): PcaModel =
    fitFromStats(stats(df, vecCol), k)

  /** Distributed fit: each shard computes its sufficient statistics
    * independently (no cross-shard shuffle — the whole corpus-sized
    * pass parallelizes across source clusters), ONE driver-side fold
    * adds the decimals exactly, and the d×d eigen-solve runs once.
    * Because the statistics are order-exact, the merged model equals
    * `fit` over the union BIT-FOR-BIT (spec-pinned) — the strongest
    * artifact-equality form of the engine's distributed-build protocol,
    * available here because PCA's training pass IS an abelian sum,
    * unlike Lloyd's iterations (PQ/IVF merge verifies frozen artifacts
    * instead).
    */
  def fitMerged(shards: Seq[DataFrame], vecCol: String, k: Int): PcaModel = {
    require(shards.nonEmpty, "need at least one shard")
    fitFromStats(shards.map(stats(_, vecCol)).reduce(_ merge _), k)
  }

  /** Round-trip the sufficient statistics through a store table. The
    * decimals travel as plain strings — scale-exact for ANY accumulated
    * precision (a pinned DecimalType would cap the fold's precision at
    * write time), so persist → merge → persist never loses a digit and
    * the streamed fold stays bit-identical to the one-shot.
    */
  def statsToDf(spark: org.apache.spark.sql.SparkSession,
      st: PcaStats): DataFrame = {
    import spark.implicits._
    Seq((st.n, st.s.map(_.toPlainString).toSeq, st.ss.map(_.toPlainString).toSeq))
      .toDF("n", "s", "ss")
  }

  def statsFromDf(df: DataFrame): PcaStats = {
    val r = df.head()
    PcaStats(r.getLong(0),
      r.getSeq[String](1).map(new java.math.BigDecimal(_)).toArray,
      r.getSeq[String](2).map(new java.math.BigDecimal(_)).toArray)
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
