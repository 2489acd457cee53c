package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.VectorFunctions.dotp

/** Product quantization for vector search (the in-cell compression NOTES
  * flagged as the IVF follow-up): each dim-D vector splits into M
  * subvectors quantized independently against KSub centroids, so a vector
  * stores as M·log2(KSub) bits — here 8 subspaces × 4 bits = one INT per
  * vector (64× smaller than 64 float64s). Queries score codes via ADC
  * (asymmetric distance computation): a per-query lookup table of
  * subspace dot products, one add per subspace per candidate.
  *
  * Scale design (100 TB corpus):
  *  - training runs driver-side on a bounded sample (the FAISS approach) —
  *    centroids are KB; the corpus is never collected.
  *  - encoding is a narrow projection with literal codebooks — no shuffle.
  *  - search scans CODES (4 bytes/vec instead of 512) + one broadcast of
  *    per-query LUTs; the exact re-rank touches only the shortlist.
  *  - composes with IvfIndex: probe cells first, ADC within cells.
  */
object PqIndex {

  val M = 8        // subspaces
  val KSub = 16    // centroids per subspace → 4-bit codes
  val SubDim = 8   // dims per subspace (expects D = 64)

  private def asDouble(v: Column): Column = v.cast(ArrayType(DoubleType))

  /** Codebooks[m][k][subDim], trained by per-subspace Lloyd iterations on
    * a driver-side sample. Deterministic: sample = lowest vec_ids, seeds =
    * first KSub sample subvectors.
    */
  def train(corpus: DataFrame, sampleSize: Int = 10000, iters: Int = 8): Array[Array[Array[Double]]] = {
    val sample = corpus.orderBy(col("vec_id")).limit(sampleSize)
      .select(asDouble(col("embedding")).as("v")).collect()
      .map(_.getSeq[Double](0).toArray)
    trainOn(sample, iters)
  }

  /** Residual flavor (FAISS IVFPQ): train on (v − centroid[cell]) of the
    * sample — residuals have far smaller spread than raw vectors, so the
    * same 4-bit budget quantizes them much more finely.
    */
  def trainResiduals(corpus: DataFrame, centroids: Array[Array[Double]],
      sampleSize: Int = 10000, iters: Int = 8): Array[Array[Array[Double]]] = {
    val v = asDouble(col("embedding"))
    // rounded-argmin cell assignment (the engine-portable protocol) so
    // an oracle derives the identical residual training set
    val sample = corpus.orderBy(col("vec_id")).limit(sampleSize)
      .select(v.as("v"),
        IvfIndex.nearestCellExactPublic(v, centroids).as("cell"))
      .collect()
      .map { r =>
        val x = r.getSeq[Double](0).toArray
        val c = centroids(r.getInt(1))
        Array.tabulate(x.length)(i => x(i) - c(i))
      }
    trainOn(sample, iters)
  }

  /** Per-subspace Lloyd with the ENGINE-PORTABLE arithmetic protocol
    * (the cl1 graduation applied to the driver-side trainer): the
    * argmin compares DECIMAL(18,6)-HALF_UP-rounded Euclidean distances
    * with ties to the lower code (ascending scan keeps the first
    * minimum), and the update step sums the 1e-6-rounded elements as
    * exact BigDecimals before ONE double division — the same numbers a
    * SQL replay computes with `CAST(list_distance(..) AS DECIMAL(18,6))`
    * ranking and `SUM(CAST(x AS DECIMAL(18,6)))::DOUBLE / COUNT(*)`
    * means. The trajectory is therefore bit-reproducible by an
    * independent engine (ann4's oracle replays it); empty cells keep
    * their previous centroid (COALESCE in the replay).
    */
  private def trainOn(sample: Array[Array[Double]], iters: Int): Array[Array[Array[Double]]] = {
    require(sample.nonEmpty && sample.head.length == M * SubDim,
      s"expected dim ${M * SubDim}")
    import java.math.{BigDecimal => JBD, RoundingMode}
    def r6(x: Double): JBD = JBD.valueOf(x).setScale(6, RoundingMode.HALF_UP)
    Array.tabulate(M) { m =>
      val sub = sample.map(_.slice(m * SubDim, (m + 1) * SubDim))
      var cents = sub.take(KSub).map(_.clone)
      for (_ <- 1 to iters) {
        val sums = Array.fill(KSub, SubDim)(JBD.ZERO)
        val counts = Array.fill(KSub)(0L)
        sub.foreach { x =>
          var best = 0; var bestD: JBD = null
          var c = 0
          while (c < cents.length) {
            var d = 0.0; var i = 0
            while (i < SubDim) { val t = x(i) - cents(c)(i); d += t * t; i += 1 }
            val rd = r6(math.sqrt(d))
            if (bestD == null || rd.compareTo(bestD) < 0) { bestD = rd; best = c }
            c += 1
          }
          var i = 0
          while (i < SubDim) { sums(best)(i) = sums(best)(i).add(r6(x(i))); i += 1 }
          counts(best) += 1
        }
        cents = Array.tabulate(KSub)(c =>
          if (counts(c) == 0L) cents(c)
          else Array.tabulate(SubDim)(i => sums(c)(i).doubleValue / counts(c)))
      }
      cents
    }
  }

  /** Raw-PQ encode with the ENGINE-PORTABLE argmin (the trainOn
    * protocol at assignment time): ranks the FULL rounded distance
    * sqrt(|sub|² − 2⟨sub,cb⟩ + |cb|²) as DECIMAL(18,6) with ties to the
    * lower code — a constant-dropped |cb|²−2⟨sub,cb⟩ ranking is argmin-
    * equivalent only UNROUNDED; the rounded comparison needs the full
    * value the oracle's `list_distance` computes. `subNorm(m)` supplies
    * the per-subspace |sub|² as a STAGED column reference so `v` still
    * appears exactly once per codebook entry (the plan-size discipline;
    * the cancellation form can dip ~−1e-16 for sub ≈ cb, clamped ≥ 0
    * before the sqrt).
    */
  private def encodeExprRounded(v: Column, subNorm: Int => Column,
      codebooks: Array[Array[Array[Double]]]): Column = {
    val codes = (0 until M).map { m =>
      val sub = slice(v, m * SubDim + 1, SubDim)
      val scored = codebooks(m).zipWithIndex.map { case (c, i) =>
        val c2 = c.map(x => x * x).sum
        val d6 = sqrt(greatest(
          subNorm(m) - lit(2.0) * dotp(sub, typedLit(c.toSeq)) + lit(c2),
          lit(0.0))).cast(DecimalType(18, 6))
        struct(d6.as("d6"), lit(i).as("code"))
      }
      array_min(array(scored.toIndexedSeq: _*)).getField("code")
    }
    codes.zipWithIndex.map { case (c, m) => shiftleft(c, 4 * m) }
      .reduce(_.bitwiseOR(_)).cast(IntegerType)
  }

  /** Stage (vec_id, v, sn0..sn{M-1}) so the encode expression references
    * each per-subspace norm once per codebook entry as a cheap column
    * (CollapseProject keeps non-cheap aliases staged — the
    * buildIvfPqIndex two-stage pattern).
    */
  private def withSubNorms(corpus: DataFrame): DataFrame = {
    val v = asDouble(col("embedding"))
    val sns = (0 until M).map { m =>
      val sub = slice(v, m * SubDim + 1, SubDim)
      dotp(sub, sub).as(s"sn$m")
    }
    corpus.select(col("vec_id") +: v.as("v") +: sns: _*)
  }

  /** (vec_id, code INT, norm DOUBLE): the complete searchable index row —
    * 12 bytes of payload per corpus vector.
    */
  def encode(corpus: DataFrame, codebooks: Array[Array[Array[Double]]]): DataFrame =
    withSubNorms(corpus).select(col("vec_id"),
      encodeExprRounded(col("v"), m => col(s"sn$m"), codebooks).as("code"),
      sqrt(dotp(col("v"), col("v"))).as("norm"))

  /** The persistable PQ index row: codes PLUS the raw vector for the
    * exact re-rank tail (the FAISS IndexRefineFlat layout — the
    * compressed scan ranks, the stored vector rescores the shortlist).
    * Appending a new batch is THIS projection with the codebooks frozen,
    * so incremental build == batch build by construction.
    */
  def buildIndex(corpus: DataFrame, codebooks: Array[Array[Array[Double]]]): DataFrame =
    withSubNorms(corpus).select(col("vec_id"),
      encodeExprRounded(col("v"), m => col(s"sn$m"), codebooks).as("code"),
      sqrt(dotp(col("v"), col("v"))).as("norm"), col("v").as("nv"))

  /** The persistable IVFPQ index row: coarse cell + residual code + norm +
    * raw vector — (vec_id, cell, code, norm, nv). Centroids and codebooks
    * stay frozen after training (add-after-train), so appends never touch
    * existing rows.
    */
  def buildIvfPqIndex(corpus: DataFrame, centroids: Array[Array[Double]],
      codebooks: Array[Array[Array[Double]]]): DataFrame = {
    // three-stage select: (1) the ROUNDED cell argmin + per-subspace
    // |v_m|² materialize as columns before anything references them;
    // (2) per-subspace RESIDUAL norms |v_m − c_cell,m|² derive from
    // those via per-cell literals (v appears once per subspace);
    // (3) the encode argmin ranks the FULL rounded residual distance
    // sqrt(rsq_m − 2⟨v_m,cb⟩ + 2⟨c_cell,m,cb⟩ + |cb|²) — the engine-
    // portable protocol, so an oracle computing the explicit residual
    // distance replays the identical codes (CollapseProject keeps
    // non-cheap aliases staged — NOTES.md plan-size discipline)
    val v = asDouble(col("embedding"))
    val s1 = corpus.select(col("vec_id") +: v.as("v") +:
      IvfIndex.nearestCellExactPublic(v, centroids).as("cell") +:
      (0 until M).map { m =>
        val sub = slice(v, m * SubDim + 1, SubDim)
        dotp(sub, sub).as(s"sn$m")
      }: _*)
    val s2 = s1.select(col("vec_id") +: col("v") +: col("cell") +:
      (0 until M).map { m =>
        val sub = slice(col("v"), m * SubDim + 1, SubDim)
        val cellSubs = typedLit(centroids.map(
          _.slice(m * SubDim, (m + 1) * SubDim).toSeq).toSeq)
        val cellSubN = typedLit(centroids.map(c =>
          c.slice(m * SubDim, (m + 1) * SubDim).map(x => x * x).sum).toSeq)
        (col(s"sn$m") - lit(2.0) * dotp(sub, element_at(cellSubs, col("cell") + 1))
          + element_at(cellSubN, col("cell") + 1)).as(s"rsq$m")
      }: _*)
    s2.select(col("vec_id"), col("cell"),
      encodeExprRoundedResidual(col("v"), m => col(s"rsq$m"), col("cell"),
        centroids, codebooks).as("code"),
      sqrt(dotp(col("v"), col("v"))).as("norm"), col("v").as("nv"))
  }

  /** Residual flavor of `encodeExprRounded`: ranks the full rounded
    * residual distance via the expansion |r_m − cb|² = rsq_m −
    * 2⟨v_m,cb⟩ + 2⟨c_cell,m,cb⟩ + |cb|², with rsq_m staged and the
    * cell-dependent term a per-(cell, entry) literal lookup — `v`
    * appears exactly once per codebook entry. The expansion and the
    * oracle's explicit Σ(r−cb)² differ by ~1e-14 cancellation noise;
    * the DECIMAL(18,6) rounding absorbs it (the ann4 protocol).
    */
  private def encodeExprRoundedResidual(v: Column, rsq: Int => Column,
      cell: Column, centroids: Array[Array[Double]],
      codebooks: Array[Array[Array[Double]]]): Column = {
    val codes = (0 until M).map { m =>
      val sub = slice(v, m * SubDim + 1, SubDim)
      val scored = codebooks(m).zipWithIndex.map { case (cb, i) =>
        val cb2 = cb.map(x => x * x).sum
        val adj = centroids.map { cent =>
          2.0 * cb.indices.map(j => cent(m * SubDim + j) * cb(j)).sum
        }
        val d6 = sqrt(greatest(
          rsq(m) - lit(2.0) * dotp(sub, typedLit(cb.toSeq))
            + element_at(typedLit(adj.toSeq), cell + 1) + lit(cb2),
          lit(0.0))).cast(DecimalType(18, 6))
        struct(d6.as("d6"), lit(i).as("code"))
      }
      array_min(array(scored.toIndexedSeq: _*)).getField("code")
    }
    codes.zipWithIndex.map { case (c, m) => shiftleft(c, 4 * m) }
      .reduce(_.bitwiseOR(_)).cast(IntegerType)
  }

  /** Narrow 3-column projection before the shortlist window: the LUT and
    * code columns never ride the ranking shuffle, and Spark's partial
    * WindowGroupLimit under the exchange bounds it to ≤ partitions·n rows
    * per query instead of the whole ADC-scored set (PlanSpec pins it).
    */
  private def perPartitionTopN(scored: DataFrame, n: Int): DataFrame =
    scored.select(col("query_id"), col("vec_id"), col("approx_cos"))

  /** Approximate top-k by ADC over codes, then EXACT cosine re-rank of a
    * `refine`×k shortlist. Query side collected to build LUTs (queries are
    * the small side; corpus never leaves the cluster).
    */
  /** `refine`: shortlist size multiplier for the exact re-rank. 4-bit
    * codes are a coarse rank signal, so the shortlist must be generous —
    * 32·k of a large corpus is still a tiny exact-scored fraction.
    */
  def pqTopK(queries: DataFrame, corpus: DataFrame, k: Int, refine: Int = 32,
      codebooks0: Array[Array[Array[Double]]] = null): DataFrame = {
    val codebooks = if (codebooks0 != null) codebooks0 else train(corpus)
    pqTopKIndexed(queries, buildIndex(corpus, codebooks), codebooks, k, refine)
  }

  /** Per-query ADC lookup tables: lut[m*KSub + c] = ⟨q_sub_m, centroid_mc⟩,
    * plus the query norm — KB per query, broadcast to the code scan.
    */
  private def queryLuts(queries: DataFrame,
      codebooks: Array[Array[Array[Double]]]): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    queries.select(col("vec_id").as("query_id"),
        asDouble(col("embedding")).as("qv")).collect()
      .map { r =>
        val qid = r.getLong(0)
        val q = r.getSeq[Double](1).toArray
        val qnorm = math.sqrt(q.map(x => x * x).sum)
        val lut = Array.tabulate(M * KSub) { i =>
          val m = i / KSub; val c = i % KSub
          var s = 0.0; var d = 0
          while (d < SubDim) { s += q(m * SubDim + d) * codebooks(m)(c)(d); d += 1 }
          s
        }
        (qid, lut.toSeq, qnorm)
      }.toSeq.toDF("query_id", "lut", "qnorm")
  }

  /** ADC sum of the M table entries a packed code selects. */
  private def adcDotExpr: Column = (0 until M).map { m =>
    element_at(col("lut"),
      (lit(m * KSub) + shiftright(col("code"), 4 * m).bitwiseAND(0xF)) + 1)
  }.reduce(_ + _)

  /** Exact-cosine re-rank of a (query_id, neighbor_id) shortlist against
    * the index's stored vectors — the shared tail of every PQ variant.
    */
  private def exactReRank(shortlist: DataFrame, queries: DataFrame,
      index: DataFrame, k: Int): DataFrame = {
    val cv = index.select(col("vec_id").as("neighbor_id"), col("nv"))
    val qv = queries.select(col("vec_id").as("query_id"), asDouble(col("embedding")).as("qv"))
    val exact = shortlist.join(broadcast(qv), Seq("query_id")).join(cv, Seq("neighbor_id"))
      .withColumn("cos", dotp(col("qv"), col("nv")) /
        sqrt(dotp(col("qv"), col("qv")) * dotp(col("nv"), col("nv"))))
    // rank on the ROUNDED cosine (ties → neighbor_id): the raw double
    // differs between engines at ~1e-16 summation-order noise, which an
    // oracle replay must not be able to flip at the rank-k boundary
    val wf = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").cast(DecimalType(18, 6)).desc, col("neighbor_id"))
    exact.withColumn("rn", row_number().over(wf)).filter(col("rn") <= k)
      .select(col("query_id"), col("neighbor_id"),
        col("cos").cast(DecimalType(18, 6)).cast(DoubleType).as("cos"))
  }

  /** Approximate top-k over a PREBUILT index (see `buildIndex`): the
    * deployment path — training cost is paid once at index-build time,
    * queries pay only the ADC scan + shortlist re-rank.
    */
  def pqTopKIndexed(queries: DataFrame, index: DataFrame,
      codebooks: Array[Array[Array[Double]]], k: Int, refine: Int = 32): DataFrame = {
    val luts = queryLuts(queries, codebooks)
    val scored = index.join(broadcast(luts), col("query_id") =!= col("vec_id"))
      .withColumn("approx_cos", adcDotExpr / (col("qnorm") * col("norm")))
    // shortlist membership ranks on the ROUNDED ADC score (ties →
    // vec_id) so an oracle replay selects the identical refine·k set —
    // the raw double carries engine-private summation-order noise
    val wa = Window.partitionBy(col("query_id"))
      .orderBy(col("approx_cos").cast(DecimalType(18, 6)).desc, col("vec_id"))
    val shortlist = perPartitionTopN(scored, k * refine)
      .withColumn("rn", row_number().over(wa))
      .filter(col("rn") <= k * refine)
      .select(col("query_id"), col("vec_id").as("neighbor_id"))
    exactReRank(shortlist, queries, index, k)
  }

  /** IVFPQ: IvfIndex coarse cells × RESIDUAL PQ codes (the FAISS layout).
    * Each vector stores (cell, code of v − centroid[cell], norm) — 16
    * bytes; a query ADC-scans only its `nprobe` probed cells' codes, with
    * approx ⟨q, v⟩ = ⟨q, centroid_cell⟩ (driver-computed, KB literal) +
    * Σ_m lut[m][code_m] over the residual codebooks, then exact-re-ranks
    * the shortlist. Residuals have far smaller spread than raw vectors, so
    * the 4-bit budget quantizes them much more finely than ann4's raw PQ.
    * At 100 TB this is the standard billion-scale ANN layout: coarse
    * partition pruning × in-cell compressed scan × exact tail.
    */
  def ivfPqTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      kClusters: Int = 16, nprobe: Int = 4, refine: Int = 32): DataFrame = {
    val centroids = IvfIndex.fitExactLloyd(corpus, kClusters, iters = 5)
    val codebooks = trainResiduals(corpus, centroids)
    ivfPqTopKIndexed(queries, buildIvfPqIndex(corpus, centroids, codebooks),
      centroids, codebooks, k, nprobe, refine)
  }

  /** IVFPQ top-k over a PREBUILT index (see `buildIvfPqIndex`): probe the
    * query's `nprobe` cells, ADC-scan only those cells' codes with the
    * residual correction ⟨q,v⟩ ≈ ⟨q,centroid_cell⟩ + Σ_m lut[code_m],
    * exact-re-rank the shortlist against the stored vectors.
    */
  def ivfPqTopKIndexed(queries: DataFrame, index: DataFrame,
      centroids: Array[Array[Double]], codebooks: Array[Array[Array[Double]]],
      k: Int, nprobe: Int = 4, refine: Int = 32): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    // LUT + ⟨q, centroid_c⟩ per cell — the coarse term of the residual ADC
    val luts = queryLuts(queries, codebooks)
    val qcs = queries.select(col("vec_id").as("query_id"),
        asDouble(col("embedding")).as("qv")).collect()
      .map { r =>
        val q = r.getSeq[Double](1).toArray
        (r.getLong(0), centroids.map(c => c.indices.map(i => q(i) * c(i)).sum).toSeq)
      }.toSeq.toDF("query_id", "qc")
    // probe selection under the rounded protocol — the oracle replays
    // the identical cell set (nearestCellsExact)
    val probes = queries.select(col("vec_id").as("query_id"),
        explode(IvfIndex.nearestCellsExact(asDouble(col("embedding")), centroids, nprobe))
          .as("cell"))
      .join(luts, Seq("query_id")).join(qcs, Seq("query_id"))

    val adcDot = adcDotExpr + element_at(col("qc"), col("cell") + 1)
    // join on the probed cell: each query scans nprobe/kClusters of codes
    val scored = probes.join(index, Seq("cell"))
      .filter(col("query_id") =!= col("vec_id"))
      .withColumn("approx_cos", adcDot / (col("qnorm") * col("norm")))
    val wa = Window.partitionBy(col("query_id"))
      .orderBy(col("approx_cos").cast(DecimalType(18, 6)).desc, col("vec_id"))
    val shortlist = perPartitionTopN(scored, k * refine)
      .withColumn("rn", row_number().over(wa))
      .filter(col("rn") <= k * refine)
      .select(col("query_id"), col("vec_id").as("neighbor_id"))
    exactReRank(shortlist, queries, index, k)
  }
}
