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
    val sample = corpus.orderBy(col("vec_id")).limit(sampleSize)
      .select(v.as("v"),
        element_at(IvfIndex.nearestCellsPublic(v, centroids, 1), 1).as("cell"))
      .collect()
      .map { r =>
        val x = r.getSeq[Double](0).toArray
        val c = centroids(r.getInt(1))
        Array.tabulate(x.length)(i => x(i) - c(i))
      }
    trainOn(sample, iters)
  }

  private def trainOn(sample: Array[Array[Double]], iters: Int): Array[Array[Array[Double]]] = {
    require(sample.nonEmpty && sample.head.length == M * SubDim,
      s"expected dim ${M * SubDim}")
    Array.tabulate(M) { m =>
      val sub = sample.map(_.slice(m * SubDim, (m + 1) * SubDim))
      var cents = sub.take(KSub).map(_.clone)
      for (_ <- 1 to iters) {
        val sums = Array.fill(KSub, SubDim)(0.0)
        val counts = Array.fill(KSub)(0)
        sub.foreach { x =>
          var best = 0; var bestD = Double.MaxValue
          var c = 0
          while (c < cents.length) {
            var d = 0.0; var i = 0
            while (i < SubDim) { val t = x(i) - cents(c)(i); d += t * t; i += 1 }
            if (d < bestD) { bestD = d; best = c }
            c += 1
          }
          var i = 0
          while (i < SubDim) { sums(best)(i) += x(i); i += 1 }
          counts(best) += 1
        }
        cents = Array.tabulate(KSub)(c =>
          if (counts(c) == 0) cents(c) else sums(c).map(_ / counts(c)))
      }
      cents
    }
  }

  /** Per-subspace argmin against literal centroids → 4-bit codes packed
    * into one INT. Narrow, no shuffle; ties break to the lower code via
    * struct ordering (same convention as IvfIndex.nearestCell).
    *
    * Residual mode (`cellAdj` = (cell column, coarse centroids)): encodes
    * v − centroid[cell] WITHOUT materializing the residual array — the
    * argmin distance decomposes as |cb|² − 2⟨v_m, cb⟩ + 2⟨c_m, cb⟩, and
    * the last term is a pure literal per (cell, subspace, entry), looked
    * up by cell id. Keeps `v` appearing exactly once per codebook entry
    * (the plan-size discipline NOTES.md mandates; substituting a zip_with
    * residual subtree here would multiply it M·KSub times).
    */
  private def encodeExpr(v: Column, codebooks: Array[Array[Array[Double]]],
      cellAdj: Option[(Column, Array[Array[Double]])] = None): Column = {
    val codes = (0 until M).map { m =>
      val sub = slice(v, m * SubDim + 1, SubDim)
      val scored = codebooks(m).zipWithIndex.map { case (c, i) =>
        val c2 = c.map(x => x * x).sum
        val base = lit(c2) - lit(2.0) * dotp(sub, typedLit(c.toSeq))
        val d = cellAdj match {
          case None => base
          case Some((cell, cents)) =>
            // 2⟨centroid_cell[m], cb_i⟩ per cell, as one literal array
            val adj = cents.map { cent =>
              2.0 * c.indices.map(j => cent(m * SubDim + j) * c(j)).sum
            }
            base + element_at(typedLit(adj.toSeq), cell + 1)
        }
        struct(d.as("d"), lit(i).as("code"))
      }
      array_min(array(scored: _*)).getField("code")
    }
    codes.zipWithIndex.map { case (c, m) => shiftleft(c, 4 * m) }
      .reduce(_.bitwiseOR(_)).cast(IntegerType)
  }

  /** (vec_id, code INT, norm DOUBLE): the complete searchable index row —
    * 12 bytes of payload per corpus vector.
    */
  def encode(corpus: DataFrame, codebooks: Array[Array[Array[Double]]]): DataFrame = {
    val v = asDouble(col("embedding"))
    corpus.select(col("vec_id"), encodeExpr(v, codebooks).as("code"),
      sqrt(dotp(v, v)).as("norm"))
  }

  /** The persistable PQ index row: codes PLUS the raw vector for the
    * exact re-rank tail (the FAISS IndexRefineFlat layout — the
    * compressed scan ranks, the stored vector rescores the shortlist).
    * Appending a new batch is THIS projection with the codebooks frozen,
    * so incremental build == batch build by construction.
    */
  def buildIndex(corpus: DataFrame, codebooks: Array[Array[Array[Double]]]): DataFrame = {
    val v = asDouble(col("embedding"))
    corpus.select(col("vec_id"), encodeExpr(v, codebooks).as("code"),
      sqrt(dotp(v, v)).as("norm"), v.as("nv"))
  }

  /** The persistable IVFPQ index row: coarse cell + residual code + norm +
    * raw vector — (vec_id, cell, code, norm, nv). Centroids and codebooks
    * stay frozen after training (add-after-train), so appends never touch
    * existing rows.
    */
  def buildIvfPqIndex(corpus: DataFrame, centroids: Array[Array[Double]],
      codebooks: Array[Array[Array[Double]]]): DataFrame = {
    // two-stage select: the cell argmin materializes as a column BEFORE
    // the encode expression references it M·KSub times (CollapseProject
    // keeps non-cheap aliases staged — NOTES.md plan-size discipline)
    val v = asDouble(col("embedding"))
    val withCell = corpus.select(col("vec_id"), v.as("v"),
      element_at(IvfIndex.nearestCellsPublic(v, centroids, 1), 1).as("cell"))
    withCell.select(col("vec_id"), col("cell"),
      encodeExpr(col("v"), codebooks, Some((col("cell"), centroids))).as("code"),
      sqrt(dotp(col("v"), col("v"))).as("norm"), col("v").as("nv"))
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
    val wf = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
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
    val wa = Window.partitionBy(col("query_id"))
      .orderBy(col("approx_cos").desc, col("vec_id"))
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
    val centroids = IvfIndex.fit(corpus, kClusters)
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
    val probes = queries.select(col("vec_id").as("query_id"),
        explode(IvfIndex.nearestCellsPublic(asDouble(col("embedding")), centroids, nprobe))
          .as("cell"))
      .join(luts, Seq("query_id")).join(qcs, Seq("query_id"))

    val adcDot = adcDotExpr + element_at(col("qc"), col("cell") + 1)
    // join on the probed cell: each query scans nprobe/kClusters of codes
    val scored = probes.join(index, Seq("cell"))
      .filter(col("query_id") =!= col("vec_id"))
      .withColumn("approx_cos", adcDot / (col("qnorm") * col("norm")))
    val wa = Window.partitionBy(col("query_id"))
      .orderBy(col("approx_cos").desc, col("vec_id"))
    val shortlist = perPartitionTopN(scored, k * refine)
      .withColumn("rn", row_number().over(wa))
      .filter(col("rn") <= k * refine)
      .select(col("query_id"), col("vec_id").as("neighbor_id"))
    exactReRank(shortlist, queries, index, k)
  }
}
