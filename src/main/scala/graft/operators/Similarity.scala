package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Vector similarity over an embedding column (array<float>):
  * brute-force cosine (the exact baseline) and random-hyperplane LSH
  * bucketing (the approximate scale path).
  *
  * Everything is pure Column arithmetic (zip_with/aggregate — codegen'd,
  * no UDF): dot = Σ aᵢbᵢ left-to-right in double, cosine =
  * dot/√(Σaᵢ²·Σbᵢ²).
  *
  * Scale notes (100 TB): brute force is O(|Q|·|C|) — fine when one side is
  * small and broadcast (top-k against a query batch), wrong for all-pairs.
  * The LSH variant shuffles on (table, bucket) keys so candidate
  * generation stays linear in corpus size × tables; recall is tuned by
  * bitsPerTable/numTables, and buckets are bounded groups, so skew is
  * capped. An IVF refinement (k-means coarse quantizer) would slot in the
  * same bucket-join shape.
  */
object Similarity {
  import graft.functions.VectorFunctions.dotp

  private def asDouble(v: Column): Column = v.cast(ArrayType(DoubleType))

  /** Codegen'd dot product (graft.functions.DotProduct) — identical
    * left-to-right double accumulation to the zip_with formulation.
    */
  def dot(a: Column, b: Column): Column = dotp(a, b)

  def norm2(a: Column): Column = dot(a, a)

  def cosine(a: Column, b: Column): Column = {
    val ad = asDouble(a); val bd = asDouble(b)
    dot(ad, bd) / sqrt(norm2(ad) * norm2(bd))
  }

  /** Exact top-k cosine neighbors for each query vector. `queries` is the
    * SMALL side (a query batch) and is broadcast; candidates stream
    * through a single pass. Self-matches (same id) excluded.
    */
  def bruteForceTopK(queries: DataFrame, candidates: DataFrame, k: Int): DataFrame = {
    // norms computed ONCE per row on each side, not per pair
    val q = broadcast(queries.select(col("vec_id").as("query_id"),
      asDouble(col("embedding")).as("qv")).withColumn("qn2", norm2(col("qv"))))
    val c = candidates.select(col("vec_id").as("neighbor_id"),
      asDouble(col("embedding")).as("cv")).withColumn("cn2", norm2(col("cv")))
    val scored = q.join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", dot(col("qv"), col("cv")) / sqrt(col("qn2") * col("cn2")))
    // narrow 3-column projection BEFORE the ranking window: Spark plans a
    // partial WindowGroupLimit under the exchange (rank-filter pushdown),
    // so the sort-shuffle sees ≤ partitions·k rows per query, not the
    // |Q|·|C| scored set — and the vectors never ride the shuffle.
    // PlanSpec pins the partial-limit plan shape.
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    scored.select(col("query_id"), col("neighbor_id"), col("cos"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select(col("query_id"), col("neighbor_id"),
        col("cos").cast(DecimalType(18, 6)).cast(DoubleType).as("cos"))
  }

  /** All near-duplicate pairs with cosine ≥ minCos — exact O(n²) baseline
    * (the LSH path below is the scale answer; this is the oracle).
    */
  def cosineNearDupPairs(embeddings: DataFrame, minCos: Double): DataFrame = {
    // norms once per row per side; the pair row only pays one dot product
    val a = embeddings.select(col("vec_id").as("id_a"), asDouble(col("embedding")).as("va"))
      .withColumn("na2", norm2(col("va")))
    val b = embeddings.select(col("vec_id").as("id_b"), asDouble(col("embedding")).as("vb"))
      .withColumn("nb2", norm2(col("vb")))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cos", dot(col("va"), col("vb")) / sqrt(col("na2") * col("nb2")))
      .filter(col("cos") >= minCos)
      .select(col("id_a"), col("id_b"), col("cos").cast(DecimalType(18, 6)).cast(DoubleType).as("cos"))
  }

  // ───── random-hyperplane LSH ─────

  /** Deterministic gaussian hyperplanes: numTables × bitsPerTable planes
    * of dimension dim, seeded — reproducible across runs and executors.
    */
  def hyperplanes(dim: Int, numTables: Int, bitsPerTable: Int, seed: Long = 42L): Seq[Seq[Array[Double]]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(numTables)(Seq.fill(bitsPerTable)(Array.fill(dim)(rnd.nextGaussian())))
  }

  /** (vec_id, table, bucket) rows: bucket = sign-bit pattern of the
    * vector against the table's hyperplanes.
    */
  def lshBuckets(embeddings: DataFrame, planes: Seq[Seq[Array[Double]]]): DataFrame = {
    val v = asDouble(col("embedding"))
    val bucketCols = planes.map { table =>
      table.zipWithIndex.map { case (p, i) =>
        val pc = typedLit(p.toSeq) // array literal, shipped inside the plan
        when(dot(v, pc) >= 0, shiftleft(lit(1), i)).otherwise(lit(0))
      }.reduce((x, y) => x.bitwiseOR(y))
    }
    embeddings.select(col("vec_id"), col("embedding"),
        posexplode(array(bucketCols: _*)))
      .select(col("vec_id"), col("embedding"),
        col("pos").as("table"), col("col").as("bucket"))
  }

  /** Approximate top-k: candidates = vectors sharing any (table, bucket)
    * with the query; exact cosine rescoring within candidates only.
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      numTables: Int = 8, bitsPerTable: Int = 4): DataFrame = {
    val dim = 64
    val planes = hyperplanes(dim, numTables, bitsPerTable)
    val qb = lshBuckets(queries, planes)
      .select(col("vec_id").as("query_id"), asDouble(col("embedding")).as("qv"),
        col("table"), col("bucket"))
    val cb = lshBuckets(corpus, planes)
      .select(col("vec_id").as("neighbor_id"), asDouble(col("embedding")).as("cv"),
        col("table"), col("bucket"))
    // score at the join (narrow), THEN dedup: the dedup shuffle carries
    // (ids, cos), not two 64-double vectors per candidate row
    val scored = qb.join(cb, Seq("table", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", dot(col("qv"), col("cv")) / sqrt(norm2(col("qv")) * norm2(col("cv"))))
      .select(col("query_id"), col("neighbor_id"), col("cos"))
      .dropDuplicates("query_id", "neighbor_id")
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    scored.select(col("query_id"), col("neighbor_id"), col("cos"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select(col("query_id"), col("neighbor_id"),
        col("cos").cast(DecimalType(18, 6)).cast(DoubleType).as("cos"))
  }
}
