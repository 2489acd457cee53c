package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.etl.ParquetTableStore

/** Persisted band index over ANY 64-bit fingerprint column — the shared
  * core of the multimodal perceptual-hash index (MediaIndexStore) and the
  * text SimHash index (d28): `TextDedup.hammingBandPairs` re-bands the
  * whole corpus per run; this store persists each absorbed item's 8 band
  * rows once and serves an arriving batch with batch-shaped work (batch
  * bands join the stored bands on (band, band_val); only colliding
  * stored rows leave the scan). Recall is the same pigeonhole as the
  * batch operator: hamming ≤ 7 over 8 bands forces ≥ 1 identical band,
  * and banding is a pure function of the hash — no frozen-order
  * subtlety at all (contrast DedupIndexStore's df ordering).
  *
  * Input rows are (doc_id: long, hash64: long); output pairs are
  * (id_a, id_b, hamming) — identical to `hammingBandPairs`.
  *
  * Layout (journaled ParquetTableStore):
  *   bands  (band, band_val, doc_id, hash64) — 8 rows per absorbed item,
  *          BUCKET-ENCODED on (band, band_val); hash64 rides along so
  *          candidate verification is an inline xor/bit_count, never a
  *          second corpus join. doc_id is the re-serve guard (the
  *          SuffixIndexStore doctrine): serve anti-joins the batch's own
  *          ids out of the stored side, so re-serving an absorbed batch
  *          reproduces the pre-absorb answer — append idempotent up to
  *          harmless duplicate rows (candidates are dropDuplicates'd),
  *          streaming replay exactly-once with no guard table.
  *   meta   (max_hamming) — 1 row, frozen at build.
  *
  * Reference anchor: generalizes the content-hash identity the reference
  * dedups on at load time (`main.py:142-163`) to near-identity over any
  * 64-bit sketch.
  */
object HammingIndexStore {

  val tables: Seq[String] = Seq("meta", "bands")
  val nBuckets: Int = 32
  private val bucketCols = Seq("band", "band_val")

  /** 8 × 8-bit band rows per signature — identical banding to
    * `TextDedup.hammingBandPairs` (the pigeonhole contract both sides
    * of every served pair rely on).
    */
  private def banded(sig: DataFrame): DataFrame =
    sig.select(col("doc_id"), col("hash64"),
        posexplode(array((0 until 8).map(k =>
          shiftright(col("hash64"), k * 8).bitwiseAND(0xFFL)): _*)))
      .select(col("doc_id"), col("hash64"),
        col("pos").as("band"), col("col").as("band_val"))

  def build(store: ParquetTableStore, sig: DataFrame, maxHamming: Int): Unit = {
    require(maxHamming <= 7, "band recall is exact only for hamming <= 7")
    store.stageBucketed("bands", banded(sig), bucketCols, nBuckets)
    val spark = sig.sparkSession
    import spark.implicits._
    store.stage("meta", Seq(maxHamming).toDF("max_hamming"))
    store.commitStaged(tables)
  }

  def append(store: ParquetTableStore, sig: DataFrame): Unit =
    store.appendBucketed("bands", banded(sig), bucketCols, nBuckets)

  def compact(store: ParquetTableStore): Unit =
    store.compactBucketed("bands", bucketCols, nBuckets)

  /** Near-dup pair delta for an arriving batch of signatures vs
    * (indexed corpus ∪ batch): output = `hammingBandPairs` over the
    * union, restricted to pairs touching the batch (spec-pinned).
    */
  def pairsIncremental(store: ParquetTableStore, sig: DataFrame): DataFrame = {
    val maxHamming = store.read("meta").head().getInt(0)
    val inc = sig.localCheckpoint(true)
    val bInc = banded(inc)
    val stored = store.readBucketed("bands", bucketCols, nBuckets)
      .join(inc.select(col("doc_id")).distinct(), Seq("doc_id"), "left_anti")
    val newOld = bInc.as("a").join(stored.as("b"),
        col("a.band") === col("b.band") && col("a.band_val") === col("b.band_val"))
      .select(least(col("a.doc_id"), col("b.doc_id")).as("id_a"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("id_b"),
        bit_count(col("a.hash64").bitwiseXOR(col("b.hash64"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
    val newNew = TextDedup.hammingBandPairs(
        inc.select(col("doc_id"), col("hash64").as("simhash")), maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
    newOld.unionByName(newNew).dropDuplicates("id_a", "id_b")
  }

  // ───── mtime-keyed ensure (registered-query / bench serving surface) ─────

  private val cacheRoot =
    sys.env.getOrElse("SPARK_GRAFT_DEDUP_STATE_DIR", "target/graft-dedup-state")
  private val ensureLock = new Object

  /** `tag` separates coexisting indexes over the same corpus (e.g. the
    * perceptual-hash index and the SimHash index both key on
    * documents.parquet's mtime).
    */
  def ensure(spark: SparkSession, corpusDir: String, sig: DataFrame,
      maxHamming: Int, tag: String): ParquetTableStore = {
    val mtime = new java.io.File(corpusDir, "documents.parquet").lastModified
    val key = corpusDir.replaceAll("[^A-Za-z0-9.]", "_")
    val path = s"$cacheRoot/hband1_${tag}_${maxHamming}_${key}_$mtime"
    ensureLock.synchronized {
      val store = new ParquetTableStore(spark, path)
      if (!tables.forall(store.exists)) build(store, sig, maxHamming)
      store
    }
  }
}
