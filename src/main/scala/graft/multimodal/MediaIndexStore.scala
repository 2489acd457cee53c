package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.etl.ParquetTableStore
import graft.operators.HammingIndexStore

/** Persisted perceptual-hash band index for INCREMENTAL media near-dup —
  * the multimodal face of `HammingIndexStore` (where the banding,
  * bucketed layout, re-serve guard, and pigeonhole-recall argument
  * live): input rows are (media_id, phash), output pairs are
  * (id_a, id_b, hamming) — identical to the batch
  * `TextDedup.hammingBandPairs` path mm3 measures.
  */
object MediaIndexStore {

  val tables: Seq[String] = HammingIndexStore.tables
  val nBuckets: Int = HammingIndexStore.nBuckets

  private def asGeneric(sig: DataFrame): DataFrame =
    sig.select(col("media_id").as("doc_id"), col("phash").as("hash64"))

  def build(store: ParquetTableStore, sig: DataFrame, maxHamming: Int): Unit =
    HammingIndexStore.build(store, asGeneric(sig), maxHamming)

  def append(store: ParquetTableStore, sig: DataFrame): Unit =
    HammingIndexStore.append(store, asGeneric(sig))

  def compact(store: ParquetTableStore): Unit =
    HammingIndexStore.compact(store)

  def pairsIncremental(store: ParquetTableStore, sig: DataFrame): DataFrame =
    HammingIndexStore.pairsIncremental(store, asGeneric(sig))

  def ensure(spark: SparkSession, corpusDir: String, sig: DataFrame,
      maxHamming: Int): ParquetTableStore =
    HammingIndexStore.ensure(spark, corpusDir, asGeneric(sig), maxHamming,
      tag = "phash")
}
