package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Persistable inverted index for BM25 retrieval — the VectorIndexStore
  * doctrine applied to text: build once (postings + corpus stats as
  * parquet), append new batches without rebuilding, query many times.
  *
  * Layout under `dir`:
  *   postings/  (term, doc_id, tf, dl)  — partitioned write, term-filter
  *                                        prunes via parquet pushdown
  *   stats/     (n_docs, sum_dl)        — 1 row
  *
  * Document frequency is DERIVED at query time from the term-filtered
  * postings (a count over the shortlist, never the corpus), which keeps
  * `append` a pure row-append + stats bump — no global recount, the
  * abelian-delta doctrine (NB doc_ids must be disjoint across appended
  * batches, same contract as VectorIndexStore.append).
  */
object TextIndexStore {

  private def postings(docs: DataFrame): DataFrame =
    Par.fan(docs)
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"), size(col("w")).cast(LongType).as("dl"), col("w"))
      .select(col("doc_id"), col("dl"), explode(col("w")).as("term"))
      .groupBy(col("term"), col("doc_id"), col("dl"))
      .agg(count(lit(1)).as("tf"))

  private def stats(docs: DataFrame): DataFrame =
    docs.select(size(split(col("text"), " ")).cast(LongType).as("dl"))
      .agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))

  def write(dir: String, docs: DataFrame): Unit = {
    postings(docs).write.mode("overwrite").parquet(s"$dir/postings")
    stats(docs).write.mode("overwrite").parquet(s"$dir/stats")
  }

  /** Append a batch: new postings rows + an exact stats bump. */
  def append(spark: SparkSession, dir: String, batch: DataFrame): Unit = {
    postings(batch).write.mode("append").parquet(s"$dir/postings")
    val merged = spark.read.parquet(s"$dir/stats")
      .unionByName(stats(batch))
      .agg(sum(col("n_docs")).cast(LongType).as("n_docs"),
        sum(col("sum_dl")).cast(LongType).as("sum_dl"))
      .collect()(0)
    import spark.implicits._
    // rewrite AFTER collecting (1 row) — never read-and-overwrite lazily
    Seq((merged.getLong(0), merged.getLong(1))).toDF("n_docs", "sum_dl")
      .write.mode("overwrite").parquet(s"$dir/stats")
  }

  /** BM25 top-k from the stored index — identical op sequence to
    * TextQuality.bm25, so indexed == direct (QualitySpec pins it).
    * The term filter reaches the parquet scan (PushedFilters), so the
    * query cost tracks the shortlist, not the corpus.
    */
  def search(spark: SparkSession, dir: String, terms: Seq[String], k: Int,
      requireAll: Boolean = false): DataFrame = {
    val tf = spark.read.parquet(s"$dir/postings")
      .filter(col("term").isin(terms: _*))
    TextQuality.bm25Rank(tf, spark.read.parquet(s"$dir/stats"), k,
      if (requireAll) Some(terms.size) else None)
  }

  // Build-once-per-corpus scratch artifact for the registered query
  // (the VectorIndexStore.ensure* pattern): keyed by corpus dir +
  // parquet mtime so a regenerated corpus rebuilds.
  private val cacheRoot =
    sys.env.getOrElse("SPARK_GRAFT_INDEX_DIR", "target/graft-index")
  private val ensureLock = new Object

  /** Stored-index path for a corpus dir, building it on first use. */
  def ensure(corpusDir: String, docs: DataFrame): String = {
    val mtime = new java.io.File(corpusDir, "documents.parquet").lastModified
    val path = s"$cacheRoot/text_" +
      corpusDir.replaceAll("[^A-Za-z0-9.]", "_") + "_" + mtime
    ensureLock.synchronized {
      if (!java.nio.file.Files.exists(java.nio.file.Paths.get(path, "stats")))
        write(path, docs)
    }
    path
  }
}
