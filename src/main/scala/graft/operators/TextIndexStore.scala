package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Persistable inverted index for BM25 retrieval — the VectorIndexStore
  * doctrine applied to text: build once (postings + corpus stats), append
  * new batches without rebuilding, query many times.
  *
  * Layout under `dir` (a journaled ParquetTableStore):
  *   postings  (term, doc_id, tf, dl) — BUCKET-ENCODED on term, 32
  *             buckets (the DedupIndexStore layout applied to search):
  *             the scan arrives pre-partitioned on term, so the per-term
  *             document-frequency aggregate needs NO exchange on the
  *             postings side, and the term IN-filter prunes whole
  *             buckets before pushdown even sees a row group. A narrow
  *             3-term query was already scan-pruned; the case that
  *             matters at 100 TB is a HOT-VOCABULARY query (100-term OR
  *             — decontamination benchmarks, topic probes) whose
  *             shortlist is corpus-shaped: with the bucket layout its
  *             only shuffle is the doc-grained score aggregation,
  *             shortlist-sized by construction (PlanSpec pins the
  *             no-exchange contract under a 100-term query).
  *   stats     (n_docs, sum_dl)       — 1 row
  *
  * Document frequency is DERIVED at query time from the term-filtered
  * postings (a count over the shortlist, never the corpus), which keeps
  * `append` a pure bucket-append + stats bump — no global recount, the
  * abelian-delta doctrine (NB doc_ids must be disjoint across appended
  * batches, same contract as VectorIndexStore.append).
  */
object TextIndexStore {

  val nBuckets: Int = 32
  private val bucketCols = Seq("term")

  private def store(spark: SparkSession, dir: String) =
    new graft.etl.ParquetTableStore(spark, dir)

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
    val st = store(docs.sparkSession, dir)
    st.stageBucketed("postings", postings(docs), bucketCols, nBuckets)
    st.stage("stats", stats(docs))
    st.commitStaged(Seq("postings", "stats"))
  }

  /** Append a batch: new bucket files beside the old ones (the bucket
    * contract holds per file) + an exact stats bump.
    */
  def append(spark: SparkSession, dir: String, batch: DataFrame): Unit = {
    val st = store(spark, dir)
    st.appendBucketed("postings", postings(batch), bucketCols, nBuckets)
    val merged = st.read("stats")
      .unionByName(stats(batch))
      .agg(sum(col("n_docs")).cast(LongType).as("n_docs"),
        sum(col("sum_dl")).cast(LongType).as("sum_dl"))
      .collect()(0)
    import spark.implicits._
    // rewrite AFTER collecting (1 row) — never read-and-overwrite lazily
    st.overwrite("stats",
      Seq((merged.getLong(0), merged.getLong(1))).toDF("n_docs", "sum_dl"))
  }

  /** Compact the postings back to ~one file per bucket (the daily-append
    * maintenance pass — same rationale as DedupIndexStore.compact).
    */
  def compact(spark: SparkSession, dir: String): Unit =
    store(spark, dir).compactBucketed("postings", bucketCols, nBuckets)

  /** Doc-grain view of the postings (doc_id, dl — one row per indexed
    * doc): the stream twin's serve guard and exact-stats source. One
    * narrow column-pruned aggregation over the postings; a deployment
    * appending at high cadence would persist this as its own bucketed
    * table (the DedupIndexStore `sets` shape) — at the batch cadences
    * the twin targets, deriving it per batch is the simpler fixed point.
    */
  def indexedDocs(spark: SparkSession, dir: String): DataFrame =
    store(spark, dir).readBucketed("postings", bucketCols, nBuckets)
      .groupBy(col("doc_id")).agg(first(col("dl")).as("dl"))

  /** Rewrite `stats` as a pure DERIVATION of the current postings (the
    * merge/retract re-derivation as its own verb): overwriting with a
    * derived value is a FIXED POINT, so any torn state — e.g. a crash
    * between a posting append and its stats bump — heals on the next
    * call instead of freezing forever.
    */
  def healStats(spark: SparkSession, dir: String): Unit = {
    val m = indexedDocs(spark, dir)
      .agg(count(lit(1)).cast(LongType).as("n_docs"),
        sum(col("dl")).cast(LongType).as("sum_dl"))
      .collect()(0)
    import spark.implicits._
    store(spark, dir).overwrite("stats",
      Seq((m.getLong(0), m.getLong(1))).toDF("n_docs", "sum_dl"))
  }

  /** Append with derivation-consistent stats — the stream twin's absorb.
    * Posting rows append as in `append`, but `stats` re-derives from the
    * now-complete postings (`healStats`) instead of bumping the stored
    * row: the incremental bump is two unjournaled commits, fine for an
    * operator-driven CLI but wrong under replay (a crash between them
    * leaves stats stale, and the replay's fresh-filter would skip the
    * batch without ever fixing it — the heal is what makes the replayed
    * no-op converge).
    */
  def appendHealed(spark: SparkSession, dir: String, batch: DataFrame): Unit = {
    store(spark, dir).appendBucketed("postings", postings(batch),
      bucketCols, nBuckets)
    healStats(spark, dir)
  }

  /** Merge another BM25 index INTO this one — the distributed-build
    * path (shard corpora indexed independently, folded into one serving
    * index). Postings are doc-grain facts, so the merge is a union with
    * (term, doc_id) dedup; `stats` re-derives EXACTLY from the merged
    * postings (n_docs = distinct doc_ids, sum_dl = Σ per-doc dl — dl
    * rides on every posting row, and every doc has ≥ 1 row since even
    * an empty text tokenizes to one term), so overlapping shards cannot
    * double-count the way a naive stats-sum would. The re-derivation is
    * one extra aggregation riding the union exchange — merge is a
    * compaction-time op, not a serve-path one. One journaled group
    * commit; `src` read-only. QualitySpec pins merged == fresh build
    * over the union corpus, tables and search.
    */
  def merge(spark: SparkSession, dstDir: String, srcDir: String): Unit = {
    val d = store(spark, dstDir)
    val s = store(spark, srcDir)
    val merged = d.stageBucketed("postings",
      d.readBucketed("postings", bucketCols, nBuckets)
        .unionByName(s.readBucketed("postings", bucketCols, nBuckets))
        .dropDuplicates("term", "doc_id"),
      bucketCols, nBuckets)
    d.stage("stats", merged.groupBy(col("doc_id")).agg(first(col("dl")).as("dl"))
      .agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl")))
    d.commitStaged(Seq("postings", "stats"))
  }

  /** Forget documents — the takedown verb: postings are doc-grain, so
    * the retraction is an anti-join plus the merge's `stats`
    * re-derivation (n_docs/sum_dl over the remaining postings), which
    * also shifts every later query's idf/avgdl exactly as a fresh build
    * without the docs would (spec-pinned). Unknown ids are a no-op.
    * One journaled group commit.
    */
  def retract(spark: SparkSession, dir: String, ids: DataFrame): Unit = {
    val d = store(spark, dir)
    val kept = d.stageBucketed("postings",
      d.readBucketed("postings", bucketCols, nBuckets)
        .join(ids.select(col("doc_id")), Seq("doc_id"), "left_anti"),
      bucketCols, nBuckets)
    d.stage("stats", kept.groupBy(col("doc_id")).agg(first(col("dl")).as("dl"))
      .agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl")))
    d.commitStaged(Seq("postings", "stats"))
  }

  /** BM25 top-k from the stored index — identical op sequence to
    * TextQuality.bm25, so indexed == direct (QualitySpec pins it).
    * The postings scan carries the bucket layout (hashpartitioning on
    * term), so the df aggregate runs exchange-free; the term IN-filter
    * prunes buckets and row groups before any shuffle.
    */
  def search(spark: SparkSession, dir: String, terms: Seq[String], k: Int,
      requireAll: Boolean = false): DataFrame = {
    val st = store(spark, dir)
    val tf = st.readBucketed("postings", bucketCols, nBuckets)
      .filter(col("term").isin(terms: _*))
    TextQuality.bm25Rank(tf, st.read("stats"), k,
      if (requireAll) Some(terms.size) else None)
  }

  // Build-once-per-corpus scratch artifact for the registered query
  // (the VectorIndexStore.ensure* pattern): keyed by corpus dir +
  // parquet mtime so a regenerated corpus rebuilds.
  private val cacheRoot =
    sys.env.getOrElse("SPARK_GRAFT_INDEX_DIR", "target/graft-index")
  private val ensureLock = new Object

  /** Stored-index path for a corpus dir, building it on first use.
    * "textb": layout version — postings now bucket-encoded; a key bump
    * orphans (never corrupts) old plain-parquet caches.
    */
  def ensure(corpusDir: String, docs: DataFrame): String = {
    val mtime = new java.io.File(corpusDir, "documents.parquet").lastModified
    val path = s"$cacheRoot/textb_" +
      corpusDir.replaceAll("[^A-Za-z0-9.]", "_") + "_" + mtime
    ensureLock.synchronized {
      if (!store(docs.sparkSession, path).exists("stats"))
        write(path, docs)
    }
    path
  }

  /** Merged index for a corpus dir — shards build independently, fold
    * via `merge` (the DedupIndexStore.ensureMerged protocol): cached per
    * (dir, mtime, shard count), completion gated by a `merged_ok`
    * marker committed LAST so a crash mid-protocol re-runs instead of
    * serving a partial fold.
    */
  def ensureMerged(corpusDir: String, shards: Seq[DataFrame]): String = {
    require(shards.nonEmpty, "need at least one shard")
    val spark = shards.head.sparkSession
    val mtime = new java.io.File(corpusDir, "documents.parquet").lastModified
    val path = s"$cacheRoot/textm_${shards.size}_" +
      corpusDir.replaceAll("[^A-Za-z0-9.]", "_") + "_" + mtime
    ensureLock.synchronized {
      val st = store(spark, path)
      if (!st.exists("merged_ok")) {
        write(path, shards.head)
        shards.tail.zipWithIndex.foreach { case (sh, i) =>
          write(s"$path-shard${i + 1}", sh)
          merge(spark, path, s"$path-shard${i + 1}")
          // transient shard build — folded, deletable (see DedupIndexStore)
          graft.etl.ParquetTableStore.deleteStoreDir(s"$path-shard${i + 1}")
        }
        import spark.implicits._
        st.stage("merged_ok", Seq(1).toDF("ok"))
        st.commitStaged(Seq("merged_ok"))
      }
    }
    path
  }
}
