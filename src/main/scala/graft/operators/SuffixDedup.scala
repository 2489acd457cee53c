package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Exact-substring duplication via DISTRIBUTED SUFFIX GROUPING — the
  * byte-exact, maximal-length alternative to the fixed-window span family
  * (d14/d16): for every token position, the length of the LONGEST
  * substring starting there that occurs at least twice in the corpus
  * (counting multiplicity, same-doc repeats included), capped at
  * `maxLen` tokens. Positions with `match_len >= minLen` are exactly the
  * duplicated-window start positions of the n = minLen window family —
  * plus the maximal lengths the windows can't see (SuffixSpec pins the
  * superset relation on a planted corpus).
  *
  * Algorithm (the suffix-array adjacency property, Lee et al. 2022,
  * "Deduplicating Training Data Makes Language Models Better", done
  * Spark-shaped): sort all suffixes (keyed by their first `maxLen`
  * tokens) globally; each suffix's best match in the whole corpus is one
  * of its two NEIGHBORS in sorted order, so one range-partitioned sort +
  * one linear within-partition scan computes every maximal match length
  * — no self-join, no n^2 pairs, no per-length re-aggregation.
  *
  * Scale shape: ONE full shuffle of the suffix-key table (the range
  * exchange), then narrow per-partition scans. The suffix table is
  * ~maxLen x the corpus in tokens — the inherent cost of sort-based
  * substring dedup (a suffix array pays the same asymptotics in
  * pointers); `maxLen` caps it and is the knob a deployment sizes.
  * Partition boundaries are patched with each partition's first/last
  * key (2 x numPartitions keys collected — KB), so the scan never needs
  * a cross-partition window. The boundary collect and the main scan
  * read ONE pinned RDD instance (the GlobalOrder.cumSumNarrow
  * zipWithIndex doctrine: repartitionByRange re-samples its range
  * boundaries per plan branch, so two independent branches could see
  * different partitions).
  *
  * Reference anchor: the reference dedups rows on exact content hash at
  * load (`main.py:142-163`); this is the same exact-identity doctrine
  * pushed below document grain, to substrings.
  */
object SuffixDedup {

  /** Longest common prefix, in tokens, of two token sequences. */
  private[operators] def lcp(a: IndexedSeq[String], b: IndexedSeq[String]): Int = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n && a(i) == b(i)) i += 1
    i
  }

  /** (doc_id, p, match_len) for every 1-based token position whose
    * maximal duplicated substring is at least `minLen` tokens long.
    */
  def maxMatchSpans(docs: DataFrame, minLen: Int, maxLen: Int): DataFrame = {
    require(minLen >= 1 && maxLen >= minLen, "need 1 <= minLen <= maxLen")
    val spark = docs.sparkSession
    val nPart = spark.sessionState.conf.numShufflePartitions
    val w = split(TextDedup.normalizeText(col("text")), " ")
    val prepared = Par.fan(docs)
      .select(col("doc_id"), w.as("w"))
      .select(col("doc_id"), posexplode(expr(
        s"transform(sequence(1, size(w)), p -> slice(w, p, $maxLen))")))
      .select(col("doc_id"), (col("pos") + 1).cast(LongType).as("p"),
        col("col").as("key"))
      .repartitionByRange(nPart, col("key"))
      .sortWithinPartitions(col("key"))
    val schema = prepared.schema
    val docIdx = schema.fieldIndex("doc_id")
    val pIdx = schema.fieldIndex("p")
    val keyIdx = schema.fieldIndex("key")
    // ONE RDD instance, cached: the boundary job and the scan job must
    // see identical partitions AND identical shuffle output
    val rdd = prepared.rdd
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def keyOf(r: Row): IndexedSeq[String] = r.getSeq[String](keyIdx).toIndexedSeq
    // first/last key of each non-empty partition — KB, driver-bounded
    val bounds = rdd.mapPartitionsWithIndex { (i, it) =>
      if (!it.hasNext) Iterator.empty
      else {
        val first = it.next(); var last = first
        while (it.hasNext) last = it.next()
        Iterator((i, keyOf(first), keyOf(last)))
      }
    }.collect().sortBy(_._1)
    // partition i's virtual neighbors: last key of the previous non-empty
    // partition, first key of the next non-empty partition
    val lastOfPrev = Array.ofDim[IndexedSeq[String]](nPart)
    val firstOfNext = Array.ofDim[IndexedSeq[String]](nPart)
    locally {
      var prevLast: IndexedSeq[String] = null
      var bi = 0
      var pi = 0
      while (pi < nPart) {
        lastOfPrev(pi) = prevLast
        if (bi < bounds.length && bounds(bi)._1 == pi) { prevLast = bounds(bi)._3; bi += 1 }
        pi += 1
      }
      var nextFirst: IndexedSeq[String] = null
      bi = bounds.length - 1
      pi = nPart - 1
      while (pi >= 0) {
        firstOfNext(pi) = nextFirst
        if (bi >= 0 && bounds(bi)._1 == pi) { nextFirst = bounds(bi)._2; bi -= 1 }
        pi -= 1
      }
    }
    val bcPrev = spark.sparkContext.broadcast(lastOfPrev)
    val bcNext = spark.sparkContext.broadcast(firstOfNext)
    val out = rdd.mapPartitionsWithIndex { (i, it) =>
      val withKeys = it.map(r => (r, keyOf(r))).buffered
      val tailKey = bcNext.value(i)
      var prevKey = bcPrev.value(i)
      new Iterator[Row] {
        private var ready: Row = null
        private def advance(): Unit = {
          while (ready == null && withKeys.hasNext) {
            val (r, k) = withKeys.next()
            val nk = if (withKeys.hasNext) withKeys.head._2 else tailKey
            val m = math.max(
              if (prevKey == null) 0 else lcp(k, prevKey),
              if (nk == null) 0 else lcp(k, nk))
            prevKey = k
            if (m >= minLen)
              ready = Row(r.getLong(docIdx), r.getLong(pIdx), m.toLong)
          }
        }
        override def hasNext: Boolean = { advance(); ready != null }
        override def next(): Row = { advance(); val r = ready; ready = null; r }
      }
    }
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("p", LongType),
      StructField("match_len", LongType)))
    spark.createDataFrame(out, outSchema)
  }
}
