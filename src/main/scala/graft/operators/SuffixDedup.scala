package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.TextSketches

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
  * The scan runs over INTERNAL rows (Bridge.toInternalRdd): the external
  * `df.rdd` path decoded every token of every suffix key to a
  * java.lang.String and copied every key into a Seq — measured as the
  * dominant cost of the d25 family. LCP compares UTF8Strings (one byte
  * compare per token), and suffix keys come from one native eval per doc
  * (TextSketches.suffixWindows) instead of an interpreted slice lambda
  * per position.
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

  /** LCP over internal array data (UTF8String byte equality). */
  private[operators] def lcpData(a: ArrayData, b: ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var i = 0
    while (i < n && a.getUTF8String(i).equals(b.getUTF8String(i))) i += 1
    i
  }

  /** LCP of internal array data against a collected boundary key. */
  private[operators] def lcpBoundary(a: ArrayData, b: Array[UTF8String]): Int = {
    val n = math.min(a.numElements(), b.length)
    var i = 0
    while (i < n && a.getUTF8String(i).equals(b(i))) i += 1
    i
  }

  private def keyToArray(a: ArrayData): Array[UTF8String] = {
    val out = new Array[UTF8String](a.numElements())
    var i = 0
    while (i < out.length) { out(i) = a.getUTF8String(i).clone(); i += 1 }
    out
  }

  /** (doc_id, p, match_len) for every 1-based token position whose
    * maximal duplicated substring is at least `minLen` tokens long.
    */
  def maxMatchSpans(docs: DataFrame, minLen: Int, maxLen: Int): DataFrame = {
    require(minLen >= 1 && maxLen >= minLen, "need 1 <= minLen <= maxLen")
    val spark = docs.sparkSession
    val nPart = spark.sessionState.conf.numShufflePartitions
    val prepared = Par.fan(docs)
      .select(col("doc_id"), posexplode(
        TextSketches.suffixWindows(TextDedup.normalizeText(col("text")), maxLen)))
      .select(col("doc_id"), (col("pos") + 1).cast(LongType).as("p"),
        col("col").as("key"))
      .repartitionByRange(nPart, col("key"))
      .sortWithinPartitions(col("key"))
    val schema = prepared.schema
    val docIdx = schema.fieldIndex("doc_id")
    val pIdx = schema.fieldIndex("p")
    val keyIdx = schema.fieldIndex("key")
    // ONE RDD instance, cached: the boundary job and the scan job must
    // see identical partitions AND identical shuffle output. Internal
    // rows are copied out of the sorter's reused buffer before caching.
    val rdd = Bridge.toInternalRdd(prepared)
      .mapPartitions(_.map(_.copy()), preservesPartitioning = true)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // first/last key of each non-empty partition — KB, driver-bounded
    // (keys cloned to heap UTF8Strings so they survive the collect)
    val bounds = rdd.mapPartitionsWithIndex { (i, it) =>
      if (!it.hasNext) Iterator.empty
      else {
        val first = it.next(); var last = first
        while (it.hasNext) last = it.next()
        Iterator((i, keyToArray(first.getArray(keyIdx)),
          keyToArray(last.getArray(keyIdx))))
      }
    }.collect().sortBy(_._1)
    // partition i's virtual neighbors: last key of the previous non-empty
    // partition, first key of the next non-empty partition
    val lastOfPrev = Array.ofDim[Array[UTF8String]](nPart)
    val firstOfNext = Array.ofDim[Array[UTF8String]](nPart)
    locally {
      var prevLast: Array[UTF8String] = null
      var bi = 0
      var pi = 0
      while (pi < nPart) {
        lastOfPrev(pi) = prevLast
        if (bi < bounds.length && bounds(bi)._1 == pi) { prevLast = bounds(bi)._3; bi += 1 }
        pi += 1
      }
      var nextFirst: Array[UTF8String] = null
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
      // NB: named `in`, not `buffered` — inside the anonymous Iterator
      // subclass below, a local called `buffered` would be shadowed by
      // the INHERITED Iterator.buffered method (self-wrapping recursion)
      val in = it.buffered
      val tailKey = bcNext.value(i)
      var prevKey: ArrayData = null
      var prevBoundary = bcPrev.value(i)
      new Iterator[InternalRow] {
        private var ready: InternalRow = null
        private def advance(): Unit = {
          while (ready == null && in.hasNext) {
            val r = in.next()
            val k = r.getArray(keyIdx)
            val mPrev =
              if (prevKey != null) lcpData(k, prevKey)
              else if (prevBoundary != null) lcpBoundary(k, prevBoundary)
              else 0
            val mNext =
              if (in.hasNext) lcpData(k, in.head.getArray(keyIdx))
              else if (tailKey != null) lcpBoundary(k, tailKey)
              else 0
            prevKey = k; prevBoundary = null
            val m = math.max(mPrev, mNext)
            if (m >= minLen)
              ready = new GenericInternalRow(Array[Any](
                r.getLong(docIdx), r.getLong(pIdx), m.toLong))
          }
        }
        override def hasNext: Boolean = { advance(); ready != null }
        override def next(): InternalRow = { advance(); val r = ready; ready = null; r }
      }
    }
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("p", LongType),
      StructField("match_len", LongType)))
    Bridge.internalCreateDataFrame(spark, out, outSchema)
  }
}
