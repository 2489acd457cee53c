package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Frequent-items (heavy hitters) via a Misra–Gries summary: the top-k
  * path that never shuffles the full key domain.
  *
  * `t5_vocab_topk` is the exact formulation — groupBy(token) moves every
  * distinct token through the exchange, fine while the vocabulary is
  * small, table-sized for URLs / n-grams / user ids at 100 TB. Here each
  * partition folds its tokens into a `capacity`-entry Misra–Gries buffer
  * (mergeable summaries, Agarwal et al.), the partial buffers merge to
  * ONE candidate list on the driver (KB), and a second pass counts JUST
  * the candidates exactly — the shuffle carries ≤ capacity keys.
  *
  * Guarantee: any token with true count > N/(capacity+1) survives the
  * sketch. Choose capacity so the k-th most frequent item clears that
  * bar and the re-counted top-k is EXACTLY the true top-k — which makes
  * this one of the approximate operators deterministic enough to
  * hash-check against the exact DuckDB oracle (the sq1/ann6 pattern).
  */
object HeavyHitters {

  private def mgSketch(c: Column, capacity: Int): Column =
    Bridge.column(MisraGriesAgg(Bridge.expression(c.cast(StringType)), capacity)
      .toAggregateExpression())

  /** Exact top-k of `tokenCol` in `tokens`, computed sketch-first. The
    * candidate recount uses `isin` over the ≤ capacity survivors (InSet,
    * O(1) per row), so the groupBy exchange is candidate-bounded.
    */
  def topK(tokens: DataFrame, tokenCol: String, k: Int, capacity: Int): DataFrame = {
    val cands = tokens.agg(mgSketch(col(tokenCol), capacity).as("c"))
      .head().getAs[scala.collection.Seq[String]]("c").toSeq
    tokens.filter(col(tokenCol).isin(cands: _*))
      .groupBy(col(tokenCol)).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col(tokenCol)).limit(k)
  }
}

/** Typed-buffer Misra–Gries aggregate. Buffer: token → residual count,
  * at most `capacity` entries. update: classic MG (decrement-all on
  * overflow); merge: sum counts, then subtract the (capacity+1)-th
  * largest and drop non-positives (the mergeable-summaries rule — error
  * adds, the > N/(capacity+1) survival bound is preserved). eval returns
  * the candidate tokens sorted by (residual desc, token) — the residuals
  * depend on merge order, the survivor SET's guarantee does not, and
  * callers re-count exactly anyway.
  */
case class MisraGriesAgg(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate[java.util.HashMap[String, Long]]
  with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): java.util.HashMap[String, Long] =
    new java.util.HashMap[String, Long]()

  override def update(
      buf: java.util.HashMap[String, Long], input: InternalRow): java.util.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val key = v.asInstanceOf[UTF8String].toString
    val cur = buf.get(key)
    if (cur != 0L || buf.containsKey(key)) buf.put(key, cur + 1)
    else if (buf.size < capacity) buf.put(key, 1L)
    else {
      // decrement-all: the unmatched arrival cancels one occurrence of
      // every tracked token (amortized O(1) per input)
      val it = buf.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue <= 1L) it.remove() else e.setValue(e.getValue - 1)
      }
    }
    buf
  }

  override def merge(
      a: java.util.HashMap[String, Long], b: java.util.HashMap[String, Long]): java.util.HashMap[String, Long] = {
    val bi = b.entrySet().iterator()
    while (bi.hasNext) {
      val e = bi.next()
      val cur = a.get(e.getKey)
      a.put(e.getKey, cur + e.getValue)
    }
    if (a.size > capacity) {
      // subtract the (capacity+1)-th largest count, drop what hits zero
      val counts = new Array[Long](a.size)
      var i = 0
      val vi = a.values().iterator()
      while (vi.hasNext) { counts(i) = vi.next(); i += 1 }
      java.util.Arrays.sort(counts)
      val d = counts(a.size - capacity - 1)
      val ai = a.entrySet().iterator()
      while (ai.hasNext) {
        val e = ai.next()
        if (e.getValue <= d) ai.remove() else e.setValue(e.getValue - d)
      }
    }
    a
  }

  override def eval(buf: java.util.HashMap[String, Long]): Any = {
    import scala.jdk.CollectionConverters._
    val sorted = buf.asScala.toSeq.sortBy { case (t, n) => (-n, t) }
    new GenericArrayData(sorted.map(e => UTF8String.fromString(e._1): Any))
  }

  override def serialize(buf: java.util.HashMap[String, Long]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      out.writeUTF(e.getKey)
      out.writeLong(e.getValue)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[String, Long] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val m = new java.util.HashMap[String, Long](n * 2)
    var i = 0
    while (i < n) { m.put(in.readUTF(), in.readLong()); i += 1 }
    m
  }

  override def withNewMutableAggBufferOffset(offset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): MisraGriesAgg =
    copy(child = newChild)
}
