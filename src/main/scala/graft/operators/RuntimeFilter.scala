package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter runtime pruning for selective joins (the engine-side
  * flavor of Spark's `runtimeFilter.bloomFilter` rewrite, made explicit
  * so the pipeline can apply it where the optimizer's heuristics won't).
  *
  * Shape: the dim side's join keys are folded into a Bloom filter
  * (driver-held, KB–MB for millions of keys — `bloomFilter` aggregates
  * partial sketches, it never collects keys), the filter is broadcast,
  * and the fact side is pruned BEFORE its shuffle. At 100 TB the win is
  * the shuffle itself: a 1% -selective dim turns the fact exchange from
  * table-sized to result-sized for the price of one broadcast bitmap.
  * False positives only cost work (the join still discards them), never
  * correctness — j8's oracle is the plain join.
  *
  * The probe is Catalyst's own `BloomFilterMightContain` (the expression
  * Spark's injected runtime filters plan), reached through the graftbridge
  * shim: the serialized filter rides as a Literal and the probe stays
  * inside whole-stage codegen — no UDF boundary, no object
  * serialization per row.
  */
object RuntimeFilter {

  /** Prune `fact` to rows whose long-typed `factKey` might appear among
    * `dim`'s `dimKey` values. Null keys are dropped (an equi-join never
    * matches them — and BloomFilterMightContain is null-propagating, so a
    * null probe yields null which filter() drops).
    */
  def bloomPruneLong(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, expectedKeys: Long = 1000000L, fpp: Double = 0.01): DataFrame =
    fact.filter(mightContain(
      bloomBytes(dim.select(col(dimKey).cast("long").as(dimKey)), dimKey,
        expectedKeys, fpp),
      col(factKey).cast("long")))

  /** Serialized Bloom filter over a long-typed key column — built by
    * Spark's distributed partial-sketch aggregation (`stat.bloomFilter`
    * merges per-partition filters; keys are never collected).
    *
    * An EMPTY key set is legitimate (a serve wave whose batch produced
    * zero candidates) and must yield the always-false filter — but
    * `stat.bloomFilter` NPEs there (its aggregate returns a null
    * buffer), so it is guarded by a limit-1 emptiness probe. The probe
    * is a metadata-cheap job over the (batch-shaped, usually pinned)
    * key side, and the empty filter is 1-key-sized, not
    * expectedKeys-sized.
    */
  def bloomBytes(keys: DataFrame, keyCol: String,
      expectedKeys: Long, fpp: Double): Array[Byte] = {
    val bf: BloomFilter =
      if (keys.isEmpty) BloomFilter.create(1L, fpp)
      else keys.stat.bloomFilter(keyCol, expectedKeys, fpp)
    val out = new java.io.ByteArrayOutputStream()
    bf.writeTo(out)
    out.toByteArray
  }

  /** Codegen-native probe: Catalyst's `BloomFilterMightContain` over a
    * long-typed probe expression, the filter riding as a Literal.
    * Null-propagating: a null probe yields null.
    */
  def mightContain(bloom: Array[Byte], probe: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(BloomFilterMightContain(
      Bridge.expression(lit(bloom)),
      Bridge.expression(probe)))
  }
}
