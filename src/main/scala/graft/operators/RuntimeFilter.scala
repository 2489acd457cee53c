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
      dimKey: String, expectedKeys: Long = 1000000L, fpp: Double = 0.01): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
    import org.apache.spark.sql.graftbridge.Bridge
    val bf: BloomFilter = dim.select(col(dimKey).cast("long").as(dimKey))
      .stat.bloomFilter(dimKey, expectedKeys, fpp)
    val bytes = {
      val out = new java.io.ByteArrayOutputStream()
      bf.writeTo(out)
      out.toByteArray
    }
    fact.filter(Bridge.column(BloomFilterMightContain(
      Bridge.expression(lit(bytes)),
      Bridge.expression(col(factKey).cast("long")))))
  }
}
