package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** J1 — the reference's core CDC operator (src/transform.py:200-234):
  * rows whose content hash is not yet in staging are the change feed.
  *
  * Scale notes: an anti-join on the hash column only needs staging's
  * payload_hash (column-pruned at scan). At 100 TB the staging hash set is
  * still orders of magnitude smaller than raw payloads; AQE promotes to
  * broadcast when it fits, otherwise a shuffled hash anti-join with both
  * sides pruned to one column.
  */
object ChangeScan {

  /** New/changed raw rows: raw ⟕̸ staging on payload_hash. */
  def apply(raw: DataFrame, staging: DataFrame, source: Option[String] = None): DataFrame = {
    val filtered = source.fold(raw)(s => raw.filter(col("source") === s))
    val hashes = staging.select(col("payload_hash")).distinct()
    filtered.join(hashes, Seq("payload_hash"), "left_anti")
  }

  /** Test-mode variant (ref src/transform.py:208-211; main.py:44):
    * deterministic order + LIMIT. Only used when row order is observable —
    * a global sort at 100 TB is exactly what the unordered default avoids.
    */
  def ordered(changes: DataFrame, limit: Option[Int]): DataFrame = {
    val sorted = changes.orderBy(col("extracted_at"), col("id"))
    limit.fold(sorted)(sorted.limit)
  }
}
