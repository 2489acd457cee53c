package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** S6/J3/J4 — last-writer-wins upsert into staging + audit diff, the
  * set-based re-expression of the reference's ON CONFLICT (raw_id) DO
  * UPDATE (src/transform.py:240-334) and its AFTER UPDATE audit trigger
  * (alembic 7a8b9c0d1e2f:21-46).
  *
  * Plain-Parquet strategy (no ACID table format in the image): compute the
  * merged snapshot and atomically swap directories (ParquetTableStore).
  * The audit diff is computed from the SAME (existing, updates) pair as the
  * merge — SURVEY §7.4 hard-item 3.
  */
object StagingMerge {

  /** Collapse an update batch to one row per key, newest received_at wins
    * (ties: higher payload_hash, then deterministic). The reference gets
    * this for free from sequential executemany order; a distributed batch
    * must make the winner explicit.
    */
  def dedupeBatch(updates: DataFrame, key: String = "raw_id"): DataFrame = {
    val w = Window.partitionBy(col(key))
      .orderBy(col("received_at").desc, col("payload_hash").desc)
    updates.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** New snapshot: updates win over existing rows with the same raw_id. */
  def merge(existing: DataFrame, updates: DataFrame, key: String = "raw_id"): DataFrame = {
    val u = dedupeBatch(updates, key)
    u.unionByName(
      existing.join(u.select(col(key)), Seq(key), "left_anti"))
  }

  /** Audit rows for keys whose content hash changed (J4): one append-only
    * record per change, old/new canonical payload JSON, like the
    * reference's trigger (field_name literally 'payload'). changed_by
    * records the new row's actor, COALESCE(NEW.updated_by, 'system') like
    * the reference trigger (7a8b9c0d1e2f:32); old/new values are CANONICAL
    * JSON (sorted keys, Python escaping) so they byte-match payload_json
    * and the hash input — to_json would give arbitrary key order.
    */
  /** Field-grain audit diff: one row per (key, field) whose value changed
    * between the old and new payload maps — the drill-down the
    * whole-payload rows of `auditDiff` can't answer directly (SURVEY
    * §2.10 notes explode(mapCol) covers this; the reference itself logs
    * whole payloads only, field_name literally 'payload'). Fields present
    * on one side only surface with a null on the other — adds and
    * removals are changes too. Narrow after the same raw_id join as
    * auditDiff: explode is per changed row, never corpus-wide.
    */
  def auditDiffFields(existing: DataFrame, updates: DataFrame): DataFrame = {
    val u = dedupeBatch(updates)
    val actor =
      if (u.columns.contains("updated_by")) coalesce(col("updated_by"), lit("system"))
      else lit("system")
    val oldS = existing.select(
      col("raw_id"), col("payload_hash").as("__oh"), col("raw_payload").as("__op"))
    val newS = u.select(
      col("raw_id"), col("payload_hash").as("__nh"), col("raw_payload").as("__np"),
      actor.as("changed_by"))
    oldS.join(newS, Seq("raw_id"))
      .filter(col("__oh") =!= col("__nh"))
      .select(col("raw_id"), col("__op"), col("__np"), col("changed_by"),
        explode(array_distinct(
          concat(map_keys(col("__op")), map_keys(col("__np"))))).as("field_name"))
      .withColumn("old_value", element_at(col("__op"), col("field_name")))
      .withColumn("new_value", element_at(col("__np"), col("field_name")))
      .filter(!(col("old_value") <=> col("new_value")))
      .select(col("raw_id").as("record_id"), col("field_name"),
        col("old_value"), col("new_value"),
        current_timestamp().as("changed_at"), col("changed_by"))
  }

  def auditDiff(existing: DataFrame, updates: DataFrame): DataFrame = {
    import graft.functions.Parsers.canonicalJson
    val u = dedupeBatch(updates)
    val actor =
      if (u.columns.contains("updated_by")) coalesce(col("updated_by"), lit("system"))
      else lit("system")
    val oldS = existing.select(
      col("raw_id"),
      col("payload_hash").as("__old_hash"),
      canonicalJson(col("raw_payload")).as("old_value"))
    val newS = u.select(
      col("raw_id"),
      col("payload_hash").as("__new_hash"),
      canonicalJson(col("raw_payload")).as("new_value"),
      actor.as("changed_by"))
    oldS.join(newS, Seq("raw_id"))
      .filter(col("__old_hash") =!= col("__new_hash"))
      .select(
        col("raw_id").as("record_id"),
        lit("payload").as("field_name"),
        col("old_value"),
        col("new_value"),
        current_timestamp().as("changed_at"),
        col("changed_by"))
  }
}
