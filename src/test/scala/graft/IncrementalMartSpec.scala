package graft

import org.apache.spark.sql.functions._

import graft.etl.{Normalize, StagingMerge}
import graft.marts.{IncrementalMart, Views}

/** Incremental mart maintenance == full recompute, on the real normalize
  * output with a real upsert batch (edits + inserts).
  */
class IncrementalMartSpec extends SparkTestBase {
  import spark.implicits._

  private def stagingOf(df: org.apache.spark.sql.DataFrame) =
    Normalize.toStaging(Normalize(df))

  test("applyDelta over an upsert batch equals full recompute") {
    val raw = graft.queries.EndToEndQueries.ordersAsRawProbe(spark, sfTiny)
    val staging = stagingOf(raw).cache()
    val mart0 = IncrementalMart.initialize(staging).cache()

    // baseline equals the view on the same snapshot
    val viaView0 = Views.financialsV(staging).drop("last_updated")
      .collect().map(_.toString).toSet
    assert(IncrementalMart.present(mart0).collect().map(_.toString).toSet == viaView0)

    // upsert batch: double the amount on ~1/7th of rows (edits) and remap
    // 1/11th of ids to new keys (inserts); newest received_at wins
    val edits = staging.filter($"raw_id".cast("long") % 7 === 0)
      .withColumn("total_rub", $"total_rub" * 2)
      .withColumn("received_at", $"received_at" + expr("interval 1 day"))
    val inserts = staging.filter($"raw_id".cast("long") % 11 === 0)
      .withColumn("raw_id", concat(lit("new_"), $"raw_id"))
      .withColumn("received_at", $"received_at" + expr("interval 1 day"))
    val batch = edits.unionByName(inserts)

    // the replaced old versions: existing rows whose key is in the batch
    val oldRows = staging.join(batch.select($"raw_id"), Seq("raw_id"), "left_semi")
    val merged = StagingMerge.merge(staging, batch).cache()

    val incremental = IncrementalMart.present(
      IncrementalMart.applyDelta(mart0, oldRows, batch))
      .collect().map(_.toString).toSet
    val full = IncrementalMart.present(IncrementalMart.initialize(merged))
      .collect().map(_.toString).toSet
    val viaView = Views.financialsV(merged).drop("last_updated")
      .collect().map(_.toString).toSet

    assert(incremental == full)
    assert(incremental == viaView)
    assert(incremental != viaView0) // the batch actually changed the mart

    // same delta machinery for the category mart (one-key abelian shape)
    val cat0 = IncrementalMart.initializeCategories(staging)
    val catIncr = IncrementalMart.presentCategories(
      IncrementalMart.applyCategoryDelta(cat0, oldRows, batch))
      .collect().map(_.toString).toSet
    val catView = Views.expensesByCategoryV(merged).drop("last_updated")
      .collect().map(_.toString).toSet
    assert(catIncr == catView)
  }
}
