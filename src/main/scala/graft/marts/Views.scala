package graft.marts

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.etl.Normalize.financialTypes
import graft.functions.Parsers.monthBucket

/** The six analytical views + legacy summary mart, re-expressed as
  * DataFrame transformations (reference alembic 129f09ac6c14:21-67 and
  * b80da1af78f7:22-63). Each is a pure function staging → mart; register
  * as temp views for ad-hoc SQL or materialize per run (SURVEY §3.3).
  *
  * Catalyst inlines these exactly like Postgres inlined the view SQL —
  * filters push to the staging scan, only referenced columns are read.
  */
object Views {

  /** financials_v (ref 129f09ac6c14:21-34): monthly P&L. */
  def financialsV(staging: DataFrame): DataFrame =
    staging
      .filter(col("type").isin(financialTypes: _*) &&
        coalesce(col("payment_date"), col("date")) >= lit("2005-01-01").cast(TimestampType))
      .groupBy(
        monthBucket(coalesce(col("payment_date"), col("date"))).as("year_month"),
        col("type"))
      .agg(
        round(sum(col("total_rub")), 0).cast(LongType).as("total_rub"),
        count(lit(1)).as("record_count"))
      .withColumn("last_updated", current_timestamp())
      .orderBy(col("year_month").desc, col("type"))

  /** expenses_by_category_v (ref 129f09ac6c14:37-48). */
  def expensesByCategoryV(staging: DataFrame): DataFrame =
    staging
      .filter(col("type").isin("Расход", "Expense"))
      .groupBy(coalesce(col("category"), lit("Uncategorized")).as("category"))
      .agg(
        round(sum(col("total_rub")), 0).cast(LongType).as("total_rub"),
        count(lit(1)).as("record_count"))
      .withColumn("last_updated", current_timestamp())
      .orderBy(col("total_rub").desc)

  /** web_transactions_v (ref 129f09ac6c14:51-67): the 11 business columns,
    * technical fields excluded.
    */
  def webTransactionsV(staging: DataFrame): DataFrame =
    staging.select("raw_id", "date", "payment_date", "type", "client", "vendor",
        "category", "total_rub", "currency", "description", "source_type")
      .orderBy(col("date").desc)

  /** Month partition value for the web mart's incremental layout; rows
    * with an unparseable date land in one well-known partition instead of
    * Hive's default-partition escape.
    */
  def webMonth(date: Column): Column =
    coalesce(date_format(date, "yyyy-MM"), lit("undated"))

  /** webTransactionsV + the month partition column, unordered — the
    * partitioned write path orders by the Hilbert cluster key instead.
    */
  def webTransactionsP(staging: DataFrame): DataFrame =
    staging.select(col("raw_id"), col("date"), col("payment_date"), col("type"),
      col("client"), col("vendor"), col("category"), col("total_rub"),
      col("currency"), col("description"), col("source_type"),
      webMonth(col("date")).as("month"))

  /** dim_clients_v (ref b80da1af78f7:22-43): explicit ref-source rows
    * (source_type='ref_clients', origin 'manual', updated_at=received_at)
    * UNION ALL implicit DISTINCT transaction clients (origin 'transaction',
    * updated_at NULL); DISTINCT ON (name) ... ORDER BY name, origin DESC.
    *
    * NB the reference's in-code comment says "manual preferred" but its SQL
    * orders origin DESC, where 'transaction' > 'manual' — so a name present
    * in both keeps the TRANSACTION row. We mirror the executed behavior,
    * with updated_at as a deterministic tie-break inside equal origins
    * (Postgres leaves that tie unspecified).
    */
  def dimClientsV(staging: DataFrame): DataFrame = {
    val explicit = staging
      .filter(col("source_type") === "ref_clients")
      .select(col("client").as("name"), col("received_at").as("updated_at"),
        lit("manual").as("origin"))
    val implicit_ = staging
      .filter(col("client").isNotNull && col("client") =!= "")
      .select(col("client").as("name"), lit(null).cast(TimestampType).as("updated_at"),
        lit("transaction").as("origin"))
      .distinct()
    val unioned = explicit.unionByName(implicit_)
    val w = Window.partitionBy(col("name"))
      .orderBy(col("origin").desc, col("updated_at").desc_nulls_last)
    unioned.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
      .orderBy(col("name"))
  }

  /** dim_categories_v (ref b80da1af78f7:46-53). */
  def dimCategoriesV(staging: DataFrame): DataFrame =
    staging
      .filter(col("category").isNotNull && col("category") =!= "")
      .select(coalesce(col("category"), lit("Uncategorized")).as("name"))
      .distinct()
      .orderBy(col("name"))

  /** dim_vendors_v (ref b80da1af78f7:55-63). */
  def dimVendorsV(staging: DataFrame): DataFrame =
    staging
      .filter(col("vendor").isNotNull && col("vendor") =!= "")
      .select(col("vendor").as("name"))
      .distinct()
      .orderBy(col("name"))

  /** marts.campaigns_summary (legacy, ref src/marts.py:15-42): full
    * recompute replaces the reference's row-wise upsert.
    */
  def campaignsSummary(campaigns: DataFrame): DataFrame =
    campaigns
      .groupBy(col("campaign_id"))
      .agg(
        sum(coalesce(col("impressions"), lit(0))).as("impressions"),
        sum(coalesce(col("clicks"), lit(0))).as("clicks"),
        sum(coalesce(col("cost"), lit(0.0))).as("cost"),
        current_timestamp().as("updated_at"))
}
