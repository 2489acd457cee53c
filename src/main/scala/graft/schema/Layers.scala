package graft.schema

import org.apache.spark.sql.types._

/** Layer schemas — explicit StructTypes, never inferred (SURVEY §1.2).
  *
  * Raw: schema-on-read (payload is a dynamic map), ref configs/schema.sql:11-16.
  * Staging: fixed 48-column wide table, ref configs/schema.sql:53-97 +
  * alembic 0d732ee101a9:21-23; typed per the reference's Pydantic model
  * (src/models.py:8-66).
  * Audit: append-only CDC log, ref alembic e7f1a2b3c4d5:24-38.
  */
object Layers {

  val payloadType: MapType = MapType(StringType, StringType, valueContainsNull = true)

  /** Money type: Postgres NUMERIC is unbounded; (38,10) covers observed
    * magnitudes with kopeck precision (SURVEY §1.2).
    */
  val money: DecimalType = DecimalType(38, 10)

  val raw: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("source", StringType, nullable = false),
    StructField("payload", payloadType, nullable = false),
    StructField("payload_json", StringType, nullable = false), // canonical form, hash input
    StructField("payload_hash", StringType, nullable = false),
    StructField("sheet_row_number", IntegerType, nullable = true),
    StructField("extracted_at", TimestampType, nullable = false),
    StructField("last_seen", TimestampType, nullable = true)))

  /** The 48 staging columns, in the reference's upsert field order
    * (src/transform.py:243-291) with identity first.
    */
  val stagingStringCols: Seq[String] = Seq(
    "task", "type", "client", "vendor", "cashier", "service", "approver",
    "category", "currency", "subcategory", "description", "direct_indirect",
    "cat_new", "cat_final", "subcat_new", "subcat_final", "kategoriya",
    "podstatya", "statya", "vidy_raskhodov", "paket", "package_secondary",
    "updated_by")

  val stagingIntCols: Seq[String] = Seq("year", "month", "quarter", "count_vendor")

  val stagingDecimalCols: Seq[String] = Seq(
    "hours", "fx_rub", "fx_usd", "total_rub", "total_usd", "sum_total_rub",
    "total_in_currency", "rub_summa", "usd_summa")

  val stagingTimestampCols: Seq[String] = Seq(
    "date", "payment_date", "payment_date_orig", "created_at", "updated_at")

  val staging: StructType = StructType(
    Seq(
      StructField("raw_id", StringType, nullable = false),
      StructField("sheet_row_number", IntegerType, nullable = true),
      StructField("received_at", TimestampType, nullable = false),
      StructField("source_type", StringType, nullable = false)) ++
    stagingTimestampCols.map(StructField(_, TimestampType, nullable = true)) ++
    stagingStringCols.map(StructField(_, StringType, nullable = true)) ++
    stagingIntCols.map(StructField(_, IntegerType, nullable = true)) ++
    stagingDecimalCols.map(StructField(_, money, nullable = true)) ++
    Seq(
      StructField("payload_hash", StringType, nullable = false),
      StructField("raw_payload", payloadType, nullable = false)))

  val audit: StructType = StructType(Seq(
    StructField("record_id", StringType, nullable = false),
    StructField("field_name", StringType, nullable = false), // reference logs whole-payload diffs: 'payload'
    StructField("old_value", StringType, nullable = true),   // canonical JSON
    StructField("new_value", StringType, nullable = true),
    StructField("changed_at", TimestampType, nullable = false),
    StructField("changed_by", StringType, nullable = true)))
}
