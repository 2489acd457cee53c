package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.Parsers._
import graft.schema.Layers

/** Payload map → 48 typed staging columns. Distributed re-expression of the
  * reference's per-row normalize_record (src/transform.py:123-197): all 33
  * key-variant projections and coercions become one narrow, codegen'd
  * projection — no shuffle, no UDF, scales linearly with input.
  */
object Normalize {

  /** Key-variant tables, verbatim from the reference (src/transform.py:136-180). */
  val stringVariants: Map[String, Seq[String]] = Map(
    "task" -> Seq("Task", "Задача", "task"),
    "type" -> Seq("Type", "Тип", "type"),
    "client" -> Seq("Client", "Клиент", "client"),
    "vendor" -> Seq("Vendor", "Поставщик", "vendor"),
    "cashier" -> Seq("Cashier", "Кассир", "cashier"),
    "service" -> Seq("Service", "Услуга", "service"),
    "approver" -> Seq("Approver", "Утверждающий", "approver"),
    "category" -> Seq("Category", "Категория", "category"),
    "currency" -> Seq("Currency", "Валюта", "currency"),
    "subcategory" -> Seq("Subcategory", "Подкатегория", "subcategory"),
    "description" -> Seq("Description", "Описание", "description"),
    "direct_indirect" -> Seq("Direct/Indirect", "Прямые/Косвенные", "direct_indirect"),
    "cat_new" -> Seq("cat_new", "Категория новая"),
    "cat_final" -> Seq("cat_final", "Категория финал"),
    "subcat_new" -> Seq("subcat_new", "Подкатегория новая"),
    "subcat_final" -> Seq("subcat_final", "Подкатегория финал"),
    "kategoriya" -> Seq("kategoriya", "Категория"),
    "podstatya" -> Seq("podstatya", "Подстатья"),
    "statya" -> Seq("statya", "Статья"),
    "vidy_raskhodov" -> Seq("vidy_raskhodov", "Виды расходов"),
    "paket" -> Seq("paket", "Пакет", "package"),
    "package_secondary" -> Seq("package_secondary", "package secondary", "Пакет вторичный"),
    "updated_by" -> Seq("updated_by"))

  val timestampVariants: Map[String, Seq[String]] = Map(
    "date" -> Seq("Date", "Дата", "date"),
    "payment_date" -> Seq("Payment date", "Payment Date", "Дата платежа", "payment_date"),
    "payment_date_orig" -> Seq("Payment date (orig)", "Дата платежа (ориг)", "payment_date_orig"),
    "created_at" -> Seq("created_at"),
    "updated_at" -> Seq("updated_at"))

  val intVariants: Map[String, Seq[String]] = Map(
    "year" -> Seq("Year", "Год", "year"),
    "month" -> Seq("Month", "Месяц", "month"),
    "quarter" -> Seq("Quarter", "Квартал", "quarter"),
    "count_vendor" -> Seq("Count vendor", "Количество поставщиков", "count_vendor"))

  val decimalVariants: Map[String, Seq[String]] = Map(
    "hours" -> Seq("Hours", "Часы", "hours"),
    "fx_rub" -> Seq("FX RUB", "Курс РУБ", "fx_rub"),
    "fx_usd" -> Seq("FX USD", "Курс USD", "fx_usd"),
    "total_rub" -> Seq("Total RUB", "РУБ сумма", "total_rub", "rub_summa", "РУБ Сумма"),
    "total_usd" -> Seq("Total USD", "USD сумма", "total_usd", "usd_summa"),
    "sum_total_rub" -> Seq("sum Total RUB", "Сумма РУБ", "sum_total_rub"),
    "total_in_currency" -> Seq("Total in currency", "Сумма в валюте", "total_in_currency"),
    "rub_summa" -> Seq("rub_summa", "РУБ Сумма"),
    "usd_summa" -> Seq("usd_summa", "USD Сумма"))

  /** Financial-consistency types (ref src/transform.py:190, 129f09ac6c14:30). */
  val financialTypes: Seq[String] = Seq("Доход", "Расход", "Income", "Expense")

  /** Normalize a raw change-feed into the staging shape.
    *
    * Input columns: raw_id (string), sheet_row_number (int, nullable),
    * received_at (timestamp), source_type (string), payload
    * (map<string,string>). Output: Layers.staging columns +
    * `validation_warnings` array<string> (the quarantine signal — the
    * reference skips/warns per row, a Spark task is all-or-nothing so bad
    * rows carry their diagnosis instead; SURVEY §2.1 S6).
    *
    * Plan-size discipline: getVariant expands to ~2×|variants| element_at
    * calls over the normalized key map, so the normalized map is
    * materialized ONCE as a column (CollapseProject leaves it alone — it
    * is referenced ~100× with a non-cheap expression). The scalar
    * coercions are single-eval native expressions (ParseMoney /
    * ParseTimestamp), so the typed projection applies them directly to
    * the variant trees — two stages total, narrow and shuffle-free.
    */
  def apply(raw: DataFrame): DataFrame = {
    val p = col("payload")

    // stage 0: normalized-key lookup map, computed once per row
    val s0 = raw.withColumn("__norm", normalizeKeys(p))
    def v(variants: Seq[String]): Column = getVariant(p, col("__norm"), variants)

    // stage 1: variant resolution + typed coercion in one projection
    val projected = s0.select(
      Seq(
        col("raw_id").cast(StringType).as("raw_id"),
        col("sheet_row_number").cast(IntegerType).as("sheet_row_number"),
        col("received_at").cast(TimestampType).as("received_at"),
        coalesce(col("source_type"), lit("live")).as("source_type")) ++
      Layers.stagingTimestampCols.map(n => toTimestamptz(v(timestampVariants(n))).as(n)) ++
      Layers.stagingStringCols.map(n => v(stringVariants(n)).as(n)) ++
      Layers.stagingIntCols.map(n => toInt(v(intVariants(n))).as(n)) ++
      Layers.stagingDecimalCols.map(n => toDecimal(v(decimalVariants(n))).as(n)) ++
      Seq(
        // same flavor the raw layer stores (ref src/transform.py:219
        // carries raw.payload_hash through) — the anti-join compares these
        rawPayloadHash(p).as("payload_hash"),
        p.as("raw_payload")): _*)

    // P10 data-quality predicate (ref src/transform.py:190-195) as a column,
    // not a log line: financial row with missing total_rub.
    projected.withColumn("validation_warnings",
      filter(array(
        when(col("type").isin(financialTypes: _*) && col("total_rub").isNull,
          lit("missing_total_rub")),
        when(col("date").isNull && col("payment_date").isNull,
          lit("missing_dates"))),
        w => w.isNotNull))
  }

  /** Select back to the exact staging schema (drops diagnostics). */
  def toStaging(normalized: DataFrame): DataFrame =
    normalized.select(Layers.staging.fieldNames.map(col).toSeq: _*)
}
