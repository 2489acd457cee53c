package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.etl.{ChangeScan, Normalize, ParquetTableStore, RawLoader, StagingMerge}
import graft.marts.Views

/** End-to-end slice (SURVEY §7.2): the four FIXTURES.md payloads through
  * sheet-values ingest → raw → change scan → normalize → staging merge →
  * marts, plus incremental re-run semantics (CDC no-op, edit detection,
  * audit diff).
  */
class EtlPipelineSpec extends SparkTestBase {
  import spark.implicits._

  // FIXTURES.md §1 — the four payload archetypes as a sheet values matrix.
  private val headers = Seq("PK", "Date", "Client", "Type", "Category", "Vendor",
    "Total RUB", "Currency", "Payment date", "created_at", "updated_at", "updated_by")
  private val values: Seq[Seq[String]] = Seq(
    headers,
    Seq("r1", "16.07.2023", "АО \"Первая компания\"", "Расход", "Сопровождение",
      "ООО \"Поставщик\"", "195103.50", "RUB", "2023-07-20T00:00:00Z", "", "", ""),
    Seq("r2", "01.08.2023", "ИП Иванов", "Доход", "Продажи", "", "50000,00", "rub", "", "", "", ""),
    Seq("r3", "2023-09-15", "Test Client LLC", "Expense", "Marketing", "Vendor Inc",
      "$1,234.56", "", "", "", "", ""),
    Seq("550e8400-e29b-41d4-a716-446655440000", "20.12.2023", "", "", "", "",
      "100.00", "", "", "20.12.2023 10:00:00", "25.12.2023 15:30:00", "user@example.com"))

  private def ingest(): DataFrame = RawLoader.fromValues(spark, values)

  private def normalize(raw: DataFrame): DataFrame =
    Normalize(raw.select(
      $"id".as("raw_id"), $"sheet_row_number",
      $"extracted_at".as("received_at"), lit("live").as("source_type"), $"payload"))

  test("sheet ingest pads headers to 32 and values with empty strings") {
    val raw = ingest()
    assert(raw.count() == 4)
    val first = raw.select(map_keys($"payload")).head().getSeq[String](0)
    assert(first.size == 32 && first.contains("Column_32"))
    // short rows padded with ""
    val r2 = raw.filter($"id" === "r2").select($"payload".getItem("Vendor")).head()
    assert(r2.getString(0) == "")
  }

  test("normalize types the four archetypes per FIXTURES.md expectations") {
    val st = normalize(ingest()).cache()
    def one(id: String) = st.filter($"raw_id" === id)

    val p1 = one("r1").head()
    assert(p1.getAs[java.math.BigDecimal]("total_rub").doubleValue() == 195103.50)
    assert(p1.getAs[java.sql.Timestamp]("date").toString.startsWith("2023-07-16"))
    assert(p1.getAs[java.sql.Timestamp]("payment_date").toString.startsWith("2023-07-20"))
    assert(p1.getAs[String]("type") == "Расход")

    val p2 = one("r2").head()
    assert(p2.getAs[java.math.BigDecimal]("total_rub").doubleValue() == 50000.0)
    assert(p2.getAs[String]("client") == "ИП Иванов")

    val p3 = one("r3").head()
    assert(p3.getAs[java.math.BigDecimal]("total_rub").doubleValue() == 1234.56)

    val p4 = one("550e8400-e29b-41d4-a716-446655440000").head()
    assert(p4.getAs[java.sql.Timestamp]("created_at").toString.startsWith("2023-12-20 10:00:00"))
    assert(p4.getAs[java.sql.Timestamp]("updated_at").toString.startsWith("2023-12-25 15:30:00"))
    assert(p4.getAs[String]("updated_by") == "user@example.com")
  }

  test("validation_warnings flags financial rows with missing totals") {
    // strip Total RUB from r1 → financial row without total_rub
    val broken = values.map {
      case r if r.lift(0).contains("r1") => r.updated(6, "")
      case r => r
    }
    val st = normalize(RawLoader.fromValues(spark, broken))
    val w = st.filter($"raw_id" === "r1").select($"validation_warnings").head().getSeq[String](0)
    assert(w.contains("missing_total_rub"))
  }

  test("incremental CDC: second run is a no-op, an edit flows + audits") {
    val dir = Files.createTempDirectory("graft_store").toString
    val store = new ParquetTableStore(spark, dir)

    // run 1: full load
    val raw1 = ingest()
    store.overwrite("raw", raw1)
    store.overwrite("staging", Normalize.toStaging(normalize(store.read("raw"))))
    assert(store.read("staging").count() == 4)

    // run 2, no edits: change scan must be empty
    val rerun = ChangeScan(raw1, store.read("staging"))
    assert(rerun.count() == 0)

    // run 3: edit r2's amount → exactly one change; merge keeps 4 rows;
    // audit captures old/new payloads for r2
    val edited = values.map {
      case r if r.lift(0).contains("r2") => r.updated(6, "60000,00")
      case r => r
    }
    val raw2 = RawLoader.fromValues(spark, edited)
    val changed = ChangeScan(raw2, store.read("staging"))
    assert(changed.count() == 1)
    assert(changed.select($"id").head().getString(0) == "r2")

    val normChanged = Normalize.toStaging(normalize(changed))
    val existing = store.read("staging")
    val audit = StagingMerge.auditDiff(existing, normChanged)
    assert(audit.count() == 1)
    val arow = audit.head()
    assert(arow.getAs[String]("record_id") == "r2")
    assert(arow.getAs[String]("old_value").contains("50000,00"))
    assert(arow.getAs[String]("new_value").contains("60000,00"))
    // reference trigger semantics: COALESCE(NEW.updated_by, 'system').
    // r2's sheet cell is EMPTY STRING, which is not NULL — COALESCE passes
    // it through (reference staging stores '' too); the 'system' fallback
    // fires only for true NULLs. old/new are CANONICAL JSON — sorted keys,
    // byte-comparable to payload_json.
    assert(arow.getAs[String]("changed_by") == "")
    assert(arow.getAs[String]("new_value").startsWith("{\""))
    val nulled = StagingMerge.auditDiff(existing,
      normChanged.withColumn("updated_by", lit(null).cast("string")))
    assert(nulled.head().getAs[String]("changed_by") == "system")

    store.overwrite("staging", StagingMerge.merge(existing, normChanged))
    val merged = store.read("staging")
    assert(merged.count() == 4)
    val newTotal = merged.filter($"raw_id" === "r2")
      .select($"total_rub").head().getDecimal(0)
    assert(newTotal.doubleValue() == 60000.0)
  }

  test("field-grain audit diff: changed, added, and removed fields each surface") {
    import org.apache.spark.sql.functions.{md5, to_json, current_timestamp}
    def side(rows: Seq[(String, Map[String, String])]) =
      rows.toDF("raw_id", "raw_payload")
        .withColumn("payload_hash", md5(to_json($"raw_payload")))
        .withColumn("received_at", current_timestamp())
    // r1: amount changed, note removed, status added; r2: unchanged
    val existing = side(Seq(
      "r1" -> Map("amount" -> "100", "note" -> "old"),
      "r2" -> Map("amount" -> "5")))
    val updates = side(Seq(
      "r1" -> Map("amount" -> "200", "status" -> "paid"),
      "r2" -> Map("amount" -> "5")))
    val got = StagingMerge.auditDiffFields(existing, updates)
      .select($"record_id", $"field_name", $"old_value", $"new_value")
      .as[(String, String, Option[String], Option[String])].collect().toSet
    assert(got == Set(
      ("r1", "amount", Some("100"), Some("200")),
      ("r1", "note", Some("old"), None),
      ("r1", "status", None, Some("paid"))))
  }

  test("normalize is total under schema drift: unknown headers, missing variants") {
    // rows whose payloads carry none of the canonical variants (drifted /
    // autogenerated headers) must flow through typed as all-null with
    // validation warnings — never throw, never drop silently
    val drifted = Seq(
      (2, Map("Column_1" -> "x", "Column_2" -> "y")),          // autogen headers
      (3, Map("Totally New Field" -> "1", "Другое" -> "2")),   // unseen business names
      (4, Map[String, String]()))                              // empty payload
      .toDF("sheet_row_number", "payload")
      .selectExpr("cast(sheet_row_number as string) as raw_id", "sheet_row_number",
        "current_timestamp() as received_at", "'live' as source_type", "payload")
    val out = Normalize(drifted).cache()
    assert(out.count() == 3)
    assert(out.filter($"type".isNull && $"total_rub".isNull && $"date".isNull).count() == 3)
    // missing dates are flagged, and the raw payload is preserved verbatim
    assert(out.filter(array_contains($"validation_warnings", "missing_dates")).count() == 3)
    assert(out.filter($"raw_id" === "2").select(map_keys($"raw_payload"))
      .head().getSeq[String](0).toSet == Set("Column_1", "Column_2"))
  }

  test("marts: financials_v aggregates per FIXTURES.md §5") {
    val st = Normalize.toStaging(normalize(ingest()))
    val fin = Views.financialsV(st).collect()
    val jul = fin.find(r => r.getString(0) == "2023-07" && r.getString(1) == "Расход").get
    assert(jul.getLong(2) == 195104L) // ROUND(SUM(total_rub)) — half-up to whole rubles
    assert(jul.getLong(3) == 1L)
    val aug = fin.find(r => r.getString(0) == "2023-08" && r.getString(1) == "Доход").get
    assert(aug.getLong(2) == 50000L)
    // r3 "Expense": no payment_date → date used; r4 has no type → excluded
    assert(Views.expensesByCategoryV(st).count() == 2) // Сопровождение + Marketing
    assert(Views.dimClientsV(st).count() == 3)
    assert(Views.webTransactionsV(st).columns.length == 11)
  }
}
