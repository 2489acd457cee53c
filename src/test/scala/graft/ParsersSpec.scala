package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column

import graft.functions.Parsers

/** Ports of the reference's parser unit suite (tests/test_transform.py in
  * the reference repo) — every assert is a Column-expression expectation.
  * Golden hashes computed with CPython json.dumps/hashlib (parity spec).
  */
class ParsersSpec extends SparkTestBase {
  import spark.implicits._

  private def evalStr(in: String, f: Column => Column): Option[String] = {
    val r = Seq(Option(in)).toDF("v").select(f($"v").cast("string").as("r")).head()
    Option(r.getString(0))
  }

  // ── F4 decimal coercion (ref tests/test_transform.py:76-96) ──
  val decimalCases: Seq[(String, Option[String])] = Seq(
    "1 234,56" -> Some("1234.56"),
    "195103,50" -> Some("195103.5"),
    "195103.50" -> Some("195103.5"),
    "1,234.56" -> Some("1234.56"),
    "₽ 1 234,56" -> Some("1234.56"),
    "$1,234.56" -> Some("1234.56"),
    "(100)" -> Some("-100"),
    "($1,234.56)" -> Some("-1234.56"),
    "1.234.567,89" -> Some("1234567.89"),
    "50000,00" -> Some("50000"),
    "8.5" -> Some("8.5"),
    "" -> None,
    "garbage" -> None,
    (null: String) -> None)

  test("toDecimal matches the reference separator/currency/paren semantics") {
    decimalCases.foreach { case (in, want) =>
      val got = evalStr(in, Parsers.toDecimal)
        .map(s => BigDecimal(s).bigDecimal.stripTrailingZeros.toPlainString)
      assert(got == want, s"toDecimal($in) = $got, want $want")
    }
  }

  test("native ParseMoney and the Column formulation agree") {
    decimalCases.foreach { case (in, want) =>
      val native = evalStr(in, Parsers.toDecimal)
      val columns = evalStr(in, Parsers.toDecimalColumns)
      assert(native == columns, s"disagreement on '$in': $native vs $columns")
    }
  }

  // ── F5 int coercion (ref tests/test_transform.py:98-107) ──
  test("toInt truncates toward zero; European '1,234' reads as 1") {
    assert(evalStr("42", Parsers.toInt) == Some("42"))
    assert(evalStr("8.9", Parsers.toInt) == Some("8"))
    assert(evalStr("1,234", Parsers.toInt) == Some("1")) // documented quirk
    assert(evalStr("(5)", Parsers.toInt) == Some("-5"))
    assert(evalStr("", Parsers.toInt) == None)
    assert(evalStr("x", Parsers.toInt) == None)
  }

  // ── F1 date parsing (ref tests/test_transform.py:52-74) ──
  test("toTimestamptz parses the reference's format list, first match wins") {
    val cases = Seq(
      "2023-07-20T00:00:00Z" -> Some("2023-07-20 00:00:00"),
      "2023-07-20T10:30:00+05:00" -> Some("2023-07-20 05:30:00"), // aware → UTC
      "16.07.2023" -> Some("2023-07-16 00:00:00"),
      "20.12.2023 10:00:00" -> Some("2023-12-20 10:00:00"),
      "2023-09-15" -> Some("2023-09-15 00:00:00"),
      "2023-4-5" -> Some("2023-04-05 00:00:00"), // non-padded ISO (strptime %Y-%m-%d)
      "20230405" -> Some("2023-04-05 00:00:00"), // compact ISO (dateutil isoparse)
      "03/04/2023" -> Some("2023-03-04 00:00:00"), // M/d/yyyy first
      "16/07/2023" -> Some("2023-07-16 00:00:00"), // falls through to d/M/yyyy
      "" -> None,
      "not a date" -> None)
    cases.foreach { case (in, want) =>
      val got = evalStr(in, c => date_format(Parsers.toTimestamptz(c), "yyyy-MM-dd HH:mm:ss"))
      assert(got == want, s"toTimestamptz($in) = $got, want $want")
    }
  }

  test("native ParseTimestamp and the Column formulation agree") {
    val inputs = Seq("2023-07-20T00:00:00Z", "2023-07-20T10:30:00+05:00",
      "16.07.2023", "20.12.2023 10:00:00", "2023-09-15", "03/04/2023",
      "16/07/2023", "31.02.2023", "02/29/2023", "13/13/2023", "", "junk",
      " 16.07.2023 ", "2023-07-20 10:30:00", "2023-4-5", "20230405")
    inputs.foreach { in =>
      val native = evalStr(in, Parsers.toTimestamptz)
      val columns = evalStr(in, Parsers.toTimestamptzColumns)
      assert(native == columns, s"disagreement on '$in': $native vs $columns")
    }
  }

  // ── F6 canonical JSON + MD5 (golden parity with CPython json.dumps) ──
  test("payloadHash is byte-parity with python json.dumps(sort_keys) md5") {
    val p1 = Map(
      "Date" -> "16.07.2023", "Client" -> "АО \"Первая компания\"", "Type" -> "Расход",
      "Category" -> "Сопровождение", "Vendor" -> "ООО \"Поставщик\"",
      "Total RUB" -> "195103.50", "Currency" -> "RUB",
      "Payment date" -> "2023-07-20T00:00:00Z")
    val p2 = Map(
      "Дата" -> "01.08.2023", "Клиент" -> "ИП Иванов", "Тип" -> "Доход",
      "Категория" -> "Продажи", "РУБ Сумма" -> "50000,00", "Валюта" -> "rub")
    val simple = Map("b" -> "2", "a" -> "1")
    val df = Seq(p1, p2, simple).toDF("payload")
      .select(Parsers.canonicalJson($"payload").as("canon"),
        Parsers.payloadHash($"payload").as("h"))
    val rows = df.collect()
    assert(rows(2).getString(0) == """{"a":"1","b":"2"}""")
    assert(rows(2).getString(1) == "8018d630c38e45a64531824279891103")
    assert(rows(0).getString(1) == "10f2ac1ba2fe4bd500a2efff2b2a9913")
    assert(rows(1).getString(1) == "d3df20ae6ab7b059bc5187abf3064873")
  }

  test("canonicalJson escapes control chars exactly like python json.dumps") {
    val p = Map("a\nb" -> "c\"d", "e" -> "f\u0001g", "я" -> "ü\\t")
    val df = Seq(p).toDF("payload")
      .select(Parsers.canonicalJson($"payload").as("canon"),
        Parsers.payloadHash($"payload").as("h"))
    val r = df.head()
    assert(r.getString(0) == "{\"a\\nb\":\"c\\\"d\",\"e\":\"f\\u0001g\",\"я\":\"ü\\\\t\"}")
    assert(r.getString(1) == "7a66008d1f9205c5182358e802e630b2") // CPython golden
  }

  test("rawPayloadHash is byte-parity with the STORED flavor (main.py:156-160)") {
    // md5(json.dumps(payload, sort_keys=True)) — default separators +
    // ensure_ascii; this is what raw.data.payload_hash actually holds
    val ru = Map("Тип" -> "Расход", "PK" -> "x1")
    val h = Seq(ru).toDF("payload")
      .select(Parsers.rawPayloadHash($"payload").as("h")).head().getString(0)
    assert(h == "e1ff6c93c761e3a5710045ebd76805ac")
  }

  test("payloadSha256 is byte-parity with DEFAULT json.dumps (ensure_ascii, spaced)") {
    // reference main.py:191-192: sha256(json.dumps(r, sort_keys=True)) —
    // ensure_ascii=True (\\uXXXX escapes) and ', '/': ' separators
    val ru = Map("Тип" -> "Расход", "PK" -> "x1")
    val esc = Map("b" -> "say \"hi\"\n", "a" -> "tab\there")
    val df = Seq(ru, esc).toDF("payload")
      .select(Parsers.payloadSha256($"payload").as("sha"))
    val shas = df.collect().map(_.getString(0))
    assert(shas(0) == "8910bd6bc7b390435465538b4d4154d6e9873c356ba8d8a6d0a7c09520288034")
    assert(shas(1) == "0406f959c860c5d9547ff8ded0dfe334309f5445c71e242c4a682bc200c43bca")
  }

  test("hash determinism: same payload same hash, different differ") {
    val df = Seq(Map("a" -> "1"), Map("a" -> "1"), Map("a" -> "2"))
      .toDF("payload").select(Parsers.payloadHash($"payload").as("h"))
    val hs = df.collect().map(_.getString(0))
    assert(hs(0) == hs(1) && hs(0) != hs(2))
  }

  // ── P1 key-variant projection (ref tests/test_transform.py:109-122) ──
  test("getVariant: exact first, then case/space-insensitive") {
    val payload = Map("Total RUB" -> "100", "клиент х" -> "c1")
    val df = Seq(payload).toDF("p")
      .select(
        Parsers.getVariant($"p", Parsers.normalizeKeys($"p"),
          Seq("total_rub", "Total RUB")).as("exact"),
        Parsers.getVariant($"p", Parsers.normalizeKeys($"p"),
          Seq("КЛИЕНТ Х")).as("insens"),
        Parsers.getVariant($"p", Parsers.normalizeKeys($"p"),
          Seq("missing")).as("none"))
    val r = df.head()
    assert(r.getString(0) == "100")
    assert(r.getString(1) == "c1")
    assert(r.isNullAt(2))
  }

  // ── F8 id pick / synth (ref main.py:179-212) ──
  test("pickOrSynthId picks pk/id/row_id/uuid case-insensitively, else synthesizes") {
    val withPk = Map("PK" -> "550e8400-e29b-41d4-a716-446655440000", "x" -> "1")
    val noId = Map("x" -> "1")
    val df = Seq((withPk, 2), (noId, 3)).toDF("p", "rownum")
      .select(Parsers.pickOrSynthId($"p", Parsers.normalizeKeys($"p"), $"rownum").as("id"))
    val ids = df.collect().map(_.getString(0))
    assert(ids(0) == "550e8400-e29b-41d4-a716-446655440000")
    // CPython golden: sha256(json.dumps({'x':'1'}, sort_keys=True))[:12]
    assert(ids(1) == "gsheet_auto_7b99b5db04d1_3")
  }
}
