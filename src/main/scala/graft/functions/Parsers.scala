package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Normalization scalar functions — the Spark re-expression of the
  * reference's row-at-a-time helpers (reference src/transform.py:18-117,
  * src/utils.py:14-19). Everything here is a pure Column expression
  * (whole-stage-codegen friendly); there are NO Scala UDFs on the hot path.
  *
  * Null contract (matches reference + spark.sql.ansi.enabled=false):
  * unparseable input → null, never an exception.
  */
object Parsers {

  // ───── F1: multi-format timestamp coercion (ref src/transform.py:18-40) ─────

  /** Parse a polyglot date string to UTC timestamp. Format priority mirrors
    * the reference exactly: ISO-8601 first (incl. trailing offset), then
    * d.M.yyyy H:m:s, d.M.yyyy, (yyyy-M-d handled by the ISO cast),
    * M/d/yyyy BEFORE d/M/yyyy — so "03/04/2023" reads as March 4 and
    * "16/07/2023" falls through to July 16, same first-match-wins quirk
    * (ref src/transform.py:28-39). Empty/blank/garbage → null.
    */
  def toTimestamptz(c: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(ParseTimestamp(Bridge.expression(c.cast(StringType))))
  }

  /** Column-expression formulation of toTimestamptz, kept as the semantic
    * cross-check for ParseTimestamp (ParsersSpec asserts both agree).
    */
  def toTimestamptzColumns(c: Column): Column = {
    val t = trim(nullIfBlank(c.cast(StringType)))
    // each format is gated by a shape regex: a plain coalesce of
    // to_timestamp attempts drives per-row exceptions for every
    // non-matching format (~3 µs each — the dominant cost of a wide
    // normalize). The guards preserve first-match-wins exactly; only
    // shape-matching-but-invalid dates (31.02.…) still hit the
    // exception path.
    // dotted dates are rewritten to ISO order and parsed by Spark's native
    // string→timestamp fast path (lenient on digit counts) instead of a
    // DateTimeFormatter — several× cheaper per row
    val dottedTime = regexp_replace(t,
      "^(\\d{1,2})\\.(\\d{1,2})\\.(\\d{4}) ", "$3-$2-$1 ")
    val dotted = regexp_replace(t,
      "^(\\d{1,2})\\.(\\d{1,2})\\.(\\d{4})$", "$3-$2-$1")
    when(t.rlike("^\\d{4}-"), to_timestamp(t))
      .when(t.rlike("^\\d{8}$"), to_timestamp(t, "yyyyMMdd"))
      .when(t.rlike("^\\d{1,2}\\.\\d{1,2}\\.\\d{4} "), to_timestamp(dottedTime))
      .when(t.rlike("^\\d{1,2}\\.\\d{1,2}\\.\\d{4}$"), to_timestamp(dotted))
      .when(t.rlike("^\\d{1,2}/\\d{1,2}/\\d{4}$"),
        coalesce(to_timestamp(t, "M/d/yyyy"), to_timestamp(t, "d/M/yyyy")))
      .otherwise(lit(null).cast(TimestampType))
  }

  // ───── F2: currency/whitespace scrub (ref src/transform.py:43-50) ─────

  /** True when the trimmed value is parenthesized, i.e. accounting-negative. */
  def isParenNegative(c: Column): Column = {
    val t = trim(c)
    t.startsWith("(") && t.endsWith(")") && length(t) >= 2
  }

  /** Strip parens (if negative), currency symbols $ € ₽, NBSP and spaces.
    * Returns the cleaned magnitude string (sign handled by caller).
    */
  def cleanNumericString(c: Column): Column = {
    val t = trim(c)
    val unwrapped = when(isParenNegative(c), trim(expr_substr(t))).otherwise(t)
    regexp_replace(unwrapped, "[$€₽  ]", "")
  }

  /** substring(t, 2, len-2) without a raw SQL string */
  private def expr_substr(t: Column): Column = t.substr(lit(2), length(t) - 2)

  // ───── F3: decimal/thousands separator disambiguation (ref :53-65) ─────

  /** Position of the last occurrence of `ch` in `s`, 0 when absent. */
  private def rpos(s: Column, ch: String): Column =
    when(instr(s, ch) > 0, length(s) - locate(ch, reverse(s)) + 1).otherwise(lit(0))

  /** Both separators present → the later one is the decimal point, the other
    * is stripped. Only ',' → decimal iff exactly one comma with ≤3 trailing
    * digits, else thousands separator. (ref src/transform.py:53-65)
    */
  def fixSeparators(s: Column): Column = {
    val lastDot = rpos(s, ".")
    val lastComma = rpos(s, ",")
    val both = instr(s, ",") > 0 && instr(s, ".") > 0
    val commaOnly = instr(s, ",") > 0 && instr(s, ".") === 0
    val parts = split(s, ",", -1)
    val commaIsDecimal = size(parts) === 2 && length(element_at(parts, 2)) <= 3
    when(both,
      when(lastDot > lastComma, regexp_replace(s, ",", ""))
        .otherwise(regexp_replace(regexp_replace(s, "\\.", ""), ",", ".")))
      .when(commaOnly,
        when(commaIsDecimal, regexp_replace(s, ",", "."))
          .otherwise(regexp_replace(s, ",", "")))
      .otherwise(s)
  }

  // ───── F4: decimal coercion (ref src/transform.py:68-86) ─────

  /** Polyglot money-string → DecimalType(38,10); null on garbage.
    * Handles "1 234,56", "$1,234.56", "₽ 1 234,56", "(100)" → -100.
    */
  def toDecimal(c: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(ParseMoney(Bridge.expression(c.cast(StringType))))
  }

  /** Column-expression formulation of toDecimal, kept as the semantic
    * cross-check for ParseMoney (ParsersSpec asserts both agree). Do NOT
    * use on wide projections: it re-evaluates its argument ~1300×/row.
    */
  def toDecimalColumns(c: Column): Column = {
    val s0 = nullIfBlank(c.cast(StringType))
    decimalOfCleaned(s0, fixSeparators(nullIfBlank(cleanNumericString(s0))))
  }

  /** Final decimal assembly from pre-staged parts: `nb` = nullIfBlank(raw),
    * `fixed` = fixSeparators(cleanNumericString(nb)). Split out so wide
    * normalizations (graft.etl.Normalize) can materialize `nb`/`fixed` as
    * intermediate columns — composing the helpers naively duplicates each
    * argument subtree ~15×, which multiplies into a Catalyst plan the
    * optimizer can't finish on a 48-column projection.
    */
  def decimalOfCleaned(nb: Column, fixed: Column): Column = {
    val mag = fixed.cast(DecimalType(38, 10)) // non-ANSI: garbage → null
    when(nb.isNull, lit(null).cast(DecimalType(38, 10)))
      .otherwise(when(isParenNegative(nb), -mag).otherwise(mag))
  }

  // ───── F5: int coercion (ref src/transform.py:89-105) ─────

  /** Decimal-parse then truncate toward zero (so "1,234" → 1.234 → 1, the
    * documented European-reading quirk); falls back to a plain trimmed int
    * cast. Null on garbage.
    */
  def toInt(c: Column): Column =
    coalesce(toDecimal(c).cast(IntegerType), trim(c.cast(StringType)).cast(IntegerType))

  // ───── F14: empty-string → null (ref src/models.py:61-66) ─────

  def nullIfBlank(c: Column): Column =
    when(trim(c) === "" || c.isNull, lit(null).cast(StringType)).otherwise(c.cast(StringType))

  // ───── F15: key normalization (ref src/transform.py:112-114) ─────

  /** k.lower().replace(" ", "") — literal spaces only, like the reference. */
  def normalizeKey(k: Column): Column = lower(regexp_replace(k, " ", ""))

  /** Re-key a map<string,string> with normalized keys; collisions keep the
    * last entry, same as the reference's dict comprehension. One native
    * eval per row (graft.functions.NormalizedKeyMap) — the
    * map_from_arrays/transform formulation interpreted a lambda per key.
    */
  def normalizeKeys(m: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(NormalizedKeyMap(Bridge.expression(m)))
  }

  // ───── P1: key-variant projection (ref src/transform.py:108-117) ─────

  /** Exact-match any variant in order, then case/space-insensitive match in
    * order. `normMap` should be normalizeKeys(payload) computed once per row.
    */
  def getVariant(payload: Column, normMap: Column, variants: Seq[String]): Column =
    coalesce(
      (variants.map(v => element_at(payload, lit(v))) ++
        variants.map(v =>
          element_at(normMap, lit(v.toLowerCase(java.util.Locale.ROOT).replace(" ", ""))))): _*)

  // ───── F6: canonical JSON + MD5 payload hash (ref src/utils.py:14-19) ─────

  /** Deterministic canonical JSON of a map<string,string>: keys sorted by
    * Unicode code point, compact separators, Python json.dumps escaping,
    * non-ASCII kept raw — byte-parity with the reference's
    * json.dumps(sort_keys=True, ensure_ascii=False, separators=(",",":"))
    * (golden hashes pinned in ParsersSpec; exact contract implemented by
    * graft.functions.CanonicalJson, one eval per row).
    */
  def canonicalJson(m: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(CanonicalJson(Bridge.expression(m)))
  }

  /** MD5 over the compact canonical JSON — the reference's
    * utils.payload_hash flavor (src/utils.py:14-19; pinned by its parser
    * test suite). In the reference's ELT this flavor is only the FALLBACK
    * when a raw row carries no hash (src/transform.py:219).
    */
  def payloadHash(m: Column): Column = md5(canonicalJson(m))

  /** MD5 over the DEFAULT json.dumps rendering — the hash the reference
    * actually STORES: load_raw writes md5(json.dumps(payload,
    * sort_keys=True)) into raw.data.payload_hash (main.py:156-160), and
    * the transform carries that value into staging (src/transform.py:219),
    * so the change-detection anti-join compares THIS flavor on both sides.
    * The engine stores the same flavor in its raw/staging layers so stored
    * hashes are byte-compatible on migration/coexistence — re-ingesting
    * through both systems must not re-process everything.
    */
  def rawPayloadHash(m: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    md5(Bridge.column(PyDefaultJson(Bridge.expression(m))))
  }

  /** F7: SHA-256 row hash, byte-compatible with the reference's
    * sha256(json.dumps(r, sort_keys=True)) — DEFAULT json.dumps flavor:
    * ensure_ascii=True and separators (", ", ": ") (ref main.py:191-192),
    * which differs from the compact MD5 canonical form for any non-ASCII
    * payload.
    */
  def payloadSha256(m: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    sha2(Bridge.column(PyDefaultJson(Bridge.expression(m))), 256)
  }

  // ───── F8: fallback id synthesis (ref main.py:179-212) ─────

  /** Pick the row id from pk/id/row_id/uuid (case-insensitive; ref
    * main.py:182-183) or synthesize gsheet_auto_{sha256[:12]}_{recordIndex}.
    * recordIndex is the 0-BASED data-row index (reference enumerate(records),
    * main.py:179,204) — NOT the sheet row number (= index + 2); callers
    * ingesting sheet rows pass sheet_row_number - 2. Re-ingesting the same
    * sheet through the reference and this engine yields identical ids.
    */
  def pickOrSynthId(payload: Column, normMap: Column, recordIndex: Column): Column = {
    val picked = nullIfBlank(getVariant(payload, normMap, Seq("pk", "id", "row_id", "uuid")))
    coalesce(picked,
      concat(lit("gsheet_auto_"), substring(payloadSha256(payload), 1, 12), lit("_"), recordIndex))
  }

  // ───── F17: zero-padded surrogate PK (ref gas/pk_master.gs:8-12) ─────

  def formatPk(n: Column): Column = format_string("sa_%06d", n)

  // ───── F9-F12 thin wrappers (documented mapping, ref 129f09ac6c14) ─────

  /** to_char(date_trunc('month', ts), 'YYYY-MM') */
  def monthBucket(ts: Column): Column = date_format(date_trunc("month", ts), "yyyy-MM")

  // ───── F16: UUID per id-less ingest row (ref gas/SheetService.gs:154) ─────

  /** Nondeterministic — ingest-time only, never in a recomputed layer. */
  def newUuid(): Column = uuid()

  // ───── F18: local-TZ stamp format (ref gas/SheetService.gs:23-24) ─────

  /** Render a UTC timestamp the way the source sheet stamps cells
    * (dd.MM.yyyy HH:mm:ss in a fixed zone) — the format F1 must re-parse.
    */
  def localStamp(ts: Column, tz: String = "Asia/Yekaterinburg"): Column =
    date_format(from_utc_timestamp(ts, tz), "dd.MM.yyyy HH:mm:ss")

  // ───── F19: DSN password masking, log hygiene (ref src/db.py:42-44) ─────

  def maskDsnPassword(dsn: Column): Column =
    regexp_replace(dsn, ":([^:@/]+)@", ":***@")
}
