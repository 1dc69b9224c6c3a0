package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scalar function kit re-expressing the reference's ingest/view-time scalar
  * transforms as codegen-friendly Spark `Column` compositions (no UDFs).
  *
  * Semantics sources (reference, `/root/reference/`):
  *  - money parse: `source/create-athena-views-lambda.py:90,99,107,116,131`
  *    `CAST(rtrim(replace(substr(x,2),'$')) AS decimal(18,2))`
  *  - timestamp parse: `source/create-athena-views-lambda.py:87` et al.
  *    `date_parse(substr(datetime,1,19),'%Y-%m-%d %T')`
  *  - PII masks: `source/extract-ta-data-lambda.py:29-54`
  *  - ARN resource-id extraction: `source/extract-tag-data-lambda.py:48-57`
  *  - comma strip (CSV safety): `source/extract-ta-data-lambda.py:175`
  *  - divide-by-zero string guard: `source/create-athena-views-lambda.py:147-148`
  */
object Functions {

  private val MaxLen = Int.MaxValue

  /** Presto `substr(x, 2)` — drop the first character, keep the rest. */
  def dropFirstChar(c: Column): Column = substring(c, 2, MaxLen)

  /** Presto 2-arg `replace(x, '$')` — delete every occurrence of a literal. */
  def deleteAll(c: Column, lit: String): Column =
    regexp_replace(c, java.util.regex.Pattern.quote(lit), "")

  /** Money-string parse: `"$1234.56 "` -> 1234.56 as decimal(18,2).
    * Mirrors `CAST(rtrim(replace(substr(x,2),'$')) AS decimal(18,2))`
    * (create-athena-views-lambda.py:90). The leading `substr(.,2)` drops the
    * first `$`; the `replace` kills any stray `$`; `rtrim` cleans padding.
    */
  def parseMoney(c: Column, precision: Int = 18, scale: Int = 2): Column =
    rtrim(deleteAll(dropFirstChar(c), "$")).cast(DecimalType(precision, scale))

  /** RDS variant (create-athena-views-lambda.py:116): no substr; deletes
    * `$` and `"` instead. */
  def parseMoneyRds(c: Column, precision: Int = 10, scale: Int = 2): Column =
    rtrim(deleteAll(deleteAll(c, "$"), "\"")).cast(DecimalType(precision, scale))

  /** `date_parse(substr(x,1,19), '%Y-%m-%d %T')` — second-precision
    * timestamp from a string with optional sub-second suffix. */
  def parseDateTime(c: Column): Column =
    to_timestamp(substring(c, 1, 19), "yyyy-MM-dd HH:mm:ss")

  /** ISO-'T' variant (create-athena-views-lambda.py:133: Expiration Date). */
  def parseDateTimeIso(c: Column): Column =
    to_timestamp(substring(regexp_replace(c, "T", " "), 1, 19), "yyyy-MM-dd HH:mm:ss")

  /** PII mask for any embedded 12-digit account id: keep the 2nd digit and
    * the last 4, middle becomes `XXXXXXX` (extract-ta-data-lambda.py:31-34:
    * `re.sub('\d{12}', m => m[1]+'XXXXXXX'+m[-4:])`). Pure regex — the
    * positional reconstruction is expressible with capture groups, so no UDF
    * is needed and the expression stays inside whole-stage codegen. */
  def maskAccountId(c: Column): Column =
    regexp_replace(c, "\\d(\\d)\\d{6}(\\d{4})", "$1XXXXXXX$2")

  /** PII mask for names/emails: `v[:3] + '-MASKED-' + v[-3:]`
    * (extract-ta-data-lambda.py:43-45). Assumes length >= 3 like the ref. */
  def maskNameEmail(c: Column): Column =
    concat(substring(c, 1, 3), lit("-MASKED-"), substring(c, -3, 3))

  /** ARN -> ResourceId (extract-tag-data-lambda.py:48-57): text after the
    * last `/` if any, else after the last `:`, else ''. */
  def arnResourceId(c: Column): Column =
    when(c.contains("/"), regexp_extract(c, "^.*/(.*)$", 1))
      .when(c.contains(":"), regexp_extract(c, "^.*:(.*)$", 1))
      .otherwise(lit(""))

  /** CSV-safety comma strip (extract-ta-data-lambda.py:175). Null-safe: the
    * reference keeps None as None; regexp_replace already propagates null. */
  def stripCommas(c: Column): Column = regexp_replace(c, ",", "")

  /** Fidelity divide-by-zero guard (create-athena-views-lambda.py:147-148):
    * `replace(CAST(n AS varchar),'0','1')` — replaces EVERY '0' digit, so
    * 105 -> 115. Faithful to the reference, including the bug. */
  def zeroGuardFidelity(c: Column): Column =
    regexp_replace(c.cast(StringType), "0", "1")

  /** Native (correct) zero guard: denominator 0 -> 1. */
  def zeroGuardNative(c: Column): Column =
    when(c === 0, lit(1)).otherwise(c)

  /** Exact-sum helper: cast a double column to decimal before aggregation so
    * the sum is exact and order-independent (safe for distributed partial
    * aggregation at any scale), then surface as double. Use
    * `sumExact(c).cast(DoubleType)` at the output boundary. */
  def decSum(c: Column, precision: Int = 25, scale: Int = 6): Column =
    sum(c.cast(DecimalType(precision, scale)))
}
