package graft.etl

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Per-record cleaning kernel re-expressing the reference's normalization
  * pass as pure Column expressions (whole-stage-codegen'd — no UDFs).
  *
  * Reference behaviors mirrored:
  *  - UPPER+TRIM of string fields        (services/etlService.js:128-142, 284-294)
  *  - enum whitelist → NULL              (services/etlService.js:120-127, sex)
  *  - `parseFloat(x) || null` coercion   (services/etlService.js:143-147, 261-265)
  *    — note the JS quirk: a parsed 0 is falsy, so 0 maps to NULL; kept
  *    deliberately for behavioral parity.
  *  - date-or-NULL ISO normalization     (services/etlService.js:148-154, 276-282)
  *  - '1'/'0' string flag                (services/etlService.js:267-269, payout)
  *  - truthy → 1/0 int flag              (services/etlService.js:270-274)
  */
object Normalize {

  /** UPPER(TRIM(x)) applied only to non-null values. */
  def upperTrim(c: Column): Column = upper(trim(c))

  /** Whitelist enum: normalized value if in `allowed`, else NULL. */
  def enumOrNull(c: Column, allowed: Seq[String]): Column = {
    val u = upperTrim(c)
    when(u.isin(allowed: _*), u).otherwise(lit(null))
  }

  /** JS `parseFloat(x) || null`: non-numeric → NULL, and 0 → NULL. */
  def numOrNull(c: Column): Column = {
    val d = c.cast("double")
    when(d.isNull || d === lit(0.0), lit(null)).otherwise(d)
  }

  /** Valid date/timestamp → 'yyyy-MM-dd' string, else NULL. */
  def isoDateOrNull(c: Column): Column = date_format(c.cast("timestamp"), "yyyy-MM-dd")

  /** Timestamp → 'yyyy-MM-dd HH:mm:ss' string (second precision), else NULL. */
  def isoDateTimeOrNull(c: Column): Column =
    date_format(c.cast("timestamp"), "yyyy-MM-dd HH:mm:ss")

  /** String flag: exactly "1" → "1", anything else → "0". */
  def flag01(c: Column): Column = when(c === lit("1"), lit("1")).otherwise(lit("0"))

  /** Truthy → 1, falsy/NULL → 0 (int). */
  def bool01(c: Column): Column =
    when(c.cast("boolean") === lit(true), lit(1)).otherwise(lit(0))
}
