package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.Rounding.round // engine-identical rounding — shadows functions.round (see Rounding)

/** KSQL's scalar function library re-expressed as Spark `Column` algebra.
  *
  * Every function here composes built-in (whole-stage-codegen'd) Catalyst
  * expressions — zero Scala UDFs, so each stays inside codegen spans and
  * Catalyst can constant-fold / push down through them where legal.
  *
  * Naming follows KSQL (UCASE, LEN, EXTRACTJSONFIELD, MASK, GEO_DISTANCE,
  * STRINGTOTIMESTAMP, …); semantics follow the public KSQL docs.
  */
object KsqlFunctions {

  // ---- string -------------------------------------------------------------
  def ucase(c: Column): Column = upper(c)
  def lcase(c: Column): Column = lower(c)
  def len(c: Column): Column = length(c)
  def ksqlTrim(c: Column): Column = trim(c)
  def ksqlConcat(cs: Column*): Column = concat(cs: _*)
  /** KSQL SUBSTRING(str, pos, len) — 1-based like SQL. */
  def ksqlSubstring(c: Column, pos: Int, l: Int): Column = substring(c, pos, l)
  def ksqlReplace(c: Column, search: String, repl: String): Column =
    regexp_replace(c, java.util.regex.Pattern.quote(search), java.util.regex.Matcher.quoteReplacement(repl))
  def ksqlSplit(c: Column, delim: String): Column =
    split(c, java.util.regex.Pattern.quote(delim))
  def initcap_(c: Column): Column = initcap(c)

  // ---- masking ------------------------------------------------------------
  // KSQL masks: upper→'X', lower→'x', digit→'n', other→'-' (the
  // documented ksqlDB defaults — leaving punctuation unmasked would
  // leak emails/phone structure through a masking function).
  private def maskCol(c: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(
      regexp_replace(c, "[^A-Za-z0-9]", "-"), "[A-Z]", "X"), "[a-z]", "x"), "[0-9]", "n")

  /** MASK(col): mask every character class. */
  def mask(c: Column): Column = maskCol(c)
  /** MASK_LEFT(col, n): mask only the first n chars. */
  def maskLeft(c: Column, n: Int): Column =
    concat(maskCol(c.substr(lit(1), lit(n))),
      c.substr(lit(n + 1), greatest(length(c) - n, lit(0))))
  /** MASK_RIGHT(col, n): mask only the last n chars. */
  def maskRight(c: Column, n: Int): Column =
    when(length(c) <= n, maskCol(c)).otherwise(
      concat(c.substr(lit(1), length(c) - n), maskCol(c.substr(length(c) - n + 1, lit(n)))))
  /** MASK_KEEP_LEFT(col, n): keep first n chars, mask the rest. */
  def maskKeepLeft(c: Column, n: Int): Column =
    concat(substring(c, 1, n), maskCol(c.substr(lit(n + 1), greatest(length(c) - n, lit(0)))))
  /** MASK_KEEP_RIGHT(col, n): keep last n chars, mask the rest. */
  def maskKeepRight(c: Column, n: Int): Column =
    when(length(c) <= n, c).otherwise(
      concat(maskCol(c.substr(lit(1), length(c) - n)), c.substr(length(c) - n + 1, lit(n))))

  // ---- math ---------------------------------------------------------------
  def ksqlAbs(c: Column): Column = abs(c)
  def ksqlCeil(c: Column): Column = ceil(c)
  def ksqlFloor(c: Column): Column = floor(c)
  def ksqlRound(c: Column, scale: Int = 0): Column = round(c, scale)
  def ksqlSqrt(c: Column): Column = sqrt(c)
  /** KSQL RANDOM() — made deterministic with a seed for testability. */
  def ksqlRandom(seed: Long): Column = rand(seed)

  // ---- null handling ------------------------------------------------------
  def ifNull(c: Column, alt: Column): Column = coalesce(c, alt)

  // ---- JSON ---------------------------------------------------------------
  /** EXTRACTJSONFIELD(json, '$.path') — string result like KSQL. */
  def extractJsonField(c: Column, path: String): Column = get_json_object(c, path)

  // ---- arrays -------------------------------------------------------------
  def arrayContains(c: Column, v: Any): Column = array_contains(c, v)

  // ---- time ---------------------------------------------------------------
  /** STRINGTOTIMESTAMP(str, fmt) → epoch millis (KSQL returns BIGINT ms). */
  def stringToTimestamp(c: Column, fmt: String): Column =
    (unix_timestamp(to_timestamp(c, fmt)) * 1000L +
      (date_format(to_timestamp(c, fmt), "SSS")).cast("long"))
  /** TIMESTAMPTOSTRING(epochMillis, fmt). */
  def timestampToString(c: Column, fmt: String): Column =
    date_format(timestamp_millis(c.cast("long")), fmt)
  def stringToDate(c: Column, fmt: String): Column = to_date(c, fmt)
  def dateToString(c: Column, fmt: String): Column = date_format(c, fmt)

  // ---- geo ----------------------------------------------------------------
  /** GEO_DISTANCE(lat1, lon1, lat2, lon2, 'KM'|'MI') — haversine, pure
    * Column arithmetic (stays in codegen; no UDF). Mirrors KSQL's
    * earth radius 6371 km / 3959 mi.
    */
  def geoDistance(lat1: Column, lon1: Column, lat2: Column, lon2: Column,
                  unit: String = "KM"): Column = {
    val r = unit.toUpperCase match {
      case "MI" | "MILES" => 3959.0
      case _ => 6371.0
    }
    val dLat = radians(lat2 - lat1) / 2
    val dLon = radians(lon2 - lon1) / 2
    val a = pow(sin(dLat), 2) +
      cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(dLon), 2)
    // near-antipodal rounding can push a infinitesimally above 1 ->
    // asin(sqrt(a)) = NaN; clamp to the asin domain
    lit(2 * r) * asin(sqrt(least(a, lit(1.0))))
  }
}
