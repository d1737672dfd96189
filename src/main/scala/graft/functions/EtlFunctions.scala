package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar derivations from the reference's reader stage (F1-F13, U1).
  *
  * Every one is a built-in Catalyst expression composition — zero UDFs, so
  * the whole derive chain stays inside whole-stage codegen (SURVEY.md §2.7).
  * Citations: jfitam/train-reports-etl `reports_exporter_v0.83.py`.
  */
object EtlFunctions {

  /** F1 `:545-549` — strict-format timestamp parse, null on failure
    * (pandas `errors="coerce"` == Spark's default try-parse-null).
    */
  def parseTs(c: Column): Column = to_timestamp(c, "yyyy-MM-dd HH:mm:ss")

  /** F2 `:563-564` — numeric coercion, null on failure. */
  def parseNum(c: Column): Column = c.cast("double")

  /** F3 `:641-643` — date → "yyyy-MM-dd" text. */
  def fmtDateShort(c: Column): Column = date_format(c, "yyyy-MM-dd")

  /** F3 `:710-712` — timestamp → "yyyy-MM-dd HH:mm" text. */
  def fmtDateTimeMinute(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm")

  /** F3 `:648` — weekday abbreviation ("Mon".."Sun", Locale-pinned by the
    * session's UTC+root-locale config).
    */
  def weekDay(c: Column): Column = date_format(c, "E")

  /** F4 `:649` — ISO-8601 week number. */
  def isoWeek(c: Column): Column = weekofyear(c)

  /** F5 `:644-652` — " - "-joined business keys. */
  def dashKey(parts: Column*): Column = concat_ws(" - ", parts: _*)

  /** F6 `:647` — corridor/stretch code = first 2 chars of the train number. */
  def corridor(trainNumber: Column): Column = substring(trainNumber, 1, 2)

  /** F9 `:1001` — 15% VAT gross-up. Computed in decimal so results are
    * exact and engine-independent; cast back by the caller as needed.
    */
  def vatGrossUp(c: Column): Column =
    (c.cast("decimal(18,4)") * lit(BigDecimal("1.15"))).cast("decimal(18,4)")

  /** F10 `:655-671` — midnight-rollover adjustment. When the scheduled
    * departure time-of-day is later than the ticket's stamped time-of-day,
    * the train actually departed the previous day: shift back one day.
    * Time-of-day comparison on "HH:mm:ss" strings matches the reference's
    * string compare and is total-ordered.
    */
  def midnightRollover(ticketTs: Column, scheduledTs: Column): Column =
    when(date_format(scheduledTs, "HH:mm:ss") > date_format(ticketTs, "HH:mm:ss"),
      ticketTs - expr("INTERVAL 1 DAY")).otherwise(ticketTs)

  /** F11 `:673-679` — service-date cutoff: departures at or before 05:00
    * belong to the previous service date (maintenance-window rule).
    */
  def serviceDate(departureTs: Column): Column = {
    val minutes = hour(departureTs) * 60 + minute(departureTs)
    when(minutes <= lit(300), date_sub(to_date(departureTs), 1))
      .otherwise(to_date(departureTs))
  }

  /** U1→F7+F8+F6 `:723-736` — phone cleanup decomposed to built-ins:
    * strip the row's own prefix value, drop dashes, truncate to 14.
    * `startsWith` + `substring` instead of a per-row compiled regex.
    */
  def cleanPhone(prefix: Column, telephone: Column): Column = {
    val stripped = when(prefix.isNotNull && telephone.startsWith(prefix),
      telephone.substr(length(prefix) + 1, lit(Int.MaxValue))).otherwise(telephone)
    substring(regexp_replace(stripped, "-", ""), 1, 14)
  }
}
