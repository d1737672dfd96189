package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Type-robust epoch-micros projection for the time operators.
  *
  * Public time operators ([[AsOfJoin]], [[IntervalJoin]], [[Scd2]]
  * consumers) accept caller-provided time columns, and callers feed all
  * three encodings Spark produces from real lakes: TimestampType
  * (instant), TimestampNTZType (parquet timestamp without UTC
  * adjustment — `unix_micros` REJECTS it with DATATYPE_MISMATCH), and
  * integral event-time longs. This helper dispatches on the schema type
  * so every operator gets an order-preserving long without each call
  * site re-deriving the cast rules.
  *
  * NTZ semantics: the wall-clock fields are interpreted in the SESSION
  * time zone (the cast to TimestampType does exactly that). Graft pins
  * the session zone to UTC ([[graft.GraftSession]]), making the
  * projection deployment-invariant; callers running other zones get the
  * standard Spark NTZ→instant convention.
  */
object TimeCols {

  /** Epoch micros (or the integral value as-is) as an order-preserving
    * long; analysis-time error for non-time types so misuse fails fast
    * instead of producing a nonsense ordering.
    */
  def micros(dt: DataType, c: Column): Column = dt match {
    case TimestampType => unix_micros(c)
    case TimestampNTZType => unix_micros(c.cast(TimestampType))
    case ByteType | ShortType | IntegerType | LongType => c.cast("long")
    case other => throw new IllegalArgumentException(
      s"time column must be timestamp, timestamp_ntz or integral, got ${other.catalogString}")
  }
}
