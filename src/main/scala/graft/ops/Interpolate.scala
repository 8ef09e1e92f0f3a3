package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** QC + gap interpolation — the reference's own roadmap items
  * (dischargeobs_write_xl.py:265-271 TODO comments: "Remove negative
  * discharges", "Interpolate 5-min data", "Interpolate hourly data").
  *
  * Semantics (defined here, documented): out-of-range values are nulled
  * (not dropped — the slot stays on the calendar); a null is linearly
  * interpolated ONLY when bracketed by non-null neighbors in the same
  * partition (leading/trailing gaps remain null — no extrapolation).
  * Window-frame implementation: one shuffle on the station key, rows
  * frames, fully deterministic under the caller's total order.
  */
object Interpolate {

  /** QC: null values outside [min, max] (reference TODO: negative
    * discharges are physical impossibilities, not data). */
  def nullifyOutOfRange(df: DataFrame, valueCol: String,
                        min: Double, max: Double): DataFrame =
    df.withColumn(valueCol,
      when(col(valueCol).between(min, max), col(valueCol)))

  /** Linear interpolation of bracketed nulls over event time.
    * `order` must be a total order consistent with `tsCol`.
    */
  def linearInterpolate(df: DataFrame, parts: Seq[String], tsCol: String,
                        order: Seq[Column], valueCol: String,
                        outCol: String): DataFrame = {
    val w = Window.partitionBy(parts.map(col): _*).orderBy(order: _*)
    val before = w.rowsBetween(Window.unboundedPreceding, -1)
    val after  = w.rowsBetween(1, Window.unboundedFollowing)
    val tsu = unix_micros(col(tsCol))
    val vTs = when(col(valueCol).isNotNull, tsu)
    val prevV = last(col(valueCol), ignoreNulls = true).over(before)
    val prevT = last(vTs, ignoreNulls = true).over(before)
    val nextV = first(col(valueCol), ignoreNulls = true).over(after)
    val nextT = first(vTs, ignoreNulls = true).over(after)
    df.withColumn(outCol,
      when(col(valueCol).isNotNull, col(valueCol))
        .when(prevV.isNotNull && nextV.isNotNull,
          prevV + (nextV - prevV) * (tsu - prevT) / (nextT - prevT)))
  }
}
