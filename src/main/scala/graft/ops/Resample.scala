package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Tumbling-window resampling (SURVEY §2.6 — A1/A2/A4/A5).
  *
  * pandas `resample('H'|'D')` over a DatetimeIndex maps to a `date_trunc`
  * bucket + hash aggregation — Spark runs it as two-phase HashAggregate
  * (map-side partial combine), so the shuffle carries one row per
  * (key, bucket), not per observation. pandas `.last()` on a resampler takes
  * the last NON-NULL value in the bucket; reproduced with
  * `max_by(value, when(value.isNotNull, ts))` (null ts sorts below all).
  */
object Resample {

  /** A1/A2/A5 — aggregate `valueCol` into `unit` ("hour"/"day") buckets per
    * `keys`: mean, max, last-non-null, plus the bucket column `bucket`.
    * (dischargeobs_write_xl.py:337-340, 111-118, 379-383)
    */
  def resample(df: DataFrame, keys: Seq[String], tsCol: String,
               valueCol: String, unit: String): DataFrame =
    df.groupBy(keys.map(col) :+ date_trunc(unit, col(tsCol)).as("bucket"): _*)
      .agg(
        avg(col(valueCol)).as("mean_value"),
        max(col(valueCol)).as("max_value"),
        max_by(col(valueCol), when(col(valueCol).isNotNull, col(tsCol))).as("last_value"),
        count(col(valueCol)).as("n_obs"))

  /** A4 — tail-patch: in a resampled frame, replace the aggregate at each
    * key's LAST non-null bucket with the bucket's last raw value — the
    * final hour/day is partial, so its mean under-represents the latest
    * observation (dischargeobs_write_xl.py:346-349,384-387).
    *
    * `aggCol` is patched in place from `lastCol`.
    */
  def tailPatch(resampled: DataFrame, keys: Seq[String], bucketCol: String,
                aggCol: String, lastCol: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
    val lastValid = max(when(col(aggCol).isNotNull, col(bucketCol))).over(w)
    resampled
      .withColumn("__lv", lastValid)
      .withColumn(aggCol,
        when(col(bucketCol) === col("__lv"), col(lastCol)).otherwise(col(aggCol)))
      .drop("__lv")
  }
}
