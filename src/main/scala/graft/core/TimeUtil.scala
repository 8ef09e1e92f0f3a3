package graft.core

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Time-grid helpers shared by the observation operators.
  *
  * Reference semantics:
  *  - 5-minute rounding of raw timestamps (discharge_obs_pd.py:143, pandas
  *    `.round('5min')` — half-up at the midpoint).
  *  - calendar spine generation (`pd.date_range`, dischargeobs_write_xl.py:50,
  *    165-166, 279-280; discharge_obs_pd.py:233) — here a distributed
  *    `sequence` + `explode`, not a driver loop, so a year of 5-min slots at
  *    1000s of stations stays on executors.
  *  - yyyymm partition key used for monthly parquet routing
  *    (discharge_obs_pd.py:194-196,241-243).
  */
object TimeUtil {

  /** Round a timestamp column to an n-second grid, half-up (pandas `.round`).
    * Uses integer microsecond arithmetic: no double rounding ambiguity.
    */
  def roundToGrid(ts: Column, seconds: Int): Column = {
    val us = seconds.toLong * 1000000L
    // half-up: floor((t + grid/2) / grid) * grid, all integral arithmetic
    // (Column./ is double division, so floor-div is built from pmod).
    val shifted = unix_micros(ts) + lit(us / 2)
    timestamp_micros(shifted - pmod(shifted, lit(us)))
  }

  /** 5-minute grid (discharge_obs_pd.py:143). */
  def round5min(ts: Column): Column = roundToGrid(ts, 300)

  /** yyyymm partition key (discharge_obs_pd.py:194). */
  def yyyymm(ts: Column): Column = date_format(ts, "yyyyMM")

  /** Distributed calendar spine: one row per grid instant in [start, stop]
    * stepping `interval` (a SQL interval literal body, e.g. "5 minutes").
    * Equivalent of pd.date_range — but built with `sequence`+`explode` so it
    * is generated on executors and can be joined without collecting.
    */
  def spine(spark: SparkSession, start: String, stop: String, interval: String): DataFrame =
    spark.range(1).select(
      explode(sequence(
        lit(start).cast("timestamp"),
        lit(stop).cast("timestamp"),
        expr(s"INTERVAL $interval"))).as("ts"))

  /** Spine spanning the min/max of an existing timestamp column. The bounds
    * are computed as a 1-row aggregate and cross-joined (broadcast, no
    * collect) into the generator — scale-safe: the spine itself is produced
    * by `explode(sequence(...))` on executors.
    */
  def spineOver(df: DataFrame, tsCol: String, truncUnit: String, interval: String): DataFrame = {
    val bounds = df.agg(
      date_trunc(truncUnit, min(col(tsCol))).as("__lo"),
      date_trunc(truncUnit, max(col(tsCol))).as("__hi"))
    bounds.select(explode(sequence(col("__lo"), col("__hi"), expr(s"INTERVAL $interval"))).as("ts"))
  }
}
