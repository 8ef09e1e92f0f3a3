package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.formula.Formula
import graft.ops.{Fill, Recurrence, Resample}
import graft.storage.ObsStore

/** The reference's three entry points (SURVEY §3) as composable Dataset
  * jobs. Network fetch is isolated behind staging directories (the test
  * fixtures inject files there), so every pipeline is a pure
  * DataFrame → DataFrame composition the driver can schedule — the batch
  * analog of one Trigger.AvailableNow stream per source.
  */
object Pipelines {

  /** E1 — instantaneous ingest (discharge_obs_pd.py:366-412): normalized
    * long obs from all sources union → merge-upsert into the partitioned
    * store. Sources are already normalized Dataset[Obs]-shaped frames.
    */
  def ingestInstantaneous(store: ObsStore, sources: Seq[DataFrame]): Unit = {
    val all = sources.reduce(_.unionByName(_, allowMissingColumns = true))
    store.mergeUpsert(all)
  }

  /** E2a — hourly rollup (dischargeobs_write_xl.py:278-360): per (station,
    * param) hourly mean, tail-patched with the last raw observation at the
    * last valid hour, bounded-ffilled to `now`, rounded.
    * Returns long (station, param, bucket, value).
    */
  def hourlyRollup(inst: DataFrame, now: Column): DataFrame = {
    val hourly = Resample.resample(inst, Seq("station", "param"), "ts", "value", "hour")
    val patched = Resample.tailPatch(hourly, Seq("station", "param"),
      "bucket", "mean_value", "last_value")
    val filled = Fill.ffill(patched, Seq("station", "param"), Seq(col("bucket")),
      "mean_value", "value", cutoff = Some(col("bucket") <= date_trunc("day", now)))
    filled.select(col("station"), col("param"), col("bucket"),
      round(col("value"), 3).as("value"))
  }

  /** E2b — daily rollup from hourly (dischargeobs_write_xl.py:365-392). */
  def dailyRollup(hourly: DataFrame): DataFrame = {
    val daily = Resample.resample(
      hourly.withColumnRenamed("bucket", "ts"),
      Seq("station", "param"), "ts", "value", "day")
    Resample.tailPatch(daily, Seq("station", "param"),
        "bucket", "mean_value", "last_value")
      .select(col("station"), col("param"), col("bucket"),
        round(col("mean_value"), 3).as("value"))
  }

  /** E2c — COFFEE product (dischargeobs_write_xl.py:90-144): hourly
    * max/last + rising/falling recurrence per station, aligned to the
    * hour spine of the requested range.
    */
  def coffeeProduct(spark: SparkSession, inst: DataFrame): DataFrame = {
    val hourly = Resample.resample(inst.filter(col("param") === "Q"),
      Seq("station"), "ts", "value", "hour")
    Recurrence.risingFalling(spark, hourly, "station", "bucket",
        "max_value", "last_value")
      .withColumnRenamed("key", "station")
  }

  /** E2d — model-input export (dischargeobs_write_xl.py:160-251): daily
    * values pivoted wide over the product's station list, with
    * formula-estimated stations compiled (F11) instead of eval()'d.
    * `estimates`: (outStation, formula, onlyIfMissing).
    */
  def modelInput(daily: DataFrame, stations: Seq[String],
                 estimates: Seq[(String, String, Boolean)]): DataFrame = {
    val wide = daily.filter(col("param") === "Q")
      .groupBy(col("bucket").as("date"))
      .pivot("station", stations)
      .agg(first(col("value")))
    Formula.applyEstimates(wide, estimates,
      ref => col(s"`$ref`"))
  }

  /** E3 — ECCC grid resume (ECCC_hourly.py:29-141): see
    * EcccSwob.readObs/pendingWork; the per-variable export is a pivot over
    * station at each hour.
    */
  def ecccVariableExport(obs: DataFrame, param: String, stations: Seq[String]): DataFrame =
    obs.filter(col("param") === param)
      .groupBy(col("ts"))
      .pivot("station", stations)
      .agg(first(col("value")))
}
