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
    * long obs from all sources union → keep-first dedup across sources →
    * merge-upsert into the partitioned store.
    *
    * The cross-source dedup matters in the long model: the reference's
    * column-wise concat (J4) can't collide because each source owns
    * disjoint station COLUMNS, but in long form the same (station, ts,
    * param) can arrive from two sources, and combineFirst assumes unique
    * keys per side. Keep-first by source order = the reference's
    * source-precedence (earlier source wins).
    */
  def ingestInstantaneous(store: ObsStore, sources: Seq[DataFrame]): Unit = {
    val tagged = sources.zipWithIndex.map { case (df, i) =>
      df.select(col("station"), col("ts"), col("param"), col("value"))
        .withColumn("__src", lit(i))
    }
    val all = tagged.reduce(_.unionByName(_))
    val deduped = graft.ops.Dedup.dedupFirst(all,
        Seq("station", "ts", "param"), Seq(col("__src")))
      .drop("__src")
    store.mergeUpsert(deduped)
  }

  /** E2a — hourly rollup (dischargeobs_write_xl.py:278-360): per (station,
    * param) hourly mean on the COMPLETE hour spine, tail-patched with the
    * last raw observation at the last valid hour, bounded-ffilled to
    * `now`, rounded. Returns long (station, param, bucket, value).
    *
    * The spine join is load-bearing: groupBy(date_trunc) only emits hours
    * that HAVE observations, but the reference's year-frame (pandas
    * DatetimeIndex) contains every hour — gap hours and the stretch up to
    * `now` must exist as rows for the bounded forward-fill to fill them.
    * The spine is generated distributed (sequence+explode) and
    * cross-joined with the (station, param) dimension derived from the
    * data — no driver-side collection.
    */
  def hourlyRollup(inst: DataFrame, now: Column): DataFrame = {
    val hourly = Resample.resample(inst, Seq("station", "param"), "ts", "value", "hour")
    val patched = Resample.tailPatch(hourly, Seq("station", "param"),
      "bucket", "mean_value", "last_value")
    val spine = inst
      .agg(date_trunc("hour", min(col("ts"))).as("__lo"))
      .select(explode(sequence(col("__lo"), date_trunc("hour", now),
        expr("INTERVAL 1 HOUR"))).as("bucket"))
    val keys = inst.select(col("station"), col("param")).distinct()
    val full = spine.crossJoin(keys)
      .join(patched, Seq("station", "param", "bucket"), "left")
    val filled = Fill.ffill(full, Seq("station", "param"), Seq(col("bucket")),
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
