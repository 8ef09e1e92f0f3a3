package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.TimeUtil
import graft.export.Exports
import graft.ingest.{EcccSwob, Provincial, Usgs, Wsc}
import graft.pipeline.Pipelines
import graft.storage.ObsStore

/** Thin per-workflow CLIs mirroring the reference's three cron scripts —
  * the "run E1/E2/E3 on a tick" entry points (SURVEY §3; the reference
  * schedules one process per script from `.github/workflows/main*.yml`).
  * Each wraps the existing Pipelines/EcccSwob/ObsStore operators around a
  * staging-directory argument: the network fetch (S1-S3) stays OUTSIDE
  * the engine by design — a fetcher (or the driver's fixtures) stages
  * raw files, the tick normalizes + merges them. main() owns the session
  * (ToolSession doctrine); run() is session-injected so PipelineCliSpec
  * drives all three on the shared test session.
  */
object PipelineCli {
  private[tools] def exists(p: String): Boolean = Files.exists(Paths.get(p))
}

/** E1 — instantaneous ingest tick (`discharge_obs_pd.py:366-412`):
  * normalize every staged source present under `stagingDir`
  * (`wsc/`, `provincial/Discharge.csv` + `provincial/Stage.csv` +
  * `provincial/provincial_station_list.csv`, `usgs/`) and merge-upsert
  * into the partitioned store (old wins — re-running a tick is a no-op).
  *
  * Usage: runMain graft.tools.IngestTick <stagingDir> <storeDir>
  */
object IngestTick {
  import PipelineCli.exists

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: IngestTick <stagingDir> <storeDir>")
    val spark = ToolSession.local()
    try run(spark, args(0), args(1))
    finally spark.stop()
  }

  def run(spark: SparkSession, stagingDir: String, storeDir: String): Long = {
    val stations =
      if (exists(s"$stagingDir/provincial/provincial_station_list.csv"))
        Some(Provincial.stationList(spark,
          s"$stagingDir/provincial/provincial_station_list.csv"))
      else None
    val sources = Seq.newBuilder[DataFrame]
    if (exists(s"$stagingDir/wsc"))
      sources += Wsc.readObs(spark, s"$stagingDir/wsc")
    val provincialCsvs = Seq("Discharge" -> "Q", "Stage" -> "H")
      .filter { case (f, _) => exists(s"$stagingDir/provincial/$f.csv") }
    // staged provincial data without its station list must fail LOUDLY:
    // the re-key join needs the list, and silently skipping the source
    // would let a lossy tick report success (old-wins merging then hides
    // the gap from every later tick's log)
    require(provincialCsvs.isEmpty || stations.nonEmpty,
      s"$stagingDir/provincial has ${provincialCsvs.map(_._1).mkString(",")} " +
        "but no provincial_station_list.csv — re-stage the station list")
    for (st <- stations; (file, param) <- provincialCsvs)
      sources += Provincial.readObs(spark, s"$stagingDir/provincial/$file.csv", st, param)
    if (exists(s"$stagingDir/usgs"))
      sources += Usgs.readObs(spark, s"$stagingDir/usgs")
    val staged = sources.result()
    require(staged.nonEmpty, s"no recognized sources under $stagingDir")
    val store = new ObsStore(spark, storeDir)
    Pipelines.ingestInstantaneous(store, staged)
    val n = store.read().count()
    println(s"[ingest-tick] ${staged.size} sources merged; store rows=$n")
    n
  }
}

/** E2 — daily derived products + exports (`dischargeobs_write_xl.py:
  * 430-452`): store → hourly rollup → daily rollup (both written as
  * parquet products) → COFFEE recurrence CSV → model-input workbook
  * (.xlsx + legacy .xls, sheet named for the year of `now`).
  *
  * Usage: runMain graft.tools.ExportDaily <storeDir> <outDir>
  *          [nowIso=max store ts] [stations=all, comma-separated]
  */
object ExportDaily {

  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: ExportDaily <storeDir> <outDir> [nowIso] [stationsCsv]")
    val spark = ToolSession.local()
    try run(spark, args(0), args(1), args.lift(2),
      args.lift(3).map(_.split(",").toSeq).getOrElse(Nil))
    finally spark.stop()
  }

  def run(spark: SparkSession, storeDir: String, outDir: String,
          nowIso: Option[String], stationsArg: Seq[String]): (Long, Long) = {
    val inst = new ObsStore(spark, storeDir).read()
    // default `now` = the newest stored observation — the tail-patch
    // cutoff the reference takes from the wall clock on its cron tick.
    // An EMPTY store has no max(ts): fail with an actionable message
    // instead of NPE-ing later in the rollup.
    val now = nowIso.map(s => lit(s).cast("timestamp")).getOrElse {
      val maxTs = inst.agg(max(col("ts"))).head().getTimestamp(0)
      require(maxTs != null,
        s"store at $storeDir is empty; pass nowIso explicitly")
      lit(maxTs)
    }
    val hourly = Pipelines.hourlyRollup(inst, now)
    hourly.write.mode("overwrite").parquet(s"$outDir/hourly")
    // same stale-listing hazard as EcccTick's grid: a second run in one
    // session must not plan its read-back over the deleted files
    spark.catalog.refreshByPath(s"$outDir/hourly")
    val daily = Pipelines.dailyRollup(spark.read.parquet(s"$outDir/hourly"))
    daily.write.mode("overwrite").parquet(s"$outDir/daily")
    spark.catalog.refreshByPath(s"$outDir/daily")
    Exports.writeCsv(
      Pipelines.coffeeProduct(spark, inst)
        .withColumn("bucket", date_format(col("bucket"), "yyyy-MM-dd HH:mm:ss")),
      s"$outDir/coffee")
    val stations =
      if (stationsArg.nonEmpty) stationsArg
      else daily.filter(col("param") === "Q").select("station").distinct()
        .collect().map(_.getString(0)).sorted.toSeq
    val model = Pipelines.modelInput(spark.read.parquet(s"$outDir/daily"),
        stations, estimates = Nil)
      .withColumn("date", date_format(col("date"), "yyyy-MM-dd"))
    val year = nowIso.map(_.take(4)).getOrElse(
      inst.agg(date_format(max(col("ts")), "yyyy")).head().getString(0))
    Exports.writeXlsxSheet(model, s"$outDir/model.xlsx", year, "date")
    Exports.writeXlsSheet(model, s"$outDir/obsflows.xls", year, "date")
    val counts = (hourly.count(), daily.count())
    println(s"[export-daily] hourly=${counts._1} daily=${counts._2} " +
      s"stations=${stations.size} -> $outDir")
    counts
  }
}

/** E3 — ECCC weather tick (`ECCC_hourly.py:29-141`): parse staged
  * SWOB-ML XML, merge into the grid parquet (f_read resume flags ride
  * along), report the still-pending (station, hour) work-list for the
  * next fetch, and write the per-variable TA/PC pivot CSVs.
  *
  * Usage: runMain graft.tools.EcccTick <swobStagingDir> <gridDir> <outDir>
  */
object EcccTick {
  import PipelineCli.exists

  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: EcccTick <swobStagingDir> <gridDir> <outDir>")
    val spark = ToolSession.local()
    try run(spark, args(0), args(1), args(2))
    finally spark.stop()
  }

  def run(spark: SparkSession, stagingDir: String, gridDir: String,
          outDir: String): (Long, Long) = {
    val fresh = EcccSwob.readObs(spark, stagingDir)
      .withColumn("f_read", lit(true))
    val prior =
      if (exists(gridDir)) spark.read.parquet(gridDir)
      else fresh.limit(0)
    // old wins (T2 doctrine): a re-staged hour cannot overwrite the
    // stored cell; localCheckpoint decouples the merged frame from the
    // gridDir files so the overwrite below cannot read its own output
    val merged = prior.withColumn("__src", lit(0))
      .unionByName(fresh.withColumn("__src", lit(1)))
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("station", "ts", "param")
          .orderBy(col("__src").asc)))
      .filter(col("__rn") === 1).drop("__rn", "__src")
      .localCheckpoint(true)
    merged.write.mode("overwrite").parquet(gridDir)
    // path-based reads cache their file listing; without the refresh a
    // second tick in one session plans the read-back over the deleted
    // pre-overwrite files
    spark.catalog.refreshByPath(gridDir)
    val grid = spark.read.parquet(gridDir)
    // the resume work-list a fetcher would take next tick: full
    // station × hour grid of the observed window, minus read cells
    val stations = grid.select("station").distinct()
    val hours = TimeUtil.spineOver(grid, "ts", "hour", "1 hour")
    val done = grid.select(col("station"), col("ts"), col("f_read"))
    val pending = EcccSwob.pendingWork(stations, hours, done)
    val nPending = pending.count()
    for (param <- Seq("TA", "PC")) {
      val st = grid.filter(col("param") === param).select("station")
        .distinct().collect().map(_.getString(0)).sorted.toSeq
      if (st.nonEmpty)
        Exports.writeCsv(
          Pipelines.ecccVariableExport(grid, param, st)
            .withColumn("ts", date_format(col("ts"), "yyyy-MM-dd HH:mm:ss")),
          s"$outDir/$param")
    }
    val nGrid = grid.count()
    println(s"[eccc-tick] grid rows=$nGrid pending cells=$nPending -> $outDir")
    (nGrid, nPending)
  }
}
