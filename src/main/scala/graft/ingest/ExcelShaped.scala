package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Fill}

/** Workbook-sheet imports (S7/D3).
  *
  * The xlsx binary codec is an export-boundary concern (no POI in the jar
  * set — SURVEY §7.3); the ENGINE semantics — date-part forward-fill,
  * timestamp assembly from parts, year rollover, wide→long melt — operate
  * on the sheet materialized as CSV, which is what these read.
  *
  * Two sheet shapes exist in the reference:
  *  - instantaneous `ALL_Q`/`ALL_H` (discharge_obs_pd.py:114-127):
  *    Day,Hour,Minute,<stations> with Day+Hour blank-on-repeat; NO
  *    rollover;
  *  - hourly sheet (dischargeobs_write_xl.py:396-407): Day,Hour,<stations>
  *    with only Day blank-on-repeat, and any non-first duplicate of the
  *    assembled timestamp shifted +1 year (D3).
  */
object ExcelShaped {

  private def readRaw(spark: SparkSession, path: String) =
    spark.read.option("header", "true").csv(path)
      .withColumn("__line", monotonically_increasing_id())

  private def melt(df: DataFrame, stationCols: Seq[String], param: String): DataFrame = {
    val pairs = stationCols.flatMap(c => Seq(lit(c), col(s"`$c`").cast("double")))
    df.select(col("ts"), explode(map(pairs: _*)).as(Seq("station", "value")))
      .select(col("station"), col("ts"), lit(param).as("param"), col("value"))
  }

  /** Instantaneous sheet: Day,Hour,Minute,<stations>; Day and Hour
    * forward-filled (discharge_obs_pd.py:120-121); ts from parts (F5). */
  def readInstantSheet(spark: SparkSession, path: String, year: Int,
                       param: String): DataFrame = {
    val raw = readRaw(spark, path)
    val stationCols = raw.columns.filterNot(Seq("Day", "Hour", "Minute", "__line").contains).toSeq
    val filled = Seq("Day", "Hour").foldLeft(raw) { (df, c) =>
      Fill.ffillBounded(df, Seq(col("__line")), c, c) // sheets are bounded
    }
    val withTs = filled.withColumn("ts", to_timestamp(
      concat(lit(year.toString), lit("-"), col("Day"), lit(" "),
             col("Hour"), lit(":"), col("Minute")),
      "yyyy-MM-dd H:m"))
    melt(withTs, stationCols, param)
  }

  /** Hourly sheet: Day,Hour,<stations>; only Day forward-filled; duplicate
    * timestamps rolled +1 year (dischargeobs_write_xl.py:401-405). */
  def readHourlySheet(spark: SparkSession, path: String, year: Int,
                      param: String): DataFrame = {
    val raw = readRaw(spark, path)
    val stationCols = raw.columns.filterNot(Seq("Day", "Hour", "__line").contains).toSeq
    val filled = Fill.ffillBounded(raw, Seq(col("__line")), "Day", "Day")
    val withTs = filled.withColumn("ts", to_timestamp(
      concat(lit(year.toString), lit("-"), col("Day"), lit(" "),
             col("Hour"), lit(":00")),
      "yyyy-MM-dd H:mm"))
    val rolled = Dedup.yearRollover(withTs, Seq("ts"), Seq(col("__line")), "ts")
    melt(rolled, stationCols, param)
  }
}
