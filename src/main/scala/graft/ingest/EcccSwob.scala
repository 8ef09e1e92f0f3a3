package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ECCC SWOB-ML weather-observation normalizer (S4/F15 →
  * ECCC_hourly.py:19-27,79-113).
  *
  * One XML file per (station, hourUTC); the reference extracts the
  * attributes air_temp, avg_air_temp_pst1hr, pcpn_amt_pst1hr by element
  * name and scrubs non-numeric markers like "MSNG" (ECCC_hourly.py:9-16,
  * 124). There is no spark-xml in the jar set, and the SWOB element shape
  * is a flat attribute list, so extraction is `regexp_extract` over
  * `wholetext` files — stays inside codegen, no UDF (SURVEY §2.11).
  *
  * Timestamps: the reference uses the FIXED −8 h PST offset for ECCC
  * (ECCC_hourly.py:36,63) — one of the two tz policies it mixes (SURVEY
  * §7.4.3); reproduced per source, not unified.
  */
object EcccSwob {

  private val Vars = Seq("air_temp" -> "TA", "pcpn_amt_pst1hr" -> "PC")

  /** Extract value="..." of <element name="VAR" .../> from raw XML text. */
  private def attrValue(xml: org.apache.spark.sql.Column, name: String) =
    regexp_extract(xml,
      "name=\"" + name + "\"[^>]*value=\"([^\"]*)\"", 1)

  /** Read a directory of SWOB XML files named `<station>_<yyyyMMddHH>.xml`
    * into long obs (param TA/PC). Non-numeric values (e.g. "MSNG") become
    * null via the cast — the P5/F12 scrub without a UDF.
    */
  def readObs(spark: SparkSession, path: String): DataFrame = {
    val files = spark.read.option("wholetext", "true").text(path)
      .withColumn("fname", regexp_extract(input_file_name(), "([^/]+)\\.xml$", 1))
      .withColumn("station", regexp_extract(col("fname"), "^(.+)_(\\d{10})$", 1))
      .withColumn("hour_utc", to_timestamp(
        regexp_extract(col("fname"), "^(.+)_(\\d{10})$", 2), "yyyyMMddHH"))
      // fixed −8 h PST, deliberately NOT DST-aware (ECCC_hourly.py:36,63)
      .withColumn("ts", col("hour_utc") - expr("INTERVAL 8 HOURS"))
    val cols = Vars.map { case (xmlName, param) =>
      struct(lit(param).as("param"),
        attrValue(col("value"), xmlName).as("raw"))
    }
    files.select(col("station"), col("ts"),
        explode(array(cols: _*)).as("pv"))
      // ANSI-safe numeric scrub: try_cast nulls "MSNG" & friends
      .select(col("station"), col("ts"), col("pv.param"),
        expr("try_cast(pv.raw AS DOUBLE)").as("value"))
  }

  /** T3 — the idempotent re-run guard: the work-list of (station, hour)
    * cells not yet fetched = full grid anti-join already-read. The grid is
    * a crossJoin of the station dimension with the hour spine
    * (ECCC_hourly.py:66-75); `done` carries the persisted f_read flag.
    */
  def pendingWork(stations: DataFrame, hours: DataFrame, done: DataFrame): DataFrame =
    stations.crossJoin(hours)
      .join(done.filter(col("f_read")).select("station", "ts"),
            Seq("station", "ts"), "left_anti")
}
