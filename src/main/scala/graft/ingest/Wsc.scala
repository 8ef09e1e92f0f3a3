package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.TimeUtil
import graft.ops.Dedup

/** WSC DataMart hourly hydrometric CSV normalizer (S1/S5 →
  * discharge_obs_pd.py:130-155).
  *
  * Source shape (FIXTURES.md §1): ID, Date (ISO-8601 with MIXED utc
  * offsets), water level = col 2, discharge = col 6.
  *
  * Reference semantics reproduced:
  *  - tz handling: `replace(tzinfo=None)` KEEPS the local wall-clock and
  *    drops the offset (discharge_obs_pd.py:141) — so we strip the trailing
  *    offset before parsing, not convert;
  *  - timestamps rounded half-up to the 5-min grid (:143);
  *  - files concatenated then keep-FIRST dedup on (ID, Date) (:147-150) —
  *    pandas' implicit file order is made explicit and deterministic here
  *    with (input_file_name, line order) — SURVEY §7.4.5.
  */
object Wsc {

  val schema: StructType = StructType(Seq(
    StructField("ID", StringType),
    StructField("Date", StringType),
    StructField("stage", DoubleType),
    StructField("grade_h", StringType),
    StructField("symbol_h", StringType),
    StructField("qaqc_h", StringType),
    StructField("discharge", DoubleType),
    StructField("grade_q", StringType),
    StructField("symbol_q", StringType),
    StructField("qaqc_q", StringType)))

  /** Read raw WSC CSVs (a glob/dir of per-station files) into the long
    * observation frame: (station, ts, param, value). */
  def readObs(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read
      .option("header", "true")
      .schema(schema)
      .csv(path)
      // deterministic "keep first" order: file name, then position in file
      .withColumn("__file", input_file_name())
      .withColumn("__line", monotonically_increasing_id())
    val ts = TimeUtil.round5min(to_timestamp(
      regexp_replace(col("Date"), "(Z|[+-]\\d{2}:?\\d{2})$", ""),
      "yyyy-MM-dd'T'HH:mm:ss"))
    val parsed = raw.select(col("ID").as("station"), ts.as("ts"),
      col("stage"), col("discharge"), col("__file"), col("__line"))
    val deduped = Dedup.dedupFirst(parsed, Seq("station", "ts"),
      Seq(col("__file"), col("__line")))
    // wide → long: one row per (param, value); null values kept (a missing
    // reading is data — it participates in combine_first precedence).
    deduped.select(col("station"), col("ts"),
        explode(map(lit("Q"), col("discharge"), lit("H"), col("stage"))).as(Seq("param", "value")))
  }
}
