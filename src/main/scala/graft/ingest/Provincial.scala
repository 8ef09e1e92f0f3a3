package graft.ingest

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.Dedup

/** Provincial non-integrated network Discharge/Stage CSV normalizer
  * (S2/S5 → discharge_obs_pd.py:86-111,332-341).
  *
  * Source shape (FIXTURES.md §2): `Location ID`=col 0, ` Date/Time(UTC)`=
  * col 5, ` Value`=col 7 — note the leading spaces in header names, which
  * the reference renames away (:339-340).
  *
  * Reference semantics:
  *  - membership filter against the provincial station list (:95) — here a
  *    broadcast LEFT SEMI-equivalent via the re-key inner join (J1+P2 in
  *    one: only listed stations survive the lookup);
  *  - ID re-keyed to RFC ID via the dict map (:97) — broadcast join;
  *  - naive-UTC timestamps converted to Pacific WALL time then made naive
  *    (:99) — `from_utc_timestamp`;
  *  - exclusive 2-day import window (:106-107);
  *  - keep-first dedup on (ID, ts) before pivot (:109).
  */
object Provincial {

  val schema: StructType = StructType(Seq(
    StructField("Location ID", StringType),
    StructField("Location Name", StringType),
    StructField("Parameter", StringType),
    StructField("Unit", StringType),
    StructField("Grade", StringType),
    StructField(" Date/Time(UTC)", StringType),
    StructField("Approval", StringType),
    StructField(" Value", DoubleType)))

  /** Station re-key dimension (FIXTURES.md §3): ID → ID2. */
  def stationList(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").csv(path)

  /** Normalize one provincial CSV (Discharge or Stage) to long obs.
    * `param` is "Q" for Discharge.csv, "H" for Stage.csv. The window
    * (start, end) is exclusive on both ends, matching the reference.
    */
  def readObs(spark: SparkSession, path: String, stations: DataFrame,
              param: String, window: Option[(Column, Column)] = None): DataFrame = {
    val raw = spark.read.option("header", "true").schema(schema).csv(path)
      .withColumn("__line", monotonically_increasing_id())
      .select(col("`Location ID`").as("prov_id"),
              from_utc_timestamp(to_timestamp(trim(col("` Date/Time(UTC)`"))), "America/Vancouver").as("ts"),
              col("` Value`").as("value"), col("__line"))
    // J1+P2: inner broadcast join = membership filter + re-key in one pass
    val keyed = raw.join(broadcast(stations), raw("prov_id") === stations("ID"))
      .select(col("ID2").as("station"), col("ts"), col("value"), col("__line"))
    val windowed = window match {
      case Some((start, end)) => keyed.filter(col("ts") > start && col("ts") < end)
      case None               => keyed
    }
    Dedup.dedupFirst(windowed, Seq("station", "ts"), Seq(col("__line")))
      .select(col("station"), col("ts"), lit(param).as("param"), col("value"))
  }
}
