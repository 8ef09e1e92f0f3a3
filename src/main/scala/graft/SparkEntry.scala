package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.{Dedup, Resample}
import graft.queries.{Advanced, Composite, Q, QueryPack, Relational, TextSim, TimeSeries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  private val packs: Seq[QueryPack] =
    Seq(Relational, TimeSeries, TextSim, Advanced, Composite)

  private lazy val all: Map[String, Q] = packs.flatMap(_.queries).toMap

  /** Flagship: the reference's E2 cascade (SURVEY §3) on the events stream —
    * dedup → hourly resample → tail-patch → daily mean (SURVEY §7.2's
    * minimum end-to-end slice). Driver smoke-checks rows > 0 on sf0.001.
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val deduped = Dedup.dedupFirst(Tables.events(spark, dir),
      Seq("user_id", "event_type"), Seq(col("ts"), col("event_id")))
    val hourly = Resample.resample(deduped, Seq("user_id"), "ts", "value", "hour")
    val patched = Resample.tailPatch(hourly, Seq("user_id"), "bucket",
      "mean_value", "last_value")
    patched
      .groupBy(col("user_id"), date_trunc("day", col("bucket")).as("day"))
      .agg(round(avg(col("mean_value")), 3).as("daily_mean"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map { case (k, q) => k -> q.build }

  /** DuckDB-equivalent SQL for every SQL-expressible query. */
  def oracleSql: Map[String, String] =
    all.collect { case (k, Q(_, Some(sql))) => k -> sql.stripMargin.trim }
}
