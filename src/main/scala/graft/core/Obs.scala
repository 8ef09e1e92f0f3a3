package graft.core

import org.apache.spark.sql.types._

/** The engine's canonical observation model (SURVEY §1.4).
  *
  * The reference's wide (ts × station) matrices with data-dependent columns
  * are an anti-pattern at scale; the engine stores the LONG form — stations
  * are data, not schema — and pivots only at export boundaries.
  *
  * param ∈ Q (discharge, cms) | H (stage, m) | TA (air temp) | PC (precip) —
  * the reference's datatype suffixes (dischargeobs_write_xl.py:94-95) and
  * ECCC variables (ECCC_hourly.py:57).
  */
case class Obs(station: String, ts: java.sql.Timestamp, param: String,
               value: Option[Double])

object Obs {
  val Q  = "Q"
  val H  = "H"
  val TA = "TA"
  val PC = "PC"

  val schema: StructType = StructType(Seq(
    StructField("station", StringType, nullable = false),
    StructField("ts", TimestampType, nullable = false),
    StructField("param", StringType, nullable = false),
    StructField("value", DoubleType, nullable = true)))
}
