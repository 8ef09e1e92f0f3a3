package graft.core

import org.apache.spark.sql.functions._
import graft.SparkSpec

class TimeUtilSpec extends SparkSpec {

  test("round5min: half-up at the 2.5-minute midpoint, integral arithmetic") {
    import spark.implicits._
    val rows = Seq(
      "2023-09-12 08:04:59", "2023-09-12 08:07:30",  // midpoint → up
      "2023-09-12 08:07:29", "2023-09-12 08:10:00")
      .toDF("s")
      .select(TimeUtil.round5min(to_timestamp($"s")).cast("string").as("r"))
      .as[String].collect().toSeq
    assert(rows === Seq(
      "2023-09-12 08:05:00", "2023-09-12 08:10:00",
      "2023-09-12 08:05:00", "2023-09-12 08:10:00"))
  }

  test("spine: inclusive bounds, distributed generation") {
    val sp = TimeUtil.spine(spark, "2023-01-01 00:00:00", "2023-01-01 01:00:00", "15 minutes")
    assert(sp.count() === 5)
  }

  test("spineOver spans min..max truncated to unit") {
    import spark.implicits._
    val df = Seq("2023-01-01 00:10:00", "2023-01-01 03:40:00").toDF("s")
      .select(to_timestamp($"s").as("ts"))
    assert(TimeUtil.spineOver(df, "ts", "hour", "1 hour").count() === 4)
  }
}
