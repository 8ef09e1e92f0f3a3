package graft.ingest

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Source normalizers on FIXTURES.md-shaped fixtures: tz policies, dedup
  * order, unit conversion, filename parsing, sheet semantics.
  */
class IngestSpec extends SparkSpec {

  test("WSC: wall-clock tz strip, 5-min round, cross-file keep-first dedup") {
    import spark.implicits._
    val obs = Wsc.readObs(spark, resource("wsc"))
    val q = obs.filter($"param" === "Q" && $"station" === "08MF005")
      .select(date_format($"ts", "HH:mm").as("t"), $"value")
      .as[(String, Option[Double])].collect().toMap
    // 08:04 → 08:05; 08:07:30 half-up → 08:10; 08:12 → 08:10 BUT the
    // 08:07:30 row occupies 08:10 first (file A order) so 08:12's row drops.
    // File A's 08:05 wins over file B's duplicate 9999.9 (keep-first).
    assert(q === Map("08:05" -> Some(1234.5), "08:10" -> Some(1240.0)))
    // stage for the same rows arrives as param H with the same dedup
    val h = obs.filter($"param" === "H" && $"station" === "08MF005")
      .count()
    assert(h === 2)
    // mixed offsets parse as local wall time: -08:00 station lands at 09:00
    val nm = obs.filter($"station" === "08NM050" && $"param" === "Q")
      .select(date_format($"ts", "HH:mm")).as[String].head()
    assert(nm === "09:00")
  }

  test("provincial: semi+re-key join, UTC→Pacific wall, window, keep-first") {
    import spark.implicits._
    val stations = Provincial.stationList(spark, resource("provincial/provincial_station_list.csv"))
    val obs = Provincial.readObs(spark, resource("provincial/Discharge.csv"),
      stations, "Q",
      window = Some((lit("2023-09-10 00:00:00").cast("timestamp"),
                     lit("2023-09-13 00:00:00").cast("timestamp"))))
    val rows = obs.select($"station", date_format($"ts", "yyyy-MM-dd HH:mm").as("t"), $"value")
      .as[(String, String, Option[Double])].collect().toSet
    // UNLISTED1 filtered; 08MG0001 re-keyed to 08MG00A; UTC 15:05 → PDT 08:05;
    // duplicate keeps first (12.34); out-of-window 09-01 row dropped.
    assert(rows === Set(
      ("08MG00A", "2023-09-12 08:05", Some(12.34)),
      ("08MG00B", "2023-09-12 08:10", Some(7.77))))
  }

  test("USGS: cfs→cms and ft→m with 3-dp round, UTC→Pacific, DST dedup") {
    import spark.implicits._
    val obs = Usgs.readObs(spark, resource("usgs"))
    // 2023-11-05 08:55 UTC = 01:55 PDT; 09:55 UTC = 01:55 PST (DST fold!)
    // → duplicate wall time, keep first (530.0-derived value).
    val dup = obs.filter($"station" === "12401500" && $"param" === "Q" &&
        date_format($"ts", "HH:mm") === "01:55")
      .select($"value").as[Option[Double]].collect().toSeq
    assert(dup === Seq(Some(15.008))) // round(530/35.3147, 3)
    val h = obs.filter($"station" === "12401500" && $"param" === "H" &&
        date_format($"ts", "HH:mm") === "02:55")
      .select($"value").as[Option[Double]].head()
    assert(h === Some(0.985)) // round(3.23/3.28084, 3)
    // missing 00065 stays null (param row present, value null)
    val miss = obs.filter($"station" === "12404500" && $"param" === "H")
      .select($"value").as[Option[Double]].head()
    assert(miss === None)
  }

  test("SWOB: filename parse, fixed −8h, attr extraction, MSNG scrub") {
    import spark.implicits._
    val obs = EcccSwob.readObs(spark, resource("swob"))
    val rows = obs.select($"station", date_format($"ts", "yyyy-MM-dd HH").as("t"),
        $"param", $"value")
      .as[(String, String, String, Option[Double])].collect().toSet
    assert(rows === Set(
      ("WAE", "2024-01-14 22", "TA", Some(12.3)),
      ("WAE", "2024-01-14 22", "PC", Some(0.2)),
      ("WBZ", "2024-01-14 22", "TA", None), // MSNG → null, no UDF
      ("WBZ", "2024-01-14 22", "PC", Some(1.5))))
  }

  test("instant sheet: Day+Hour ffill, ts from parts, duplicates kept") {
    import spark.implicits._
    val obs = ExcelShaped.readInstantSheet(spark, resource("excel/all_q.csv"), 2023, "Q")
    val mf = obs.filter($"station" === "08MF005")
      .select(date_format($"ts", "MM-dd HH:mm").as("t"), $"value")
      .as[(String, Option[Double])].collect().toSeq.sortBy(r => (r._1, r._2))
    assert(mf === Seq(
      ("09-12 08:05", Some(1234.5)), ("09-12 08:05", Some(2000.0)),
      ("09-12 08:10", Some(1235.0)), ("09-12 09:00", Some(1236.0))))
  }

  test("hourly sheet: Day-only ffill + year rollover on duplicate ts") {
    import spark.implicits._
    val obs = ExcelShaped.readHourlySheet(spark, resource("excel/hourly_q.csv"), 2023, "Q")
    val mf = obs.filter($"station" === "08MF005")
      .select(date_format($"ts", "yyyy-MM-dd HH").as("t"), $"value")
      .as[(String, Option[Double])].collect().toMap
    assert(mf === Map(
      "2023-01-01 00" -> Some(1100.0), "2023-01-01 01" -> Some(1101.0),
      "2023-12-31 23" -> Some(1234.5),
      "2024-01-01 00" -> Some(1300.0), "2024-01-01 01" -> Some(1301.0)))
  }

  test("ECCC pending-work grid: crossJoin anti-join already-read") {
    import spark.implicits._
    val stations = Seq("WAE", "WBZ").toDF("station")
    val hours = Seq(java.sql.Timestamp.valueOf("2024-01-15 06:00:00"),
      java.sql.Timestamp.valueOf("2024-01-15 07:00:00")).toDF("ts")
    val done = Seq(("WAE", java.sql.Timestamp.valueOf("2024-01-15 06:00:00"), true))
      .toDF("station", "ts", "f_read")
    val pending = EcccSwob.pendingWork(stations, hours, done)
    assert(pending.count() === 3)
  }

  test("NWIS iv URL: RFC-id normalization, 2-day midnight lookback, params") {
    val now = java.time.LocalDateTime.of(2024, 3, 15, 14, 37, 22)
    val url = Fetch.nwisIvUrl(Seq("12U1500", "12404500"), now)
    assert(url ===
      "https://waterservices.usgs.gov/nwis/iv/?format=rdb" +
        "&sites=12001500,12404500" +
        "&startDT=2024-03-13&endDT=2024-03-15" +
        "&parameterCd=00060,00065")
    // lookback crosses a month boundary correctly
    val url2 = Fetch.nwisIvUrl(Seq("07U0001"), java.time.LocalDateTime.of(2024, 3, 1, 1, 0),
      lookbackDays = 2, parameterCds = Seq("00060"))
    assert(url2.contains("startDT=2024-02-28") && url2.contains("sites=07000001"))
    intercept[IllegalArgumentException] { Fetch.nwisIvUrl(Seq.empty, now) }
  }

  test("pooled fetch: bounded concurrency, input order kept, errors -> None") {
    import java.util.concurrent.atomic.AtomicInteger
    val inFlight = new AtomicInteger(0)
    val maxInFlight = new AtomicInteger(0)
    // fake fetcher: no sockets; later-submitted urls FINISH FIRST (sleep
    // inversely proportional to index) so ordered output proves the pool
    // reorders results by input, not completion; url "...bad" throws
    val urls = (1 to 12).map(i => s"http://x/f$i") :+ "http://x/bad"
    val fake = (u: String, dir: String) => {
      val cur = inFlight.incrementAndGet()
      maxInFlight.getAndUpdate(m => math.max(m, cur))
      try {
        if (u.endsWith("bad")) sys.error("connection refused")
        Thread.sleep(if (u.endsWith("f1")) 80L else 5L)
        Some(java.nio.file.Paths.get(dir, u.split("/").last))
      } finally inFlight.decrementAndGet()
    }
    val out = Fetch.fetchAll(urls, "/tmp/stage", parallelism = 4, fetchOne = fake)
    assert(out.map(_._1) === urls, "results must keep input order")
    assert(out.last._2.isEmpty, "a throwing fetch must degrade to None")
    assert(out.init.forall(_._2.nonEmpty))
    assert(out.head._2.get.getFileName.toString === "f1")
    assert(maxInFlight.get() <= 4, s"pool exceeded its bound: ${maxInFlight.get()}")
    assert(maxInFlight.get() >= 2, "fetches never overlapped — pool is sequential")
    // parallelism=1 degrades to the reference's sequential loop, same results
    val seq1 = Fetch.fetchAll(urls, "/tmp/stage", parallelism = 1, fetchOne = fake)
    assert(seq1.map(t => t._1 -> t._2.map(_.toString)) ===
      out.map(t => t._1 -> t._2.map(_.toString)))
    intercept[IllegalArgumentException] {
      Fetch.fetchAll(urls, "/tmp/stage", parallelism = 0, fetchOne = fake)
    }
  }
}
