package graft.ingest

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.{Files, Path, Paths}
import java.time.LocalDateTime
import java.time.format.DateTimeFormatter

/** S1/S2/S3 — driver-side staged download (discharge_obs_pd.py:29-43,
  * 74-84; constants.py:2-11).
  *
  * Network fetch is NOT an engine operator: the reference streams each
  * remote CSV to a local file and the dataflow starts from those files.
  * The engine keeps the same boundary — fetchers fill a staging directory,
  * `spark.read`/`readStream` (StreamingIngest) consume it — so pipelines
  * are testable by fixture injection and the cluster never blocks on
  * third-party endpoints.
  *
  * URL templates carry strftime-style date fields (the reference's
  * `%Y%m%d`-templated DataMart layout): `templated(url, now)` expands
  * them. No concrete service URLs are baked in — they are configuration.
  */
object Fetch {

  /** Expand strftime-ish fields (%Y %m %d %H) in a URL template. */
  def templated(urlTemplate: String, now: LocalDateTime): String =
    urlTemplate
      .replace("%Y", now.format(DateTimeFormatter.ofPattern("yyyy")))
      .replace("%m", now.format(DateTimeFormatter.ofPattern("MM")))
      .replace("%d", now.format(DateTimeFormatter.ofPattern("dd")))
      .replace("%H", now.format(DateTimeFormatter.ofPattern("HH")))

  /** S3 — USGS NWIS instantaneous-values request (discharge_obs_pd.py:
    * 46-61): the reference calls `nwis.get_record(sites, service='iv',
    * start, end)` after normalizing RFC ids ('U' → '00') and flooring the
    * start to midnight `lookbackDays` back. This builds the PUBLIC NWIS iv
    * REST URL (waterservices.usgs.gov is the documented public API the
    * dataretrieval package itself calls) for the staging boundary;
    * `base` is overridable configuration.
    */
  def nwisIvUrl(sites: Seq[String], now: LocalDateTime, lookbackDays: Int = 2,
                parameterCds: Seq[String] = Seq("00060", "00065"),
                base: String = "https://waterservices.usgs.gov/nwis/iv/"): String = {
    require(sites.nonEmpty, "nwisIvUrl needs at least one site")
    val day = DateTimeFormatter.ofPattern("yyyy-MM-dd")
    val start = now.minusDays(lookbackDays.toLong)
      .withHour(0).withMinute(0).withSecond(0)
    s"$base?format=rdb&sites=${sites.map(normalizeRfcSite).mkString(",")}" +
      s"&startDT=${start.format(day)}&endDT=${now.format(day)}" +
      s"&parameterCd=${parameterCds.mkString(",")}"
  }

  /** RFC station ids carry a 'U' where NWIS site numbers have '00'
    * (discharge_obs_pd.py:58). */
  def normalizeRfcSite(rfcId: String): String = rfcId.replace("U", "00")

  /** Download one URL to the staging dir; skip (None) on non-200, matching
    * the reference's tolerant status check (discharge_obs_pd.py:40-43).
    */
  def toStaging(url: String, stagingDir: String,
                client: HttpClient = HttpClient.newHttpClient()): Option[Path] = {
    val fileName = url.split("/").last
    val dest = Paths.get(stagingDir, fileName)
    Files.createDirectories(dest.getParent)
    val resp = client.send(
      HttpRequest.newBuilder(URI.create(url)).GET().build(),
      HttpResponse.BodyHandlers.ofFile(dest))
    if (resp.statusCode() == 200) Some(dest)
    else { Files.deleteIfExists(dest); None }
  }

  /** Bounded-parallel staged download of a WORK LIST — the batch shape the
    * reference runs one URL at a time in a driver loop
    * (ECCC_hourly.py:79-113, per-(station,hour)); at 931 stations × 24 h a
    * sequential backfill is latency-bound, ~threads× slower than the pool.
    *
    *  - `parallelism` bounds in-flight requests — a POLITENESS cap on the
    *    third-party endpoint as much as a throughput knob;
    *  - results keep INPUT order (url → Option[Path]) regardless of
    *    completion order, so downstream bookkeeping is deterministic;
    *  - a fetch that THROWS (DNS, refused connection) degrades to None for
    *    that url — the reference's tolerant skip-on-bad-status, extended
    *    to transport errors: one dead endpoint must not sink a backfill;
    *  - `fetchOne` is injectable (same seam as `toStaging`'s client) so
    *    specs drive the pool against a fake with no sockets.
    *
    * Driver-side by design: staged files must land on ONE filesystem the
    * subsequent `spark.read` can list. Distributing fetches over executors
    * (via the pendingWork frame) only helps when staging is shared storage
    * — on executor-local disks the listing breaks; with shared storage the
    * same `fetchOne` seam can ride `mapPartitions` unchanged.
    */
  def fetchAll(urls: Seq[String], stagingDir: String, parallelism: Int = 8,
               fetchOne: (String, String) => Option[Path] = {
                 // ONE client for the whole work list (a per-URL
                 // HttpClient.newHttpClient() would spawn a selector
                 // thread + pool per request — 22k of them on the
                 // motivating backfill); jdk.httpclient threads are
                 // daemon, so the client is GC-reclaimed after the call
                 val client = HttpClient.newHttpClient()
                 toStaging(_, _, client)
               }): Seq[(String, Option[Path])] = {
    require(parallelism >= 1, s"parallelism must be >= 1, got $parallelism")
    // force strictness: a lazy Seq (LazyList) would defer submission past
    // pool.shutdown() and throw RejectedExecutionException at first use
    val work = urls.toVector
    val pool = java.util.concurrent.Executors.newFixedThreadPool(parallelism)
    try {
      val futures = work.map { u =>
        pool.submit(new java.util.concurrent.Callable[Option[Path]] {
          def call(): Option[Path] =
            try fetchOne(u, stagingDir)
            catch { case e: Exception =>
              System.err.println(s"[fetch] $u failed: ${e.getMessage}")
              None
            }
        })
      }
      work.zip(futures.map(_.get()))
    } finally pool.shutdown()
  }
}
