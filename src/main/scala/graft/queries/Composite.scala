package graft.queries

import org.apache.spark.sql.functions._
import graft.core.{Tables, TimeUtil}
import graft.formula.Formula
import graft.ops.{Dedup, Fill, Interpolate, Resample}
import graft.storage.ObsStore

/** Composite pipeline queries: whole reference entry points (SURVEY §3)
  * as single oracle-checked dataflows — operator-level equivalence is
  * necessary but composition is where precedence/ordering bugs live.
  */
object Composite extends QueryPack {

  // q28 materializes a real store per invocation; without cleanup, bench
  // loops leak a parquet tree per run into the temp dir
  private val tempDirs = new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]()
  private lazy val cleanupHook: Unit =
    sys.addShutdownHook {
      tempDirs.forEach { p =>
        try {
          java.nio.file.Files.walk(p)
            .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
            .forEach(f => java.nio.file.Files.deleteIfExists(f))
        } catch { case scala.util.control.NonFatal(_) => () }
      }
    }
  private def deleteRecursivelyOnExit(p: java.nio.file.Path): Unit = {
    cleanupHook
    tempDirs.add(p)
  }

  override val queries: Map[String, Q] = Map(

    // E3 grid-resume composite (fills the q09 numbering gap): the ECCC
    // pending-work pattern end-to-end — expected station×hour grid (J10 +
    // distributed spine F7), observed hours joined in (T3 resume
    // semantics), missing slots backfilled from the most recent
    // observation within a bounded 24 h lookback (the cron-resume story:
    // a tick that went down reconstructs what it can and labels the
    // rest). Values are PICKED raw doubles (max_by, no summation) — no
    // cross-engine rounding hazards.
    "q09_grid_resume" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val ev = Tables.events(s, d)
        val hourly = ev
          .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("h"))
          .agg(max_by(col("value"), struct(col("ts"), col("event_id"))).as("hv"))
        val users = ev.select(col("user_id")).distinct()
        val grid = users.crossJoin(broadcast(TimeUtil.spineOver(ev, "ts", "hour", "1 hour")
          .select(col("ts").as("h"))))
        val w = Window.partitionBy(col("user_id")).orderBy(col("h"))
          .rowsBetween(-24, -1)
        grid.join(hourly, Seq("user_id", "h"), "left")
          .withColumn("lastv", last(col("hv"), ignoreNulls = true).over(w))
          .select(col("user_id"),
            date_format(col("h"), "yyyy-MM-dd HH").as("hour"),
            when(col("hv").isNotNull, lit("done"))
              .when(col("lastv").isNotNull, lit("backfilled"))
              .otherwise(lit("missing")).as("status"),
            coalesce(col("hv"), col("lastv")).as("value"))
      },
      Some("""
        WITH bounds AS (
          SELECT date_trunc('hour', min(ts)) AS lo, date_trunc('hour', max(ts)) AS hi
          FROM events),
        spine AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
                  FROM bounds),
        hourly AS (
          SELECT user_id, date_trunc('hour', ts) AS h, value AS hv
          FROM events
          QUALIFY row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts)
                                     ORDER BY ts DESC, event_id DESC) = 1),
        grid AS (SELECT u.user_id, s.h
                 FROM (SELECT DISTINCT user_id FROM events) u CROSS JOIN spine s),
        joined AS (
          SELECT g.user_id, g.h, hourly.hv
          FROM grid g LEFT JOIN hourly ON hourly.user_id = g.user_id AND hourly.h = g.h),
        framed AS (
          SELECT *, last_value(hv IGNORE NULLS) OVER
                      (PARTITION BY user_id ORDER BY h
                       ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING) AS lastv
          FROM joined)
        SELECT user_id, strftime(h, '%Y-%m-%d %H') AS hour,
               CASE WHEN hv IS NOT NULL THEN 'done'
                    WHEN lastv IS NOT NULL THEN 'backfilled'
                    ELSE 'missing' END AS status,
               coalesce(hv, lastv) AS value
        FROM framed""")),

    // Store round-trip composite (fills the q28 numbering gap): the
    // streaming-tick → store → read-back story as ONE oracle-checked
    // dataflow — historical batch written to a REAL partitioned ObsStore
    // (yyyymm, param), an incremental tick merge-upserted (pruned read,
    // old-wins combine_first, dynamic partition overwrite), then the
    // store READ BACK and rolled up. The oracle recomputes the merge
    // declaratively, so the physical write→merge→read cycle must
    // preserve every cell bit-for-bit to pass. Mean uses the exact
    // integer-cents doctrine (see q44).
    // JSONL corpus round-trip: documents → gzip JSONL shards
    // (Exports.writeJsonl — each task its own shard, no driver funnel) →
    // explicit-schema read-back (Sources.readJsonl — no inference pass)
    // → per-source content digest. The checksum aggregates text md5s
    // with an order-independent XOR (the q117 idiom), so any dropped
    // row, mangled escape, or re-encoded character hash-fails against
    // the oracle, which reads the PARQUET originals — the round-trip
    // itself is what's under test.
    "q118_jsonl_roundtrip" -> Q(
      (s, d) => {
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("text"))
        val tmp = java.nio.file.Files.createTempDirectory("graft_q118")
        Composite.deleteRecursivelyOnExit(tmp)
        val dir = tmp.resolve("corpus_jsonl").toString
        graft.export.Exports.writeJsonl(docs, dir, rowsPerFile = 2000)
        val schema = org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("doc_id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("source",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("text",
            org.apache.spark.sql.types.StringType)))
        graft.sources.Sources.readJsonl(s, dir, schema)
          .select(col("source"),
            conv(substring(md5(col("text")), 1, 15), 16, 10)
              .cast("long").as("h"),
            length(col("text")).as("len"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            expr("bit_xor(h)").as("text_checksum"),
            sum(col("len")).as("total_chars"))
      },
      Some("""
        SELECT source, count(*)::BIGINT AS n_docs,
               bit_xor(('0x' || substr(md5(text), 1, 15))::BIGINT)
                 AS text_checksum,
               sum(length(text))::BIGINT AS total_chars
        FROM documents GROUP BY 1""")),

    "q28_store_roundtrip" -> Q(
      (s, d) => {
        val ev = Tables.events(s, d).select(
          col("user_id").cast("string").as("station"), col("ts"),
          col("event_type").as("param"), col("value"), col("event_id"))
        def half(pred: org.apache.spark.sql.Column) =
          Dedup.dedupFirst(ev.filter(pred), Seq("station", "ts", "param"),
            Seq(col("event_id"))).drop("event_id")
        val tmp = java.nio.file.Files.createTempDirectory("graft_q28")
        Composite.deleteRecursivelyOnExit(tmp)
        val dir = tmp.resolve("store").toString
        val store = new ObsStore(s, dir)
        store.write(half(col("event_id") % 3 =!= 0))
        store.mergeUpsert(half(col("event_id") % 3 === 0))
        store.read()
          .groupBy(col("station"), col("yyyymm").cast("string").as("yyyymm"))
          .agg(count(col("value")).as("n_obs"),
               sum(round(col("value") * 100)).cast("long").as("cents"))
          .select(col("station"), col("yyyymm"), col("n_obs"),
            (col("cents") / (col("n_obs") * 100)).as("mean_value"))
      },
      Some("""
        WITH ev AS (
          SELECT user_id::VARCHAR AS station, ts, event_type AS param,
                 value, event_id
          FROM events),
        hist AS (
          SELECT station, ts, param, value FROM ev WHERE event_id % 3 <> 0
          QUALIFY row_number() OVER (PARTITION BY station, ts, param
                                     ORDER BY event_id) = 1),
        tick AS (
          SELECT station, ts, param, value FROM ev WHERE event_id % 3 = 0
          QUALIFY row_number() OVER (PARTITION BY station, ts, param
                                     ORDER BY event_id) = 1),
        merged AS (
          SELECT coalesce(h.station, t.station) AS station,
                 coalesce(h.ts, t.ts) AS ts,
                 coalesce(h.value, t.value) AS value
          FROM hist h FULL OUTER JOIN tick t
            ON h.station = t.station AND h.ts = t.ts AND h.param = t.param)
        SELECT station, strftime(date_trunc('month', ts), '%Y%m') AS yyyymm,
               count(value) AS n_obs,
               sum(round(value * 100))::BIGINT / (count(value) * 100) AS mean_value
        FROM merged GROUP BY 1, 2""")),

    // E2 medallion cascade (dischargeobs_write_xl.py:278-392): keep-first
    // dedup → hourly mean + last → tail-patch → daily mean → round(3).
    // ORACLE-STABLE LAYERING: each layer converts to exact integer units
    // before summing (integer-valued doubles sum exactly in any order
    // below 2^53) and divides per-row afterward — bit-identical across
    // engines with NO rounding, which is the only portable option (exact
    // decimal midpoints are reachable at every precision for power-of-2×5
    // counts, and the engines round the same midpoint double differently).
    // The hourly layer lands on the reference's 3dp grid via
    // floor(s·10/n + 0.5) over EXACT integer cents — floor arithmetic on
    // exact inputs is engine-identical even at midpoints.
    "q44_medallion_cascade" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val deduped = Dedup.dedupFirst(Tables.events(s, d),
          Seq("user_id", "event_type"), Seq(col("ts"), col("event_id")))
        val hourly = deduped
          .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("bucket"))
          .agg(sum(round(col("value") * 100)).as("s"),
               count(col("value")).as("n"),
               max_by(col("value"), when(col("value").isNotNull, col("ts"))).as("last_value"))
        val w = Window.partitionBy(col("user_id"))
        // hourly value in milli-units (3dp grid, reference parity)
        val patched = hourly
          .withColumn("__lv", max(when(col("s").isNotNull, col("bucket"))).over(w))
          .withColumn("k",
            when(col("bucket") === col("__lv"), round(col("last_value") * 100) * 10)
              .otherwise(floor(col("s") * 10.0 / col("n") + 0.5)))
        patched.groupBy(col("user_id"),
            date_format(date_trunc("day", col("bucket")), "yyyy-MM-dd").as("day"))
          .agg((sum(col("k")) / (count(col("k")) * 1000)).as("daily_value"),
               count(col("k")).as("n_hours"))
      },
      Some("""
        WITH deduped AS (
          SELECT * FROM events
          QUALIFY row_number() OVER (PARTITION BY user_id, event_type
                                     ORDER BY ts, event_id) = 1),
        hourly AS (
          SELECT user_id, date_trunc('hour', ts) AS bucket,
                 sum(round(value * 100)) AS s, count(value) AS n,
                 arg_max(value, CASE WHEN value IS NOT NULL THEN ts END) AS last_value
          FROM deduped GROUP BY 1, 2),
        patched AS (
          SELECT user_id, bucket,
                 CASE WHEN bucket = max(CASE WHEN s IS NOT NULL THEN bucket END)
                                    OVER (PARTITION BY user_id)
                      THEN round(last_value * 100) * 10
                      ELSE floor(s * 10.0 / n + 0.5) END AS k
          FROM hourly)
        SELECT user_id, strftime(date_trunc('day', bucket), '%Y-%m-%d') AS day,
               sum(k) / (count(k) * 1000) AS daily_value,
               count(k) AS n_hours
        FROM patched GROUP BY 1, 2""")),

    // E2d model-input export (dischargeobs_write_xl.py:160-251): hourly →
    // daily cascade → wide pivot → compiled formula estimate → W2
    // blank-on-repeat month labels in export order.
    "q45_export_composite" -> Q(
      (s, d) => {
        // oracle-stable layering (see q44): exact cent sums per hour, 3dp
        // milli-grid via floor on exact inputs, exact milli sums per day
        val hourly = Tables.events(s, d)
          .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
          .agg(sum(round(col("value") * 100)).as("s"), count(col("value")).as("n"))
          .withColumn("kh", floor(col("s") * 10.0 / col("n") + 0.5))
        val daily = hourly
          .groupBy(col("event_type"),
            date_format(date_trunc("day", col("h")), "yyyy-MM-dd").as("day"))
          .agg((sum(col("kh")) / (count(col("kh")) * 1000)).as("dv"))
        val wide = daily.groupBy(col("day"))
          .pivot("event_type", Seq("click", "purchase", "signup", "view"))
          .agg(first(col("dv")))
        val est = Formula.applyEstimates(wide,
          Seq(("est", "(0.5*{click}+0.5*{view}).clip(lower=1)", false)), col)
        // month is MONOTONE in day order ⇒ the label-partitioned form is
        // exact and fully distributed (no global window)
        Fill.blankOnRepeatByLabel(
          est.withColumn("month", substring(col("day"), 1, 7)),
          Seq(col("day")), "month", "month_label")
          .select(col("day"), col("month_label"), col("click"),
                  col("purchase"), col("signup"), col("view"), col("est"))
      },
      Some("""
        WITH hourly AS (
          SELECT event_type, date_trunc('hour', ts) AS h,
                 floor(sum(round(value * 100)) * 10.0 / count(value) + 0.5) AS kh
          FROM events GROUP BY 1, 2),
        daily AS (
          SELECT event_type, strftime(date_trunc('day', h), '%Y-%m-%d') AS day,
                 sum(kh) / (count(kh) * 1000) AS dv
          FROM hourly GROUP BY 1, 2),
        wide AS (
          SELECT day,
                 first(dv) FILTER (event_type = 'click')    AS click,
                 first(dv) FILTER (event_type = 'purchase') AS purchase,
                 first(dv) FILTER (event_type = 'signup')   AS signup,
                 first(dv) FILTER (event_type = 'view')     AS view
          FROM daily GROUP BY day),
        est AS (
          SELECT *, CASE WHEN 0.5*click + 0.5*view IS NOT NULL
                         THEN greatest(0.5*click + 0.5*view, 1.0) END AS est
          FROM wide)
        SELECT day,
               CASE WHEN lag(substr(day, 1, 7)) OVER (ORDER BY day) = substr(day, 1, 7)
                    THEN '' ELSE substr(day, 1, 7) END AS month_label,
               click, purchase, signup, view, est
        FROM est""")),

    // QC + gap interpolation (the reference's own TODOs,
    // dischargeobs_write_xl.py:265-271): shift values so ~half fail QC (median is ~34.6, shift 35: ~half go
    // negative), null them as QC failures, then linearly interpolate the
    // bracketed gaps over event time. Leading/trailing gaps stay null.
    "q46_qc_interpolate" -> Q(
      (s, d) => {
        val shifted = Tables.events(s, d)
          .withColumn("v", col("value") - 35)
        val qcd = Interpolate.nullifyOutOfRange(shifted, "v", 0.0, 1e9)
        // raw output: the interpolation is per-row arithmetic over
        // identical inputs — bit-identical across engines, no rounding
        Interpolate.linearInterpolate(qcd, Seq("user_id"), "ts",
            Seq(col("ts"), col("event_id")), "v", "v_interp")
          .select(col("event_id"), col("user_id"), col("v_interp"))
      },
      Some("""
        WITH qcd AS (
          SELECT event_id, user_id, ts, epoch_us(ts) AS tsu,
                 CASE WHEN value - 35 BETWEEN 0 AND 1e9
                      THEN value - 35 END AS v
          FROM events),
        framed AS (
          SELECT *,
            last_value(v IGNORE NULLS) OVER
              (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_v,
            last_value(CASE WHEN v IS NOT NULL THEN tsu END IGNORE NULLS) OVER
              (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_t,
            first_value(v IGNORE NULLS) OVER
              (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_v,
            first_value(CASE WHEN v IS NOT NULL THEN tsu END IGNORE NULLS) OVER
              (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_t
          FROM qcd)
        SELECT event_id, user_id,
               CASE WHEN v IS NOT NULL THEN v
                    WHEN prev_v IS NOT NULL AND next_v IS NOT NULL
                    THEN prev_v + (next_v - prev_v) * (tsu - prev_t)
                           / (next_t - prev_t) END AS v_interp
        FROM framed"""))
  )
}
