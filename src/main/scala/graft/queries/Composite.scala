package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.formula.Formula
import graft.ops.{Dedup, Fill, Interpolate, Resample}

/** Composite pipeline queries: whole reference entry points (SURVEY §3)
  * as single oracle-checked dataflows — operator-level equivalence is
  * necessary but composition is where precedence/ordering bugs live.
  */
object Composite extends QueryPack {

  override val queries: Map[String, Q] = Map(

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
