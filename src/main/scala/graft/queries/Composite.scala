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
    "q44_medallion_cascade" -> Q(
      (s, d) => {
        val deduped = Dedup.dedupFirst(Tables.events(s, d),
          Seq("user_id", "event_type"), Seq(col("ts"), col("event_id")))
        val hourly = Resample.resample(deduped, Seq("user_id"), "ts", "value", "hour")
        val patched = Resample.tailPatch(hourly, Seq("user_id"), "bucket",
          "mean_value", "last_value")
          // reference parity: the hourly layer is rounded to 3dp BEFORE the
          // daily job reads it (dischargeobs_write_xl.py:357)
          .withColumn("mean_value", round(col("mean_value"), 3))
        patched.groupBy(col("user_id"),
            date_format(date_trunc("day", col("bucket")), "yyyy-MM-dd").as("day"))
          // stable double-round: means of small-count decimals can land
          // EXACTLY on 3dp midpoints, where cross-engine fp summation
          // order flips round(). 6dp midpoints are unreachable for these
          // rationals (5-adic argument), so snap there first — both
          // engines then round the identical canonical double.
          .agg(round(round(avg(col("mean_value")), 6), 3).as("daily_value"),
               count(col("mean_value")).as("n_hours"))
      },
      Some("""
        WITH deduped AS (
          SELECT * FROM events
          QUALIFY row_number() OVER (PARTITION BY user_id, event_type
                                     ORDER BY ts, event_id) = 1),
        hourly AS (
          SELECT user_id, date_trunc('hour', ts) AS bucket,
                 avg(value) AS mean_value,
                 arg_max(value, CASE WHEN value IS NOT NULL THEN ts END) AS last_value
          FROM deduped GROUP BY 1, 2),
        patched AS (
          SELECT user_id, bucket,
                 round(CASE WHEN bucket = max(CASE WHEN mean_value IS NOT NULL THEN bucket END)
                                    OVER (PARTITION BY user_id)
                      THEN last_value ELSE mean_value END, 3) AS mean_value
          FROM hourly)
        SELECT user_id, strftime(date_trunc('day', bucket), '%Y-%m-%d') AS day,
               round(round(avg(mean_value), 6), 3) AS daily_value,
               count(mean_value) AS n_hours
        FROM patched GROUP BY 1, 2""")),

    // E2d model-input export (dischargeobs_write_xl.py:160-251): hourly →
    // daily cascade → wide pivot → compiled formula estimate → W2
    // blank-on-repeat month labels in export order.
    "q45_export_composite" -> Q(
      (s, d) => {
        val hourly = Tables.events(s, d)
          .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
          .agg(avg(col("value")).as("hv"))
        val daily = hourly
          .groupBy(col("event_type"),
            date_format(date_trunc("day", col("h")), "yyyy-MM-dd").as("day"))
          .agg(avg(col("hv")).as("dv"))
        val wide = daily.groupBy(col("day"))
          .pivot("event_type", Seq("click", "purchase", "signup", "view"))
          .agg(round(round(first(col("dv")), 6), 4))
        val est = Formula.applyEstimates(wide,
          Seq(("est", "(0.5*{click}+0.5*{view}).clip(lower=1)", false)), col)
          .withColumn("est", round(col("est"), 4))
        Fill.blankOnRepeat(
          est.withColumn("month", substring(col("day"), 1, 7)),
          Seq.empty, Seq(col("day")), "month", "month_label")
          .select(col("day"), col("month_label"), col("click"),
                  col("purchase"), col("signup"), col("view"), col("est"))
      },
      Some("""
        WITH hourly AS (
          SELECT event_type, date_trunc('hour', ts) AS h, avg(value) AS hv
          FROM events GROUP BY 1, 2),
        daily AS (
          SELECT event_type, strftime(date_trunc('day', h), '%Y-%m-%d') AS day,
                 avg(hv) AS dv
          FROM hourly GROUP BY 1, 2),
        wide AS (
          SELECT day,
                 round(round(first(dv) FILTER (event_type = 'click'), 6), 4)    AS click,
                 round(round(first(dv) FILTER (event_type = 'purchase'), 6), 4) AS purchase,
                 round(round(first(dv) FILTER (event_type = 'signup'), 6), 4)   AS signup,
                 round(round(first(dv) FILTER (event_type = 'view'), 6), 4)     AS view
          FROM daily GROUP BY day),
        est AS (
          SELECT *, round(CASE WHEN 0.5*click + 0.5*view IS NOT NULL
                               THEN greatest(0.5*click + 0.5*view, 1.0) END, 4) AS est
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
        Interpolate.linearInterpolate(qcd, Seq("user_id"), "ts",
            Seq(col("ts"), col("event_id")), "v", "v_interp")
          .select(col("event_id"), col("user_id"),
                  round(col("v_interp"), 4).as("v_interp"))
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
               round(CASE WHEN v IS NOT NULL THEN v
                          WHEN prev_v IS NOT NULL AND next_v IS NOT NULL
                          THEN prev_v + (next_v - prev_v) * (tsu - prev_t)
                                 / (next_t - prev_t) END, 4) AS v_interp
        FROM framed"""))
  )
}
