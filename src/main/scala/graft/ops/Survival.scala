package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** KAPLAN-MEIER survival estimation over an event stream (Kaplan &
  * Meier 1958, the standard right-censored product-limit estimator) —
  * time-to-conversion with honest censoring: a user who has not
  * purchased YET is not a non-converter, they are censored at their
  * last observed event, and dropping them (or counting them as
  * failures) biases the conversion curve the way naive funnel rates
  * always do. (Reference scope note: the reference engine
  * (bcgov/nr-rfc-dischargeobs) has no event analytics; this extends
  * the post-parity pack, SURVEY §2 extension table.)
  *
  * Semantics: per entity, t0 = first event, the "death" = first event
  * matching `eventPred` (duration t_event − t0 in whole days), else
  * censored at the last event. At each duration day t:
  * n_risk(t) = entities with duration ≥ t, d(t) = conversions at t,
  * c(t) = censorings at t (censored-at-t entities still count at risk
  * at t — the standard deaths-before-censorings convention), and
  * S(t) = Π_{u ≤ t} (1 − d(u)/n_risk(u)).
  *
  * Exactness + scale: the corpus pays ONE entity aggregation (three
  * min/max in a single groupBy) and one duration-histogram
  * aggregation; windows run over the guarded day histogram only (the
  * cumeDist doctrine — never over entities). The output carries
  * ln S(t) as `ln_surv_micro` — each step's ln((n−d)/n) micro-snaps
  * from exact integers and the cumulative sum is then exact, so both
  * engines agree bit-for-bit; exp is left to the reader (a cross-
  * engine exp would reintroduce the transcendental-tail risk for zero
  * analytical gain). A step that exhausts the risk set (d = n) pins
  * the sentinel term −10^15 (S = 0 — ln is −∞); Spark's null-skipping
  * sum would silently DROP a null term, so the sentinel is load-
  * bearing, not cosmetic.
  */
object Survival {

  private val DayMicros = 86400000000L

  /** One row per observed duration day: (dur_days, n_risk, d, c,
    * ln_surv_micro). `eventPred` marks the terminal event rows.
    */
  def kaplanMeier(events: DataFrame, entityCol: String, tsCol: String,
                  eventPred: Column, maxCells: Long = 100000L): DataFrame = {
    val perEntity = events.groupBy(col(entityCol).as("entity"))
      .agg(min(unix_micros(col(tsCol))).as("t0"),
        min(when(eventPred, unix_micros(col(tsCol)))).as("tp"),
        max(unix_micros(col(tsCol))).as("tl"))
    val dur = perEntity.select(
      when(col("tp").isNotNull,
        expr(s"(tp - t0) div $DayMicros"))
        .otherwise(expr(s"(tl - t0) div $DayMicros")).as("dur_days"),
      when(col("tp").isNotNull, lit(1L)).otherwise(lit(0L)).as("ev"))
    // day histogram — checkpointed: the guard count, the total, and the
    // window consumer read one materialization (the q124 hand-off rule)
    val hist = dur.groupBy(col("dur_days"))
      .agg(sum(col("ev")).as("d"), sum(lit(1L) - col("ev")).as("c"))
      .localCheckpoint(true)
    val nCells = hist.count()
    require(nCells <= maxCells,
      s"kaplanMeier duration histogram has $nCells day cells " +
        s"(> $maxCells): durations are expected calendar-bounded — " +
        "coarsen the duration unit or raise maxCells deliberately")
    val total = hist.agg(sum(col("d") + col("c")).as("n_total"))
    val wPrev = Window.orderBy(col("dur_days"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wCur = Window.orderBy(col("dur_days"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hist.crossJoin(broadcast(total))
      .withColumn("n_risk",
        col("n_total") - coalesce(sum(col("d") + col("c")).over(wPrev), lit(0L)))
      .withColumn("term",
        when(col("d") === 0, lit(0L))
          .when(col("d") === col("n_risk"), lit(-1000000000000000L))
          .otherwise(floor(
            log((col("n_risk") - col("d")).cast("double")
              / col("n_risk").cast("double")) * lit(1e6) + lit(0.5))
            .cast("long")))
      .withColumn("ln_surv_micro", sum(col("term")).over(wCur))
      .select(col("dur_days"), col("n_risk"), col("d"), col("c"),
        col("ln_surv_micro"))
  }

  /** LOG-RANK TEST (Mantel 1966 — the standard two-cohort survival
    * comparison): does cohort A convert on a different clock than
    * cohort B? At each duration day t with d(t) total conversions,
    * cohort g's expected share under the null is
    * E_g(t) = d·n_g/n, with hypergeometric variance
    * V(t) = d·(n_g/n)·(1 − n_g/n)·(n − d)/(n − 1); the statistic is
    * z = Σ(O_1 − E_1)/√ΣV — |z| > 1.96 rejects "same hazard".
    *
    * Exactness + scale: same shape as [[kaplanMeier]] — one entity
    * aggregation, a guarded (day × cohort) histogram, windows over the
    * histogram only. O, d, n, n_g are exact integers at every step;
    * E and V contributions micro-snap per day before the integer sums
    * (the q66 doctrine), so both engines carry identical longs into
    * the single final z division. Days with n ≤ 1 or d = 0 contribute
    * zero to both sums in both engines.
    */
  def logRank(events: DataFrame, entityCol: String, tsCol: String,
              eventPred: Column, cohortCol: Column,
              maxCells: Long = 100000L): DataFrame = {
    val perEntity = events.groupBy(col(entityCol).as("entity"))
      .agg(min(unix_micros(col(tsCol))).as("t0"),
        min(when(eventPred, unix_micros(col(tsCol)))).as("tp"),
        max(unix_micros(col(tsCol))).as("tl"),
        max(cohortCol).as("cohort"))
    val dur = perEntity.select(col("cohort"),
      when(col("tp").isNotNull,
        expr(s"(tp - t0) div $DayMicros"))
        .otherwise(expr(s"(tl - t0) div $DayMicros")).as("dur_days"),
      when(col("tp").isNotNull, lit(1L)).otherwise(lit(0L)).as("ev"))
    val hist = dur.groupBy(col("dur_days"), col("cohort"))
      .agg(sum(col("ev")).as("d"), count(lit(1)).as("m"))
      .localCheckpoint(true)
    val nCells = hist.count()
    require(nCells <= maxCells,
      s"logRank histogram has $nCells (day × cohort) cells " +
        s"(> $maxCells): coarsen the duration unit or raise maxCells")
    // per-day totals + cohort-1 slice, then risk sets from cumulative
    // windows over the bounded day frame
    val day = hist.groupBy(col("dur_days"))
      .agg(sum(col("d")).as("d_all"), sum(col("m")).as("m_all"),
        sum(when(col("cohort") === 1, col("d")).otherwise(0L)).as("d1"),
        sum(when(col("cohort") === 1, col("m")).otherwise(0L)).as("m1"))
    val wPrev = Window.orderBy(col("dur_days"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val tot = day.agg(sum(col("m_all")).as("n_tot"), sum(col("m1")).as("n1_tot"))
    val risk = day.crossJoin(broadcast(tot))
      .withColumn("n",
        col("n_tot") - coalesce(sum(col("m_all")).over(wPrev), lit(0L)))
      .withColumn("n1",
        col("n1_tot") - coalesce(sum(col("m1")).over(wPrev), lit(0L)))
    val contrib = risk
      .withColumn("oe_micro",
        when(col("d_all") === 0 || col("n") <= 1, lit(0L))
          .otherwise(floor((col("d1").cast("double")
            - col("d_all").cast("double") * col("n1").cast("double")
              / col("n").cast("double")) * lit(1e6) + lit(0.5)).cast("long")))
      .withColumn("v_micro",
        when(col("d_all") === 0 || col("n") <= 1, lit(0L))
          .otherwise(floor(col("d_all").cast("double")
            * (col("n1").cast("double") / col("n").cast("double"))
            * (lit(1.0) - col("n1").cast("double") / col("n").cast("double"))
            * (col("n") - col("d_all")).cast("double")
            / (col("n") - 1).cast("double") * lit(1e6) + lit(0.5))
            .cast("long")))
    contrib.agg(sum(col("oe_micro")).as("oe_sum_micro"),
        sum(col("v_micro")).as("v_sum_micro"))
      .withColumn("z_micro",
        when(col("v_sum_micro") > 0,
          floor(col("oe_sum_micro").cast("double")
            / sqrt(col("v_sum_micro").cast("double") / lit(1e6)) + lit(0.5))
            .cast("long")))
  }
}
