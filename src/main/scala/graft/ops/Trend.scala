package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-entity trend statistics over event streams — the smoothing /
  * change-detection layer of the monitoring surface (EWMA level, CUSUM
  * changepoint). Both are exact-integer window computations: no
  * cross-engine `pow` is ever evaluated (decay weights are ONE
  * driver-side multiply fold rendered as literal tables in both the
  * Spark plan and the DuckDB oracle — the q146 rboWeights doctrine),
  * and every aggregate sums micro-snapped longs.
  */
object Trend {

  /** Decay-weight tables for [[ewmaLastK]] in nano units, driver-folded:
    * `body(i) = floor(α·β^i·1e9 + 0.5)`, `tail(i) = floor(β^i·1e9+0.5)`
    * with β^i an ITERATIVE product (never a pow call — libm pow differs
    * across engines in the last ulp; an iterative IEEE multiply fold is
    * exactly reproducible anywhere, and as literal longs it doesn't even
    * need to be). Shared by the Spark expression and the oracle SQL so
    * the two weight functions cannot drift.
    */
  private[graft] def ewmaWeightsNano(alpha: Double,
                                     k: Int): (Array[Long], Array[Long]) = {
    require(alpha > 0.0 && alpha < 1.0, s"alpha $alpha outside (0, 1)")
    require(k >= 1 && k <= 4096, s"window $k outside [1, 4096]")
    val beta = 1.0 - alpha
    val pow = new Array[Double](k)
    pow(0) = 1.0
    var i = 1
    while (i < k) { pow(i) = pow(i - 1) * beta; i += 1 }
    (pow.map(p => math.floor(alpha * p * 1e9 + 0.5).toLong),
      pow.map(p => math.floor(p * 1e9 + 0.5).toLong))
  }

  /** Windowed EWMA level per entity: the classic recurrence
    * s₁ = x₁, sₜ = α·xₜ + (1−α)·sₜ₋₁ unrolled over the LAST `k` events
    * (rank-from-newest rk gets weight α·β^(rk−1); the oldest in-window
    * event carries the full tail weight β^(m−1), m = min(n, k)) — the
    * bounded-memory form a streaming smoother actually keeps, and the
    * truncation that makes the per-row weight a FINITE literal table.
    * Terms micro-snap per row before the per-entity sum.
    *
    * Scale shape: one (entity)-keyed window (numerous bounded
    * partitions — per-entity event counts, not corpus-sized), a rank
    * filter to ≤ k rows per entity, one aggregation.
    */
  def ewmaLastK(events: DataFrame, entityCol: String, valueCol: String,
                orderCols: Seq[Column], alpha: Double, k: Int): DataFrame = {
    val (body, tail) = ewmaWeightsNano(alpha, k)
    val w = Window.partitionBy(col(entityCol))
      .orderBy(orderCols.map(_.desc): _*)
    val wg = Window.partitionBy(col(entityCol))
    val ranked = events
      .withColumn("rk", row_number().over(w))
      .withColumn("n_events", count(lit(1)).over(wg))
      .filter(col("rk") <= k)
      .withColumn("m", least(col("n_events"), lit(k.toLong)))
      .withColumn("wn",
        when(col("rk") === col("m"),
          element_at(typedlit(tail.toSeq), col("rk").cast("int")))
          .otherwise(element_at(typedlit(body.toSeq), col("rk").cast("int"))))
      .withColumn("term",
        floor(col(valueCol) * col("wn") / lit(1000.0) + lit(0.5)).cast("long"))
    ranked.groupBy(col(entityCol))
      .agg(max(col("n_events")).as("n_events"),
        sum(col("term")).as("ewma_micro"))
  }

  /** THEIL-SEN robust slope per entity (Theil 1950 / Sen 1968): the
    * median of pairwise slopes over (x = hours since the entity's first
    * event, y = centi-snapped value) — 29% breakdown point where least
    * squares (q116) is yanked by one outlier. Expects the pre-projected
    * frame (user_id, event_id, tus, yc); slopes micro-snap from exact
    * integer (Δcenti, Δhour) pairs and the median is the exact ⌈n/2⌉-th
    * order statistic under the deterministic (slope, e1, e2) order.
    *
    * SCALE DISPATCH (VERDICT r16 #5): the pair term is PER-ENTITY
    * quadratic — calendar-bounded for typical users, but a power user
    * at 100× is a hub bucket (the q113→q210 occupancy problem in
    * per-user form). `cap > 0` keeps the md5-rank top-`cap` events per
    * entity (the q71 deterministic-subsample idiom — seeded, no RNG)
    * BEFORE pair enumeration, bounding every partition at
    * cap·(cap−1)/2 pairs; the estimator stays Theil-Sen on a uniform
    * per-entity subsample (the statistic's standard scale-out, same
    * breakdown point on the sample). x re-bases on the SAMPLED min
    * timestamp — the div-hour bucketing is shift-sensitive, so the
    * re-base is part of the contract both engines replay. cap = 0 is
    * the exact estimator (q195, oracle unchanged); q227 registers
    * cap = 30, which BINDS at every gate SF (~64 events/user at
    * sf0.01), so cap-constant corruption fails the gate.
    */
  def theilSen(ev: DataFrame, cap: Int = 0): DataFrame = {
    val sampled =
      if (cap <= 0) ev
      else {
        val wS = Window.partitionBy(col("user_id"))
          .orderBy(graft.text.TextOps.hashPrefix("tssample|",
            col("event_id")).asc, col("event_id").asc)
        ev.withColumn("srn", row_number().over(wS))
          .filter(col("srn") <= cap).drop("srn")
      }
    // t0 re-base (r20): on the EXACT face the window-min form replaces
    // the groupBy+join-back — every stage of this operator clusters on
    // user_id, so one user_id exchange feeds the re-base, both pair
    // self-join sides (deduped via ReuseExchange) and the median
    // windows (q195 plan 12 → 6 Exchanges, ABAB 2.6 → 1.7/1.8 s). The
    // CAPPED face keeps the agg+join shape: its self-join sides
    // re-evaluate everything above the reused exchange per side, and
    // stacking a second WindowExec on the sample window there measured
    // a consistent ~0.8× ABAB regression (q227 0.87/0.91 → 1.10/1.24)
    // — the capped frame is ≤ cap rows/user, so the tiny agg+broadcast
    // join was never its cost.
    val base = (if (cap <= 0)
        sampled.withColumn("t0",
          min(col("tus")).over(Window.partitionBy(col("user_id"))))
      else
        sampled.join(
          sampled.groupBy(col("user_id")).agg(min(col("tus")).as("t0")),
          Seq("user_id")))
      .withColumn("x", expr("(tus - t0) div 3600000000"))
      .select(col("user_id"), col("event_id"), col("x"), col("yc"))
    val a = base.select(col("user_id"), col("x").as("x1"),
      col("yc").as("y1"), col("event_id").as("e1"))
    val b = base.select(col("user_id"), col("x").as("x2"),
      col("yc").as("y2"), col("event_id").as("e2"))
    val slopes = a.join(b, Seq("user_id"))
      .filter(col("x1") < col("x2"))
      .withColumn("slope_micro",
        floor((col("y2") - col("y1")).cast("double") * lit(1e6)
          / (col("x2") - col("x1")).cast("double") + lit(0.5))
          .cast("long"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("slope_micro"), col("e1"), col("e2"))
    slopes
      .withColumn("rn", row_number().over(w))
      .withColumn("np", count(lit(1))
        .over(Window.partitionBy(col("user_id"))))
      .filter(col("rn") === expr("(np + 1) div 2"))
      .select(col("user_id"), col("np").as("n_pairs"),
        col("slope_micro").as("ts_slope_micro"))
  }

  /** CUSUM changepoint per entity: the split point k maximizing the
    * scaled mean-shift statistic |n·P_k − k·T| (P_k = prefix sum of the
    * centi-snapped value, T = total) — algebraically n·k·|mean(1..k) −
    * mean(all)| with every intermediate an EXACT integer (no division
    * until the final normalized emit; exact while n²·max|x_centi| <
    * 2^63 ≈ per-entity event counts up to ~10⁶ at centi scale).
    * Tie-break: the smallest k. Entities with fewer than 2 events have
    * no interior split and are dropped. `cusum_micro` normalizes by the
    * |D| ≤ n·T bound, so it is comparable across entities.
    */
  def cusumChangepoint(events: DataFrame, entityCol: String,
                       valueCenti: Column,
                       orderCols: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(col(entityCol)).orderBy(orderCols: _*)
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wg = Window.partitionBy(col(entityCol))
    val d = events
      .withColumn("xc", valueCenti)
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("p", sum(col("xc")).over(wRun))
      .withColumn("n", count(lit(1)).over(wg))
      .withColumn("t", sum(col("xc")).over(wg))
      .filter(col("rn") < col("n")) // interior splits only
      .withColumn("absd", abs(col("n") * col("p") - col("rn") * col("t")))
    val wPick = Window.partitionBy(col(entityCol))
      .orderBy(col("absd").desc, col("rn"))
    d.withColumn("pick", row_number().over(wPick))
      .filter(col("pick") === 1)
      .select(col(entityCol), col("n").as("n_events"),
        col("rn").as("cp_k"), col("absd").as("dmax"),
        floor(col("absd").cast("double") * lit(1e6)
          / (col("n").cast("double") * col("t").cast("double")) + lit(0.5))
          .cast("long").as("cusum_micro"))
  }
}
