package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-group score CALIBRATION — the cross-source fairness primitive a
  * mixture-building pipeline needs before it can apply one global quality
  * threshold: raw quality scores are not comparable across sources (a
  * boilerplate-heavy crawl scores lower everywhere than a curated wiki
  * dump), so gating on the raw score silently starves whole sources.
  * Mapping every score to its within-source cumulative fraction
  * (`cume_dist`) makes "keep the top half" mean the top half OF EACH
  * SOURCE. (Reference scope note: the reference engine
  * (bcgov/nr-rfc-dischargeobs) has no corpus operators; this extends the
  * post-parity LLM-pipeline pack, SURVEY §2 extension table.)
  *
  * Scale shape: the naive form — `cume_dist() OVER (PARTITION BY source
  * ORDER BY score)` — sorts every source's full row set inside single
  * tasks: one task per source at corpus scale, i.e. the exact
  * single-task-window failure the repo's doctrine forbids
  * (groupedQuantile, waterfillBudget). This operator instead windows over
  * the (group, snapped-score) HISTOGRAM: the corpus pays one cell
  * aggregation (map-side combined) and one join back; only the
  * cell frame — guarded ≤ `maxHistCells`, the groupedQuantile contract —
  * is windowed. The guard pass and the window share one checkpointed
  * materialization (the q124 hand-off doctrine: per-consumer column
  * pruning defeats exchange reuse, so an uncheckpointed cell frame would
  * re-run the corpus aggregation per consumer).
  *
  * Determinism: ties in the raw score share a snapped cell, so they get
  * the SAME calibrated value on any engine and any partitioning —
  * `cume_dist` semantics exactly (count of rows ≤ mine / n), computed as
  * `floor(cum·1e6/n + 0.5)` in integer-exact inputs with one final
  * double division, mirrored op-for-op by the oracle.
  */
object Calibrate {

  /** Appends `score_micro`, `pct_micro` (calibrated cume-dist in
    * micro-units) and `n_group` to `df`. `scoreMicro` must be a
    * LongType micro-snapped score expression (caller snaps; this keeps
    * the operator reusable for scores that are already integers).
    */
  def cumeDist(df: DataFrame, groupCol: String, scoreMicro: Column,
               maxHistCells: Long = 4000000L): DataFrame = {
    val scored = df.withColumn("score_micro", scoreMicro)
    // distributed histogram; checkpointed so the bound guard and the
    // window consumer read one materialization
    val cells = scored.groupBy(col(groupCol), col("score_micro"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    val nCells = cells.count()
    require(nCells <= maxHistCells,
      s"cumeDist histogram has $nCells (group × score) cells " +
        s"(> $maxHistCells): the contract is a bounded group column and a " +
        "snapped bounded score — reduce group cardinality or raise " +
        "maxHistCells deliberately")
    // window over CELLS only (bounded by the guard above) — cells are
    // distinct per (group, score), so ROWS and RANGE frames agree
    val w = Window.partitionBy(col(groupCol)).orderBy(col("score_micro"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = cells.withColumn("cum", sum(col("c")).over(w))
    val n = cells.groupBy(col(groupCol)).agg(sum(col("c")).as("n_group"))
    // both joins are histogram-sized (cells / groups) — unhinted by the
    // broadcast-scaling doctrine; AQE picks broadcast when they fit
    scored
      .join(cum.select(col(groupCol), col("score_micro"), col("cum")),
        Seq(groupCol, "score_micro"))
      .join(n, Seq(groupCol))
      .withColumn("pct_micro",
        floor(col("cum").cast("double") * lit(1e6) /
          col("n_group").cast("double") + lit(0.5)).cast("long"))
      .drop("cum")
  }

  /** Per-group PEARSON CORRELATION between two integer-valued per-row
    * signals — the score-drift diagnostic a curation pipeline runs to
    * catch a scorer that has degenerated into a length proxy (or any two
    * scores that should / should not co-move, per source). Rank-based
    * coefficients (Spearman/Kendall) need a per-group total ordering —
    * the single-task-window shape [[cumeDist]] exists to avoid — while
    * Pearson is five plain distributed sums, so it is the coefficient
    * that scales without ceremony.
    *
    * Exactness: `x` and `y` must be integer (LongType) expressions; the
    * five moments (Σx, Σy, Σx², Σy², Σxy) are exact integer sums —
    * aggregation-order-independent — and
    * r = (n·Σxy − Σx·Σy) / (sqrt(n·Σx² − (Σx)²) · sqrt(n·Σy² − (Σy)²))
    * is then evaluated in ONE fixed double-op sequence from those longs,
    * mirrored op-for-op by the oracle; the output is micro-snapped.
    * Degenerate groups (n < 2 or zero variance in either signal) emit a
    * null coefficient rather than NaN.
    *
    * Overflow: Σxy sums |x·y| per row — with micro-snapped scores (~1e6)
    * and natural counts (~1e4) the per-group budget is ~1e8 rows before
    * a long saturates; past that, shift to coarser snap units (the same
    * knob every micro-sum in this repo exposes). The long→double casts in
    * the final formula are deliberate: n·Σxy as a LONG product could
    * overflow where the double product only loses ulps, identically on
    * both engines.
    */
  def groupedPearson(df: DataFrame, groupCol: String,
                     x: Column, y: Column): DataFrame = {
    val m = df
      .select(col(groupCol), x.cast("long").as("x"), y.cast("long").as("y"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"),
        sum(col("x") * col("y")).as("sxy"))
    val nD = col("n_rows").cast("double")
    val num = nD * col("sxy").cast("double") -
      col("sx").cast("double") * col("sy").cast("double")
    val vx = nD * col("sxx").cast("double") -
      col("sx").cast("double") * col("sx").cast("double")
    val vy = nD * col("syy").cast("double") -
      col("sy").cast("double") * col("sy").cast("double")
    m.withColumn("corr_micro",
        when(col("n_rows") >= 2 && vx > 0.0 && vy > 0.0,
          floor(num / (sqrt(vx) * sqrt(vy)) * lit(1e6) + lit(0.5)).cast("long")))
      .select(col(groupCol), col("n_rows"), col("corr_micro"),
        (col("corr_micro").cast("double") / lit(1e6)).as("corr"))
  }

  /** CHI-SQUARE INDEPENDENCE cells for two categorical columns — the
    * "are my sources language-balanced" (or any category × category)
    * monitoring statistic: per (row, col) cell the observed count, the
    * independence-expected count E = rowTotal·colTotal/N, and the
    * micro-snapped χ² contribution (O−E)²/E. The corpus pays ONE cell
    * aggregation; row/col/grand totals are WINDOW sums over the
    * checkpointed cell frame (bounded by the categorical-cardinality
    * guard — the cumeDist contract), so nothing rescans the corpus and
    * no corpus-sized window exists.
    *
    * Exactness: O and every total are exact integers; E and the
    * contribution are one fixed double-op sequence from those integers,
    * mirrored op-for-op by the oracle. Consumers sum `contrib_micro`
    * for the statistic (exact integer sum) and compare against a χ²
    * quantile with (R−1)(C−1) degrees of freedom.
    */
  def chiSquare(df: DataFrame, rowCol: String, colCol: String,
                maxCells: Long = 4000000L): DataFrame = {
    val observed = df.groupBy(col(rowCol), col(colCol))
      .agg(count(lit(1)).as("o"))
      .localCheckpoint(true)
    // the full R×C grid: a ZERO cell (never observed together) still
    // contributes E to the statistic — omitting it understates χ²
    // exactly where the dependence is strongest
    val cells = observed.select(col(rowCol)).distinct()
      .crossJoin(observed.select(col(colCol)).distinct())
      .join(observed, Seq(rowCol, colCol), "left")
      .na.fill(0L, Seq("o"))
    val nCells = observed.select(col(rowCol)).distinct().count() *
      observed.select(col(colCol)).distinct().count()
    require(nCells <= maxCells,
      s"chiSquare grid has $nCells ($rowCol × $colCol) cells (> $maxCells): " +
        "the contract is two bounded categorical columns")
    val wr = Window.partitionBy(col(rowCol))
    val wc = Window.partitionBy(col(colCol))
    val wAll = Window.partitionBy() // grid-sized; bounded by the guard
    val e = (col("row_total").cast("double") * col("col_total").cast("double")) /
      col("n_total").cast("double")
    val d = col("o").cast("double") - e
    cells
      .withColumn("row_total", sum(col("o")).over(wr))
      .withColumn("col_total", sum(col("o")).over(wc))
      .withColumn("n_total", sum(col("o")).over(wAll))
      .select(col(rowCol), col(colCol), col("o"),
        col("row_total"), col("col_total"), col("n_total"),
        floor(e * lit(1e6) + lit(0.5)).cast("long").as("e_micro"),
        floor(d * d / e * lit(1e6) + lit(0.5)).cast("long").as("contrib_micro"))
  }

  /** Per-group WINSORIZED MEAN of a micro-snapped score — the
    * outlier-robust location estimate a monitoring pipeline tracks when
    * a handful of pathological documents would otherwise move the plain
    * mean (q109's MAD flags the outliers; this reports the center as if
    * they were clamped). Values below the qLo-quantile / above the
    * qHi-quantile are CLAMPED to those quantiles, then averaged.
    *
    * Quantile definition (exact, engine-mirrorable): the p-PERCENT
    * quantile of a group of n is the smallest value whose cumulative
    * count reaches ceil(p·n/100) = (p·n + 99) div 100 — INTEGER rank
    * arithmetic (percent bounds are taken as integers precisely so no
    * `0.1·n` double ever enters: 0.1·500 is 50.000000000000007 in
    * binary fp and would ceil to 51), no interpolation, so both engines
    * pick the identical value.
    *
    * Exactness: the clamped sum is an exact integer (Σ c·clamp(v)); one
    * trailing division yields the mean. Scale: the cumeDist shape — one
    * corpus cell aggregation, windows/argmins over the guarded histogram
    * only.
    */
  def winsorizedMean(df: DataFrame, groupCol: String, scoreMicro: Column,
                     pLo: Int, pHi: Int,
                     maxHistCells: Long = 4000000L): DataFrame = {
    require(pLo >= 0 && pHi <= 100 && pLo < pHi,
      s"need 0 <= pLo < pHi <= 100; got $pLo, $pHi")
    val cells = df.select(col(groupCol), scoreMicro.as("v"))
      .groupBy(col(groupCol), col("v"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    val nCells = cells.count()
    require(nCells <= maxHistCells,
      s"winsorizedMean histogram has $nCells cells (> $maxHistCells): " +
        "the contract is a bounded group column and a snapped bounded score")
    val w = Window.partitionBy(col(groupCol)).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = cells.withColumn("cum", sum(col("c")).over(w))
    val n = cells.groupBy(col(groupCol)).agg(sum(col("c")).as("n_rows"))
    // rank targets: ceil(p·n/100) = floor((p·n + 99)/100) — the double
    // division is exact for p·n < 2^53 and mirrors the SQL rendering
    val withN = cum.join(n, Seq(groupCol))
      .withColumn("k_lo",
        floor((col("n_rows") * lit(pLo.toLong) + lit(99L)).cast("double") /
          lit(100.0)).cast("long"))
      .withColumn("k_hi",
        floor((col("n_rows") * lit(pHi.toLong) + lit(99L)).cast("double") /
          lit(100.0)).cast("long"))
    def pick(kCol: String, out: String) = withN
      .filter(col("cum") >= col(kCol))
      .groupBy(col(groupCol)).agg(min(col("v")).as(out))
    val bounds = pick("k_lo", "lo").join(pick("k_hi", "hi"), Seq(groupCol))
    cells.join(bounds, Seq(groupCol))
      .select(col(groupCol), col("lo"), col("hi"),
        col("c"),
        (col("c") * greatest(col("lo"), least(col("hi"), col("v"))))
          .as("clamped"))
      .groupBy(col(groupCol), col("lo"), col("hi"))
      .agg(sum(col("c")).as("n_rows"), sum(col("clamped")).as("wsum"))
      .select(col(groupCol), col("n_rows"), col("lo"), col("hi"),
        floor(col("wsum").cast("double") / col("n_rows").cast("double") +
          lit(0.5)).cast("long").as("wmean_micro"))
  }

  /** Per-group KOLMOGOROV–SMIRNOV statistic of an integer-valued signal
    * against the whole-corpus marginal — the distribution-shift sibling
    * of [[groupedPearson]] (correlation drift) and the token-KL (q132):
    * KS asks "does this source's LENGTH (or any integer score)
    * distribution look like everyone else's", nonparametrically.
    *
    *   D_g = max_v |ECDF_g(v) − ECDF(v)|
    *
    * evaluated at every observed value step — exact for step ECDFs.
    *
    * Exactness: the comparison runs entirely on integers —
    * |cum_g·N − cum_all·n_g| — and divides by n_g·N ONCE at the end, so
    * the argmax cannot be flipped by fp. (Overflow bound: cum·N tops out
    * at N², so the exact path holds to N ≈ 3·10⁹ rows; past that, snap
    * the value column to coarser units first — the micro-sum knob.)
    *
    * Scale shape: one (group, value) cell aggregation over the corpus;
    * the evaluation grid is |groups| × |distinct values| — guarded
    * ≤ `maxCells` (the cumeDist contract: a snapped bounded signal).
    * Windows run over the guarded grid/histogram only, never the corpus;
    * the checkpoint is shared by the guard and every grid consumer.
    */
  def ksByGroup(df: DataFrame, groupCol: String, valueCol: String,
                maxCells: Long = 4000000L): DataFrame = {
    val cells = df.groupBy(col(groupCol), col(valueCol).cast("long").as("v"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    val nGroups = cells.select(col(groupCol)).distinct().count()
    val nVals = cells.select(col("v")).distinct().count()
    require(nGroups * nVals <= maxCells,
      s"ksByGroup grid is $nGroups groups × $nVals values (> $maxCells): " +
        "the contract is a bounded group column and a snapped bounded signal")
    // full evaluation grid: every group × every observed value (a group
    // missing a value still steps there in the CORPUS ECDF)
    val grid = cells.select(col(groupCol)).distinct()
      .crossJoin(cells.select(col("v")).distinct())
      .join(cells, Seq(groupCol, "v"), "left")
      .na.fill(0L, Seq("c"))
    val wg = Window.partitionBy(col(groupCol)).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAllCum = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val corpus = cells.groupBy(col("v")).agg(sum(col("c")).as("c_all"))
      .withColumn("cum_all", sum(col("c_all")).over(wAllCum))
    val totals = cells.groupBy(col(groupCol)).agg(sum(col("c")).as("n_rows"))
    val nTotal = cells.agg(sum(col("c")).as("n_total"))
    grid
      .withColumn("cum_g", sum(col("c")).over(wg))
      .join(corpus.select(col("v"), col("cum_all")), Seq("v"))
      .join(totals, Seq(groupCol))
      .crossJoin(broadcast(nTotal))
      .select(col(groupCol), col("n_rows"), col("n_total"),
        abs(col("cum_g") * col("n_total") - col("cum_all") * col("n_rows"))
          .as("diff_scaled"))
      .groupBy(col(groupCol), col("n_rows"), col("n_total"))
      .agg(max(col("diff_scaled")).as("max_diff"))
      .select(col(groupCol), col("n_rows"),
        floor(col("max_diff").cast("double") * lit(1e6) /
          (col("n_rows").cast("double") * col("n_total").cast("double")) +
          lit(0.5)).cast("long").as("ks_micro"))
      .withColumn("ks", col("ks_micro").cast("double") / lit(1e6))
  }

  /** Per-group SPEARMAN rank correlation between two snapped signals —
    * the monotone-association sibling of [[groupedPearson]] (which q137
    * chose precisely because raw Spearman needs per-group total
    * orderings, the single-task-window failure). This operator gets
    * Spearman the doctrine-safe way: ranks come from the JOINT
    * (group × x × y) histogram — midranks (tie-averaged, Spearman's
    * standard treatment) are window sums over the guarded cell frame,
    * never a corpus sort, and they are kept DOUBLED
    * (mr2 = 2·cum_before + c + 1) so every moment is an exact integer.
    *
    * The moment sums are the honest bound: Σ c·mr2x·mr2y ≤ 4n³ per
    * group, so exactness in 64-bit demands n_group ≤ ~1.3e6 — the
    * `maxGroupRows` require. Rank statistics over bigger groups should
    * compose a per-group sample (q71) first; the refusal names that.
    * The final rho is a fixed double tail over exact longs (same-long →
    * same-double on both engines, so the snap is engine-identical even
    * where the longs exceed 2^53's absolute precision).
    */
  def groupedSpearman(df: DataFrame, groupCol: String,
                      xMicro: Column, yMicro: Column,
                      maxHistCells: Long = 4000000L,
                      maxGroupRows: Long = 1300000L): DataFrame = {
    val cells = df.select(col(groupCol).as("grp"), xMicro.as("x"), yMicro.as("y"))
      .groupBy(col("grp"), col("x"), col("y"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    val nCells = cells.count()
    require(nCells <= maxHistCells,
      s"groupedSpearman histogram has $nCells (group × x × y) cells " +
        s"(> $maxHistCells): snap the signals coarser or raise the bound")
    val maxRows = cells.groupBy(col("grp")).agg(sum(col("c")).as("n"))
      .agg(max(col("n"))).head().getLong(0)
    require(maxRows <= maxGroupRows,
      s"groupedSpearman group has $maxRows rows (> $maxGroupRows): rank " +
        "moments overflow 64-bit beyond ~1.3e6 rows — sample per group " +
        "(perGroupSample, q71) before correlating")
    def midranks(valCol: String, out: String) = {
      val w = Window.partitionBy(col("grp")).orderBy(col(valCol))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      cells.groupBy(col("grp"), col(valCol)).agg(sum(col("c")).as("cm"))
        .withColumn("cum", sum(col("cm")).over(w))
        .select(col("grp"), col(valCol),
          (lit(2L) * (col("cum") - col("cm")) + col("cm") + 1).as(out))
    }
    val joined = cells
      .join(midranks("x", "mr2x"), Seq("grp", "x"))
      .join(midranks("y", "mr2y"), Seq("grp", "y"))
    val mom = joined.groupBy(col("grp")).agg(
      sum(col("c")).as("n"),
      sum(col("c") * col("mr2x")).as("sx"),
      sum(col("c") * col("mr2y")).as("sy"),
      sum(col("c") * col("mr2x") * col("mr2x")).as("sxx"),
      sum(col("c") * col("mr2y") * col("mr2y")).as("syy"),
      sum(col("c") * col("mr2x") * col("mr2y")).as("sxy"))
    val nD = col("n").cast("double")
    // NOTE: keep each difference inside ONE parenthesized expression — a
    // leading-minus continuation line is parsed as a separate (discarded)
    // unary statement by semicolon inference, silently dropping the term
    val cov = (nD * col("sxy").cast("double")
      - col("sx").cast("double") * col("sy").cast("double"))
    val dx = (nD * col("sxx").cast("double")
      - col("sx").cast("double") * col("sx").cast("double"))
    val dy = (nD * col("syy").cast("double")
      - col("sy").cast("double") * col("sy").cast("double"))
    mom.select(col("grp"), col("n"),
      when(dx > 0.0 && dy > 0.0,
        floor(cov / sqrt(dx * dy) * lit(1e6) + lit(0.5)).cast("long"))
        .as("spearman_micro"))
  }

  /** WELCH'S t-test of each group against the rest of the corpus —
    * "is this source's score level genuinely shifted?" with unequal
    * variances assumed (the realistic case across crawl sources).
    * One aggregation produces per-group exact integer moments
    * (n, Σs, Σs²); the rest-of-corpus moments are global − group (no
    * second scan); t is one mirrored double tail. Exactness bound:
    * Σs² needs value² · rows < 2^63 — snap scores to CENTI for corpus
    * scale (10⁴·rows, good to ~10¹⁴ rows). NULL t when either side has
    * n < 2 or zero variance.
    */
  def welchTTest(df: DataFrame, groupCol: String,
                 valueCenti: Column): DataFrame = {
    val base = df.select(col(groupCol).as("grp"), valueCenti.as("v"))
    val g = base.groupBy(col("grp")).agg(count(lit(1)).as("n1"),
      sum(col("v")).as("s1"), sum(col("v") * col("v")).as("q1"))
    val tot = base.agg(count(lit(1)).as("nt"), sum(col("v")).as("st"),
      sum(col("v") * col("v")).as("qt"))
    val j = g.crossJoin(broadcast(tot))
      .withColumn("n2", col("nt") - col("n1"))
      .withColumn("s2", col("st") - col("s1"))
      .withColumn("q2", col("qt") - col("q1"))
    def meanD(s: String, n: String) =
      col(s).cast("double") / col(n).cast("double")
    def varD(q: String, s: String, n: String) =
      (col(q).cast("double")
        - col(s).cast("double") * col(s).cast("double")
          / col(n).cast("double")) / (col(n).cast("double") - lit(1.0))
    val se = sqrt(varD("q1", "s1", "n1") / col("n1").cast("double")
      + varD("q2", "s2", "n2") / col("n2").cast("double"))
    j.select(col("grp"), col("n1").as("n_group"), col("n2").as("n_rest"),
      floor(meanD("s1", "n1") * lit(1e4) + lit(0.5)).cast("long")
        .as("mean_group_micro"),
      floor(meanD("s2", "n2") * lit(1e4) + lit(0.5)).cast("long")
        .as("mean_rest_micro"),
      when(col("n1") >= 2 && col("n2") >= 2 && se > 0.0,
        floor((meanD("s1", "n1") - meanD("s2", "n2")) / se * lit(1e6)
          + lit(0.5)).cast("long")).as("t_micro"))
  }

  /** MANN-WHITNEY rank-sum test of each group against the rest — the
    * distribution-free sibling of [[welchTTest]] (location shift
    * without normality). Ranks are tie-averaged midranks of the
    * GLOBAL value histogram (one bounded-cell window — the
    * groupedSpearman construction, here over one marginal), kept
    * DOUBLED so the rank sum R2 and the doubled statistic
    * U2 = R2 − n₁(n₁+1) are exact integers. z uses the tie-corrected
    * normal approximation; its tail runs in doubles over the exact
    * longs (same-long → same-double on both engines).
    */
  def mannWhitney(df: DataFrame, groupCol: String, valueCol: Column,
                  maxCells: Long = 4000000L): DataFrame = {
    val base = df.select(col(groupCol).as("grp"), valueCol.as("v"))
    val cells = base.groupBy(col("grp"), col("v"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    val nCells = cells.count()
    require(nCells <= maxCells,
      s"mannWhitney histogram has $nCells (group × value) cells " +
        s"(> $maxCells): snap the value coarser or raise the bound")
    val vm = cells.groupBy(col("v")).agg(sum(col("c")).as("cm"))
    val w = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // global marginal: one bounded window (≤ nCells rows)
    val vr = vm.withColumn("cum", sum(col("cm")).over(w))
      .select(col("v"),
        (lit(2L) * (col("cum") - col("cm")) + col("cm") + 1).as("mr2"),
        col("cm"))
    val tieTerm = vm
      .agg(sum(col("cm") * col("cm") * col("cm") - col("cm")).as("tiesum"),
        sum(col("cm")).as("ntot"))
    val r2 = cells.join(vr.select(col("v"), col("mr2")), Seq("v"))
      .groupBy(col("grp"))
      .agg(sum(col("c")).as("n1"), sum(col("c") * col("mr2")).as("rr2"))
    val nD = (c: String) => col(c).cast("double")
    val joined = r2.crossJoin(broadcast(tieTerm))
      .withColumn("n2", col("ntot") - col("n1"))
      .withColumn("u2", col("rr2") - col("n1") * (col("n1") + 1))
    val muU2 = nD("n1") * nD("n2") // doubled mean: 2·n1n2/2
    val sigmaU2 = sqrt(nD("n1") * nD("n2") / lit(3.0)
      * ((nD("ntot") + 1.0)
        - col("tiesum").cast("double")
          / (nD("ntot") * (nD("ntot") - 1.0))))
    joined.select(col("grp"), col("n1").as("n_group"), col("n2").as("n_rest"),
      col("u2"),
      when(col("n1") >= 1 && col("n2") >= 1 && sigmaU2 > 0.0,
        floor((col("u2").cast("double") - muU2) / sigmaU2 * lit(1e6)
          + lit(0.5)).cast("long")).as("z_micro"))
  }

  /** BENJAMINI-HOCHBERG FDR threshold over a p-value column: the
    * largest p with p_(i) ≤ α·i/m, found WITHOUT sorting the corpus —
    * p-values land on a snapped grid, so the order statistics live in
    * the bounded p-histogram: a value p's highest sorted index is
    * cum(≤ p), and the BH condition `p ≤ α·cum/m` is the integer
    * comparison p_micro·m ≤ α_micro·cum (exact while p_micro·m < 2^63
    * — rows to ~9·10¹²). Emits each input row flagged, plus the
    * threshold and rejection count on every row (a grid-join constant).
    */
  def bhReject(df: DataFrame, idCol: String, pMicroCol: Column,
               alphaMicro: Long, maxCells: Long = 4000000L): DataFrame = {
    require(alphaMicro > 0L && alphaMicro < 1000000L,
      s"alphaMicro $alphaMicro outside (0, 1e6)")
    val base = df.select(col(idCol).as("id"), pMicroCol.as("p"))
    val cells = base.groupBy(col("p")).agg(count(lit(1)).as("cm"))
      .localCheckpoint(true)
    val nCells = cells.count()
    require(nCells <= maxCells,
      s"bhReject p-histogram has $nCells cells (> $maxCells): " +
        "p-values must land on a snapped grid")
    val w = Window.orderBy(col("p"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy()
    val cum = cells.withColumn("cum", sum(col("cm")).over(w))
      .withColumn("m", sum(col("cm")).over(wAll))
    val thr = cum
      .agg(max(when(col("p") * col("m") <= lit(alphaMicro) * col("cum"),
        struct(col("p"), col("cum")))).as("t"))
      .select(coalesce(col("t.p"), lit(-1L)).as("thr_p"),
        coalesce(col("t.cum"), lit(0L)).as("n_rejected"))
    base.crossJoin(broadcast(thr))
      .select(col("id"), col("p").as("p_micro"),
        (col("p") <= col("thr_p")).as("rejected"),
        col("thr_p").as("threshold_p_micro"), col("n_rejected"))
  }

  /** SPLIT-CONFORMAL novelty p-values (Vovk et al.): score every
    * non-calibration row against a held-out calibration sample —
    * p = (1 + #{cal ≤ s}) / (n_cal + 1), the finite-sample-valid
    * "how unusual is this score" quantile. Low p = the row scores
    * below nearly all of the calibration set (for a quality score:
    * the distribution-free drop gate).
    *
    * Doctrine shape: the score is snapped onto a FIXED literal grid
    * [0, gridMax] (caller contract, checked loudly), so "count cal ≤ s"
    * becomes an equi-join against a dense (gridMax+1)-row cumulative
    * table — no range join, no corpus-sized window; the test side pays
    * one broadcast hash join. n_cal and the score bounds come from one
    * driver-collected aggregate (row-bounded, the months-routing class).
    */
  def conformalPValues(df: DataFrame, idCol: String, calPred: Column,
                       scoreCenti: Column, gridMax: Int = 100): DataFrame = {
    val spark = df.sparkSession
    // EAGER checkpoint (r19): this frame has THREE consumers (the
    // stats collect, the calibration histogram, the test side) and a
    // downstream caller (bhReject) adds two more — without a boundary
    // every consumer re-evaluated `scoreCenti`, which for the q167
    // face is the multi-tokenize quality kernel. The rows are three
    // narrow columns (id, bool, long), so the materialization is
    // block-cheap at any scale.
    val scored = df.select(col(idCol).as("id"),
      calPred.cast("boolean").as("is_cal"), scoreCenti.as("sc"))
      .localCheckpoint(true)
    val stats = scored.agg(min(col("sc")), max(col("sc")),
      sum(when(col("is_cal"), 1L).otherwise(0L))).head()
    require(!stats.isNullAt(0) && stats.getLong(0) >= 0L
        && stats.getLong(1) <= gridMax.toLong,
      s"conformalPValues scores span [${stats.get(0)}, ${stats.get(1)}] " +
        s"outside the [0, $gridMax] grid — snap the score into the grid")
    val nCal = stats.getLong(2)
    require(nCal > 0L, "conformalPValues needs a nonempty calibration set")
    val calCells = scored.filter(col("is_cal"))
      .groupBy(col("sc")).agg(count(lit(1)).as("cm"))
    val w = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // literal grid: the one unpartitioned window is gridMax+1 rows
    val cum = spark.range(0, gridMax + 1L).select(col("id").as("v"))
      .join(calCells, col("v") === col("sc"), "left")
      .na.fill(0L, Seq("cm"))
      .withColumn("cum_le", sum(col("cm")).over(w))
      .select(col("v"), col("cum_le"))
    scored.filter(!col("is_cal"))
      .join(broadcast(cum), col("sc") === col("v"))
      .select(col("id"), col("sc").as("score_centi"),
        lit(nCal).as("n_cal"),
        floor((lit(1L) + col("cum_le")).cast("double") * lit(1e6)
          / lit(nCal + 1.0) + lit(0.5)).cast("long").as("p_micro"))
  }

  /** ISOTONIC score calibration via pool-adjacent-violators (PAVA):
    * fit the best monotone-nondecreasing map from a snapped score to a
    * binary outcome rate — the standard post-hoc calibrator when a
    * quality score should predict a downstream keep/convert label but
    * its raw scale is distorted. The corpus pays ONE aggregation to the
    * guarded (score → n, positives) histogram; PAVA itself is a
    * driver-side linear walk over those cells (the q78/q88 legal-collect
    * class: bounded by score RESOLUTION, never corpus size), with block
    * rates compared by EXACT cross-multiplication (pos_a·n_b vs
    * pos_b·n_a — no fp in the pooling decisions, so the fit is
    * deterministic on any engine and any partitioning).
    *
    * Returns one row per fitted block: [score_lo, score_hi] and the
    * pooled rate (exact pos/n integers plus a micro-snapped rate for
    * joining). Blocks are the CANONICAL representation — adjacent
    * block rates strictly increase (equal-rate neighbors pool, which
    * leaves the fitted function unchanged), so the block set equals
    * the level sets of the minimax closed form
    * ŷ_i = max_{j≤i} min_{k≥i} pos(j..k)/n(j..k) — which is exactly
    * how the q212 oracle replays the fit in SQL over the bounded cell
    * histogram (the r12 verdict's "no SQL rendering" caveat closed:
    * the SEQUENCE has no window form, but the unique fixed point has a
    * closed form, quadratic only in CELLS, never rows). Monotone by
    * construction; Σn over blocks = corpus rows.
    */
  def isotonicFit(df: DataFrame, scoreMicro: Column, positive: Column,
                  maxCells: Long = 1000000L): DataFrame = {
    val spark = df.sparkSession
    val cells = df.select(scoreMicro.as("s"), positive.cast("boolean").as("y"))
      .groupBy(col("s"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("y"), 1L).otherwise(0L)).as("pos"))
      .localCheckpoint(true)
    val nCells = cells.count()
    require(nCells <= maxCells,
      s"isotonicFit histogram has $nCells score cells (> $maxCells): " +
        "snap the score coarser or raise the bound deliberately")
    val sorted = cells.orderBy(col("s")).collect()
    // PAVA: maintain a stack of blocks; pool while the last block's rate
    // exceeds the incoming one (pos_a/n_a > pos_b/n_b as exact cross-mult)
    final case class Block(var sLo: Long, var sHi: Long, var n: Long, var pos: Long)
    val stack = scala.collection.mutable.ArrayBuffer.empty[Block]
    sorted.foreach { r =>
      val b = Block(r.getLong(0), r.getLong(0), r.getLong(1), r.getLong(2))
      stack += b
      while (stack.length >= 2 && {
        val a = stack(stack.length - 2); val c = stack.last
        // BigInt: pooled pos·n products outgrow 64 bits near 3e9 rows.
        // >= (not >): equal-rate neighbors pool too — the canonical
        // strictly-increasing block form the minimax oracle reproduces
        BigInt(a.pos) * c.n >= BigInt(c.pos) * a.n
      }) {
        val c = stack.remove(stack.length - 1)
        val a = stack.last
        a.sHi = c.sHi; a.n += c.n; a.pos += c.pos
      }
    }
    import spark.implicits._
    stack.toSeq.map(b => (b.sLo, b.sHi, b.n, b.pos,
        math.floor(b.pos.toDouble * 1e6 / b.n.toDouble + 0.5).toLong))
      .toDF("score_lo", "score_hi", "n", "pos", "rate_micro")
  }

  /** SIMPSON'S-PARADOX DETECTOR: per-group least-squares slope of
    * (x, y) against the pooled slope, flagging groups whose trend
    * REVERSES the pooled one — the aggregation-bias tripwire (a pooled
    * trend over a mixed corpus can point opposite to every stratum).
    * Exact integer moments at both levels (the q116 doctrine), one
    * mirrored double tail each; zero-variance groups emit NULL slope
    * and no flag. `x`/`y` must be integer (LongType) expressions.
    */
  def groupedSlopeFlip(df: DataFrame, groupCol: String,
                       x: Column, y: Column): DataFrame = {
    val base = df.select(col(groupCol).as("grp"), x.as("x"), y.as("y"))
      .localCheckpoint(true) // pooled + grouped moments share it
    def slope = {
      val nD = col("n").cast("double")
      val den = nD * col("sxx").cast("double") -
        col("sx").cast("double") * col("sx").cast("double")
      when(den > 0.0,
        floor((nD * col("sxy").cast("double")
          - col("sx").cast("double") * col("sy").cast("double"))
          / den * lit(1e6) + lit(0.5)).cast("long"))
    }
    def moments(g: org.apache.spark.sql.RelationalGroupedDataset) =
      g.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
    val per = moments(base.groupBy(col("grp")))
      .withColumn("slope_micro", slope)
      .select(col("grp"), col("n"), col("slope_micro"))
    val pooled = moments(base.groupBy())
      .withColumn("pooled_slope_micro", slope)
      .select(col("pooled_slope_micro"))
    per.crossJoin(broadcast(pooled))
      .withColumn("sign_flipped",
        when(col("slope_micro").isNotNull,
          (signum(col("slope_micro").cast("double")) =!=
            signum(col("pooled_slope_micro").cast("double")) &&
            col("slope_micro") =!= 0L).cast("int")))
  }

  /** POPULATION STABILITY INDEX per group vs the corpus marginal — the
    * standard production drift score (credit-scoring lineage, public):
    * PSI = Σ_bins (p_b − q_b)·ln(p_b/q_b) where p is the group's bin
    * distribution and q the corpus-wide one. Bins are log₂ magnitude
    * buckets of `valueCol` (the q171 bit-length idiom — integer-exact,
    * immune to fp log2 at power-of-two edges; value 0 keeps bucket 0),
    * so the bin universe is ≤ ~64 cells and the (group × bin) grid is
    * group-bounded.
    *
    * Zero cells: the grid includes every (group, observed-bin) cell and
    * add-one smooths BOTH sides — p_b = (c_gb+1)/(n_g+B), q_b =
    * (c_b+1)/(N+B) with B the observed-bin count — so ln stays finite
    * without dropping exactly the bins where drift is total (a bin one
    * side never produces is the strongest shift evidence). Per-bin
    * contributions micro-snap before the integer sum (q66 doctrine);
    * the division and ln run on exact integer inputs, so both engines
    * snap identical doubles. Conventional reading: PSI < 0.1 stable,
    * 0.1–0.25 moderate, > 0.25 major shift.
    */
  def psiByGroup(df: DataFrame, groupCol: String, valueCol: Column): DataFrame = {
    val binned = df.select(col(groupCol).as("grp"), valueCol.as("v"))
      .withColumn("bucket",
        when(col("v") <= 0, lit(0L))
          .otherwise(length(bin(col("v"))).cast("long")))
    // (group, bucket) counts — one map-side-combined aggregation; the
    // grid below is (groups × ≤64 buckets)-bounded, tiny at any scale
    psiFromGrid(binned.groupBy(col("grp"), col("bucket"))
      .agg(count(lit(1)).as("c")))
  }

  /** The log₂ (group, bucket) count grid for `valueCol` — [[psiByGroup]]'s
    * front half, exposed because the grid is trivially MERGEABLE
    * (cell-wise add): a streaming tick maintains it incrementally and
    * recomputes PSI from cells at per-batch cost, never re-reading the
    * corpus (StreamingIngest.driftMonitorTick). */
  def psiGrid(df: DataFrame, groupCol: String, valueCol: Column): DataFrame =
    df.select(col(groupCol).as("grp"), valueCol.as("v"))
      .withColumn("bucket",
        when(col("v") <= 0, lit(0L))
          .otherwise(length(bin(col("v"))).cast("long")))
      .groupBy(col("grp"), col("bucket"))
      .agg(count(lit(1)).as("c"))

  /** PSI from a (grp, bucket, c) cell grid — the back half of
    * [[psiByGroup]]; add-one smoothing over the zero-cell-complete
    * grid, per-bin terms micro-snapped. */
  def psiFromGrid(cellGrid: DataFrame): DataFrame = {
    val cg = cellGrid.select(col("grp"), col("bucket"), col("c"))
      .localCheckpoint(true)
    val groups = cg.groupBy(col("grp")).agg(sum(col("c")).as("n_g"))
    val buckets = cg.groupBy(col("bucket")).agg(sum(col("c")).as("c_all"))
    val nBuckets = buckets.agg(count(lit(1)).as("b"),
      sum(col("c_all")).as("n_all"))
    val grid = groups.crossJoin(buckets.select(col("bucket"), col("c_all")))
      .join(cg, Seq("grp", "bucket"), "left").na.fill(0L, Seq("c"))
      .crossJoin(broadcast(nBuckets))
    grid.withColumn("t", {
        val p = (col("c") + lit(1)).cast("double") /
          (col("n_g") + col("b")).cast("double")
        val q = (col("c_all") + lit(1)).cast("double") /
          (col("n_all") + col("b")).cast("double")
        floor((p - q) * log(p / q) * lit(1e6) + lit(0.5)).cast("long")
      })
      .groupBy(col("grp")).agg(max(col("n_g")).as("n_g"),
        sum(col("t")).as("psi_micro"))
  }
}
