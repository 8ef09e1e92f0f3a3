package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution-shape statistics of a corpus — the inequality / tail /
  * burstiness diagnostics a data card reports next to the raw counts:
  * how concentrated is token mass (Gini), which terms are topical
  * rather than uniform filler (Fano-factor burstiness, Church & Gale),
  * and how Zipfian is the rank-frequency curve (log-log slope).
  * (Reference scope note: the reference engine
  * (bcgov/nr-rfc-dischargeobs) has no corpus operators; this extends
  * the post-parity LLM-pipeline pack, SURVEY §2 extension table.)
  *
  * All three follow the repo doctrine: aggregates sum exact integers,
  * windows run only over bounded frames (count-of-count cells, top-K
  * slices, literal grids — never corpus-sized partitions), and each
  * fixed double tail is mirrored op-for-op by a DuckDB oracle.
  */
object CorpusStats {

  /** Per-group GINI of the term-frequency vector — 0 = every term
    * equally frequent, →1 = mass concentrated in a head. Computed from
    * the COUNT-OF-COUNTS histogram, not a per-term rank window: terms
    * sharing a frequency c occupy a consecutive rank block, and the
    * block's Σ(2r − n − 1) closed form is m·(2·cum_before + m − n) —
    * so the only window runs over (group × distinct-c) cells, which
    * grow like O(√T) per group, never like the vocabulary. Gini is
    * tie-order invariant, so the block form is EXACT, not an
    * approximation. Integer-exact until the single final division
    * (needs n·T < 2^63 per group — holds to ~10⁹ terms × 10⁹ tokens).
    */
  def giniTokenMass(docs: DataFrame, groupCol: String,
                    textCol: String): DataFrame = {
    val tf = docs
      .select(col(groupCol).as("grp"),
        explode(TextOps.tokens(col(textCol))).as("term"))
      .groupBy(col("grp"), col("term"))
      .agg(count(lit(1)).as("c"))
    val cc = tf.groupBy(col("grp"), col("c"))
      .agg(count(lit(1)).as("m"))
    val w = Window.partitionBy(col("grp")).orderBy(col("c"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wg = Window.partitionBy(col("grp"))
    val withTotals = cc
      .withColumn("cumm", sum(col("m")).over(w))
      .withColumn("n", sum(col("m")).over(wg))
      .withColumn("t", sum(col("c") * col("m")).over(wg))
      .withColumn("contrib",
        col("c") * col("m")
          * (lit(2L) * (col("cumm") - col("m")) + col("m") - col("n")))
    withTotals.groupBy(col("grp"))
      .agg(max(col("n")).as("n_terms"), max(col("t")).as("t_tokens"),
        sum(col("contrib")).as("gs"))
      .select(col("grp"), col("n_terms"), col("t_tokens"),
        floor(col("gs").cast("double") * lit(1e6)
          / (col("n_terms").cast("double") * col("t_tokens").cast("double"))
          + lit(0.5)).cast("long").as("gini_micro"))
  }

  /** BURSTINESS (Fano factor, var/mean) of the top-K global terms
    * across the values of `binCol` (e.g. source): uniform filler terms
    * have Fano ≈ 1 under Poisson scatter, topical terms ≫ 1 — the
    * classic Church & Gale content-word signal. The term set is a
    * TakeOrdered-bounded top-K; the count grid is K × bins with
    * absent cells counted as 0 (omitting them understates variance
    * exactly for the burstiest terms — the q140 zero-cell lesson).
    * Fano = (B·Σc² − T²)/(B·T): exact integers, one division.
    */
  def tokenBurstiness(docs: DataFrame, binCol: String, textCol: String,
                      topK: Int): DataFrame = {
    val terms = docs
      .select(col(binCol).as("bin"),
        explode(TextOps.tokens(col(textCol))).as("term"))
    val top = terms.groupBy(col("term")).agg(count(lit(1)).as("ctot"))
      .orderBy(col("ctot").desc, col("term")).limit(topK)
    val bins = docs.select(col(binCol).as("bin")).distinct()
    val perBin = terms.join(broadcast(top.select(col("term"))), Seq("term"))
      .groupBy(col("term"), col("bin")).agg(count(lit(1)).as("c"))
    val grid = broadcast(top).crossJoin(broadcast(bins))
      .join(perBin, Seq("term", "bin"), "left")
      .na.fill(0L, Seq("c"))
    grid.groupBy(col("term"), col("ctot"))
      .agg(count(lit(1)).as("b"), sum(col("c") * col("c")).as("s2"))
      .select(col("term"), col("ctot").as("total"), col("b").as("n_bins"),
        floor((col("b") * col("s2") - col("ctot") * col("ctot"))
          .cast("double") * lit(1e6)
          / (col("b").cast("double") * col("ctot").cast("double"))
          + lit(0.5)).cast("long").as("fano_micro"))
  }

  /** ZIPF SLOPE: least-squares fit of ln(count) on ln(rank) over the
    * top-N vocabulary — the rank-frequency exponent (≈ −1 for natural
    * text; template mills and token soup both bend it). The regression
    * runs on the TakeOrdered-bounded top-N frame only (the one
    * unpartitioned window is over exactly N rows — the q53 bounded-cut
    * class); per-point ln values micro-snap, moments are exact
    * integers, the slope is one mirrored double tail.
    */
  def zipfSlope(docs: DataFrame, textCol: String, topN: Int): DataFrame = {
    val top = docs.select(explode(TextOps.tokens(col(textCol))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("term")).limit(topN)
    // bounded frame: the window sorts exactly topN rows
    val ranked = top
      .withColumn("r", row_number()
        .over(Window.orderBy(col("c").desc, col("term"))))
      .withColumn("x", floor(log(col("r").cast("double")) * lit(1e6)
        + lit(0.5)).cast("long"))
      .withColumn("y", floor(log(col("c").cast("double")) * lit(1e6)
        + lit(0.5)).cast("long"))
    val mom = ranked.agg(count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
    val nD = col("n").cast("double")
    val den = (nD * col("sxx").cast("double")
      - col("sx").cast("double") * col("sx").cast("double"))
    mom.select(col("n"),
      when(den > 0.0,
        floor((nD * col("sxy").cast("double")
          - col("sx").cast("double") * col("sy").cast("double"))
          / den * lit(1e6) + lit(0.5)).cast("long"))
        .as("slope_micro"))
  }

  /** HILL TAIL-INDEX estimator (Hill 1975, the standard heavy-tail
    * exponent MLE) over the token-frequency distribution:
    * H = (1/k)·Σ_{i=1..k} ln(f_(i)/f_(k+1)) over the k largest
    * frequencies, α = 1/H. Zipf-like corpora give α ≈ 1; α drifting
    * low means the head is fattening (template/boilerplate flooding),
    * high means the head is thinning — the single-number companion to
    * [[zipfSlope]]'s regression (Hill is the MLE, the regression the
    * visual-fit diagnostic; disagreement between them flags a bent,
    * non-power-law head worth looking at).
    *
    * Exactness + scale: one token-count aggregation, then the
    * TakeOrdered-bounded top-(k+1) frame (the q53 bounded-cut class —
    * no corpus sort). f_(k+1) = min(c) over that frame (it IS the
    * (k+1)-th by construction; boundary ties change which TOKEN holds
    * the rank but not the value, so the estimator is tie-invariant).
    * Per-term ln ratios micro-snap from exact integer pairs before the
    * integer sum; H and α are one mirrored double tail each.
    */
  /** HEAPS'-LAW VOCABULARY-GROWTH EXPONENT per group (Heaps 1978,
    * V(T) ≈ K·T^β — natural text sits near β ≈ 0.5; β collapsing
    * toward 0 means the source stopped contributing new vocabulary,
    * the template-mill signature the Gini/burstiness battery reads
    * from the other side): log-log least squares of cumulative
    * vocabulary V against cumulative tokens T at 10 checkpoints along
    * each group's doc-id range.
    *
    * Scale shape: the progress axis is the ID RANGE (thr_j = min +
    * j·(max−min)/10, exact integer arithmetic) — NOT a per-group
    * row-number, which would be one window task per group over every
    * doc, and NOT a count quantile, whose histogram is doc-count-sized.
    * For an append-log corpus ids ARE arrival order; callers with
    * re-keyed ids substitute their own progress column. V(thr) comes
    * from the q102 first-seen idiom (token's min doc_id per group —
    * one token aggregation), T(thr) from per-doc token counts; both
    * checkpoint sums are a ×10 conditional replication of group-keyed
    * aggregates, no windows over data. ln values micro-snap; the
    * 10-point LS runs on exact integer moments per group (the q163
    * machinery).
    */
  def heapsExponent(docs: DataFrame, groupCol: String, idCol: String,
                    textCol: String): DataFrame = {
    val spark = docs.sparkSession
    val base = docs.select(col(groupCol).as("grp"), col(idCol).as("id"),
      col(textCol).as("t"))
    val bounds = base.groupBy(col("grp"))
      .agg(min(col("id")).as("mn"), max(col("id")).as("mx"))
    val checkpoints = bounds
      .select(col("grp"), col("mn"), col("mx"),
        explode(sequence(lit(1), lit(10))).as("j"))
      .withColumn("thr", expr("mn + ((mx - mn) * j) div 10"))
      .select(col("grp"), col("j"), col("thr"))
    val perDoc = base.select(col("grp"), col("id"),
      TextOps.tokenCountFast(spark, col("t")).cast("long").as("nt"))
    val tAt = perDoc.join(checkpoints, Seq("grp"))
      .filter(col("id") <= col("thr"))
      .groupBy(col("grp"), col("j")).agg(sum(col("nt")).as("tt"))
    val firstSeen = base.select(col("grp"), col("id"),
        explode(TextOps.tokens(col("t"))).as("term"))
      .groupBy(col("grp"), col("term")).agg(min(col("id")).as("fd"))
    val vAt = firstSeen.join(checkpoints, Seq("grp"))
      .filter(col("fd") <= col("thr"))
      .groupBy(col("grp"), col("j")).agg(count(lit(1)).as("v"))
    val pts = tAt.join(vAt, Seq("grp", "j"))
      .filter(col("tt") > 0 && col("v") > 0)
      .withColumn("x", floor(log(col("tt").cast("double")) * lit(1e6)
        + lit(0.5)).cast("long"))
      .withColumn("y", floor(log(col("v").cast("double")) * lit(1e6)
        + lit(0.5)).cast("long"))
    val mom = pts.groupBy(col("grp")).agg(count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
    val nD = col("n").cast("double")
    val den = (nD * col("sxx").cast("double")
      - col("sx").cast("double") * col("sx").cast("double"))
    mom.select(col("grp"), col("n").as("n_points"),
      when(den > 0.0,
        floor((nD * col("sxy").cast("double")
          - col("sx").cast("double") * col("sy").cast("double"))
          / den * lit(1e6) + lit(0.5)).cast("long"))
        .as("beta_micro"))
  }

  def hillTailIndex(docs: DataFrame, textCol: String, k: Int): DataFrame = {
    val head = docs.select(explode(TextOps.tokens(col(textCol))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("term")).limit(k + 1)
      .localCheckpoint(true) // the tail value and the sum share the cut
    val fTail = head.agg(min(col("c")).as("f_tail"))
    // sum over ALL k+1 rows: the tail row and any boundary ties
    // contribute ln(1) = 0 exactly, so the numerator is tie-invariant;
    // the divisor is k = rows − 1 regardless of which token holds rank
    // k+1
    val mom = head.crossJoin(broadcast(fTail))
      .withColumn("t", floor(log(col("c").cast("double")
        / col("f_tail").cast("double")) * lit(1e6) + lit(0.5)).cast("long"))
      .agg((count(lit(1)) - lit(1)).as("n_head"), sum(col("t")).as("sum_micro"))
    mom.crossJoin(broadcast(fTail)).select(
      col("n_head"), col("f_tail"),
      when(col("n_head") > 0 && col("sum_micro") > 0,
        floor(col("sum_micro").cast("double") / col("n_head").cast("double")
          + lit(0.5)).cast("long")).as("h_micro"))
      .withColumn("alpha_micro",
        when(col("h_micro").isNotNull && col("h_micro") > 0,
          floor(lit(1e12) / col("h_micro").cast("double") + lit(0.5))
            .cast("long")))
  }
}
