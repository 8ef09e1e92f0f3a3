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
}
