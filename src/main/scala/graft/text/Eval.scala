package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Evaluation statistics over corpora, rankings and labelers — the
  * measurement half of a data-curation loop: is the retrieval stack
  * ranking well (nDCG), do two cheap labelers agree enough to trust
  * either (Cohen's kappa), how stable is a per-source quality mean
  * (Poisson-bootstrap CI), and which sources win head-to-head quality
  * comparisons (pairwise win rates). (Reference scope note: the
  * reference engine (bcgov/nr-rfc-dischargeobs) has no evaluation
  * operators; this extends the post-parity LLM-pipeline pack, SURVEY §2
  * extension table.)
  *
  * Numerics doctrine (PLANS.md): every aggregate sums exact integers
  * (micro-snapped per row where a double enters), divisions happen once
  * per output row over exact inputs, and every window ordering is a
  * total order — so each operator has a bit-identical DuckDB oracle.
  */
object Eval {

  /** nDCG@k of a ranking against graded relevance judgments.
    *
    * `ranking`: (query_id, doc_id, rank) — rank 1-based, unique per
    * query. `grades`: (query_id, doc_id, grade) — integer grades ≥ 0;
    * unjudged ranked docs count as grade 0 (the standard convention).
    * The ideal ordering (IDCG) is computed over the JUDGED set per
    * query — callers control the judged universe by what they pass.
    *
    * Per-row term: (2^grade − 1) · ln 2 / ln(rank+1), micro-snapped
    * BEFORE the per-query sum so the aggregate is an order-independent
    * integer sum (q65 doctrine); at rank 1 the ratio is exactly 1.0
    * (same double divided by itself), so a grade-g hit contributes
    * exactly (2^g−1)·1e6.
    *
    * Scale shape: one equi-join on (query_id, doc_id) + two per-query
    * windows over ≤ judged-set-sized partitions — numerous and small
    * (the q142 criterion: per-query partitions shrink as queries
    * multiply; they never grow with the corpus).
    */
  def ndcgAtK(ranking: DataFrame, grades: DataFrame, k: Int): DataFrame = {
    def termMicro(grade: Column, rank: Column): Column =
      // pow(2, g) is exact for integer g (and mirrors DuckDB power());
      // shiftleft would be the integer form but takes only literal bits
      floor((pow(lit(2.0), grade.cast("double")) - lit(1.0))
        * log(lit(2.0)) / log(rank.cast("double") + lit(1.0))
        * lit(1e6) + lit(0.5)).cast("long")

    val dcg = ranking.filter(col("rank") <= k)
      .join(grades, Seq("query_id", "doc_id"), "left")
      .withColumn("grade", coalesce(col("grade"), lit(0)))
      .withColumn("t", termMicro(col("grade"), col("rank")))
      .groupBy(col("query_id"))
      .agg(sum(col("t")).as("dcg_micro"))

    val wIdeal = Window.partitionBy(col("query_id"))
      .orderBy(col("grade").desc, col("doc_id"))
    val idcg = grades
      .withColumn("irank", row_number().over(wIdeal))
      .filter(col("irank") <= k)
      .withColumn("t", termMicro(col("grade"), col("irank")))
      .groupBy(col("query_id"))
      .agg(sum(col("t")).as("idcg_micro"))

    dcg.join(idcg, Seq("query_id"), "full_outer")
      .select(
        col("query_id"),
        coalesce(col("dcg_micro"), lit(0L)).as("dcg_micro"),
        coalesce(col("idcg_micro"), lit(0L)).as("idcg_micro"))
      .withColumn("ndcg_micro",
        when(col("idcg_micro") > 0,
          floor(col("dcg_micro").cast("double") * lit(1e6)
            / col("idcg_micro").cast("double") + lit(0.5)).cast("long")))
  }

  /** Cohen's kappa between two boolean labelers, per group — the
    * inter-annotator-agreement gate before trusting either cheap
    * heuristic as a training-data filter. The confusion matrix is four
    * exact integer counts from ONE corpus aggregation; po/pe/kappa are a
    * fixed double-op tail over those exact counts (marginal products go
    * double-FIRST — n² overflows BIGINT at corpus scale, the PMI
    * overflow doctrine). kappa is NULL when pe = 1 (a degenerate
    * marginal — both labelers constant); the po/pe columns still emit.
    */
  def cohensKappa(df: DataFrame, groupCol: String,
                  labelA: Column, labelB: Column): DataFrame = {
    val t = df.select(col(groupCol).as("grp"),
      labelA.cast("boolean").as("a"), labelB.cast("boolean").as("b"))
    val cell = (x: Column, y: Column) =>
      sum(when(x && y, 1L).otherwise(0L))
    val agg = t.groupBy(col("grp")).agg(
      count(lit(1)).as("n"),
      cell(col("a"), col("b")).as("n11"),
      cell(col("a"), !col("b")).as("n10"),
      cell(!col("a"), col("b")).as("n01"),
      cell(!col("a"), !col("b")).as("n00"))
    val nD = col("n").cast("double")
    val po = (col("n11") + col("n00")).cast("double") / nD
    val pe = ((col("n11") + col("n10")).cast("double")
        * (col("n11") + col("n01")).cast("double")
      + (col("n01") + col("n00")).cast("double")
        * (col("n10") + col("n00")).cast("double")) / (nD * nD)
    agg
      .withColumn("po_micro", floor(po * lit(1e6) + lit(0.5)).cast("long"))
      .withColumn("pe_micro", floor(pe * lit(1e6) + lit(0.5)).cast("long"))
      .withColumn("kappa_micro",
        when(pe < 1.0,
          floor((po - pe) / (lit(1.0) - pe) * lit(1e6) + lit(0.5))
            .cast("long")))
  }

  /** Poisson(1) CDF in micro-units — the inverse-CDF table both the
    * Spark weight expression and the DuckDB oracle CASE render from, so
    * the two weight functions cannot drift. Index = weight; a uniform
    * micro-draw u maps to the first k with u < cdf(k), else
    * `POISSON1_CDF_MICRO.length`. Values are floor(1e6·e⁻¹·Σ 1/i!).
    */
  val POISSON1_CDF_MICRO: Seq[Long] =
    Seq(367879L, 735758L, 919698L, 981011L, 996340L, 999405L, 999916L)

  /** Per-group mean with a Poisson-bootstrap confidence interval
    * (Chamandy et al.'s map-reduce bootstrap: each (row, replicate)
    * draws an independent Poisson(1) weight, so resampling never
    * needs the group's row count up front and the whole computation is
    * one explode + one aggregation — the only bootstrap that
    * distributes). Draws are seeded md5 (`TextOps.hashPrefix`), so the
    * replicate set is a pure function of (seed, id, replicate) —
    * stable under re-runs and re-partitioning.
    *
    * `scoreMicro` must be a LongType micro-snapped score. CI bounds are
    * exact order statistics of the `b` replicate means at loPermille /
    * hiPermille (integer rank arithmetic — ceil(p·n/1000) as
    * (p·n+999) div 1000, the q147 doctrine; the double form is wrong at
    * representable-boundary products). Replicates whose total weight is
    * 0 are excluded from the order statistics (n_reps counts the rest);
    * with ≥ tens of rows per group, P[Σw = 0] is negligible but the
    * guard keeps the operator total.
    *
    * Scale shape: b× explode of one scan into a (group × b)-bounded
    * aggregation with map-side combine, then windows over ≤ b rows per
    * group. Nothing grows with the corpus except the one scan.
    */
  def poissonBootstrapCI(df: DataFrame, groupCol: String, idCol: String,
                         scoreMicro: Column, b: Int = 32,
                         seed: String = "boot|",
                         loPermille: Int = 25,
                         hiPermille: Int = 975): DataFrame = {
    require(b >= 2 && b <= 4096, s"replicate count $b outside [2, 4096]")
    val base = df.select(col(groupCol).as("grp"), col(idCol).as("id"),
      scoreMicro.as("s"))
    val u = pmod(TextOps.hashPrefix(seed,
      concat(col("id").cast("string"), lit("#"), col("rep").cast("string"))),
      lit(1000000L))
    val weight = POISSON1_CDF_MICRO.zipWithIndex
      .foldRight(lit(POISSON1_CDF_MICRO.length): Column) {
        case ((cdf, w), rest) => when(col("u") < cdf, lit(w)).otherwise(rest)
      }
    val reps = base
      .withColumn("rep", explode(lit((0 until b).toArray)))
      .withColumn("u", u)
      .withColumn("w", weight.cast("long"))
      .groupBy(col("grp"), col("rep"))
      .agg(sum(col("w")).as("sw"), sum(col("w") * col("s")).as("sws"))
      .filter(col("sw") > 0)
      .withColumn("mean_rep",
        floor(col("sws").cast("double") / col("sw").cast("double") + lit(0.5))
          .cast("long"))
    val wRank = Window.partitionBy(col("grp")).orderBy(col("mean_rep"), col("rep"))
    val wGrp = Window.partitionBy(col("grp"))
    val ranked = reps
      .withColumn("rn", row_number().over(wRank))
      .withColumn("n_reps", count(lit(1)).over(wGrp))
      // ceil(n·p/1000) as (n·p+999) div 1000; the double division is
      // exact-integer-safe here (products < 2^53, integral quotients are
      // division-exact) but the long cast is what makes rn === k compare
      .withColumn("k_lo",
        ((col("n_reps") * loPermille + 999) / 1000).cast("long"))
      .withColumn("k_hi",
        ((col("n_reps") * hiPermille + 999) / 1000).cast("long"))
      .groupBy(col("grp"))
      .agg(max(col("n_reps")).as("n_reps"),
        max(when(col("rn") === greatest(col("k_lo"), lit(1L)), col("mean_rep")))
          .as("boot_lo_micro"),
        max(when(col("rn") === greatest(col("k_hi"), lit(1L)), col("mean_rep")))
          .as("boot_hi_micro"))
    val full = base.groupBy(col("grp"))
      .agg(count(lit(1)).as("n_rows"),
        floor(sum(col("s")).cast("double") / count(lit(1)).cast("double")
          + lit(0.5)).cast("long").as("mean_micro"))
    full.join(ranked, Seq("grp"), "left")
      .select(col("grp"), col("n_rows"), col("mean_micro"),
        col("n_reps"), col("boot_lo_micro"), col("boot_hi_micro"))
  }

  /** Differentially-private histogram release: per-group counts with
    * seeded Laplace(1/ε) noise (count queries have sensitivity 1, so
    * Laplace(1/ε) noise gives ε-DP per release — Dwork et al.'s
    * standard mechanism). The noise draw is the inverse-CDF transform
    * of a seeded md5 uniform PER CELL KEY, which makes the release a
    * pure function of (seed, group key): deterministic for the oracle
    * and for idempotent re-releases — but NOTE the privacy caveat this
    * implies, stated plainly: re-releasing with the SAME seed spends no
    * extra budget (identical output), while releasing with a NEW seed
    * is a fresh ε spend; a production deployment rotates seeds
    * deliberately and accounts ε per rotation.
    *
    * Numerics: u = (h + 0.5)/2³² is strictly inside (0, 1) (the +0.5
    * keeps ln(1−2|u−½|) finite at both extremes and can never hit the
    * u = ½ sign boundary — h + 0.5 is a half-integer, 2³¹ is not), and
    * the whole noise chain is per-row double arithmetic over exact
    * inputs — engine-identical, mirrored op-for-op by the oracle.
    * Scale shape: one aggregation with map-side combine; noise is one
    * codegen expression over the (group-bounded) count frame.
    */
  def dpNoisyCounts(df: DataFrame, groupCols: Seq[String], epsilon: Double,
                    seed: String = "dp|"): DataFrame = {
    require(groupCols.nonEmpty, "dpNoisyCounts needs at least one group column")
    require(epsilon > 0.0, s"epsilon $epsilon must be positive")
    val counts = df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
    val key = concat_ws("#", groupCols.map(c => col(c).cast("string")): _*)
    val u = (TextOps.hashPrefix(seed, key).cast("double") + lit(0.5)) /
      lit(4294967296.0)
    val sgn = when(u < 0.5, lit(-1.0)).otherwise(lit(1.0))
    val noisy = (col("n").cast("double")
      - sgn * log(lit(1.0) - lit(2.0) * abs(u - lit(0.5))) / lit(epsilon))
    counts
      .withColumn("noisy_micro",
        floor(noisy * lit(1e6) + lit(0.5)).cast("long"))
      // non-negative integer post-processing (free under DP)
      .withColumn("released",
        greatest(lit(0L),
          floor(col("noisy_micro").cast("double") / lit(1e6) + lit(0.5))
            .cast("long")))
      .drop("n") // the release carries ONLY the noised values
  }

  /** Head-to-head win rates between entities (e.g. sources) under a
    * quality score, from a deterministic hash-bucketed tournament:
    * rows land in md5 buckets, each bucket pairs id-adjacent rows, and
    * only cross-entity pairs score (winner = higher score, tie → the
    * smaller id). The logit of the win rate is the one-step
    * Bradley-Terry strength estimate — which sources systematically
    * beat which under the metric.
    *
    * `nBuckets` is the parallelism AND pairing-density knob: buckets
    * are the window partitions, so pick nBuckets ≳ corpus/1e6 at scale
    * (the per-bucket sort is the only per-row ordered pass — same
    * contract as blocked Jaccard's blocks); more buckets also means
    * fewer, sparser pairs, which only widens the estimate's variance,
    * never biases it (the draw is score-independent).
    */
  def tournamentWinRates(df: DataFrame, idCol: String, entityCol: String,
                         scoreMicro: Column, nBuckets: Int = 64,
                         seed: String = "pair|"): DataFrame = {
    require(nBuckets >= 1, s"nBuckets $nBuckets must be >= 1")
    val t = df.select(col(idCol).as("id"), col(entityCol).as("entity"),
        scoreMicro.as("s"))
      .withColumn("bucket", pmod(TextOps.hashPrefix(seed, col("id")),
        lit(nBuckets.toLong)))
    val w = Window.partitionBy(col("bucket")).orderBy(col("id"))
    val paired = t
      .withColumn("nid", lead(col("id"), 1).over(w))
      .withColumn("nentity", lead(col("entity"), 1).over(w))
      .withColumn("ns", lead(col("s"), 1).over(w))
      .filter(col("nid").isNotNull && col("entity") =!= col("nentity"))
      .withColumn("a_wins",
        col("s") > col("ns") || (col("s") === col("ns") && col("id") < col("nid")))
    val sides = paired.select(explode(array(
        struct(col("entity"), col("a_wins").as("win")),
        struct(col("nentity").as("entity"), (!col("a_wins")).as("win"))))
        .as("side"))
      .select(col("side.entity").as("entity"), col("side.win").as("win"))
    sides.groupBy(col("entity"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(col("win"), 1L).otherwise(0L)).as("n_wins"))
      .withColumn("winrate_micro",
        floor(col("n_wins").cast("double") * lit(1e6)
          / col("n_pairs").cast("double") + lit(0.5)).cast("long"))
      .withColumn("logit_micro",
        when(col("n_wins") > 0 && col("n_wins") < col("n_pairs"),
          floor(log(col("n_wins").cast("double")
              / (col("n_pairs") - col("n_wins")).cast("double"))
            * lit(1e6) + lit(0.5)).cast("long")))
  }
}
