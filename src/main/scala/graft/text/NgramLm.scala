package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed n-gram language-model estimation — the statistics a
  * count-based LM trainer (or a perplexity-filter bootstrap, CCNet-style)
  * derives from a corpus. Interpolated Kneser-Ney for bigrams (Kneser &
  * Ney 1995; Chen & Goodman 1998 — public results), the "lite" fixed-
  * discount variant:
  *
  *   p_kn(w2|w1) = max(c12 − D, 0)/c1 + (D·n_follow(w1)/c1)·p_cont(w2)
  *   p_cont(w2)  = n_prec(w2) / n_types
  *
  * where c12 is the bigram count, c1 = Σ_w2 c12 the left-context mass,
  * n_follow(w1) the distinct continuations of w1, n_prec(w2) the distinct
  * left contexts of w2 (the KN insight: "how many contexts does w2
  * complete" beats raw frequency), and n_types the distinct-bigram total.
  *
  * Numerics: every model input is an exact integer count; D = 0.75 is
  * exact in binary. p_kn is then one per-row closed-form expression —
  * bit-identical across engines by the PLANS.md doctrine (same IEEE ops
  * in the same order; the oracle mirrors the parenthesization exactly).
  * Nothing floating-point is ever aggregated.
  *
  * Scale: the bigram pairing is per-row codegen (slice + arrays_zip +
  * explode — no self-join on positions, no HOF lambdas); c12 is ONE
  * (w1, w2) shuffle with map-side combine. c1/n_follow and n_prec are
  * VOCABULARY-sized aggregates over the c12 frame and join back on
  * w1/w2 — unhinted by doctrine (Heaps' law: a natural vocabulary is
  * unbounded, the planner must pick broadcast from measured size);
  * n_types is a scalar crossJoin(broadcast). Emitted rows are the
  * bigram-type table itself — the model, ready to write bucketed by w1
  * for shuffle-free lookup joins at serving time.
  */
object NgramLm {

  /** The previous [[skipgramPmi]] big-path call's persisted barrier
    * blocks, unpersisted on the next big-path entry (ADVICE r14 — a
    * repeat loop must not stack pair-table-scale persists waiting for
    * ContextCleaner GC). Guarded by `NgramLm.synchronized`. */
  @volatile private var pmiBarriers: Seq[DataFrame] = Nil

  val Discount = 0.75

  /** Bigram occurrences (w1, w2) — codegen zip of each token array with
    * its own tail; docs with < 2 tokens contribute nothing.
    */
  def bigramRows(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("id"), TextOps.tokens(col(textCol)).as("t"))
      // greatest(., 0): slice rejects negative lengths, and a 0-token doc
      // would otherwise ask for length -1
      .select(col("id"), explode(arrays_zip(
        expr("slice(t, 1, greatest(size(t) - 1, 0))"),
        expr("slice(t, 2, greatest(size(t) - 1, 0))")).cast(
        "array<struct<w1:string,w2:string>>")).as("bg"))
      .select(col("id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))

  /** The interpolated-KN bigram model: one row per bigram TYPE with its
    * count inputs and p_kn. See object doc for formula and plan shape.
    */
  def bigramKn(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val c12 = bigramRows(df, idCol, textCol)
      .groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val c1 = c12.groupBy("w1")
      .agg(sum(col("c12")).as("c1"), count(lit(1)).as("n_follow"))
    val nPrec = c12.groupBy("w2").agg(count(lit(1)).as("n_prec"))
    val nTypes = c12.agg(count(lit(1)).as("n_types"))
    val d = lit(Discount)
    // mirror the oracle's parenthesization EXACTLY — closed-form per-row
    // double arithmetic is engine-identical only when the op tree is
    val pKn =
      greatest(col("c12") - d, lit(0.0)) / col("c1") +
        ((d * col("n_follow")) / col("c1")) *
          (col("n_prec") / col("n_types").cast("double"))
    c12.join(c1, Seq("w1"))       // vocabulary-sized; unhinted by doctrine
      .join(nPrec, Seq("w2"))     // vocabulary-sized; unhinted
      .crossJoin(broadcast(nTypes))
      .select(col("w1"), col("w2"), col("c12"), col("c1"), col("n_follow"),
        col("n_prec"), col("n_types"), pKn.as("p_kn"))
  }

  /** Pointwise mutual information over adjacent word pairs (Church &
    * Hanks 1990, public) — collocation mining: pairs that co-occur far
    * more than their marginals predict ("new york") score high, chance
    * adjacencies score ~0, and anti-collocations go negative.
    *
    *   pmi(w1, w2) = ln( c12 · T / (cL(w1) · cR(w2)) )
    *
    * over the bigram-occurrence stream: c12 the pair count, cL/cR the
    * left-slot/right-slot marginals, T the total pair count. All four
    * inputs are exact integers; `ln` enters once per surviving pair and
    * is micro-snapped immediately (doctrine form 4). `minCount` prunes
    * the hapax tail BEFORE the marginal joins — the standard PMI
    * practice (rare pairs have unreliable, wildly-positive PMI) and the
    * thing that keeps the output to the interesting head.
    *
    * Scale: reuses the [[bigramRows]] codegen pairing; one (w1, w2)
    * shuffle for c12; marginals are vocabulary-sized aggregates OVER THE
    * c12 frame (never a second corpus pass — Σ c12 per slot ≡ the slot
    * marginal) joined back unhinted; T is a scalar broadcast.
    */
  def pmi(df: DataFrame, idCol: String, textCol: String,
          minCount: Long = 1L): DataFrame = {
    val c12 = bigramRows(df, idCol, textCol)
      .groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val cL = c12.groupBy("w1").agg(sum(col("c12")).as("c_left"))
    val cR = c12.groupBy("w2").agg(sum(col("c12")).as("c_right"))
    val total = c12.agg(sum(col("c12")).as("n_pairs"))
    // double-first multiplies: c12·T and cL·cR overflow LONG at corpus
    // scale (T ~ 1e13 → products ~ 1e26); each factor is exact in double
    // below 2^53 and the rounded products are engine-identical
    val pmiMicro = floor(
      log((col("c12").cast("double") * col("n_pairs").cast("double")) /
          (col("c_left").cast("double") * col("c_right").cast("double")))
        * lit(1e6) + lit(0.5))
      .cast("long")
    c12.filter(col("c12") >= minCount)
      .join(cL, Seq("w1"))        // vocabulary-sized; unhinted
      .join(cR, Seq("w2"))        // vocabulary-sized; unhinted
      .crossJoin(broadcast(total))
      .select(col("w1"), col("w2"), col("c12"), col("c_left"), col("c_right"),
        col("n_pairs"), pmiMicro.as("pmi_micro"),
        (pmiMicro.cast("double") / lit(1e6)).as("pmi"))
  }

  /** WINDOWED skipgram PMI — co-occurrence within ±`window` positions,
    * UNORDERED (pairs canonicalized least/greatest), the word2vec-style
    * association statistic. [[pmi]] sees only adjacency and direction;
    * this sees "york" near "new" across intervening tokens, which is
    * what collocation mining over noisy text actually wants.
    *
    * Model: a pair SLOT is one (i, i+k) co-occurrence, k ∈ [1, window];
    * N = total slots, c12 = slots pairing {a,b}, c_w = slots CONTAINING
    * w (each slot contributes to two word marginals — or twice to one
    * for a self-pair — so Σ c_w = 2N). Then
    *
    *   pmi(a, b) = ln( p(a,b) / (p(a)·p(b)) )
    *             = ln( 4·c12·N / (c_a·c_b) )      [p(w) = c_w/(2N)]
    *
    * micro-snapped like [[pmi]].
    *
    * Scale: the k-shifted pairing is per-row codegen (one slice+zip per
    * k, unioned — no position self-join, no HOF lambdas); ONE (w1, w2)
    * shuffle with map-side combine builds c12; the word marginal is a
    * vocabulary-sized aggregate over BOTH SLOTS of the c12 frame (never
    * a second corpus pass), joined back unhinted; N is a scalar
    * broadcast.
    */
  def skipgramPmi(df: DataFrame, idCol: String, textCol: String,
                  window: Int = 3, minCount: Long = 1L): DataFrame = {
    require(window >= 1, "window must be >= 1")
    val toks = df.select(TextOps.tokens(col(textCol)).as("t"))
    // ONE corpus scan: the k zips concat per row and explode once —
    // a k-way union of per-k frames would re-scan the corpus per k
    // (measured: 3 FileScans per c12 reference before this form)
    val zips = (1 to window).map { k =>
      arrays_zip(
        expr(s"slice(t, 1, greatest(size(t) - $k, 0))"),
        expr(s"slice(t, ${k + 1}, greatest(size(t) - $k, 0))")).cast(
        "array<struct<a:string,b:string>>")
    }
    val pairRows = toks
      .select(explode(concat(zips: _*)).as("p"))
      .select(least(col("p.a"), col("p.b")).as("w1"),
              greatest(col("p.a"), col("p.b")).as("w2"))
    // c12 has FOUR consumers (the minCount face, both branches of the
    // cw union, and the n_pairs total), each pruning different columns
    // — canonical-plan exchange reuse never fires across them (the
    // q132 c_gt lesson), so an unmaterialized frame re-runs the
    // ×window corpus explode per consumer; cw is itself triple-read
    // (both PMI joins + the total). The r14 ×100 skew audit measured
    // exactly that: four ~12 s explode stages for one query. The
    // barrier is SIZED (one count over the INPUT frame — cheap when
    // df is a direct parquet scan, a real job otherwise; the
    // lshNeighborPairsAuto doctrine) with the hold at 2^17 docs: the
    // barrier's serialize+read-back beats the recompute only once the
    // pair table is large — measured crossover sits between the ×10
    // corpus (50k docs: 14.7 s plain vs 17.2 s barriered) and ×100
    // (500k: 80.5 s vs 36.2 s), and at oracle scales the barrier would
    // only add jobs (0.53 → 1.01 s measured at sf0.1 with an eager
    // checkpoint). A LAZY persist is NOT the answer either: its
    // consumers race the cache build inside the one action (measured
    // worse at BOTH scales: 1.77 s sf0.1 / 49.8 s ×100).
    val big = df.count() > 131072L
    // eager MEMORY_AND_DISK_SER persist, not localCheckpoint: the two
    // barriered frames total ~corpus-pair-scale on the ×100 corpus,
    // and in-memory CHECKPOINT blocks (non-evictable — they are the
    // lineage) starved execution memory into UNABLE_TO_ACQUIRE task
    // failures at the default heap; evictable serialized persist
    // blocks keep memory speed while they fit and degrade to disk
    // when they don't (DISK_ONLY measured 1.4× worse at ×10, where
    // everything fits)
    //
    // RE-ENTRY HYGIENE (ADVICE r14): the barriered blocks outlive this
    // call (the returned frame reads them lazily), so they cannot be
    // unpersisted here — instead each NEW big-path call unpersists the
    // PREVIOUS call's blocks (a bench loop's repeats would otherwise
    // stack pair-table-scale persists until ContextCleaner GC catches
    // up). Non-blocking: in-flight readers of the old frame finish
    // from the recomputed lineage.
    def barrier(x: DataFrame): DataFrame =
      if (big) {
        val p = x.persist(
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
        p.count()
        NgramLm.synchronized { pmiBarriers = pmiBarriers :+ p }
        p
      } else x
    if (big) NgramLm.synchronized {
      val prev = pmiBarriers; pmiBarriers = Nil
      prev.foreach(_.unpersist(blocking = false))
    }
    val c12 = barrier(
      pairRows.groupBy("w1", "w2").agg(count(lit(1)).as("c12")))
    // cw is itself triple-consumed (the c_a join, the c_b join); same
    // sized barrier
    val cw = barrier(c12.select(col("w1").as("w"), col("c12"))
      .unionAll(c12.select(col("w2").as("w"), col("c12")))
      .groupBy("w").agg(sum(col("c12")).as("cw")))
    val total = c12.agg(sum(col("c12")).as("n_pairs"))
    // double-first multiplies, same overflow doctrine as [[pmi]]; the
    // oracle mirrors this exact op order (4·c12·N left-assoc / ca·cb)
    val pmiMicro = floor(
      log((lit(4.0) * col("c12").cast("double") * col("n_pairs").cast("double")) /
          (col("c_a").cast("double") * col("c_b").cast("double")))
        * lit(1e6) + lit(0.5))
      .cast("long")
    c12.filter(col("c12") >= minCount)
      .join(cw.withColumnsRenamed(Map("w" -> "w1", "cw" -> "c_a")), Seq("w1"))
      .join(cw.withColumnsRenamed(Map("w" -> "w2", "cw" -> "c_b")), Seq("w2"))
      .crossJoin(broadcast(total))
      .select(col("w1"), col("w2"), col("c12"), col("c_a"), col("c_b"),
        col("n_pairs"), pmiMicro.as("pmi_micro"),
        (pmiMicro.cast("double") / lit(1e6)).as("pmi"))
  }

  /** Per-group unigram KL DIVERGENCE vs the whole-corpus distribution —
    * the token-level drift/contribution statistic (CCNet, Gopher data
    * cards carry exactly this shape): KL(group ‖ corpus) =
    * Σ_t p_g(t) · ln(p_g(t) / p(t)), with p_g(t) = c_gt/T_g and
    * p(t) = c_t/T. A source whose token distribution matches the corpus
    * scores ~0; templated or single-domain sources score high — the
    * number a mixture designer watches when a new crawl snapshot lands.
    *
    * Numerics: per-term contributions are micro-snapped then integer-
    * summed, so the per-group total is aggregation-order-independent
    * (the q66 surprisal doctrine); the log ratio uses double-FIRST
    * multiplies (c_gt·T and T_g·c_t overflow LONG at corpus scale — the
    * PMI overflow doctrine) and the oracle mirrors the op order exactly.
    * KL ≥ 0 only holds for the EXACT sum; snapping can leave a group of
    * near-identical distributions a few micro-nats below zero — callers
    * read magnitude, not sign.
    *
    * Scale: ONE (group, term) shuffle with map-side combine builds c_gt;
    * the global term counts are an aggregate OVER the c_gt frame (never
    * a second corpus pass), which is why c_gt is eagerly checkpointed —
    * its two consumers (the KL join and the c_t rollup) prune different
    * columns, so canonical-plan exchange reuse never fires and an
    * uncheckpointed frame would re-run the corpus explode per consumer
    * (the q124 lesson). T_g = Σ_t c_gt and T = Σ_g T_g are rollups over
    * the same checkpointed frame — group-bounded and scalar respectively;
    * the corpus is scanned exactly once in this operator.
    */
  def unigramKlByGroup(df: DataFrame, groupCol: String, textCol: String): DataFrame = {
    val cg = df.select(col(groupCol).as("grp"),
        explode(TextOps.tokens(col(textCol))).as("term"))
      .groupBy("grp", "term").agg(count(lit(1)).as("c_gt"))
      .localCheckpoint(true)
    val ct = cg.groupBy("term").agg(sum(col("c_gt")).as("c_t"))
    // T_g = Σ_t c_gt is a rollup OVER the checkpointed gram frame — the
    // corpus is scanned exactly once in this operator; T = Σ T_g in turn.
    // Checkpointed (tiny) so the KL join and the total share it.
    val tg = cg.groupBy("grp").agg(sum(col("c_gt")).as("t_g"))
      .localCheckpoint(true)
    val total = tg.agg(sum(col("t_g")).as("t"))
    val contribMicro = floor(
      col("c_gt").cast("double") / col("t_g").cast("double") *
        log((col("c_gt").cast("double") * col("t").cast("double")) /
            (col("t_g").cast("double") * col("c_t").cast("double")))
        * lit(1e6) + lit(0.5))
      .cast("long")
    cg.join(ct, Seq("term"))      // vocabulary-sized; unhinted by doctrine
      .join(tg, Seq("grp"))       // group-bounded; unhinted
      .crossJoin(broadcast(total))
      .select(col("grp"), col("t_g"), contribMicro.as("km"))
      .groupBy("grp", "t_g")
      .agg(count(lit(1)).as("n_terms"), sum(col("km")).as("kl_micro"))
      .select(col("grp"), col("n_terms"), col("t_g").as("t_tokens"),
        col("kl_micro"), (col("kl_micro").cast("double") / lit(1e6)).as("kl"))
  }

  /** CROSS-SOURCE PERPLEXITY MATRIX: for every (train, eval) source
    * pair, the mean cross-entropy of eval's token stream under train's
    * add-one unigram LM — "which sources predict which" (the full-matrix
    * generalization of Moore-Lewis's two-model contrast; high self-xent
    * = internally diverse source, low cross-xent = near-duplicate
    * sources; the matrix is the source-level plagiarism/affinity map).
    *
    *   xent(t, e) = ln(T_t + V) − (1/T_e)·Σ_w c_ew·ln(c_tw + 1)
    *
    * — the algebra folds the smoothing denominator out of the sum, and
    * terms ABSENT from the train source contribute ln(0+1) = 0, so the
    * Σ needs only the INNER join of the two count frames on `term`:
    * no vocabulary × S² smoothing grid is ever materialized.
    *
    * Exactness: each c_ew·ln(c_tw+1) is micro-snapped then
    * integer-summed (q66 doctrine); the closing form is one fixed
    * double-op sequence from exact longs. Missing (t, e) sums (no
    * shared vocabulary) coalesce to 0 via the S²-bounded grid.
    *
    * Scale: ONE (group, term) corpus aggregation (checkpointed — its
    * consumers are the pair join's two sides and the totals rollup);
    * the pair join is vocabulary-keyed and ≤ vocab·S² rows — Heaps-
    * bounded, not corpus-bounded; with many sources, run on a source
    * sample (the matrix is quadratic in S by definition).
    */
  def crossSourcePerplexity(df: DataFrame, groupCol: String,
                            textCol: String): DataFrame = {
    val cg = df.select(col(groupCol).as("grp"),
        explode(TextOps.tokens(col(textCol))).as("term"))
      .groupBy("grp", "term").agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    val tg = cg.groupBy("grp").agg(sum(col("c")).as("t_g"))
    val vv = cg.select(col("term")).distinct().agg(count(lit(1)).as("v"))
    val m = floor(col("e.c").cast("double") *
      log(col("t.c").cast("double") + lit(1.0)) * lit(1e6) + lit(0.5))
      .cast("long")
    val pairs = cg.as("e").join(cg.as("t"), Seq("term"))
      .select(col("e.grp").as("eval_source"), col("t.grp").as("train_source"),
        m.as("m"))
      .groupBy("eval_source", "train_source")
      .agg(sum(col("m")).as("s"))
    val grid = tg.select(col("grp").as("train_source"), col("t_g").as("t_train"))
      .crossJoin(tg.select(col("grp").as("eval_source"), col("t_g").as("t_eval")))
    grid.join(pairs, Seq("train_source", "eval_source"), "left")
      .na.fill(0L, Seq("s"))
      .crossJoin(broadcast(vv))
      .select(col("train_source"), col("eval_source"), col("t_eval"),
        floor((log((col("t_train") + col("v")).cast("double")) -
          col("s").cast("double") / (col("t_eval").cast("double") * lit(1e6)))
          * lit(1e6) + lit(0.5)).cast("long").as("xent_micro"))
  }

  /** Per-group TERM-DISTRIBUTION DIVERSITY: Shannon entropy and the
    * Simpson index of each group's unigram distribution — the "is this
    * source a template mill or a real corpus" summary ([[unigramKlByGroup]]
    * measures distance FROM the corpus; these measure internal spread).
    *
    *   H       = ln T − (Σ_t c_t·ln c_t) / T           (nats)
    *   Simpson = Σ_t c_t·(c_t − 1) / (T·(T − 1))       (collision prob.)
    *
    * Exactness: Simpson is exact integer arithmetic with ONE trailing
    * division. For Shannon, each c·ln c is a per-row derived
    * micro-snapped then integer-summed (q66 doctrine); the final form
    * evaluates `ln T − s1/(T·1e6)` as one fixed double-op sequence.
    *
    * Scale: rides the same single (group, term) aggregation as the KL —
    * everything after is group-bounded.
    */
  def termDiversityByGroup(df: DataFrame, groupCol: String,
                           textCol: String): DataFrame = {
    val cg = df.select(col(groupCol).as("grp"),
        explode(TextOps.tokens(col(textCol))).as("term"))
      .groupBy("grp", "term").agg(count(lit(1)).as("c"))
    val m = floor(col("c").cast("double") * log(col("c").cast("double"))
      * lit(1e6) + lit(0.5)).cast("long")
    cg.select(col("grp"), col("c"), m.as("m"),
        (col("c") * (col("c") - lit(1L))).as("coll"))
      .groupBy("grp")
      .agg(count(lit(1)).as("n_terms"), sum(col("c")).as("t_tokens"),
        sum(col("m")).as("s1"), sum(col("coll")).as("s_coll"))
      .select(col("grp"), col("n_terms"), col("t_tokens"),
        floor((log(col("t_tokens").cast("double")) -
          col("s1").cast("double") /
            (col("t_tokens").cast("double") * lit(1e6)))
          * lit(1e6) + lit(0.5)).cast("long").as("shannon_micro"),
        when(col("t_tokens") >= 2L,
          floor(col("s_coll").cast("double") * lit(1e6) /
            (col("t_tokens").cast("double") *
              (col("t_tokens").cast("double") - lit(1.0))) + lit(0.5))
            .cast("long")).as("simpson_micro"))
  }

  /** Per-document BIGRAM CONDITIONAL ENTROPY RATE — the information-
    * theoretic repetitiveness score (q51's dup-line ratio measures exact
    * repeats; this measures how PREDICTABLE each next token is from the
    * previous one):
    *
    *   H = −Σ_{ab} p(ab)·ln p(b|a) = (1/T)·Σ_{ab} c_ab·ln(c_a / c_ab)
    *
    * with c_ab the doc's bigram count, c_a its prefix count, T its total
    * bigram tokens. Looping templated text (low entropy) separates from
    * natural prose (high) — a filter axis perplexity-based curation uses
    * without needing a trained LM.
    *
    * Exactness: counts are exact integers; each (a,b) term is a per-row
    * derived micro-snapped then integer-summed per doc (the q66/q132
    * doctrine), so the per-doc aggregate is order-independent; the rate
    * divides once by T·1e6. Documents with < 2 tokens emit nothing (no
    * bigrams — both engines' explode semantics).
    *
    * Scale shape: every aggregation is keyed by (doc, ...) —
    * embarrassingly parallel across documents. c_a rides a WINDOW over
    * the (doc, prefix) partition of the bigram-count frame rather than a
    * rollup+join: the naive join form consumed the count frame twice
    * (two corpus scans, five exchanges); the window form is ONE scan and
    * the three hierarchical exchanges (doc,a,b) → (doc,a) → (doc), and
    * its partitions are per-doc-prefix — tiny and numerous, so the
    * single-task-per-partition property is parallelism, not the
    * single-task-window failure (that failure is about per-GROUP-COLUMN
    * partitions whose size grows with the corpus). Nothing is
    * corpus-global, so no broadcast or driver bound exists to guard.
    */
  def bigramEntropyRate(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cab = bigramRows(df, idCol, textCol)
      .groupBy("id", "w1", "w2").agg(count(lit(1)).as("c_ab"))
    val wa = Window.partitionBy(col("id"), col("w1"))
    val termMicro = floor(
      col("c_ab").cast("double") *
        (log(col("c_a").cast("double")) - log(col("c_ab").cast("double")))
        * lit(1e6) + lit(0.5)).cast("long")
    cab.withColumn("c_a", sum(col("c_ab")).over(wa))
      .select(col("id"), col("c_ab"), termMicro.as("hm"))
      .groupBy(col("id").as("doc_id"))
      .agg(sum(col("c_ab")).as("n_bigrams"), sum(col("hm")).as("h_sum_micro"))
      .withColumn("entropy_rate",
        col("h_sum_micro").cast("double") /
          (col("n_bigrams").cast("double") * lit(1e6)))
  }
}
