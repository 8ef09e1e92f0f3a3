package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.plans.ArrayOps

/** Distributed MULTINOMIAL NAIVE BAYES over token counts — train and
  * inference as ONE declarative plan. This is the classical lightweight
  * text classifier a data pipeline bootstraps from weak labels (language,
  * source, heuristic quality buckets) and then applies at corpus scale:
  * fastText-class accuracy needs training; NB needs only counts, which is
  * exactly what a Spark aggregation produces. (Public result: add-one
  * smoothed multinomial NB, McCallum & Nigam 1998 formulation.)
  *
  *   score(d, l) = ln p(l) + Σ_{t ∈ d} ln p(t|l)
  *   p(t|l)      = (c_tl + 1) / (T_l + V)        [add-one smoothing]
  *   p(l)        = n_docs_l / N
  *
  * Numerics: per-(term, label) log-probabilities and the label priors are
  * micro-snapped ONCE in the model table; a document's score is then an
  * exact integer sum of snapped longs — aggregation-order-independent
  * (the q66 doctrine), so the argmax is engine-exact. Ties break to the
  * lexicographically LARGER label via max(struct) on both engines.
  *
  * Scale shape (r15 form): per-doc (term, count) tables come from the
  * row-local RLE kernels (no occurrence shuffle, no interpreted gram
  * HOF); the model is ONE term-keyed fixed-width aggregation of L
  * conditional count sums (the per-term L-vector — zero cells are the
  * zero columns, exactly where smoothing acts); scoring joins that
  * vector 1:1 on term (UNHINTED — a natural vocabulary is unbounded,
  * the planner picks broadcast from measured size) and sums L bounded
  * columns per doc. Train + score = two corpus-scale exchanges, both
  * fixed-width hash aggregates. Label-bounded frames (priors, t_l
  * stats) broadcast or collect explicitly. The per-(doc, label) score
  * frame re-stacks only AFTER the per-doc aggregation, where it is
  * argmax-sized. Token-less documents carry no evidence and are
  * dropped by both engines (the explode semantics).
  */
object Classify {

  /** Self-train-and-predict: fit NB on (labelCol, tokens(textCol)) and
    * score every document against every label. Output per document:
    * the true label, the argmax label, its score, and a correctness
    * flag — the resubstitution diagnostic a labeling pipeline watches.
    */
  def naiveBayesSelfTest(df: DataFrame, idCol: String, textCol: String,
                         labelCol: String): DataFrame =
    wordNbWide(df, idCol, textCol, labelCol) match {
      case None =>
        df.select(col(idCol).as("doc_id"), col(labelCol).as("label"),
          col(labelCol).as("pred_label"), lit(0L).as("score_micro"),
          lit(0).as("correct")).limit(0)
      case Some(w) =>
        w.wide.select(col("doc_id"), col("label_true"), bestCand(w).as("best"))
          .select(col("doc_id"), col("label_true").as("label"),
            col("best.l").as("pred_label"), col("best.s").as("score_micro"),
            (col("best.l") === col("label_true")).cast("int").as("correct"))
    }

  /** Per-doc argmax candidate over the wide score row (r19): the L
    * struct candidates (ll_i + prior_i, label_i) compared in ONE
    * projection — `greatest` over structs is exactly the max(struct)
    * the exploded form aggregated, highest score then greater label,
    * with NO ×L row explode, NO priors join and NO per-doc
    * re-aggregation exchange. Priors ride as literals collected from
    * the same Spark-computed priors frame (never recomputed driver-
    * side, so the micro-snap doubles are bit-identical by
    * construction). */
  private def bestCand(w: NbWide): Column = {
    val cands = w.labelSeq.indices.map(i =>
      struct((col(s"ll_$i") + lit(w.priorMicro(i))).as("s"),
        lit(w.labelSeq(i)).as("l")))
    if (cands.size == 1) cands.head else greatest(cands: _*)
  }

  /** The full per-(document, candidate-label) NB score frame —
    * (doc_id, label_true, label, total_micro) — shared by the argmax
    * self-test above and the margin-calibration diagnostic below so the
    * model formula cannot drift between them. */
  def naiveBayesScores(df: DataFrame, idCol: String, textCol: String,
                       labelCol: String): DataFrame = {
    val spark = df.sparkSession
    naiveBayesScoresWith(df, idCol, textCol, labelCol,
      t => ArrayOps.stringRleCounts(spark, TextOps.tokens(t)),
      t => TextOps.tokenCountFast(spark, t).cast("long"))
  }

  /** The word-token wide core shared by the argmax/top-two faces. */
  private def wordNbWide(df: DataFrame, idCol: String, textCol: String,
                         labelCol: String): Option[NbWide] = {
    val spark = df.sparkSession
    naiveBayesWide(df, idCol, textCol, labelCol,
      t => ArrayOps.stringRleCounts(spark, TextOps.tokens(t)),
      t => TextOps.tokenCountFast(spark, t).cast("long"))
  }

  /** The wide NB core's hand-off (r19): one row per doc with L integer
    * log-likelihood columns ll_0..ll_{L-1} (column i = labelSeq(i)),
    * the sorted label sequence, and the per-label micro-snapped priors
    * COLLECTED from the Spark-computed priors frame (label-bounded; the
    * collect is how the argmax/top-two faces inline them as literals
    * without an explode + join + re-aggregation tail). */
  private final case class NbWide(wide: DataFrame, labelSeq: Seq[String],
                                  priorMicro: Seq[Long])

  /** [[naiveBayesScores]] generalized over the FEATURE FAMILY — the
    * one NB core the word-token model (q133/q177/q187) and the char-
    * n-gram language-ID model (q220) share, so the smoothing grid,
    * priors and score algebra cannot drift between them. `termPairsOf`
    * extracts the per-doc (term, count) table — array<struct<term, c>>
    * from the RLE kernels; `termCountOf` must equal Σc in closed form
    * (it feeds the t_l normalizer without paying the term table twice).
    * Contract: ONE row per idCol value (the corpus PK) — per-row counts
    * ARE the per-doc counts only then, and both engines group by doc.
    *
    * Further contract terms (ADVICE r15, stated instead of assumed):
    *  - `df` must be DETERMINISTIC: the token stream `dtc` is a pure
    *    map of the input and is evaluated twice (once into the
    *    checkpointed model aggregation, once on the score side) — a
    *    non-deterministic input could present score-side terms the
    *    model vocabulary never saw, which the inner score join would
    *    silently drop. Registered callers all read parquet.
    *  - `labelCol` must be NON-NULL and LOW-CARDINALITY: the model is
    *    L aggregate columns each holding an L-branch when-chain, so
    *    plan size and codegen compile cost grow with L — weak-label
    *    families (languages, sources, quality buckets) are tens of
    *    labels; past a few hundred, janino falls back or fails, which
    *    is why L > 512 and null labels are rejected loudly below.
    * An empty input (no labels observed) returns an EMPTY score frame
    * of the correct schema rather than throwing.
    */
  def naiveBayesScoresWith(df: DataFrame, idCol: String, textCol: String,
                           labelCol: String,
                           termPairsOf: Column => Column,
                           termCountOf: Column => Column): DataFrame =
    naiveBayesWide(df, idCol, textCol, labelCol, termPairsOf,
        termCountOf) match {
      case None =>
        df.select(col(idCol).as("doc_id"),
          col(labelCol).as("label_true"), col(labelCol).as("label"),
          lit(0L).as("total_micro")).limit(0)
      case Some(NbWide(wide, labelSeq, priorMicro)) =>
        // per-(doc, label) face: totals computed IN the explode values
        // (ll + prior literal, same long addition the old priors join
        // performed) — the |docs|·L frame still re-stacks only AFTER
        // the per-doc aggregation, where it is argmax-sized
        wide.select(col("doc_id"), col("label_true"),
          explode(map_from_arrays(
            array(labelSeq.map(lit(_)): _*),
            array(labelSeq.indices.map(i =>
              col(s"ll_$i") + lit(priorMicro(i))): _*)))
            .as(Seq("label", "total_micro")))
    }

  private def naiveBayesWide(df: DataFrame, idCol: String, textCol: String,
                             labelCol: String,
                             termPairsOf: Column => Column,
                             termCountOf: Column => Column): Option[NbWide] = {
    // OCCURRENCE COMPRESSION (r15, the q220 lesson): aggregate to
    // per-(doc, term) counts BEFORE anything joins the vocabulary×L
    // grid — char-gram features are ~10× repeat-heavy, so the grid
    // join ships distinct pairs instead of raw occurrences, and the
    // score sum is unchanged as an integer: Σ_occurrences s_micro ≡
    // Σ_pairs c·s_micro (the oracle keeps the occurrence form — same
    // longs). Since the r15 follow-through the counts come from the
    // per-row RLE KERNELS (ArrayOps.CharNgramRleCounts /
    // StringArrayRleCounts): the old explode + groupBy(doc, term)
    // exchange — the NB core's biggest shuffle, shipping every raw
    // occurrence — is gone entirely, and the char-gram path also drops
    // the interpreted transform(sequence, substr) HOF (the r03 lesson).
    // NOT checkpointed (the ×1000 lesson, r15): dtc is now a pure MAP
    // of the parquet scan (kernel + explode — no exchange, no HOF), so
    // its two consumers re-running that scan stage costs two cheap
    // codegen passes over the source; an eager checkpoint of the
    // corpus-scale pair stream costs tens of GB of block traffic at
    // the ×1000 decade and DIED there — scan-partition-grained blocks
    // (~1 GB serialized each) OOM an 8 GiB box when the consumer's
    // BlockManager re-buffers whole blocks off disk
    // (maybeCacheDiskBytesInMemory allocates per-block ByteBuffers).
    // The multi-consumer checkpoint doctrine (q124/q97) applies to
    // frames that are EXPENSIVE to recompute; post-kernel, this one is
    // not.
    val dtc = df.select(col(idCol).as("doc_id"),
        col(labelCol).as("label_true"),
        explode(termPairsOf(col(textCol))).as("tc"))
      .select(col("doc_id"), col("label_true"),
        col("tc.term").as("term"), col("tc.c").as("c"))
    // label-bounded; checkpointed so its consumers (the priors, the
    // N = Σ n_docs rollup, and the driver-side label-stats collect —
    // never another corpus scan) read one materialization
    val labels = df.groupBy(col(labelCol).as("label"))
      .agg(count(lit(1)).as("n_docs"),
        sum(termCountOf(col(textCol))).as("t_l"))
      .localCheckpoint(true)
    val nAll = labels.agg(sum(col("n_docs")).as("n_all"))
    val priors = labels.crossJoin(broadcast(nAll))
      .select(col("label"),
        floor((log(col("n_docs").cast("double")) -
          log(col("n_all").cast("double"))) * lit(1e6) + lit(0.5))
          .cast("long").as("prior_micro"))
    // LABEL-VECTOR MODEL + SCORING (r15 follow-through, hardened at the
    // ×1000 decade): the dense (term, label) smoothing grid — a
    // vocabulary×L frame built from a (label, term) exchange, a cross
    // join and a left join, then re-pivoted per term — is replaced by
    // ONE term-keyed aggregation of L conditional sums:
    // c_l(term) = Σ c over label-l rows, a FIXED-WIDTH hash aggregate
    // (codegen'd, spillable) keyed by term alone. Zero cells are
    // exactly the c_l = 0 columns, so smoothing acts in the same
    // places; V = the frame's row count; t_l rides in as a literal
    // per label (the labels frame is L-bounded and already collected
    // for the column order). This removes BOTH the (label, term)
    // exchange and the vocabulary-keyed OBJECT aggregation the
    // map-pivot form paid (ArrayBuffer state per key — the ∝N-vocab
    // worst case measured it superlinear at ×1000). The score join is
    // 1:1 on term (unhinted by doctrine — a natural vocabulary is
    // unbounded; the planner picks broadcast from measured size), the
    // per-doc agg sums L bounded columns, and the |docs|·L frame
    // re-stacks AFTER aggregation, where it is argmax-sized. Same
    // integers throughout: Σ_terms c·s_l per (doc, l), with s_micro
    // computed from the same double operands (log(c+1) − log(t_l+V)).
    // Train + score = TWO corpus-scale exchanges total (term-keyed
    // model agg, doc-keyed score agg).
    val labelRows = labels.select(col("label"), col("t_l")).collect()
    // degenerate-case guards (ADVICE r15): an empty input used to throw
    // NoSuchElementException at labelSeq.head and a null label NPE'd in
    // the sort — return None (the faces emit their empty frames) / fail
    // with the actual contract violation instead
    if (labelRows.isEmpty) return None
    require(labelRows.forall(!_.isNullAt(0)),
      "naiveBayesScoresWith: null label value — labels are model keys " +
        "and must be non-null (filter or impute upstream)")
    require(labelRows.length <= 512,
      s"naiveBayesScoresWith: ${labelRows.length} distinct labels — the " +
        "fixed-width model builds one aggregate column (an L-branch " +
        "when-chain) per label, so very large L blows plan/codegen size; " +
        "bucket or hash the label upstream (contract cap: 512)")
    val labelStats = labelRows
      .map(r => (r.getString(0), r.getLong(1))).sortBy(_._1).toSeq
    val labelSeq = labelStats.map(_._1)
    val termVec = dtc.groupBy(col("term"))
      .agg(sum(when(col("label_true") === labelSeq.head, col("c"))
          .otherwise(lit(0L))).as("c_0"),
        labelSeq.indices.drop(1).map(i =>
          sum(when(col("label_true") === labelSeq(i), col("c"))
            .otherwise(lit(0L))).as(s"c_$i")): _*)
      .localCheckpoint(true,
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val vCount = termVec.agg(count(lit(1)).as("v"))
    val gridVec = termVec.crossJoin(broadcast(vCount))
      .select(col("term"),
        array(labelSeq.indices.map(i =>
          floor((log(col(s"c_$i").cast("double") + lit(1.0)) -
            log((lit(labelStats(i)._2) + col("v")).cast("double")))
            * lit(1e6) + lit(0.5)).cast("long")): _*).as("s_arr"))
    val wide = dtc
      .join(gridVec, Seq("term"))  // 1:1 on term; unhinted by doctrine
      .groupBy(col("doc_id"), col("label_true"))
      .agg(sum(col("c") * element_at(col("s_arr"), 1)).as("ll_0"),
        labelSeq.indices.drop(1).map(i =>
          sum(col("c") * element_at(col("s_arr"), i + 1)).as(s"ll_$i")): _*)
    // priors collected (label-bounded, from the checkpointed labels
    // frame) so the consumer faces can inline them as literals — the
    // snapped values stay the SPARK-computed doubles above, never a
    // driver-side log recomputation
    val priorMap = priors.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    Some(NbWide(wide, labelSeq, labelSeq.map(priorMap)))
  }

  /** TRAINED LANGUAGE-ID confusion census (VERDICT r14 #5): fit the
    * multinomial NB on CHAR n-grams with the corpus `lang` labels,
    * predict per doc (argmax — ties to the greater label, the q133
    * convention), and roll up the observed (label, prediction) cells
    * with row (recall-axis) and column (precision-axis) shares — the
    * q194 census shape, so the trained model and the q33 marker-word
    * heuristic are comparable table for table. Char grams carry the
    * script/orthography signal the marker CASE misses; on the
    * synthetic corpus the trained model's diagonal mass beats the
    * heuristic's (TextSpec pins it).
    *
    * Scale shape: the NB core's — per-row RLE kernel (no occurrence
    * shuffle), a (label, term) and a vocabulary×L grid aggregation;
    * everything after the score frame is |langs|²-bounded.
    */
  def charLangIdConfusion(df: DataFrame, idCol: String, textCol: String,
                          labelCol: String, n: Int = 3): DataFrame =
    predCensus(df, labelCol,
      naiveBayesWide(df, idCol, textCol, labelCol,
        t => ArrayOps.charNgramRleCounts(df.sparkSession, t, n),
        TextOps.charNgramCount(_, n)))

  /** MIXED-WIDTH char-gram language-ID (VERDICT r15 #5): the same NB
    * core over the UNION of several gram widths — each width's per-row
    * (term, c) table comes from its own RLE kernel with the terms
    * WIDTH-PREFIXED ("n|gram"), so features from different widths can
    * never alias, and the per-row tables concatenate into one pair
    * stream (kernel concat is codegen'd array concat; term count is the
    * closed-form Σ_w max(len−w+1, 0)). Adjudication on the synthetic
    * corpus (TextSpec pins the ordering, r16): the prescribed
    * {2,3,4} mix beats the 3-gram diagonal (319 vs 288 of 500) but at
    * 3× the gram extent — and the measured knee is WIDTH, not mixing:
    * single-width 4 reaches 375/500 at the same extent as 3 (held-out
    * split agrees: 8>5≈6>4≈2>3, every mix below its widest member), so
    * q220 registers single-width 4 and this stays the measured
    * capability for corpora whose script mix genuinely needs it.
    */
  def charLangIdConfusionMixed(df: DataFrame, idCol: String,
                               textCol: String, labelCol: String,
                               widths: Seq[Int]): DataFrame = {
    require(widths.nonEmpty && widths.forall(_ >= 1) &&
      widths.distinct.size == widths.size,
      s"charLangIdConfusionMixed: widths must be distinct and >= 1, got $widths")
    val spark = df.sparkSession
    predCensus(df, labelCol,
      naiveBayesWide(df, idCol, textCol, labelCol,
        t => concat(widths.map(w =>
          ArrayOps.charNgramRleCounts(spark, t, w, widthPrefixed = true)): _*),
        t => widths.map(w => TextOps.charNgramCount(t, w)).reduce(_ + _)))
  }

  /** The confusion-census tail (argmax per doc — ties to the greater
    * label, the q133 convention — then (label, pred) cells with row/
    * column shares, the q194 shape) shared by the single-width and
    * mixed-width language-ID faces so the census cannot drift. */
  private def predCensus(df: DataFrame, labelCol: String,
                         w: Option[NbWide]): DataFrame = {
    // argmax in ONE projection over the wide row (r19, see bestCand):
    // no ×L explode, no priors join, no per-doc re-aggregation — the
    // census exchange below is the face's first shuffle after the
    // score aggregation
    val pred = w match {
      case None => df.select(col(labelCol).as("label"),
        col(labelCol).as("pred")).limit(0)
      case Some(w) =>
        w.wide.select(col("label_true").as("label"),
          bestCand(w).getField("l").as("pred"))
    }
    val cells = pred.groupBy(col("label"), col("pred"))
      .agg(count(lit(1)).as("n")).localCheckpoint(true)
    val rt = cells.groupBy(col("label")).agg(sum(col("n")).as("rt"))
    val ct = cells.groupBy(col("pred")).agg(sum(col("n")).as("ct"))
    cells.join(rt, Seq("label")).join(ct, Seq("pred"))
      .select(col("label"), col("pred").as("pred_lang"), col("n"),
        floor(col("n").cast("double") * lit(1e6)
          / col("rt").cast("double") + lit(0.5)).cast("long")
          .as("row_share_micro"),
        floor(col("n").cast("double") * lit(1e6)
          / col("ct").cast("double") + lit(0.5)).cast("long")
          .as("col_share_micro"))
  }

  /** MARGIN-CALIBRATION TABLE: does the classifier's own confidence
    * margin (top-1 − top-2 score, exact micro integers) predict its
    * accuracy? The reliability-diagram analog for a log-space classifier
    * whose scores never normalize to probabilities: per log₂ margin
    * bucket (the q171 bit-length idiom), the doc count and the empirical
    * accuracy — a monotone-rising table means the margin is a usable
    * triage knob (auto-accept wide margins, route narrow ones to review).
    *
    * Exactness + scale: top-1 and top-2 come from ONE projection over
    * the wide per-doc score row (r19 — an L-element array_sort of the
    * candidate structs, L label-bounded): best = max(s, l), runner-up =
    * the best of the remaining candidates, bit-identical to the old
    * two-pass max(struct) + equi-join form it replaced. Ties at the
    * top give margin 0 — bucket 0 collects exactly the coin-flip
    * cases. Everything after the NB score aggregation is per-doc
    * bounded.
    */
  /** Top-1 / top-2 candidate extraction from the wide NB core:
    * (doc_id, label_true, pred_label, best_micro, second_micro) — the
    * shared front half of the margin-calibration table and the
    * label-noise audit. One projection, no per-doc window sort, no
    * runner-up join.
    */
  private def topTwo(df: DataFrame, idCol: String, labelCol: String,
                     w: Option[NbWide]): DataFrame = w match {
    // L < 2: no runner-up exists — the old equi-join form returned an
    // empty frame; preserve that (and the empty-input case with it)
    case Some(w) if w.labelSeq.size >= 2 =>
      // ONE map over the wide row (r19): the L candidate structs sort
      // ascending by (score, label); the last element is exactly the
      // old max(struct) argmax (highest score, ties to greater label)
      // and the second-to-last is exactly the old "max total among
      // labels != pred_label" (labels are distinct, so the runner-up
      // candidate IS the best of the rest). Replaces a per-doc argmax
      // exchange + a |docs|·L runner-up join + a second per-doc
      // aggregation — and the scores checkpoint both consumers needed.
      val arr = array_sort(array(w.labelSeq.indices.map(i =>
        struct((col(s"ll_$i") + lit(w.priorMicro(i))).as("s"),
          lit(w.labelSeq(i)).as("l"))): _*))
      w.wide.select(col("doc_id"), col("label_true"),
          element_at(arr, -1).as("best"), element_at(arr, -2).as("second"))
        .select(col("doc_id"), col("label_true"),
          col("best.l").as("pred_label"), col("best.s").as("best_micro"),
          col("second.s").as("second_micro"))
    case _ =>
      df.select(col(idCol).as("doc_id"), col(labelCol).as("label_true"),
        col(labelCol).as("pred_label"), lit(0L).as("best_micro"),
        lit(0L).as("second_micro")).limit(0)
  }

  def nbMarginCalibration(df: DataFrame, idCol: String, textCol: String,
                          labelCol: String): DataFrame = {
    topTwo(df, idCol, labelCol, wordNbWide(df, idCol, textCol, labelCol))
      .withColumn("margin", col("best_micro") - col("second_micro"))
      .withColumn("bucket",
        when(col("margin") <= 0, lit(0L))
          .otherwise(length(bin(col("margin"))).cast("long")))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
        sum((col("pred_label") === col("label_true")).cast("long"))
          .as("n_correct"))
      .withColumn("acc_micro",
        floor(col("n_correct").cast("double") * lit(1e6)
          / col("n").cast("double") + lit(0.5)).cast("long"))
  }

  /** LEAVE-ONE-SOURCE-OUT DATA VALUATION: for every source s, the NB
    * label-model's accuracy on a fixed eval slice when trained WITHOUT
    * s, against the full-corpus model — the distributable core of
    * influence-style data valuation (which sources actually help the
    * downstream label model, which are noise). A source whose removal
    * RAISES accuracy is hurting training; the delta column ranks
    * sources for culling or down-weighting.
    *
    * The key algebra: every LOO model's counts derive from ONE corpus
    * scan — c_tl^(−s) = c_tl − c_tls, T_l^(−s) = T_l − T_ls,
    * V^(−s) = V − |terms exclusive to s|, priors likewise — so "train
    * S models" costs one (source, term, label) aggregation plus
    * vocab×L×S grid arithmetic, never S corpus passes. Inference
    * replicates eval-doc tokens ×L×S; keep the eval slice a sample
    * (`evalPred`) — the replication, not the training, is the scale
    * knob (scale path: restrict the grid to eval-doc terms first).
    *
    * Semantics notes, both engines: docs whose every token is
    * exclusive to the held-out source carry no evidence under that
    * model and drop from its eval (n_scored is per-source for this
    * reason); labels wholly contributed by s die with it (their grid
    * and prior rows are filtered on n_docs > 0, so they simply cannot
    * be predicted). Scores are micro-snapped integer sums throughout —
    * the q133 exactness doctrine.
    *
    * Scale rule (SCALE.md F12, measured r12): cost is ∝ the OBSERVED
    * (source, term, label) cube — ≈ min(V·S·L, corpus tokens) — NOT
    * raw vocabulary. A calibrated Heaps-β≈0.5 corpus with 30× less
    * vocabulary at ×100 left the cube at 5.96M vs 7.33M rows and the
    * wall at 0.87× (110.9 vs 128.0 s); an intermediate variant with
    * 4.3× less vocabulary but the SAME cube ran 1.28× SLOWER (higher
    * per-key multiplicity). Do not expect vocabulary reductions to
    * shrink this operator once the cube saturates. Linear-in-corpus
    * holds on every regime (×10→×100 = 5.8–7.3× wall for 10× data).
    */
  def looSourceValuation(df: DataFrame, idCol: String, textCol: String,
                         labelCol: String, sourceCol: String,
                         evalPred: Column): DataFrame =
    looValuationWithEval(df, idCol, textCol, labelCol, sourceCol,
      df.filter(evalPred).select(col(idCol).as("doc_id")))

  /** SAMPLED leave-one-source-out valuation (VERDICT r13 #3): the
    * scaladoc above names the eval-token ×L×S replication as the scale
    * knob and says "keep the eval slice a sample" — this is that knob
    * REGISTERED instead of prose. The eval slice is the q71
    * deterministic per-label subsample (seeded md5 rank, no RNG) of
    * the `evalPred` candidates: |eval| ≤ L·k BY CONSTRUCTION, so the
    * inference replication — and with it the eval-vocab×L×S grid, the
    * cube term q193 pays — is BOUNDED regardless of corpus size,
    * while training counts and smoothing corrections still come from
    * the FULL corpus. Per-label (not global) sampling keeps every
    * label represented in the eval slice, so a rare label's accuracy
    * contribution survives the cut. Model scores for the sampled docs
    * are EXACTLY the full-eval q193 scores (the grid restriction to
    * eval-slice terms is already proven result-neutral); only the
    * accuracy denominator changes, which is the documented estimator
    * trade of any fixed eval subset.
    */
  def looSourceValuationSampled(df: DataFrame, idCol: String,
                                textCol: String, labelCol: String,
                                sourceCol: String, evalPred: Column,
                                perLabelK: Int): DataFrame =
    looValuationWithEval(df, idCol, textCol, labelCol, sourceCol,
      Terms.perGroupSample(df.filter(evalPred), idCol, labelCol, perLabelK)
        .select(col("doc_id")))

  private def looValuationWithEval(df: DataFrame, idCol: String,
                                   textCol: String, labelCol: String,
                                   sourceCol: String,
                                   evalDocs: DataFrame): DataFrame = {
    val spark = df.sparkSession
    // the token stream feeds the count model AND the eval slice.
    // Occurrence-compressed per row by the RLE kernel (r15): every
    // downstream consumer is either an additive count rollup or the
    // ×L×S inference join, so shipping (doc, term, c) instead of raw
    // occurrences shrinks the grid replication by the corpus' per-doc
    // repeat factor, with identical integer sums (Σ_occurrences x ≡
    // Σ_pairs c·x). Checkpointed SERIALIZED: unlike the NB core's dtc
    // (two consumers, dropped checkpoint — the ×1000 lesson), this
    // stream has THREE consumers (the cube agg, the grid's eval-term
    // distinct, the inference join) and an uncheckpointed form
    // measured 1.2–1.4× slower at ×100; MEMORY_AND_DISK_SER keeps the
    // blocks ~3× smaller than the old deserialized default against
    // the block-rebuffer hazard the NB core hit at ×1000.
    val toks = df.select(col(idCol).as("doc_id"),
      col(labelCol).as("label_true"), col(sourceCol).as("src"),
      explode(ArrayOps.stringRleCounts(spark,
        TextOps.tokens(col(textCol)))).as("tc"))
      .select(col("doc_id"), col("label_true"), col("src"),
        col("tc.term").as("term"), col("tc.c").as("c"))
      .localCheckpoint(true,
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val ctls = toks.groupBy(col("src"), col("label_true").as("label"),
        col("term"))
      .agg(sum(col("c")).as("c")).localCheckpoint(true)
    val sources = ctls.select(col("src")).distinct().localCheckpoint(true)
    val ctl = ctls.groupBy(col("label"), col("term"))
      .agg(sum(col("c")).as("c_all")).localCheckpoint(true)
    // per-label totals, full and per-source
    val lab = df.groupBy(col(labelCol).as("label"))
      .agg(count(lit(1)).as("n_docs"),
        sum(TextOps.tokenCountFast(spark, col(textCol)).cast("long")).as("t_l"))
      .localCheckpoint(true)
    val labS = df.groupBy(col(sourceCol).as("src"), col(labelCol).as("label"))
      .agg(count(lit(1)).as("n_ls"),
        sum(TextOps.tokenCountFast(spark, col(textCol)).cast("long")).as("t_ls"))
    val nAll = lab.agg(sum(col("n_docs")).as("n_all"))
    // vocabulary sizes: V, and V^(−s) = V − (terms exclusive to s)
    val termTot = ctl.groupBy(col("term")).agg(sum(col("c_all")).as("ct"))
    val termSrc = ctls.groupBy(col("src"), col("term"))
      .agg(sum(col("c")).as("cs"))
    val v = termTot.agg(count(lit(1)).as("v"))
    val vS = termSrc.join(termTot, Seq("term"))
      .filter(col("ct") === col("cs"))
      .groupBy(col("src")).agg(count(lit(1)).as("excl"))
    // eval slice tokens, needed below to bound the grid
    val evalToks = toks.join(evalDocs, Seq("doc_id"))
      .drop("src")
    // per-source LOO model grid: labels × sources over EVAL-SLICE terms
    // only (r11 — the scale knob the scaladoc names): the grid's sole
    // consumer is the evalToks inference join, so terms absent from the
    // eval slice can never contribute a row — dropping them changes
    // nothing (verified by the unchanged oracle) while the smoothing
    // corrections (V, V^(−s), T_l, T_ls) still come from FULL-corpus
    // counts computed above. On the ×100 salted-vocab corpus this cut
    // the grid from corpus-vocab×L×S to eval-vocab×L×S. Zero cells stay
    // included (smoothing acts exactly there) — EXCEPT terms whose
    // entire corpus count came from the held-out source: model −s has
    // never seen them, so they are out-of-vocabulary for it (their
    // rows drop, matching the V correction; at inference they behave
    // like any unknown token — the join misses)
    val grid = evalToks.select(col("term")).distinct()
      .crossJoin(broadcast(lab.select(col("label"))))
      .crossJoin(broadcast(sources))
      .join(ctl, Seq("label", "term"), "left").na.fill(0L, Seq("c_all"))
      .join(ctls.withColumnRenamed("c", "c_s"), Seq("src", "label", "term"), "left")
      .na.fill(0L, Seq("c_s"))
      .join(broadcast(lab), Seq("label"))
      .join(labS, Seq("src", "label"), "left")
      .na.fill(0L, Seq("n_ls", "t_ls"))
      .crossJoin(broadcast(v))
      .join(broadcast(vS), Seq("src"), "left").na.fill(0L, Seq("excl"))
      .join(broadcast(termTot), Seq("term"))
      .join(termSrc.withColumnRenamed("cs", "cs_term"), Seq("src", "term"), "left")
      .na.fill(0L, Seq("cs_term"))
      .filter(col("cs_term") < col("ct")) // term survives the hold-out
      .filter(col("n_docs") - col("n_ls") > 0) // label dies with s
      .select(col("src"), col("term"), col("label"),
        floor((log((col("c_all") - col("c_s")).cast("double") + lit(1.0)) -
          log((col("t_l") - col("t_ls") + col("v") - col("excl"))
            .cast("double"))) * lit(1e6) + lit(0.5)).cast("long").as("s_micro"))
    val priors = lab.crossJoin(broadcast(sources))
      .join(labS, Seq("src", "label"), "left").na.fill(0L, Seq("n_ls"))
      .crossJoin(broadcast(nAll))
      .join(df.groupBy(col(sourceCol).as("src")).agg(count(lit(1)).as("n_s")),
        Seq("src"))
      .filter(col("n_docs") - col("n_ls") > 0)
      .select(col("src"), col("label"),
        floor((log((col("n_docs") - col("n_ls")).cast("double")) -
          log((col("n_all") - col("n_s")).cast("double"))) * lit(1e6)
          + lit(0.5)).cast("long").as("prior_micro"))
    // eval slice scored under every LOO model
    val scored = evalToks
      .join(grid, Seq("term")) // ×L×S replication — the documented knob
      .groupBy(col("src"), col("doc_id"), col("label_true"), col("label"))
      .agg(sum(col("c") * col("s_micro")).as("ll_micro"))
      .join(broadcast(priors), Seq("src", "label"))
      .select(col("src"), col("doc_id"), col("label_true"),
        struct((col("ll_micro") + col("prior_micro")).as("s"),
          col("label").as("l")).as("cand"))
    val looAcc = scored.groupBy(col("src"), col("doc_id"), col("label_true"))
      .agg(max(col("cand")).as("best"))
      .groupBy(col("src"))
      .agg(count(lit(1)).as("n_scored"),
        sum((col("best.l") === col("label_true")).cast("long")).as("n_ok"))
      .withColumn("acc_loo_micro",
        floor(col("n_ok").cast("double") * lit(1e6)
          / col("n_scored").cast("double") + lit(0.5)).cast("long"))
    // full-model accuracy on the same slice — DERIVED from the same
    // count scan as the LOO models (r19 optimization): the full model
    // is exactly the src-free face of the algebra above (c_all, t_l,
    // V, n_docs/n_all priors), so scoring the eval slice needs only
    // ctl/lab/v — already checkpointed — restricted to eval-slice
    // terms (the same result-neutral grid cut the LOO grid takes: the
    // grid's sole consumer is the evalToks join, and every eval term
    // is in the corpus vocabulary, so the inner score join hits
    // identically). This replaces naiveBayesSelfTest's SECOND corpus
    // tokenize pass, second term-keyed model exchange, and corpus-wide
    // doc-keyed score aggregation (it scored EVERY doc, then joined
    // the slice away). Same integers: s_micro/prior_micro share the
    // double operand shapes of the LOO grid with the src terms zeroed,
    // which is the oracle's nbCtes formula (ln(c_all+1) − ln(t_l+V)).
    val fullGrid = evalToks.select(col("term")).distinct()
      .crossJoin(broadcast(lab.select(col("label"), col("t_l"))))
      .join(ctl, Seq("label", "term"), "left").na.fill(0L, Seq("c_all"))
      .crossJoin(broadcast(v))
      .select(col("term"), col("label"),
        floor((log(col("c_all").cast("double") + lit(1.0)) -
          log((col("t_l") + col("v")).cast("double"))) * lit(1e6)
          + lit(0.5)).cast("long").as("s_micro"))
    val fullPriors = lab.crossJoin(broadcast(nAll))
      .select(col("label"),
        floor((log(col("n_docs").cast("double")) -
          log(col("n_all").cast("double"))) * lit(1e6) + lit(0.5))
          .cast("long").as("prior_micro"))
    val full = evalToks.join(fullGrid, Seq("term"))
      .groupBy(col("doc_id"), col("label_true"), col("label"))
      .agg(sum(col("c") * col("s_micro")).as("ll_micro"))
      .join(broadcast(fullPriors), Seq("label"))
      .select(col("doc_id"), col("label_true"),
        struct((col("ll_micro") + col("prior_micro")).as("s"),
          col("label").as("l")).as("cand"))
      .groupBy(col("doc_id"), col("label_true"))
      .agg(max(col("cand")).as("best"))
      .agg(count(lit(1)).as("n_eval"),
        sum((col("best.l") === col("label_true")).cast("long")).as("ok"))
      .select(col("n_eval"),
        floor(col("ok").cast("double") * lit(1e6)
          / col("n_eval").cast("double") + lit(0.5)).cast("long")
          .as("acc_full_micro"))
    looAcc.crossJoin(broadcast(full))
      .select(col("src").as("source"), col("n_scored"), col("n_eval"),
        col("acc_full_micro"), col("acc_loo_micro"),
        (col("acc_loo_micro") - col("acc_full_micro")).as("delta_micro"))
  }

  /** LABEL-NOISE AUDIT (the confident-learning idea, Northcutt et al.
    * 2021, reduced to its distributable core): documents where the
    * model trained ON the given labels still disagrees with its own
    * training label BY A WIDE MARGIN are the strongest mislabel
    * candidates — a weak-label pipeline routes exactly these to
    * re-annotation. Emits (doc_id, label, pred_label, margin_micro)
    * for disagreements with margin ≥ `minMarginMicro`, margin being
    * the exact top-1 − top-2 integer of [[nbMarginCalibration]]'s
    * scale (so the threshold is calibrated by q177's table).
    */
  def labelNoiseCandidates(df: DataFrame, idCol: String, textCol: String,
                           labelCol: String,
                           minMarginMicro: Long): DataFrame = {
    topTwo(df, idCol, labelCol, wordNbWide(df, idCol, textCol, labelCol))
      .withColumn("margin_micro", col("best_micro") - col("second_micro"))
      .filter(col("pred_label") =!= col("label_true") &&
        col("margin_micro") >= minMarginMicro)
      .select(col("doc_id"), col("label_true").as("label"),
        col("pred_label"), col("margin_micro"))
  }

  /** PREFERENCE-PAIR MINING for DPO/RLHF-style training-set construction:
    * within each group (the "same prompt/context" bucket — here any
    * grouping the caller picks), emit (chosen, rejected) = the highest-
    * and lowest-scoring documents, kept only when the score margin clears
    * `minMarginMicro` — pairs with no real quality gap teach a preference
    * model nothing. `scoreMicro` must be a micro-snapped LongType score.
    *
    * Exactness + scale: both extremes come out of ONE groupBy via
    * `max(struct)` / `min(struct)` — the q95 keeper-argmax doctrine: no
    * per-group window sort, map-side combinable, engine-exact tie-breaks.
    * Chosen ties resolve to the SMALLER doc id (max over (score, −id)),
    * rejected ties likewise (min over (score, id)), so a group of equal
    * scores yields chosen == rejected and is dropped by the margin gate
    * before the identity check even matters.
    */
  def preferencePairs(df: DataFrame, idCol: String, groupCols: Seq[String],
                      scoreMicro: Column, minMarginMicro: Long): DataFrame = {
    val g = groupCols.map(col)
    df.select(g :+ col(idCol).as("__id") :+ scoreMicro.as("__sm"): _*)
      .groupBy(g: _*)
      .agg(count(lit(1)).as("n_group"),
        max(struct(col("__sm").as("s"), (-col("__id")).as("ni"))).as("mx"),
        min(struct(col("__sm").as("s"), col("__id").as("i"))).as("mn"))
      .select(g ++ Seq(col("n_group"),
        (-col("mx.ni")).as("chosen_id"), col("mn.i").as("rejected_id"),
        col("mx.s").as("chosen_micro"), col("mn.s").as("rejected_micro"),
        (col("mx.s") - col("mn.s")).as("margin_micro")): _*)
      .filter(col("margin_micro") >= minMarginMicro &&
        col("chosen_id") =!= col("rejected_id"))
  }

  /** CLASS-BALANCE WEIGHTS by effective number of samples (Cui et al.
    * 2019, public): per label, n_eff = (1 − β^n)/(1 − β) and
    * weight ∝ 1/n_eff — the re-weighting a trainer applies when label
    * frequencies are skewed; β→1 recovers inverse-frequency, β=0 gives
    * uniform. Emits the raw weight and each label's share of the total
    * weight mass (what a weighted sampler actually consumes).
    *
    * Numerics: one corpus-scan groupBy produces exact counts; β^n is a
    * per-row libm `pow` on the label-bounded frame, micro-snapped like
    * every ln in this repo (doctrine form 4); the share divides once by
    * the exact integer Σ weight_micro. Scale: everything after the count
    * aggregation is label-bounded — broadcast-sized by construction.
    */
  def classWeights(df: DataFrame, labelCol: String,
                   beta: Double = 0.999): DataFrame = {
    require(beta >= 0.0 && beta < 1.0, s"beta must be in [0,1), got $beta")
    val counts = df.groupBy(col(labelCol).as("label"))
      .agg(count(lit(1)).as("n"))
      .withColumn("weight_micro",
        floor((lit(1.0) - lit(beta)) /
          (lit(1.0) - pow(lit(beta), col("n").cast("double")))
          * lit(1e6) + lit(0.5)).cast("long"))
      .localCheckpoint(true) // total + share read one materialization
    val total = counts.agg(sum(col("weight_micro")).as("w_total"))
    counts.crossJoin(broadcast(total))
      .select(col("label"), col("n"), col("weight_micro"),
        floor(col("weight_micro").cast("double") * lit(1e6) /
          col("w_total").cast("double") + lit(0.5)).cast("long")
          .as("share_micro"))
  }
}
