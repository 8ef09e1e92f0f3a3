package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level retrieval and scoring operators for the training-data
  * pipeline surface (builder brief: quality scoring / contamination /
  * similarity beyond the reference's own analytics): BM25 top-k lookup,
  * unigram-LM surprisal scoring, and domain-level quality gating.
  *
  * Numerics follow the PLANS.md cross-engine doctrine: every aggregated
  * double is first snapped per row to an exact integer micro-unit via
  * `floor(x * 1e6 + 0.5)` (doctrine form 3 — floor is engine-identical
  * even at representable midpoints), so group sums are order-independent
  * integer sums and the single trailing division is one IEEE op both
  * engines perform identically. `ln` enters only as a per-row derived
  * (doctrine form 4) whose ulp-level libm variation is absorbed by the
  * micro rounding.
  *
  * Scale notes, per operator:
  *  - `bm25TopK`: the query-term `isin` prunes the exploded token stream
  *    BEFORE the postings aggregation — the shuffle carries only
  *    occurrences of query terms (the inverted-index access path), not
  *    the corpus. df/idf live on a query-term-bounded dimension
  *    (broadcast by construction); the final top-k is a per-query
  *    row_number the optimizer executes as WindowGroupLimit (per-
  *    partition heaps, no global sort).
  *  - `unigramSurprisal`: same two-aggregate shape as distinctiveTerms —
  *    one (doc, term) shuffle, one vocabulary-sized count frame; the
  *    token←count join is keyed on `term` and left UNHINTED (Heaps' law:
  *    a natural vocabulary is unbounded, so the planner/AQE must pick
  *    broadcast from measured size, not a forced hint).
  *  - `domainQualityFilter`: the per-domain aggregate is domain-bounded
  *    (orders of magnitude smaller than the corpus but NOT fixed-size —
  *    the web has ~1e8 registrable domains), so the survivors semi-join
  *    is likewise unhinted; the mean gate compares integer micro-sums
  *    (`q_sum >= min * n`) so no division enters the predicate.
  */
object Retrieval {

  /** QUERY-LIKELIHOOD retrieval with Dirichlet smoothing (Zhai &
    * Lafferty 2001) — the language-modeling ranker next to [[bm25TopK]]:
    * score(q, d) = Σ_{t∈q} qf_t · ln p(t|d) with
    * p(t|d) = (c_td + μ·P(t|C)) / (dl + μ). Computed in the standard
    * sparse decomposition — a query constant Σ qf·ln(μ·P_t), a
    * document-length term −|q|·ln(dl + μ), and a PRESENT-TERM-only
    * bonus Σ qf·ln(1 + c_td·T/(μ·ctf_t)) — so the postings join carries
    * only matching occurrences.
    *
    * Queries here are query-by-example documents (`queryPred` rows);
    * each is its own token multiset. Every component micro-snaps per
    * term before its integer sum (q65 doctrine), so scores and ranks
    * are engine-exact.
    *
    * Scale note: the final frame scores the FULL query×doc grid (the
    * dl term differentiates even zero-overlap docs) — the honest
    * brute-force baseline, q38's role for ANN. A deployment prunes to
    * overlap candidates plus a dl-extreme fringe, or composes the
    * score into an impact-ordered index; the grid keeps the oracle
    * exactly mirrorable.
    *
    * Contract (ADVICE r15, surfaced like [[graft.text.Classify]]'s):
    * `idCol` must be UNIQUE — ONE row per document, the corpus PK. The
    * per-row RLE kernel makes each row's (term, c) table the per-DOC
    * table only under that key; duplicate id rows would emit duplicate
    * (query_id, term) postings that inflate the query constant and the
    * present-term bonus (dl/coll re-sum and stay safe). Registered
    * callers read the parquet corpus, whose doc_id is the table PK.
    */
  def qlDirichletTopK(docs: DataFrame, idCol: String, textCol: String,
                      queryPred: Column, mu: Double, k: Int): DataFrame = {
    // (doc, term) postings are consumed by FOUR frames (collection
    // stats, dl, query side, candidate side) whose different pruned
    // schemas defeat canonical exchange reuse (the q124 lesson) — an
    // uncheckpointed tf re-runs the corpus pass per consumer. The
    // frame is vocabulary×docs-bounded (distinct terms per doc), the
    // genuinely-multi-consumed case the checkpoint doctrine reserves
    // this for; dl derives from it instead of a second pass. Since r15
    // the counts come from the per-row RLE kernel (doc_id is the
    // corpus PK — one row per doc), so building tf ships NO shuffle at
    // all where the explode + groupBy form shipped every occurrence;
    // the checkpoint is SERIALIZED (the SCALE.md §12 block-rebuffer
    // hazard — corpus-scale map-of-scan frames keep a checkpoint only
    // at 3+ consumers, and then with ~3×-smaller SER blocks).
    val tf = docs.select(col(idCol).as("doc_id"),
        explode(graft.plans.ArrayOps.stringRleCounts(docs.sparkSession,
          TextOps.tokens(col(textCol)))).as("tc"))
      .select(col("doc_id"), col("tc.term").as("term"), col("tc.c").as("c"))
      .localCheckpoint(true,
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val dl = tf.groupBy(col("doc_id")).agg(sum(col("c")).as("dl"))
    val coll = tf.groupBy(col("term")).agg(sum(col("c")).as("ctf"))
    val tTotal = dl.agg(sum(col("dl")).as("t_total"))
    val qids = docs.filter(queryPred).select(col(idCol).as("query_id"))
    val qtf = tf.join(qids, tf("doc_id") === qids("query_id"))
      .select(col("query_id"), col("term"), col("c").as("qf"))
    val qlen = dl.join(qids, dl("doc_id") === qids("query_id"))
      .select(col("query_id"), col("dl").as("qlen"))
    // per-query constant: Σ qf·ln(μ·ctf/T), snapped per term
    val qconst = qtf.join(coll, Seq("term")).crossJoin(broadcast(tTotal))
      .withColumn("t", floor(col("qf").cast("double")
        * log(lit(mu) * col("ctf").cast("double")
          / col("t_total").cast("double")) * lit(1e6) + lit(0.5))
        .cast("long"))
      .groupBy(col("query_id")).agg(sum(col("t")).as("qconst_micro"))
    // present-term bonus: Σ qf·ln(1 + c·T/(μ·ctf)), snapped per term
    val present = qtf
      .join(tf.withColumnRenamed("doc_id", "cand_id"), Seq("term"))
      .join(coll, Seq("term")).crossJoin(broadcast(tTotal))
      .filter(col("cand_id") =!= col("query_id"))
      .withColumn("t", floor(col("qf").cast("double")
        * log(lit(1.0) + col("c").cast("double")
          * col("t_total").cast("double")
          / (lit(mu) * col("ctf").cast("double"))) * lit(1e6) + lit(0.5))
        .cast("long"))
      .groupBy(col("query_id"), col("cand_id"))
      .agg(sum(col("t")).as("present_micro"))
    // full grid: the dl term scores every candidate, matched or not
    val grid = qlen.join(qconst, Seq("query_id"))
      .crossJoin(dl.withColumnRenamed("doc_id", "cand_id"))
      .filter(col("cand_id") =!= col("query_id"))
      .withColumn("len_micro", floor(col("qlen").cast("double")
        * log(col("dl").cast("double") + lit(mu)) * lit(1e6) + lit(0.5))
        .cast("long"))
    val scored = grid
      .join(present, Seq("query_id", "cand_id"), "left")
      .withColumn("score_micro",
        col("qconst_micro") - col("len_micro")
          + coalesce(col("present_micro"), lit(0L)))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score_micro").desc, col("cand_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("cand_id").as("doc_id"),
        col("score_micro"), col("rank"))
  }

  /** BM25 (Robertson/Spärck Jones, public) top-k documents per query.
    *
    * Scoring uses the Lucene-shaped idf `ln(1 + (N - df + 0.5)/(df + 0.5))`
    * (never negative) and the standard saturation
    * `tf·(k1+1) / (tf + k1·(1 - b + b·dl/avgdl))`. Per-(term, doc)
    * contributions are micro-snapped then integer-summed per (query, doc),
    * so the score is order-independent; ranking ties break on doc id.
    * Repeated query terms count once (set semantics — the common choice
    * when queries are short keyword lists).
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               queries: Map[Int, String], k: Int,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val qterms = queries.toSeq
      .flatMap { case (qid, q) => q.split(" +").filter(_.nonEmpty).distinct.map((qid, _)) }
      .toDF("query_id", "term")
    val terms = queries.valuesIterator.flatMap(_.split(" +")).filter(_.nonEmpty)
      .toSeq.distinct
    // one corpus scan for the scalar stats (N, total token count)
    val stats = docs.agg(
      count(lit(1)).as("n_docs"),
      sum(TextOps.tokenCountFast(spark, col(textCol)).cast("long")).as("sum_dl"))
    // postings restricted to query terms BEFORE the aggregation: the
    // (doc, term) shuffle carries only matching occurrences
    val postings = docs
      .select(col(idCol).as("doc_id"),
        TextOps.tokenCountFast(spark, col(textCol)).cast("long").as("dl"),
        explode(TextOps.tokens(col(textCol))).as("term"))
      .filter(col("term").isin(terms: _*))
      .groupBy("doc_id", "term", "dl").agg(count(lit(1)).as("tf"))
    // idf + avgdl on the query-term-bounded dimension (≤ |query terms|
    // rows): compute once per term, broadcast into the postings stream
    val dfreq = postings.groupBy("term").agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(stats))
      .withColumn("avgdl", col("sum_dl").cast("double") / col("n_docs").cast("double"))
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs").cast("double") - col("df") + lit(0.5)) /
          (col("df") + lit(0.5))))
      .select("term", "avgdl", "idf")
    val contribMicro = floor(
      (col("idf") *
        ((col("tf") * lit(k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / col("avgdl")))))
        * lit(1e6) + lit(0.5)).cast("long")
    val scored = postings
      .join(broadcast(dfreq), Seq("term"))
      .join(broadcast(qterms), Seq("term"))
      .groupBy("query_id", "doc_id")
      .agg(sum(contribMicro).as("score_micro"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score_micro").desc, col("doc_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("doc_id"),
        (col("score_micro") / lit(1e6)).as("score"), col("rank"))
  }

  /** Per-document mean unigram surprisal against the corpus's own unigram
    * LM — the dependency-free stand-in for the perplexity filters real
    * pipelines run with a trained LM (CCNet-style): documents whose
    * tokens are globally rare score high, repetitive/common-token
    * documents score low. Per token: `ln(T) - ln(c)` nats (T = corpus
    * token count, c = the token's corpus count), micro-snapped and
    * integer-summed per doc; the mean divides once by `n · 1e6`.
    */
  def unigramSurprisal(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
      explode(TextOps.tokens(col(textCol))).as("term"))
    val counts = toks.groupBy("term").agg(count(lit(1)).as("c"))
    // T = Σc is just the corpus token count — one per-row codegen scan of
    // the docs table, NOT a second pass over the counts aggregation (the
    // naive `counts.agg(sum)` re-ran the vocabulary shuffle as a second
    // subtree)
    val total = docs.agg(
      sum(TextOps.tokenCountFast(docs.sparkSession, col(textCol)).cast("long")).as("t"))
    val sMicro = floor(
      (log(col("t").cast("double")) - log(col("c").cast("double"))) * lit(1e6) + lit(0.5))
      .cast("long")
    toks.join(counts, Seq("term")) // vocabulary-sized; unhinted by doctrine
      .crossJoin(broadcast(total))
      .select(col("doc_id"), sMicro.as("s_micro"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum(col("s_micro")).as("surprisal_micro"))
      .withColumn("mean_surprisal",
        col("surprisal_micro").cast("double") /
          (col("n_tokens").cast("double") * lit(1e6)))
  }

  /** DSIR-style importance resampling (Xie et al. 2023, public — here the
    * hashed-n-gram-overlap lite variant): score every non-target document
    * by the fraction of its distinct hashed n-grams that also occur in
    * the TARGET domain sample, then keep it with probability equal to
    * that score via the deterministic per-doc hash draw (no RNG — stable
    * under re-runs and partitioning, like [[Terms.mixtureSample]]).
    * Emits the kept documents with their score numerator/denominator
    * (n_target_grams / n_grams).
    *
    * The keep test is `u · n_grams < n_target_grams`: u is an exact
    * division by 2^32 (exact in binary floating point) and the single
    * multiply is one IEEE op — no division, engine-identical at
    * boundaries. Scale: the target gram set is sample-bounded (the
    * practitioner chooses the target sample size) and broadcasts like
    * q50's benchmark set; the corpus side pays the shingle shuffle it
    * already pays everywhere else.
    */
  def importanceResample(docs: DataFrame, idCol: String, textCol: String,
                         targetPred: Column, n: Int = 2): DataFrame = {
    // the predicate is phrased against the CALLER's columns, so split the
    // doc frame before any renaming — the two shingle pipelines partition
    // the same scan, not duplicate it
    def grams(d: DataFrame) = TextOps.wordShingleRows(d, idCol, textCol, n)
      .select(col("id"), TextOps.gramHash64(docs.sparkSession, col("g")).as("hg"))
      .dropDuplicates("id", "hg")
    val target = grams(docs.filter(targetPred))
      .select("hg").distinct().withColumn("__hit", lit(1))
    grams(docs.filter(!targetPred))
      .join(broadcast(target), Seq("hg"), "left")
      .groupBy(col("id").as("doc_id"))
      .agg(count(lit(1)).as("n_grams"), count(col("__hit")).as("n_target_grams"))
      .filter(TextOps.hashUnit("dsir|", col("doc_id")) * col("n_grams") <
        col("n_target_grams"))
  }

  /** Query-by-example LEXICAL ranker: per query document, the top-k other
    * documents by DISTINCT word-n-gram overlap count (the set-intersection
    * ranker of classical near-duplicate retrieval — the sparse half of a
    * hybrid sparse+dense stack; BM25 with per-term weights is [[bm25TopK]],
    * this is its unweighted, query-is-a-document sibling).
    *
    * SHINGLES, not tokens, deliberately: a single-token overlap join fans
    * out as Σ_t df(t)·qf(t), and natural-language token frequency is
    * Zipf — the head terms alone make the join quadratic-ish in practice
    * (measured here: the token form produced a 17.6 M-row join on the
    * sf0.1 corpus where the 3-gram form produces 107 k — a 160×
    * difference; a token that appears in most documents carries no
    * ranking signal but dominates the join). Word n-grams are the
    * standard fix (the same reason every near-dup family in NearDup
    * shingles first): df falls off sharply with n, so the join is
    * signal-sized.
    *
    * Exactness: grams are md5-hashed to 64-bit ([[TextOps.gramHash64]] —
    * the oracle renders the identical formula) and the score is an
    * integer count of shared distinct hashes, so ranking is engine-exact
    * with the doc-id tie-break — no fp enters at all.
    *
    * Scale shape: both sides reduce to DISTINCT (id, gram-hash) before
    * the join. The query side is query-set-bounded (the caller picks the
    * query predicate) and broadcast explicitly; the per-query top-k is
    * the usual WindowGroupLimit heap, never a global sort.
    */
  def shingleOverlapTopK(docs: DataFrame, idCol: String, textCol: String,
                         queryPred: Column, n: Int, k: Int): DataFrame = {
    val sp = docs.sparkSession
    def grams(d: DataFrame, out: String) =
      TextOps.wordShingleRows(d, idCol, textCol, n)
        .select(col("id").as(out),
          TextOps.gramHash64(sp, col("g")).as("hg"))
        .dropDuplicates(out, "hg")
    val scored = grams(docs, "doc_id")
      .join(broadcast(grams(docs.filter(queryPred), "query_id")), Seq("hg"))
      .filter(col("doc_id") =!= col("query_id"))
      .groupBy("query_id", "doc_id")
      .agg(count(lit(1)).as("overlap"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("overlap").desc, col("doc_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "doc_id", "overlap", "rank")
  }

  /** RECIPROCAL-RANK FUSION (Cormack/Clarke/Buettcher 2009, public) of any
    * number of per-query rankings into one hybrid ranking — the standard
    * way production retrieval stacks combine a sparse (lexical) and a
    * dense (embedding) ranker without score normalization, since RRF
    * consumes only RANKS: score(d) = Σ_r 1/(k0 + rank_r(d)).
    *
    * Inputs must each have (query_id, doc_id, rank) columns. Per-ranker
    * contributions are micro-snapped (`floor(1e6/(k0+rank) + 0.5)` — one
    * IEEE division from exact integers, engine-identical) then
    * integer-summed, so the fused ordering is order-independent and
    * engine-exact; ties break on doc_id. A document missing from one
    * ranker simply contributes nothing (the union semantics of RRF).
    *
    * Scale shape: every input is already top-k-bounded per query (the
    * rankers' own WindowGroupLimit), so the union and the fused groupBy
    * run on |queries| × k × rankers rows — dimension-sized regardless of
    * corpus size; the final per-query top-k is again a per-partition heap.
    */
  def rrfFuse(rankings: Seq[DataFrame], k0: Int, k: Int): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    val contrib = rankings
      .map(_.select(col("query_id"), col("doc_id"),
        floor(lit(1e6) / (lit(k0) + col("rank")) + lit(0.5))
          .cast("long").as("rrf_c")))
      .reduce(_ unionByName _)
    val fused = contrib.groupBy("query_id", "doc_id")
      .agg(count(lit(1)).as("n_rankers"), sum(col("rrf_c")).as("rrf_micro"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("rrf_micro").desc, col("doc_id").asc)
    fused.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "doc_id", "n_rankers", "rrf_micro", "rank")
  }

  /** MOORE-LEWIS CONTRASTIVE DATA SELECTION (Moore & Lewis 2010, public —
    * unigram form): score every non-target document by
    * Σ_tokens (ln p_target(w) − ln p_corpus(w)) — positive means the
    * document looks more like the target domain than like the general
    * corpus, the classic "select pretraining data that resembles my
    * domain sample" criterion ([[importanceResample]] is the hashed-
    * n-gram cousin; this is the LM-ratio original). Add-one smoothing on
    * BOTH models over the shared corpus vocabulary, so unseen-in-target
    * terms score negative rather than −∞.
    *
    * Numerics: the per-TERM log-ratio is micro-snapped ONCE in the model
    * table (the q133 pattern); a document's score is then an exact
    * integer sum over its token occurrences — order-independent, so the
    * keep decision (score > 0) is engine-exact.
    *
    * Scale shape: one (term) count aggregation per model (target side is
    * sample-bounded by the caller's predicate); the model table is
    * vocabulary-sized and joins the token stream UNHINTED (Heaps' law —
    * the planner must pick broadcast from measured size). The token
    * stream pays the explode it pays everywhere else; nothing else
    * touches the corpus.
    */
  def mooreLewisScore(docs: DataFrame, idCol: String, textCol: String,
                      targetPred: Column): DataFrame = {
    val spark = docs.sparkSession
    val toks = docs.withColumn("__tgt", targetPred)
      .select(col(idCol).as("doc_id"), col("__tgt"),
        explode(TextOps.tokens(col(textCol))).as("term"))
    // corpus counts + target counts in ONE (term) aggregation pass
    val counts = toks.groupBy("term")
      .agg(count(lit(1)).as("c_all"),
        sum(when(col("__tgt"), 1L).otherwise(0L)).as("c_tgt"))
      .localCheckpoint(true) // consumers: V/totals rollup + the model join
    val totals = counts.agg(
      sum(col("c_all")).as("t_all"), sum(col("c_tgt")).as("t_tgt"),
      count(lit(1)).as("v"))
    val model = counts.crossJoin(broadcast(totals))
      .select(col("term"),
        floor((log(col("c_tgt").cast("double") + lit(1.0)) -
          log((col("t_tgt") + col("v")).cast("double")) -
          (log(col("c_all").cast("double") + lit(1.0)) -
            log((col("t_all") + col("v")).cast("double"))))
          * lit(1e6) + lit(0.5)).cast("long").as("lr_micro"))
    toks.filter(!col("__tgt"))
      .join(model, Seq("term")) // vocabulary-sized; unhinted by doctrine
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum(col("lr_micro")).as("ml_micro"))
      .withColumn("keep", (col("ml_micro") > 0L).cast("int"))
  }

  /** RANK-BIASED OVERLAP, truncated (Webber et al. 2010, public): per
    * query, the agreement of two top-k rankings —
    * RBO@k = Σ_{d=1..k} (1−p)·p^(d−1)·(|A_d ∩ B_d| / d). A doc present
    * in BOTH prefixes first counts at depth d₀ = max(rank_A, rank_B) and
    * contributes Σ_{d=d₀..k} (1−p)·p^(d−1)/d — a k-entry weight table
    * computed ONCE on the driver, micro-snapped, and shipped as an array
    * literal both engines index identically. The per-query score is then
    * an exact integer sum: engine-exact, no fp in the aggregation.
    *
    * Use: measures whether a hybrid stack's rankers are redundant
    * (RBO → 1) or complementary (RBO → 0) — the diagnostic that says
    * whether [[rrfFuse]] is buying anything. Inputs are the rankers'
    * top-k outputs (query_id, doc_id, rank); the join is
    * |queries|×k-bounded, dimension-sized at any corpus scale.
    */
  /** w(d0) = Σ_{d=d0..k} (1−p)·p^(d−1)/d, micro-snapped — sequential
    * driver fold, shared with the oracle generator so the SQL list
    * literal is the SAME longs by construction. */
  private[graft] def rboWeights(k: Int, p: Double): Array[Long] =
    Array.tabulate(k) { i =>
      val d0 = i + 1
      var acc = 0.0
      var d = d0
      while (d <= k) { acc += (1.0 - p) * math.pow(p, d - 1) / d; d += 1 }
      math.floor(acc * 1e6 + 0.5).toLong
    }

  def rboAgreement(rankingA: DataFrame, rankingB: DataFrame,
                   k: Int, p: Double): DataFrame = {
    require(k > 0 && p > 0.0 && p < 1.0, s"need k>0, 0<p<1; got k=$k p=$p")
    val wCol = array(rboWeights(k, p).map(lit): _*)
    val scored = rankingA
      .select(col("query_id"), col("doc_id"), col("rank").as("rank_a"))
      .join(rankingB.select(col("query_id"), col("doc_id"),
        col("rank").as("rank_b")), Seq("query_id", "doc_id"))
      .select(col("query_id"),
        element_at(wCol, greatest(col("rank_a"), col("rank_b")).cast("int"))
          .as("wm"))
      .groupBy("query_id")
      .agg(count(lit(1)).as("n_common"), sum(col("wm")).as("rbo_micro"))
    // a query whose prefixes share NOTHING is RBO = 0, not absent — the
    // "fully complementary" reading must be distinguishable from "query
    // was never ranked"
    rankingA.select(col("query_id"))
      .unionByName(rankingB.select(col("query_id"))).distinct()
      .join(scored, Seq("query_id"), "left")
      .na.fill(0L, Seq("n_common", "rbo_micro"))
      .withColumn("rbo", col("rbo_micro").cast("double") / lit(1e6))
  }

  /** Domain-level quality gating (the "drop bad domains wholesale" step of
    * web-corpus curation): keep every document whose domain's MEAN quality
    * score clears `minMean`. The mean test is the integer comparison
    * `sum(micro(q)) >= micro(minMean) · n` — no division, engine-exact.
    * `quality` is any per-row deterministic score column over the doc
    * frame (e.g. [[TextOps.qualityScore]]).
    */
  def domainQualityFilter(docs: DataFrame, idCol: String, domainCol: String,
                          quality: Column, minMean: Double): DataFrame = {
    val qMicro = floor(quality * lit(1e6) + lit(0.5))
    val passing = docs
      .select(col(domainCol).as("domain"), qMicro.as("qm"))
      .groupBy("domain").agg(sum(col("qm")).as("q_sum"), count(lit(1)).as("n_docs"))
      .filter(col("q_sum") >= lit(minMean * 1e6) * col("n_docs"))
      .select("domain")
    docs.select(col(idCol).as("doc_id"), col(domainCol).as("domain"))
      .join(passing, Seq("domain"), "left_semi") // domain-bounded; unhinted
      .select("doc_id", "domain")
  }
}
