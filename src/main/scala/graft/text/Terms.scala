package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus/term statistics for the training-data pipeline surface (builder
  * brief: quality scoring, dedup, token analysis — no reference analog).
  * Everything is integer-count based so every query has a bit-identical
  * DuckDB oracle (see PLANS.md "Cross-engine numerics doctrine").
  *
  * Scale notes, per operator:
  *  - `repetitionSignals`: the per-doc token stats are pure per-row codegen
  *    (no shuffle); the bigram top-1 pays the same (id)-keyed shuffle the
  *    shingle pipeline already uses, then a map-side-combined count and a
  *    bounded per-doc window. Nothing quadratic, nothing driver-side.
  *  - `distinctiveTerms`: tf is one (id, term) shuffle with map-side
  *    combine; document frequency is a second vocabulary-sized aggregate.
  *    The tf←df join is keyed on `term` — vocabulary-sized, not
  *    corpus-sized. The join is left UNHINTED deliberately: a forced
  *    broadcast() is honored regardless of size and a natural-language
  *    vocabulary is unbounded (Heaps' law), so the planner/AQE picks
  *    broadcast only when df's measured size is under the threshold.
  *  - `vocabulary`: classic two-phase aggregation; the final top-N is a
  *    `TakeOrderedAndProject` (per-partition heaps + a driver merge of N
  *    rows), NOT a global sort — the plan to want at 100 TB.
  */
object Terms {

  /** Gopher-style repetition signals (Rae et al. 2021, public): documents
    * dominated by repeated fragments are low-quality training data. Emits
    * per doc: token count, distinct-token count (their difference is the
    * duplicate-token mass), and the most frequent word bigram with its
    * count (ties broken lexicographically — deterministic everywhere).
    * Docs with fewer than 2 tokens get ("", 0).
    */
  def repetitionSignals(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val stats = df.select(col(idCol).as("id"), TextOps.tokens(col(textCol)).as("__toks"))
      .select(col("id"), size(col("__toks")).as("n_tokens"),
        size(array_distinct(col("__toks"))).as("n_distinct_tokens"))
    val counts = TextOps.wordShingleRows(df, idCol, textCol, 2)
      .groupBy(col("id"), col("g")).agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("id").orderBy(col("cnt").desc, col("g").asc)
    val top = counts.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("id"), col("g").as("top_bigram"), col("cnt").as("top_bigram_count"))
    stats.join(top, Seq("id"), "left")
      .select(col("id").as("doc_id"), col("n_tokens"), col("n_distinct_tokens"),
        coalesce(col("top_bigram"), lit("")).as("top_bigram"),
        coalesce(col("top_bigram_count"), lit(0L)).as("top_bigram_count"))
  }

  /** Most DISTINCTIVE term per document: the term with the lowest corpus
    * document frequency, ties broken by higher in-doc term frequency, then
    * lexicographically — a TF-IDF argmax re-expressed in exact integer
    * ordering (df asc ≡ idf desc) so no cross-engine `ln` enters the
    * output. Emits (doc_id, term, tf, df).
    */
  def distinctiveTerms(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tf = df.select(col(idCol).as("id"), explode(TextOps.tokens(col(textCol))).as("term"))
      .groupBy("id", "term").agg(count(lit(1)).as("tf"))
    // tf already has one row per (doc, term), so df = plain count per term
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy("id").orderBy(col("df").asc, col("tf").desc, col("term").asc)
    tf.join(dfreq, Seq("term"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("id").as("doc_id"), col("term"), col("tf"), col("df"))
  }

  /** Deterministic MIXTURE SAMPLING — the data-mixing step of a training
    * pipeline: each shard (source/language) has a target weight; docs are
    * up-sampled (weight > 1 → floor(w) copies plus one more for a
    * hash-chosen fraction) or down-sampled (weight < 1 → kept only when
    * the hash falls under w). The choice is a pure function of the doc id
    * (md5, no RNG) so the mixture is reproducible anywhere and stable
    * under re-runs; emits one row per (doc, copy).
    *
    * Scale: pure per-row codegen + an explode bounded by ceil(max
    * weight) — no shuffle at all; the weight table is a literal map
    * (bounded by the number of sources).
    */
  def mixtureSample(df: DataFrame, idCol: String, shardCol: String,
                    weights: Map[String, Double],
                    carry: Seq[String] = Nil): DataFrame = {
    require(weights.values.forall(w => w >= 0 && w < 100),
      "weights must be in [0, 100) — a 100x upsample is a config error")
    val wt = coalesce(element_at(typedlit(weights), col(shardCol)), lit(0.0))
    val u = TextOps.hashUnit("mix|", col(idCol))
    val n = (floor(wt).cast("long") + when(u < wt - floor(wt), 1L).otherwise(0L)).as("n")
    // `carry` columns ride the sample rows so downstream stages (e.g.
    // sequence packing) don't pay a corpus-sized join back to the source
    df.select(Seq(col(idCol).as("doc_id"), col(shardCol).as("shard"), n) ++
        carry.map(col): _*)
      .filter(col("n") > 0)
      .withColumn("copy", explode(sequence(lit(1L), col("n"))))
      .select(Seq(col("doc_id"), col("shard"), col("copy")) ++ carry.map(col): _*)
  }

  /** Out-of-vocabulary stats per doc against the corpus top-N vocabulary
    * (tokenizer-coverage estimation): n_tokens and how many fall outside
    * the vocabulary. The vocabulary is a COMPUTED dimension — bounded at
    * N rows by construction, so it broadcasts regardless of corpus size;
    * the corpus pays one (id)-keyed aggregation.
    */
  def oovStats(df: DataFrame, idCol: String, textCol: String, topN: Int): DataFrame = {
    val vocab = vocabulary(df, idCol, textCol, topN)
      .select(col("term"), lit(1).as("__in"))
    val toks = df.select(col(idCol).as("id"), explode(TextOps.tokens(col(textCol))).as("term"))
    toks.join(broadcast(vocab), Seq("term"), "left")
      .groupBy(col("id").as("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
           count(when(col("__in").isNull, 1)).as("n_oov"))
  }

  /** PER-SHARD sequence packing — the "pack documents into fixed-size
    * training sequences" step: within each shard (e.g. language), docs
    * are laid out in doc-id order, each gets its running token offset,
    * and a chunk id at `blockTokens` granularity. The window is
    * PARTITIONED by the shard column — a deliberate contract: global
    * packing would need an unpartitioned running sum (single-task
    * barrier); real pipelines pack per shard, which keeps every shard an
    * independent partition-local scan.
    *
    * Shard GRANULARITY bounds parallelism: one task sorts one shard (the
    * sort spills, but it does not parallelize). If a natural shard is
    * corpus-scale (one language = half the corpus), pass a composite
    * derived column instead — e.g.
    * `df.withColumn("shard", concat_ws("/", col("lang"),
    * pmod(hash(col("doc_id")), lit(1024))))` — trading cross-sub-shard
    * chunk continuity (training does not need it) for 1024× the tasks.
    */
  def sequencePacking(df: DataFrame, idCol: String, textCol: String,
                      shardCol: String, blockTokens: Int): DataFrame =
    packPrepared(
      df.select(col(idCol).as("doc_id"), col(shardCol).as("shard"),
        TextOps.tokenCountFast(df.sparkSession, col(textCol))
          .cast("long").as("n_tokens")),
      blockTokens, orderCols = Seq("doc_id"))
      .select(col("doc_id"), col("shard"), col("n_tokens"),
        col("start_tok"), col("chunk"))

  /** Packing window over already-prepared rows carrying `shard` and
    * `n_tokens` columns: per-shard running token offsets in `orderCols`
    * order, chunk ids at `blockTokens` granularity. Factored out so the
    * pretraining composite (which packs (doc, copy) sample rows) and
    * [[sequencePacking]] share one window definition.
    */
  def packPrepared(rows: DataFrame, blockTokens: Int,
                   orderCols: Seq[String]): DataFrame =
    rows
      .withColumn("end_tok", sum(col("n_tokens")).over(
        Window.partitionBy("shard").orderBy(orderCols.map(col): _*)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("start_tok", col("end_tok") - col("n_tokens"))
      // integral division (Column./ is double division by contract)
      .withColumn("chunk", expr(s"start_tok div $blockTokens"))
      .drop("end_tok")

  /** Deterministic PER-GROUP subsample: the k docs per group (language,
    * source, …) whose seeded md5 draw ranks lowest — how fixed eval/dev
    * subsets are carved out of a moving corpus so they stay stable
    * across re-runs and re-partitioning (same no-RNG doctrine as
    * [[mixtureSample]]). Emits (doc_id, group, rank).
    *
    * Scale: one exchange on the group key; the per-group top-k plans as
    * partial+final WindowGroupLimit (per-partition heaps, k rows per
    * group per partition survive the shuffle — never a full sort of the
    * group).
    */
  def perGroupSample(df: DataFrame, idCol: String, groupCol: String, k: Int,
                     seed: String = "sample|"): DataFrame = {
    val w = Window.partitionBy("grp")
      .orderBy(TextOps.hashPrefix(seed, col("doc_id")).asc, col("doc_id").asc)
    df.select(col(idCol).as("doc_id"), col(groupCol).as("grp"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Token-id encoding against the corpus top-N vocabulary — the
    * "text → tensor" preparation step: every token becomes its vocabulary
    * id (rank by corpus frequency, ties lexicographic, 0-based) or the
    * OOV id `topN`. Emits EXPLODED (doc_id, pos, token_id) rows rather
    * than per-doc arrays — the shape downstream packing consumes, and at
    * 100 TB the explode keeps rows narrow instead of materializing
    * per-doc id arrays in executor memory.
    *
    * Scale: the vocabulary is a COMPUTED bounded dimension (topN rows by
    * construction → broadcast, like [[oovStats]]); the id assignment is
    * an unpartitioned row_number over those topN rows only (single task
    * over a bounded frame, never the corpus). The corpus side is pure
    * scan-stage codegen: posexplode + broadcast hash join, no shuffle.
    */
  def tokenIds(df: DataFrame, idCol: String, textCol: String, topN: Int): DataFrame = {
    val vocab = vocabulary(df, idCol, textCol, topN)
      .withColumn("token_id",
        row_number().over(Window.orderBy(col("n_occurrences").desc, col("term").asc))
          .cast("long") - 1L)
      .select("term", "token_id")
    df.select(col(idCol).as("doc_id"),
        posexplode(TextOps.tokens(col(textCol))).as(Seq("pos", "term")))
      .join(broadcast(vocab), Seq("term"), "left")
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        coalesce(col("token_id"), lit(topN.toLong)).as("token_id"))
  }

  /** WITHIN-document duplicate n-gram mass (the Gopher repetition rules'
    * "fraction of tokens in duplicated n-grams", Rae et al. 2021 —
    * public): per doc, the share of n-gram OCCURRENCES whose gram appears
    * more than once in that document. Complements [[repetitionSignals]]
    * (which surfaces only the single top bigram): a doc alternating two
    * phrases has a modest top-bigram count but high duplicate mass.
    * Docs shorter than n tokens emit nothing (no grams to measure).
    *
    * Scale: ONE exchange total. `wordShingleRows` shuffles on the doc id;
    * both downstream aggregations — per-(id, gram) counts and the per-doc
    * rollup — reuse that partitioning (HashPartitioning(id) satisfies
    * ClusteredDistribution(id, g), the same no-second-shuffle property
    * the q63 winnowing audit documents). The fraction divides once per
    * output row over exact integer sums.
    */
  def dupNgramMass(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    TextOps.wordShingleRows(df, idCol, textCol, n)
      .groupBy("id", "g").agg(count(lit(1)).as("cnt"))
      .groupBy(col("id").as("doc_id"))
      .agg(sum(col("cnt")).as("n_grams"),
           sum(when(col("cnt") >= 2, col("cnt")).otherwise(0L)).as("n_dup_occurrences"))
      .withColumn("dup_fraction",
        col("n_dup_occurrences").cast("double") / col("n_grams").cast("double"))

  /** Feature-hashing TF-IDF (the "hashing trick", Weinberger et al. 2009,
    * public — the shape of Spark MLlib's own HashingTF + IDF, re-derived
    * here with the repo's md5 hash family so a DuckDB oracle exists):
    * every token hashes to one of `dims` buckets, tf is the per-(doc,
    * bucket) occurrence count, df the number of docs touching the bucket,
    * and the weight is `tf · ln((N + 1)/(df + 1))` (smooth idf, never
    * negative). Emits sparse rows (doc_id, dim, tf, df, w_micro, w) —
    * the fixed-dimension text featurization that needs NO vocabulary
    * pass, which is the whole point at corpus scale.
    *
    * Numerics: tf/df/N are exact integers; `ln` enters once per output
    * row as a per-row derived micro-snapped immediately (doctrine form
    * 4) — nothing fp is ever aggregated.
    *
    * Scale: one (doc, dim) shuffle with map-side combine for tf; df is a
    * DIMS-BOUNDED aggregate (≤ `dims` rows by construction → broadcast
    * unconditionally, same contract as the computed-vocabulary
    * broadcasts); N is a scalar crossJoin. No vocabulary-sized frame
    * exists anywhere — unlike tf-idf over terms, the hashed form's
    * dimension table CANNOT grow with the corpus (Heaps' law doesn't
    * apply to a modulus).
    */
  def hashedTfIdf(df: DataFrame, idCol: String, textCol: String,
                  dims: Int): DataFrame = {
    val spark = df.sparkSession
    val tf = df.select(col(idCol).as("doc_id"),
        explode(TextOps.tokens(col(textCol))).as("term"))
      .select(col("doc_id"),
        pmod(TextOps.gramHash64(spark, col("term")), lit(dims.toLong)).as("dim"))
      .groupBy("doc_id", "dim").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("dim").agg(count(lit(1)).as("df"))
    val nDocs = df.agg(count(lit(1)).as("n_docs"))
    val wMicro = floor(
      (col("tf").cast("double") *
        log((col("n_docs").cast("double") + lit(1.0)) /
            (col("df").cast("double") + lit(1.0)))) * lit(1e6) + lit(0.5))
      .cast("long")
    tf.join(broadcast(dfreq), Seq("dim"))
      .crossJoin(broadcast(nDocs))
      .select(col("doc_id"), col("dim"), col("tf"), col("df"),
        wMicro.as("w_micro"),
        (wMicro.cast("double") / lit(1e6)).as("w"))
  }

  /** SIGNED FEATURE HASHING (Weinberger et al. 2009, public — the
    * "hashing trick"): project each document's bag of words into a
    * fixed `dims`-dimensional integer vector with no vocabulary table at
    * all — dim = h(term) mod dims, sign = ±1 from an independent hash
    * bit, value = Σ sign over occurrences. The sign bit is what makes
    * the estimator unbiased under collisions (colliding terms cancel in
    * expectation rather than always adding). This is the vectorizer a
    * pipeline uses when even the hashed-TFIDF df table is too much
    * ceremony — pure integers, stream-mergeable, and the natural input
    * to a linear probe/classifier over corpus sketches.
    *
    * Exactness: everything is integer arithmetic on md5-derived hashes
    * (both halves of the digest — the minhash double-hash family), so
    * the output is engine-exact with no fp anywhere. Scale: one
    * (doc, dim) shuffle with map-side combine; the dimension space is a
    * modulus, so no frame grows with the vocabulary (the hashedTfIdf
    * argument, minus even the df aggregate). Zero-sum buckets (signs
    * cancelled exactly) are kept — dropping them would make the vector
    * lossy in a way the consumer can't distinguish from absence.
    */
  def signedFeatureHash(df: DataFrame, idCol: String, textCol: String,
                        dims: Int): DataFrame = {
    require(dims > 0, s"dims must be positive, got $dims")
    val spark = df.sparkSession
    df.select(col(idCol).as("doc_id"),
        explode(TextOps.tokens(col(textCol))).as("term"))
      .select(col("doc_id"),
        pmod(TextOps.gramHash64(spark, col("term")), lit(dims.toLong)).as("dim"),
        when(pmod(TextOps.gramHash64Hi(spark, col("term")), lit(2L)) === 0L,
          lit(1L)).otherwise(lit(-1L)).as("sign"))
      .groupBy("doc_id", "dim")
      .agg(count(lit(1)).as("n_terms"), sum(col("sign")).as("value"))
  }

  /** TEMPERATURE-SCALED MIXTURE WEIGHTS (the multilingual sampling
    * formula of XLM-R / mBERT, public): per group (language/source),
    * q_l ∝ p_l^α with p_l the group's token share — α < 1 upsamples the
    * tail so low-resource groups are not drowned by the head; α = 1 is
    * proportional, α = 0 uniform. Emits p, q and the resampling boost
    * q/p a weighted sampler (mixtureSample) consumes directly.
    *
    * Numerics: token counts are exact integers from ONE corpus scan;
    * p^α is a per-row libm pow on the group-bounded frame, micro-snapped
    * (doctrine form 4); the normalization divides by the exact integer
    * Σ w_micro. The checkpoint is the classWeights pattern: the count
    * frame is group-bounded and read by the total and the final select.
    */
  def temperatureMixture(df: DataFrame, groupCol: String, textCol: String,
                         alpha: Double): DataFrame = {
    require(alpha >= 0.0 && alpha <= 1.0, s"alpha must be in [0,1], got $alpha")
    val spark = df.sparkSession
    val counts = df.groupBy(col(groupCol))
      .agg(sum(TextOps.tokenCountFast(spark, col(textCol)).cast("long"))
        .as("n_tokens"))
      .localCheckpoint(true)
    val total = counts.agg(sum(col("n_tokens")).as("n_total"))
    val withP = counts.crossJoin(broadcast(total))
      .withColumn("w_micro",
        floor(pow(col("n_tokens").cast("double") / col("n_total").cast("double"),
          lit(alpha)) * lit(1e6) + lit(0.5)).cast("long"))
    val wTotal = withP.agg(sum(col("w_micro")).as("w_total"))
    withP.crossJoin(broadcast(wTotal))
      .select(col(groupCol), col("n_tokens"),
        floor(col("n_tokens").cast("double") * lit(1e6) /
          col("n_total").cast("double") + lit(0.5)).cast("long").as("p_micro"),
        floor(col("w_micro").cast("double") * lit(1e6) /
          col("w_total").cast("double") + lit(0.5)).cast("long").as("q_micro"),
        col("n_tokens").cast("double")./(col("n_total").cast("double")).as("__p"))
      .withColumn("boost_micro",
        floor((col("q_micro").cast("double") / lit(1e6)) / col("__p")
          * lit(1e6) + lit(0.5)).cast("long"))
      .drop("__p")
  }

  /** Sliding-window CHUNKING with stride — the "context-window carving"
    * step between tokenization and packing: every document yields windows
    * of up to `len` tokens starting every `stride` positions (the final
    * windows are the natural partials; a trainer that wants only full
    * blocks filters `chunk_len = len`). Emits (doc_id, chunk_id,
    * start_tok, chunk_len); empty documents emit nothing.
    *
    * Scale: pure per-row codegen — one `sequence` bounded by
    * ceil(n_tokens / stride) per doc, no shuffle, no state. The chunk
    * table is the corpus token count divided by the stride, which is the
    * smallest representation that still locates every window.
    */
  def chunkWindows(df: DataFrame, idCol: String, textCol: String,
                   len: Int, stride: Int): DataFrame = {
    require(len > 0 && stride > 0, s"len=$len, stride=$stride must be positive")
    df.select(col(idCol).as("doc_id"),
        TextOps.tokenCountFast(df.sparkSession, col(textCol))
          .cast("long").as("n_tokens"))
      .filter(col("n_tokens") > 0)
      .select(col("doc_id"), col("n_tokens"),
        explode(sequence(lit(0L), col("n_tokens") - 1, lit(stride.toLong)))
          .as("start_tok"))
      .select(col("doc_id"),
        (col("start_tok") / lit(stride.toLong)).cast("long").as("chunk_id"),
        col("start_tok"),
        least(lit(len.toLong), col("n_tokens") - col("start_tok")).as("chunk_len"))
  }

  /** EXACT top-quantile gate — keep the best `frac` of the corpus by a
    * deterministic per-row score, exactly (count = ceil(frac · N), ties
    * at the threshold broken by doc id). Real pipelines usually settle
    * for an approximate percentile cut; this is the exact variant, and
    * it stays distributed because the score is MICRO-SNAPPED first: the
    * snapped score has at most ~1e6 distinct values for a [0, 1]-bounded
    * score, so the full distribution fits a BOUNDED histogram. The
    * selection is two scans:
    *
    *  1. histogram scan: groupBy(q_micro) counts — a ≤ 1e6-row frame
    *     collected to the driver (bounded by score RESOLUTION, not
    *     corpus size), where the threshold bucket t and the boundary
    *     quota r are computed by one cumulative walk;
    *  2. gate scan: `q_micro > t` passes outright (pure codegen filter);
    *     rows AT the threshold take a doc-id `row_number` capped at r —
    *     an unpartitioned window, bounded by the tie count of the one
    *     boundary bucket. (A corpus where one score value dominates
    *     would need a second histogram walk over doc-id ranges instead;
    *     that degenerate shape is documented, not built.)
    *
    * Emits (doc_id, q_micro). The same selection in one window —
    * `row_number() OVER (ORDER BY q DESC, doc_id) <= K` — is the
    * oracle's phrasing but a GLOBAL SORT of the corpus in Spark; the
    * histogram split is what makes exactness affordable.
    */
  def topQuantileGate(df: DataFrame, idCol: String, quality: Column,
                      frac: Double, windowCap: Long = 4000000L): DataFrame = {
    require(frac > 0 && frac <= 1, s"frac=$frac must be in (0, 1]")
    // eager checkpoint: the quality expression evaluates ONCE (it may be
    // expensive or, worse, non-deterministic — a recomputed score could
    // select an inconsistent boundary set), and the three downstream
    // scans (bounds, histogram, selection) read narrow blocks. The
    // blocks back the returned frame; ContextCleaner reclaims them when
    // the caller drops it (dedupClusters doctrine).
    val scored = df.select(col(idCol).as("doc_id"),
      floor(quality * lit(1e6) + lit(0.5)).cast("long").as("q_micro"))
      .localCheckpoint(true)
    val bounds = scored.agg(count(lit(1)).as("n"),
      min(col("q_micro")).as("lo"), max(col("q_micro")).as("hi")).head()
    val total = bounds.getLong(0)
    if (total == 0L) return scored.limit(0)
    // the driver-side histogram is bounded ONLY by the [0,1] score
    // contract (<= 1e6+1 buckets). Enforce it BEFORE collecting — an
    // unbounded quality column must fail loudly, not OOM the driver.
    require(bounds.getLong(1) >= 0L && bounds.getLong(2) <= 1000000L,
      s"topQuantileGate requires a [0,1]-bounded quality column " +
        s"(micro-snapped range [${bounds.getLong(1)}, ${bounds.getLong(2)}] " +
        "observed); clamp or rescale the score")
    val hist = scored.groupBy("q_micro").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(-_._1)
    val k = math.ceil(frac * total).toLong
    // cumulative walk: t = the bucket where the running count crosses k;
    // r = how many of t's ties still fit
    var cum = 0L; var i = 0
    while (i < hist.length && cum + hist(i)._2 < k) { cum += hist(i)._2; i += 1 }
    val t = hist(i)._1
    val r = k - cum
    val above = scored.filter(col("q_micro") > t)
    val bucket = scored.filter(col("q_micro") === t)
    // boundary = the r LOWEST doc_ids of the tie bucket. The single
    // unpartitioned row_number window is fine at the typical bucket size
    // but becomes a one-task sort of the corpus in the degenerate shape
    // (one dominant score value) — past windowCap, switch to the
    // doc-id-range walk, which never sorts more than windowCap rows.
    // the walk's slice arithmetic needs an integral id; other ordered id
    // types stay on the window path (the degenerate-scale guard is a
    // Long/Int-id feature, stated rather than a latent ClassCastException)
    val integralId = scored.schema("doc_id").dataType match {
      case org.apache.spark.sql.types.LongType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.ShortType => true
      case _ => false
    }
    val boundary =
      if (hist(i)._2 <= windowCap || !integralId)
        bucket
          .withColumn("__rn", row_number().over(Window.orderBy(col("doc_id").asc)))
          .filter(col("__rn") <= r).drop("__rn")
      else smallestIdsByRangeWalk(bucket, r, windowCap)
    above.unionByName(boundary)
  }

  /** The r smallest `doc_id`s of `bucket` WITHOUT a global sort: narrow
    * an id range [lo, hi] by repeatedly histogramming it into <= 4096
    * equal-width slices (one bounded collect per iteration), keeping
    * every id below the slice where the running count crosses r, until
    * the straddling slice fits under `cap` and a window ranks just that
    * slice. Ranges shrink 4096× per iteration, so 64-bit id spaces
    * terminate in <= 6 rounds; each round is one partial-aggregated scan
    * of the (shrinking) bucket.
    */
  private def smallestIdsByRangeWalk(bucket: DataFrame, r0: Long, cap: Long,
                                     depth: Int = 0): DataFrame = {
    // ranges shrink 4096× per level, so 64-bit id spaces bottom out in
    // <= 6 levels; anything deeper means the id column violates the
    // integral contract
    require(depth <= 8, "id-range walk failed to converge (non-integral ids?)")
    val S = 4096L
    val mm = bucket.agg(min(col("doc_id")).cast("long").as("lo"),
      max(col("doc_id")).cast("long").as("hi")).head()
    val lo = mm.getLong(0); val hi = mm.getLong(1)
    val width = (hi - lo) / S + 1L
    val slices = bucket
      .groupBy(expr(s"(doc_id - ${lo}L) div ${width}L").as("s"))
      .agg(count(lit(1)).as("c"))
      .collect().map(rr => (rr.getLong(0), rr.getLong(1))).sortBy(_._1)
    var cum = 0L; var j = 0
    while (cum + slices(j)._2 < r0) { cum += slices(j)._2; j += 1 }
    val sLo = lo + slices(j)._1 * width
    val sHi = math.min(hi, sLo + width - 1L)
    if (cum + slices(j)._2 == r0)
      // the crossing lands exactly on a slice boundary: pure filter
      bucket.filter(col("doc_id") <= sHi)
    else if (slices(j)._2 <= cap) {
      val ranked = bucket.filter(col("doc_id").between(sLo, sHi))
        .withColumn("__rn", row_number().over(Window.orderBy(col("doc_id").asc)))
        .filter(col("__rn") <= r0 - cum).drop("__rn")
      bucket.filter(col("doc_id") < sLo).unionByName(ranked)
    } else
      // recurse into the straddling slice; every id below it is selected
      // by the plain filter — no sort ever sees more than `cap` rows
      smallestIdsByRangeWalk(
        bucket.filter(col("doc_id").between(sLo, sHi)), r0 - cum, cap, depth + 1)
        .unionByName(bucket.filter(col("doc_id") < sLo))
  }

  /** EXACT per-group median of a [0, 1]-bounded score — percentile_disc
    * (0.5) semantics (the smallest value whose cumulative count reaches
    * ceil(n/2)), computed without any per-group sort: the same bounded-
    * histogram trick as [[topQuantileGate]], grouped. The histogram is
    * (group × snapped-score)-bounded — score RESOLUTION times a
    * key-bounded dimension (languages, sources), never corpus-sized —
    * so it collects to the driver where one cumulative walk per group
    * reads off the median. Emits (group, n_docs, median_micro, median).
    *
    * This is the exact-quantile path a gating decision wants (set the
    * per-language threshold AT the observed median); for arbitrary
    * unbounded doubles Spark's approx_percentile is the right tool —
    * this operator's contract is exactness on snapped bounded scores.
    */
  def groupedMedian(df: DataFrame, keyCol: String, quality: Column,
                    maxHistCells: Long = 4000000L): DataFrame =
    groupedQuantile(df, keyCol, quality, 1L, 2L, maxHistCells)
      .withColumnRenamed("quantile_micro", "median_micro")
      .withColumnRenamed("quantile", "median")

  /** EXACT per-group percentile_disc(pNum/pDen) — [[groupedMedian]]
    * generalized: the smallest snapped value whose cumulative count
    * reaches ceil(p·n), with p carried as a RATIONAL so the rank is
    * pure integer arithmetic (a double p·n can straddle an integer on
    * one engine and not the other at exact multiples). Same bounded
    * histogram, same guards. Emits (grp, n_docs, quantile_micro,
    * quantile).
    */
  def groupedQuantile(df: DataFrame, keyCol: String, quality: Column,
                      pNum: Long, pDen: Long,
                      maxHistCells: Long = 4000000L): DataFrame = {
    require(pDen > 0 && pNum > 0 && pNum <= pDen,
      s"quantile $pNum/$pDen must be in (0, 1]")
    val spark = df.sparkSession
    import spark.implicits._
    // the cell histogram aggregates DISTRIBUTED and is checkpointed so
    // the guard pass (cell count + score bounds) and the collect share
    // one materialization. The driver only ever sees it AFTER the cell
    // count is proven bounded — a high-cardinality group column (url,
    // not lang) or an unbounded score must fail loudly, not OOM the
    // driver. The key is cast to string HERE so integer/date group keys
    // work (the walk below reads it as a string).
    val cells = df.select(col(keyCol).cast("string").as("k"),
        floor(quality * lit(1e6) + lit(0.5)).cast("long").as("qm"))
      .groupBy("k", "qm").agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    val stats = cells.agg(count(lit(1)).as("n"),
      min(col("qm")).as("lo"), max(col("qm")).as("hi")).head()
    val nCells = stats.getLong(0)
    if (nCells == 0L)
      return Seq.empty[(String, Long, Long)].toDF("grp", "n_docs", "quantile_micro")
        .select(col("grp"), col("n_docs"), col("quantile_micro"),
          (col("quantile_micro").cast("double") / lit(1e6)).as("quantile"))
    require(nCells <= maxHistCells,
      s"groupedQuantile histogram has $nCells (group × score) cells " +
        s"(> $maxHistCells): the contract is a KEY-BOUNDED group column " +
        "and a snapped bounded score — reduce group cardinality or raise " +
        "maxHistCells deliberately")
    require(stats.getLong(1) >= 0L && stats.getLong(2) <= 1000000L,
      s"groupedQuantile requires a [0,1]-bounded quality column " +
        s"(micro-snapped range [${stats.getLong(1)}, ${stats.getLong(2)}] observed)")
    val hist = cells.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // the collected rows are all that outlives this call — free the
    // checkpoint blocks now
    graft.core.Checkpoints.release(cells)
    val rows = hist.groupBy(_._1).toSeq.map { case (k, cells) =>
      val sorted = cells.sortBy(_._2)
      val n = sorted.map(_._3).sum
      val target = (n * pNum + pDen - 1) / pDen // ceil(p*n), exact
      var cum = 0L; var i = 0
      while (cum + sorted(i)._3 < target) { cum += sorted(i)._3; i += 1 }
      (k, n, sorted(i)._2)
    }
    rows.toDF("grp", "n_docs", "quantile_micro")
      .select(col("grp"), col("n_docs"), col("quantile_micro"),
        (col("quantile_micro").cast("double") / lit(1e6)).as("quantile"))
  }

  /** Corpus vocabulary: top-N terms by total occurrences (ties broken
    * lexicographically), with per-term document counts. The n_docs count
    * rides the same two-phase aggregation (tf rows are distinct per
    * (term, doc)); the top-N avoids a global sort.
    */
  def vocabulary(df: DataFrame, idCol: String, textCol: String, topN: Int): DataFrame = {
    val perDoc = df.select(col(idCol).as("id"), explode(TextOps.tokens(col(textCol))).as("term"))
      .groupBy("term", "id").agg(count(lit(1)).as("cnt"))
    perDoc.groupBy("term")
      .agg(sum(col("cnt")).as("n_occurrences"), count(lit(1)).as("n_docs"))
      .orderBy(col("n_occurrences").desc, col("term").asc)
      .limit(topN)
  }

  /** Vocabulary COVERAGE CURVE — how many corpus tokens the top-N terms
    * cover, at each requested tokenizer budget: the statistic a vocab
    * size is chosen from. Exact integers (covered and total token
    * counts per budget); the corpus pays the usual term aggregation,
    * the curve itself is a driver-side cumulative sum over the
    * TakeOrdered top-max(budget) rows — bounded by the largest budget,
    * never vocabulary-sized, and the corpus total rides the one-pass
    * token-count kernel.
    */
  def vocabCoverage(df: DataFrame, idCol: String, textCol: String,
                    budgets: Seq[Int]): DataFrame = {
    require(budgets.nonEmpty && budgets.forall(_ > 0), "budgets must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val maxN = budgets.max
    val top = df.select(explode(TextOps.tokens(col(textCol))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("term").asc)
      .limit(maxN)
      .select(col("c")).as[Long].collect()
    // coalesce: an EMPTY corpus aggregates sum() to null — the curve
    // should degrade to covered=0/total=0, not NPE on getLong
    val total = df.agg(coalesce(
      sum(TextOps.tokenCountFast(spark, col(textCol)).cast("long")),
      lit(0L))).head().getLong(0)
    val cum = top.scanLeft(0L)(_ + _)
    budgets.distinct.sorted
      .map(b => (b.toLong, cum(math.min(b, top.length)), total))
      .toDF("budget", "covered_tokens", "total_tokens")
  }

  /** WEIGHTED sample without replacement, k per group — deterministic
    * Efraimidis–Spirakis A-ES (2006, public): each row draws a seeded
    * uniform u ∈ (0, 1] from its id hash and ranks by ln(u)/w; the top-k
    * per group is then EXACTLY a weight-proportional without-replacement
    * draw. The reservoir algorithm's streaming trick collapses, under a
    * deterministic u, to one ranking expression — so the "reservoir" is
    * just a per-group top-k, which Spark plans as partial+final
    * WindowGroupLimit: every partition keeps only k candidates before
    * the single group-key exchange. [[perGroupSample]] is the uniform
    * special case (w ≡ const); this one upweights by any positive
    * column (doc length here — the "sample long docs preferentially"
    * curation knob).
    *
    * Numerics: u > 0 by the +1 shift (ln(0) never evaluates); key order
    * is engine-identical because ln and the divide are the same IEEE
    * ops on the same inputs; ties broken by id. The raw double key is
    * NOT emitted — outputs are integers.
    */
  def weightedSample(df: DataFrame, idCol: String, groupCol: String,
                     weightCol: String, k: Int, seed: String = "wres|"): DataFrame = {
    require(k > 0, "k must be positive")
    val u = (TextOps.hashPrefix(seed, col(idCol)) + lit(1L)).cast("double") /
      lit(4294967296.0)
    val key = log(u) / col(weightCol).cast("double")
    df.select(col(idCol).as("doc_id"), col(groupCol).as("grp"),
        col(weightCol).as("weight"), key.as("__k"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("grp")).orderBy(col("__k").desc, col("doc_id"))))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("grp"), col("weight"), col("rank"))
  }

  /** Token-budget MIXTURE ACCOUNTING — the planning table behind a
    * training-data mixture: per group (language / domain / source), how
    * many tokens exist, what share of the corpus that is, what the
    * TARGET share allocates out of a fixed token `budget`, the sampling
    * rate that allocation implies, and whether the group is in DEFICIT
    * (target wants more tokens than exist → upsampling/more collection
    * needed). Shares and rates are half-up micro integers; the
    * allocation is exact integer rounding of budget × target — every
    * output column is hash-exact across engines.
    *
    * Scale: one corpus pass (the token-count kernel inside a grouped
    * sum with map-side combine); everything after operates on the
    * KEY-BOUNDED group frame — the global-total window is over group
    * cardinality, not rows, and the target lookup is a broadcast of the
    * caller's constant map. Groups absent from `targetsMicro` get
    * target 0 (allocated nothing, flagged surplus).
    */
  def tokenBudget(df: DataFrame, textCol: String, groupCol: String,
                  targetsMicro: Map[String, Long], budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    require(targetsMicro.values.forall(_ >= 0), "targets must be >= 0")
    val spark = df.sparkSession
    import spark.implicits._
    val per = df.groupBy(col(groupCol).as("grp"))
      .agg(count(lit(1)).as("n_docs"),
        coalesce(sum(TextOps.tokenCountFast(spark, col(textCol)).cast("long")),
          lit(0L)).as("tokens"))
    val tgt = targetsMicro.toSeq.toDF("grp", "target_micro")
    // unpartitioned window — legal ONLY because `per` is group-bounded
    // (groupedMedian contract): the frame entering it has one row per
    // group, never one per document
    val total = sum(col("tokens")).over(Window.partitionBy())
    per.join(broadcast(tgt), Seq("grp"), "left")
      .withColumn("target_micro", coalesce(col("target_micro"), lit(0L)))
      .withColumn("share_micro",
        floor(col("tokens").cast("double") * lit(1e6) /
          total.cast("double") + lit(0.5)).cast("long"))
      // exact to the unit: budget·target ≤ ~1e12 stays double-exact,
      // and both engines evaluate the identical expression
      .withColumn("alloc_tokens",
        floor((lit(budget) * col("target_micro") + lit(500000L)).cast("double") /
          lit(1000000.0)).cast("long"))
      .withColumn("rate_micro",
        floor(col("alloc_tokens").cast("double") * lit(1e6) /
          greatest(col("tokens"), lit(1L)).cast("double") + lit(0.5)).cast("long"))
      .withColumn("deficit", (col("alloc_tokens") > col("tokens")).cast("int"))
      .select(col("grp"), col("n_docs"), col("tokens"), col("share_micro"),
        col("target_micro"), col("alloc_tokens"), col("rate_micro"), col("deficit"))
  }

  /** WATER-FILLING token-budget allocation: the cap c solving
    * Σ_g min(tokens_g, c) = budget — the allocation a mixture planner
    * uses when no per-group targets exist (tokenBudget's complement):
    * small groups keep every token, large groups truncate at a common
    * water level, and the level itself is SOLVED, not configured.
    *
    * One pass, no iteration, no collect: sort groups by token count;
    * f(i) = P_i + (n−i)·T_i (the corpus kept if the cap were group i's
    * own size) is nondecreasing, so the cap's segment is the FIRST i
    * with f(i) ≥ budget and c = (budget − P_{i−1}) / (n − i + 1).
    * Every step is exact integer arithmetic until that single division
    * (IEEE double over exact integers — both engines agree bit-for-bit).
    * The unpartitioned windows are legal ONLY because the frame is
    * group-bounded (one row per source — the groupedMedian contract).
    * cap_micro = −1 flags an unbinding budget (corpus ≤ budget: every
    * group keeps everything).
    */
  def waterfillBudget(df: DataFrame, textCol: String, groupCol: String,
                      budget: Long, maxGroups: Long = 100000L): DataFrame = {
    require(budget > 0, "budget must be positive")
    val spark = df.sparkSession
    val per = df.groupBy(col(groupCol).as("source"))
      .agg(count(lit(1)).as("n_docs"),
        coalesce(sum(TextOps.tokenCountFast(spark, col(textCol)).cast("long")),
          lit(0L)).as("tokens"))
      .localCheckpoint(true)
    // the unpartitioned windows below serialize the per-GROUP frame into
    // one task — legal only while that frame is mixture-sized. Enforce
    // the contract on the MEASURED group count (the groupedQuantile
    // doctrine: a degenerate groupCol — doc_id, a url — must fail
    // loudly, not quietly single-task a corpus-sized sort). The
    // checkpoint makes the count a scalar job over materialized blocks,
    // not a second aggregation. Past the bound the construction still
    // exists distributed: range-partition by tokens and two-pass the
    // prefix sums (the f(i) segment scan is order-statistics over
    // sorted groups) — unimplemented because no real mixture axis
    // (source, lang, domain bucket) approaches 100k groups.
    val nGroups = per.count()
    require(nGroups <= maxGroups,
      s"waterfillBudget: $nGroups groups in '$groupCol' exceeds maxGroups=" +
        s"$maxGroups — the single-task window contract is for mixture axes " +
        "(source/lang/domain), not per-document keys; use a distributed " +
        "range-partitioned prefix-sum for high-cardinality group columns")
    val ow = Window.orderBy(col("tokens"), col("source"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val rw = Window.orderBy(col("tokens"), col("source"))
    val full = Window.partitionBy()
    val ord = per
      .withColumn("i", row_number().over(rw))
      .withColumn("p", sum(col("tokens")).over(ow))
      .withColumn("n", count(lit(1)).over(full))
      .withColumn("g", sum(col("tokens")).over(full))
    val seg = ord.withColumn("i0",
      min(when(col("p") + (col("n") - col("i")) * col("tokens") >= budget,
        col("i"))).over(full))
    val capAtSeg = (lit(budget) - (col("p") - col("tokens"))).cast("double") /
      (col("n") - col("i") + 1).cast("double")
    seg
      .withColumn("cap", max(when(col("i") === col("i0"), capAtSeg)).over(full))
      .withColumn("cap_micro",
        when(col("g") <= budget, lit(-1L))
          .otherwise(floor(col("cap") * lit(1e6) + lit(0.5)).cast("long")))
      .withColumn("alloc_micro",
        when(col("g") <= budget, col("tokens") * lit(1000000L))
          .otherwise(floor(least(col("tokens").cast("double"), col("cap")) *
            lit(1e6) + lit(0.5)).cast("long")))
      .select(col("source"), col("n_docs"), col("tokens"),
        col("cap_micro"), col("alloc_micro"))
  }

  /** DETERMINISTIC CORPUS SHUFFLE: assign every document a (shard, pos)
    * under a seeded pseudo-random permutation — the reproducible global
    * shuffle a pretraining run applies before sequence packing, where
    * "same seed ⇒ same order" must hold across reruns, engines and input
    * partitionings. The permutation key is the engine-portable 60-bit
    * md5 prefix of (seed | doc_id): shard = key mod nShards (balanced by
    * hash spread — no global sort anywhere), pos = rank of the key
    * within the shard (ties broken by doc_id; one window per shard, the
    * unavoidable per-shard sort that MATERIALIZING a shuffled order
    * costs — at scale each shard is one output file's worth of rows,
    * sorted independently at full parallelism).
    */
  def corpusShuffle(df: DataFrame, idCol: String, seed: String,
                    nShards: Int): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    val spark = df.sparkSession
    val w = Window.partitionBy(col("shard")).orderBy(col("hk"), col("doc_id"))
    df.select(col(idCol).as("doc_id"))
      .withColumn("hk", TextOps.gramHash64(spark,
        concat(lit(seed + "|"), col("doc_id").cast("string"))))
      .withColumn("shard", pmod(col("hk"), lit(nShards.toLong)))
      .withColumn("pos", (row_number().over(w) - 1).cast("long"))
      .select(col("doc_id"), col("shard"), col("pos"))
  }

  /** NEYMAN-ALLOCATION SAMPLING PLAN (Neyman 1934, the optimal
    * stratified-sampling allocation): split a sampling `budget` across
    * strata proportionally to n_h·σ_h — high-variance strata earn more
    * of the audit/eval budget than uniform or size-proportional splits,
    * the standard design for QA sampling over a heterogeneous corpus.
    *
    * Exactness: n_h·σ_h = √(n_h·Σx² − S²) EXACTLY (the n in σ's
    * denominator cancels), so the weight is one sqrt of an exact long,
    * half-up snapped to an integer weight; the split is then pure
    * integer largest-remainder apportionment — base_h = ⌊budget·w_h/W⌋
    * plus one for the r largest remainders (ties to the smaller
    * stratum name) — which sums to the budget by construction. One
    * corpus aggregation; every window runs over the strata frame only.
    * Allocations may exceed a stratum's population (Neyman's formula is
    * unconstrained); callers clamp and re-run on the residual if they
    * need n_h-capped draws.
    */
  def neymanAllocation(df: DataFrame, stratumCol: String, valueCol: Column,
                       budget: Long): DataFrame = {
    require(budget >= 0, s"budget=$budget must be >= 0")
    val mom = df.select(col(stratumCol).as("stratum"), valueCol.as("x"))
      .groupBy(col("stratum"))
      .agg(count(lit(1)).as("n_h"), sum(col("x")).as("s"),
        sum(col("x") * col("x")).as("s2"))
      .withColumn("w",
        floor(sqrt((col("n_h") * col("s2") - col("s") * col("s"))
          .cast("double")) + lit(0.5)).cast("long"))
      .localCheckpoint(true) // total, base and remainder rank share it
    val tot = mom.agg(sum(col("w")).as("tw"))
    val based = mom.crossJoin(broadcast(tot))
      .withColumn("base", expr(s"($budget * w) div tw"))
      .withColumn("rem", expr(s"($budget * w) % tw"))
    val wr = Window.orderBy(col("rem").desc, col("stratum"))
    val wsum = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    based
      .withColumn("leftover", lit(budget) - sum(col("base")).over(wsum))
      .withColumn("rk", row_number().over(wr))
      .withColumn("alloc",
        col("base") + when(col("rk") <= col("leftover"), 1L).otherwise(0L))
      .select(col("stratum"), col("n_h"), col("w").as("nh_sigma"),
        col("alloc"))
  }
}
