package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for the training-data pipeline surface
  * (builder brief: language-ID, quality scoring, token counting, document
  * fingerprinting). All pure Column compositions — codegen'd, no UDFs, and
  * every function has an exact SQL equivalent so results are oracle-checkable.
  */
object TextOps {

  /** Whitespace tokens, empties dropped (multi-space safe).
    *
    * Deliberately LAMBDA-FREE (`array_remove`, not `filter(_, lambda)`):
    * plans containing lambda expressions do not canonicalize equal, which
    * blocks ReuseExchange for every subtree above them — the minhash
    * pipeline would recompute its shingle subtree once per consumer.
    */
  def tokens(text: Column): Column =
    array_remove(split(text, " +"), "")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Word n-gram shingles from an ALREADY-MATERIALIZED tokens column
    * (an attribute, not an expression). Guarded for docs shorter than n
    * tokens (Spark's `sequence(1,0)` would count DOWN, not return empty).
    *
    * Perf note: expressions referenced inside a higher-order-function
    * lambda are re-evaluated PER ELEMENT — passing `tokens(text)` directly
    * here would re-split the text O(n) times per row (measured 20× slowdown
    * at sf0.1). Hence the df-level `withWordShingles`, which binds the
    * token array to a column first; `element_at` keeps each element O(1)
    * where `slice` would copy O(n).
    */
  def wordShinglesFromTokens(toks: Column, n: Int): Column =
    array_distinct(
      when(size(toks) >= n,
        transform(sequence(lit(1), size(toks) - (n - 1)),
          i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + j)): _*)))
      .otherwise(array()))

  /** Add a word-n-gram shingle column (distinct) for `textCol`. */
  def withWordShingles(df: org.apache.spark.sql.DataFrame, textCol: String,
                       n: Int, out: String): org.apache.spark.sql.DataFrame =
    df.withColumn("__toks", tokens(col(textCol)))
      .withColumn(out, wordShinglesFromTokens(col("__toks"), n))
      .drop("__toks")

  /** Word n-gram shingles as ROWS (id, g) — the scale path for MinHash:
    * posexplode + windowed lead keeps everything in whole-stage codegen
    * (no array materialization, no per-element lambda re-evaluation; the
    * only cost is one shuffle on the doc id, which the downstream
    * signature aggregation needs anyway). Emits one row per OCCURRENCE —
    * duplicate-insensitive consumers (min-hash, collect_set) see the same
    * set as the distinct-array form.
    */
  def wordShingleRows(df: org.apache.spark.sql.DataFrame, idCol: String,
                      textCol: String, n: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("id").orderBy("pos")
    val toks = df.select(col(idCol).as("id"),
      posexplode(tokens(col(textCol))).as(Seq("pos", "tok")))
    val withLeads = (1 until n).foldLeft(toks) { (acc, j) =>
      acc.withColumn(s"__t$j", lead(col("tok"), j).over(w))
    }
    withLeads.filter(col(s"__t${n - 1}").isNotNull)
      .select(col("id"),
        concat_ws(" ", col("tok") +: (1 until n).map(j => col(s"__t$j")): _*).as("g"))
  }

  /** Character n-gram shingles (distinct). */
  def charShingles(text: Column, n: Int): Column =
    array_distinct(
      when(length(text) >= n,
        transform(sequence(lit(1), length(text) - (n - 1)),
          i => text.substr(i, lit(n))))
      .otherwise(array()))

  /** Seeded 32-bit hash of an id column: the first 8 hex chars of
    * md5(seed || id) as a long in [0, 2^32) — the ONE deterministic
    * pseudo-randomness primitive behind bucketed splits (mod N) and
    * unit-interval draws (divide by 2^32). Mirrors the DuckDB idiom
    * `('0x' || substr(md5(seed || id), 1, 8))::BIGINT` bit-identically;
    * keep both renderings in lock-step.
    */
  def hashPrefix(seed: String, id: Column): Column =
    conv(substring(md5(concat(lit(seed), id)), 1, 8), 16, 10).cast("long")

  /** `hashPrefix` scaled to a uniform draw in [0, 1). */
  def hashUnit(seed: String, id: Column): Column =
    hashPrefix(seed, id) / lit(4294967296.0)

  /** Canonical-form fingerprint: md5 of the lowercased alphanumeric
    * skeleton — a deterministic rolling-hash substitute that two engines
    * compute identically (whitespace/punct/case-insensitive exact dedup key).
    */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(text), "[^a-z0-9]+", ""))

  /** Count of tokens that appear in `markers` (language stopword scoring). */
  def markerCount(text: Column, markers: Seq[String]): Column =
    size(filter(tokens(lower(text)), t => t.isin(markers.map(lit): _*)))

  val EN_MARKERS = Seq("the", "a", "of", "and", "is")
  val DE_MARKERS = Seq("der", "die", "das", "und", "ist")
  val ES_MARKERS = Seq("el", "la", "los", "de", "es")
  val FR_MARKERS = Seq("le", "les", "et", "est", "une")

  /** n-gram-heuristic language ID: marker-token scores with a fixed,
    * deterministic tie-break chain (zh wins on any CJK presence, then
    * en >= de >= es >= fr). Returns the predicted code.
    */
  def langId(text: Column): Column = {
    val sEn = markerCount(text, EN_MARKERS)
    val sDe = markerCount(text, DE_MARKERS)
    val sEs = markerCount(text, ES_MARKERS)
    val sFr = markerCount(text, FR_MARKERS)
    val hasCjk = length(regexp_replace(text, "[^\\u4e00-\\u9fff]", "")) > 0
    when(hasCjk, "zh")
      .when(sEn >= sDe && sEn >= sEs && sEn >= sFr, "en")
      .when(sDe >= sEs && sDe >= sFr, "de")
      .when(sEs >= sFr, "es")
      .otherwise("fr")
  }

  /** Heuristic quality score in [0,1]: length, punctuation density and
    * stopword density (the standard pre-training quality gates, each a
    * deterministic closed form).
    */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text).cast("double")
    val punct = (length(text) - length(regexp_replace(text, "[.,;:!?'\"]", ""))).cast("double")
    val punctRatio = punct / greatest(length(text).cast("double"), lit(1.0))
    val stopRatio = markerCount(text, EN_MARKERS).cast("double") / greatest(nTok, lit(1.0))
    // RAW double, deliberately unrounded: every input is per-row
    // deterministic, so the result is bit-identical across engines;
    // rounding would reintroduce same-double midpoint divergence
    least(nTok / 100.0, lit(1.0)) * 0.4 +
      (lit(1.0) - least(punctRatio * 10.0, lit(1.0))) * 0.3 +
      least(stopRatio * 5.0, lit(1.0)) * 0.3
  }
}
