package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for the training-data pipeline surface
  * (builder brief: language-ID, quality scoring, token counting, document
  * fingerprinting). All pure Column compositions — codegen'd, no UDFs, and
  * every function has an exact SQL equivalent so results are oracle-checkable.
  */
object TextOps {

  /** Whitespace tokens, empties dropped (multi-space safe). */
  def tokens(text: Column): Column =
    filter(split(text, " "), t => t =!= "")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Word n-gram shingles (distinct), the unit for MinHash/Jaccard dedup.
    * Guarded for docs shorter than n tokens (Spark's `sequence(1,0)` would
    * count DOWN, not return empty).
    */
  def wordShingles(text: Column, n: Int): Column = {
    val toks = tokens(text)
    array_distinct(
      when(size(toks) >= n,
        transform(sequence(lit(1), size(toks) - (n - 1)),
          i => concat_ws(" ", slice(toks, i, lit(n)))))
      .otherwise(array()))
  }

  /** Character n-gram shingles (distinct). */
  def charShingles(text: Column, n: Int): Column =
    array_distinct(
      when(length(text) >= n,
        transform(sequence(lit(1), length(text) - (n - 1)),
          i => text.substr(i, lit(n))))
      .otherwise(array()))

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
    round(
      least(nTok / 100.0, lit(1.0)) * 0.4 +
      (lit(1.0) - least(punctRatio * 10.0, lit(1.0))) * 0.3 +
      least(stopRatio * 5.0, lit(1.0)) * 0.3, 4)
  }
}
