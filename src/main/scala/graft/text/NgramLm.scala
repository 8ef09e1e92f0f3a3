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
}
