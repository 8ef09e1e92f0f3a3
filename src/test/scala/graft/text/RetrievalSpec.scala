package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.plans.{ArrayOps, DoubleArrayQuantStats}

/** Retrieval/scoring operators: BM25, unigram surprisal, domain gating,
  * and the scalar-quantization kernel. Expected numbers are computed
  * INDEPENDENTLY (python math.log/floor over the same formulas) and
  * hardcoded — the spec would be tautological if it re-ran the Spark
  * arithmetic.
  */
class RetrievalSpec extends SparkSpec {

  private def corpus = {
    import spark.implicits._
    Seq(
      (1L, "apple apple banana"),
      (2L, "apple cherry"),
      (3L, "cherry banana"))
      .toDF("doc_id", "text")
  }

  test("bm25: hand-computed scores, saturation ranking, absent docs excluded") {
    import spark.implicits._
    val out = Retrieval.bm25TopK(corpus, "doc_id", "text",
      queries = Map(1 -> "apple"), k = 5)
      .select($"query_id", $"doc_id", $"score", $"rank")
      .as[(Int, Long, Double, Int)].collect().sortBy(_._4)
    // python: idf = ln(1 + (3 - 2 + 0.5)/(2 + 0.5)); avgdl = 7/3
    //   d1 (tf=2, dl=3) -> floor(idf*tfpart*1e6 + .5) = 598186
    //   d2 (tf=1, dl=2) -> 499176; d3 has no 'apple' -> absent
    assert(out === Seq((1, 1L, 0.598186, 1), (1, 2L, 0.499176, 2)))
  }

  test("bm25: k bounds results; ties break on doc_id; multi-term sums") {
    import spark.implicits._
    val docs = Seq(
      (10L, "x y"), (11L, "x y"), (12L, "x y"), (13L, "z z"))
      .toDF("doc_id", "text")
    val out = Retrieval.bm25TopK(docs, "doc_id", "text",
      queries = Map(7 -> "x y"), k = 2)
      .select($"doc_id", $"rank").as[(Long, Int)].collect().sortBy(_._2)
    // three identical matches, k=2: deterministic doc_id tie-break
    assert(out === Seq((10L, 1), (11L, 2)))
  }

  test("unigram surprisal: exact micro-nat sums against the corpus LM") {
    import spark.implicits._
    val docs = Seq((1L, "a a a"), (2L, "b")).toDF("doc_id", "text")
    val out = Retrieval.unigramSurprisal(docs, "doc_id", "text")
      .select($"doc_id", $"n_tokens", $"surprisal_micro", $"mean_surprisal")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    // T=4, c(a)=3, c(b)=1; per-token micro = floor((ln T - ln c)*1e6 + .5)
    assert(out === Seq((1L, 3L, 863046L, 0.287682), (2L, 1L, 1386294L, 1.386294)))
  }

  test("domain gate: passing domain keeps all docs, failing domain drops all") {
    import spark.implicits._
    val docs = Seq(
      (1L, "good.com", 0.8), (2L, "good.com", 0.6),
      (3L, "bad.com", 0.3), (4L, "bad.com", 0.5))
      .toDF("doc_id", "domain", "q")
    val kept = Retrieval.domainQualityFilter(docs, "doc_id", "domain",
        col("q"), minMean = 0.56)
      .select($"doc_id").as[Long].collect().toSet
    assert(kept === Set(1L, 2L)) // good mean 0.7 >= 0.56; bad mean 0.4 < 0.56
  }

  test("quant stats: hand case, constant vector, and codegen/eval parity") {
    import spark.implicits._
    val df = Seq(
      (1L, Array(0.0, 1.0, 0.25)),
      (2L, Array(0.5, 0.5, 0.5)))
      .toDF("vec_id", "v")
    val out = df.select($"vec_id", ArrayOps.quantStats(spark, $"v", 2).as("qs"))
      .select($"vec_id", element_at($"qs", 1), element_at($"qs", 2),
        element_at($"qs", 3).cast("long"))
      .as[(Long, Double, Double, Long)].collect().sortBy(_._1)
    // levels=2: scale=1; 0.25 quantizes to 0 -> err 0.0625 -> micro 62500.
    // Constant vector: zero scale branch -> zero error by definition.
    assert(out === Seq((1L, 0.0, 1.0, 62500L), (2L, 0.5, 0.5, 0L)))

    // interpreted eval must agree with the codegen path bit for bit
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    val lit = Literal.create(Array(0.0, 1.0, 0.25),
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType, false))
    val r = DoubleArrayQuantStats(lit, 2).eval(null).asInstanceOf[ArrayData]
    assert(r.toDoubleArray().toSeq === Seq(0.0, 1.0, 62500.0))
  }

  test("dup n-gram mass: fully-repetitive vs all-unique vs too-short docs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c a b c a b"), // every 3-gram occurs twice -> mass 1.0
      (2L, "x y z w"),         // both 3-grams unique -> mass 0.0
      (3L, "a b"))             // < 3 tokens -> absent
      .toDF("doc_id", "text")
    val out = Terms.dupNgramMass(docs, "doc_id", "text", n = 3)
      .select($"doc_id", $"n_grams", $"n_dup_occurrences", $"dup_fraction")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(out === Seq((1L, 6L, 6L, 1.0), (2L, 2L, 0L, 0.0)))
  }

  test("importance resample: full-overlap doc always kept, disjoint doc never") {
    import spark.implicits._
    val docs = Seq(
      (0L, "alpha beta gamma delta"),  // the target sample (doc_id === 0)
      (1L, "alpha beta gamma delta"),  // identical -> overlap 1.0 -> kept (u < 1 always)
      (3L, "zeta eta theta iota"))     // disjoint -> overlap 0 -> u*n < 0 impossible
      .toDF("doc_id", "text")
    val out = Retrieval.importanceResample(docs, "doc_id", "text",
        targetPred = col("doc_id") === 0, n = 2)
      .select($"doc_id", $"n_grams", $"n_target_grams")
      .as[(Long, Long, Long)].collect().toSeq
    assert(out === Seq((1L, 3L, 3L)))
  }

  test("per-group sample: k per group, rank-contiguous, partitioning-invariant") {
    import spark.implicits._
    val docs = (1L to 20L).map(i => (i, if (i % 2 == 0) "en" else "de"))
      .toDF("doc_id", "lang")
    val a = Terms.perGroupSample(docs, "doc_id", "lang", k = 3)
      .select($"doc_id", $"grp", $"rank").as[(Long, String, Int)].collect().toSet
    assert(a.size === 6 && a.groupBy(_._2).forall(_._2.map(_._3) === Set(1, 2, 3)))
    // hash-ranked, not id-ranked: same set no matter how the input arrives
    val b = Terms.perGroupSample(docs.repartition(7), "doc_id", "lang", k = 3)
      .select($"doc_id", $"grp", $"rank").as[(Long, String, Int)].collect().toSet
    assert(a === b)
  }

  test("token ids: frequency-ranked vocab, OOV id, positions preserved") {
    import spark.implicits._
    val docs = Seq((1L, "b a"), (2L, "a c a")).toDF("doc_id", "text")
    val out = Terms.tokenIds(docs, "doc_id", "text", topN = 2)
      .select($"doc_id", $"pos", $"token_id")
      .as[(Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
    // counts: a=3 -> id 0; b=1, c=1 tie -> b (lexicographic) takes id 1; c is OOV (=2)
    assert(out === Seq((1L, 0L, 1L), (1L, 1L, 0L),
      (2L, 0L, 0L), (2L, 1L, 2L), (2L, 2L, 0L)))
  }

  test("bm25 plan: query-term prune sits BELOW every postings shuffle") {
    // AQE off for a stable, walkable physical tree
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = Retrieval.bm25TopK(corpus, "doc_id", "text",
        queries = Map(1 -> "apple"), k = 5)
        .queryExecution.executedPlan
      import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
      // every shuffle fed by a token explode (Generate) must already have
      // the isin prune in its subtree — i.e. the (doc, term) aggregation
      // never shuffles unpruned corpus tokens. The scalar-stats branch has
      // a shuffle but no Generate, so it is rightly exempt.
      val postingsShuffles = plan.collect {
        case e: ShuffleExchangeExec if e.child.toString.contains("Generate") => e
      }
      assert(postingsShuffles.nonEmpty, s"no postings shuffle found in:\n$plan")
      postingsShuffles.foreach { e =>
        assert(e.child.toString.contains("apple"),
          s"a token-explode shuffle is missing the query-term prune:\n$e")
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
