package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Eval operators: branch semantics the cross-engine oracle can't reach
  * on the synthetic corpus (exact-tie branches, degenerate marginals,
  * outer-join sides), plus determinism / partitioning invariance.
  */
class EvalSpec extends SparkSpec {
  import spark.implicits._

  test("ndcgAtK: perfect ranking scores 1e6, reversal scores less") {
    // grades 3,2,1 on docs 1,2,3; ranking in grade order is ideal
    val grades = Seq((1L, 1L, 3), (1L, 2L, 2), (1L, 3L, 1))
      .toDF("query_id", "doc_id", "grade")
    val perfect = Seq((1L, 1L, 1), (1L, 2L, 2), (1L, 3L, 3))
      .toDF("query_id", "doc_id", "rank")
    val reversed = Seq((1L, 3L, 1), (1L, 2L, 2), (1L, 1L, 3))
      .toDF("query_id", "doc_id", "rank")
    val p = Eval.ndcgAtK(perfect, grades, k = 3).head()
    assert(p.getAs[Long]("ndcg_micro") == 1000000L)
    val r = Eval.ndcgAtK(reversed, grades, k = 3).head()
    assert(r.getAs[Long]("ndcg_micro") < 1000000L)
    assert(r.getAs[Long]("idcg_micro") == p.getAs[Long]("idcg_micro"))
  }

  test("ndcgAtK: unjudged ranked docs gain 0; grade-0 judgments equal absent ones") {
    val grades = Seq((1L, 1L, 2)).toDF("query_id", "doc_id", "grade")
    val gradesWithZero = Seq((1L, 1L, 2), (1L, 9L, 0))
      .toDF("query_id", "doc_id", "grade")
    val ranking = Seq((1L, 9L, 1), (1L, 1L, 2))
      .toDF("query_id", "doc_id", "rank")
    val a = Eval.ndcgAtK(ranking, grades, k = 3).head()
    val b = Eval.ndcgAtK(ranking, gradesWithZero, k = 3).head()
    // a grade-0 term is exactly floor(0 + 0.5) = 0, so an explicit zero
    // judgment and an unjudged doc are indistinguishable in every sum
    assert(a.getAs[Long]("dcg_micro") == b.getAs[Long]("dcg_micro"))
    assert(a.getAs[Long]("idcg_micro") == b.getAs[Long]("idcg_micro"))
    // rank-2 hit of grade 2: floor(3·ln2/ln3·1e6 + 0.5)
    val expected = math.floor(3.0 * math.log(2.0) / math.log(3.0) * 1e6 + 0.5).toLong
    assert(a.getAs[Long]("dcg_micro") == expected)
  }

  test("ndcgAtK: all-zero judged set yields NULL ndcg; outer join keeps grade-only queries") {
    val grades = Seq((1L, 1L, 0), (2L, 5L, 3)).toDF("query_id", "doc_id", "grade")
    val ranking = Seq((1L, 1L, 1)).toDF("query_id", "doc_id", "rank")
    val out = Eval.ndcgAtK(ranking, grades, k = 3)
      .collect().map(r => r.getAs[Long]("query_id") -> r).toMap
    assert(out(1L).isNullAt(out(1L).fieldIndex("ndcg_micro"))) // idcg = 0
    assert(out(2L).getAs[Long]("dcg_micro") == 0L)             // never ranked
    assert(out(2L).getAs[Long]("idcg_micro") == 7000000L)      // (2^3−1)·1e6
  }

  test("cohensKappa: perfect agreement is 1e6, constant labelers are NULL") {
    val df = Seq(("g", true, true), ("g", false, false), ("g", true, true),
        ("h", true, true), ("h", true, true))
      .toDF("grp", "a", "b")
    val out = Eval.cohensKappa(df, "grp", col("a"), col("b"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("g").getAs[Long]("kappa_micro") == 1000000L)
    // h: both labelers constant-true → pe = 1 → kappa undefined
    assert(out("h").isNullAt(out("h").fieldIndex("kappa_micro")))
    assert(out("h").getAs[Long]("po_micro") == 1000000L)
  }

  test("cohensKappa: hand-checked 2x2") {
    // n11=20 n10=5 n01=10 n00=15: po=0.7, pe=(25·30+25·20)/2500=0.5
    val rows = Seq.fill(20)(("g", true, true)) ++ Seq.fill(5)(("g", true, false)) ++
      Seq.fill(10)(("g", false, true)) ++ Seq.fill(15)(("g", false, false))
    val out = Eval.cohensKappa(rows.toDF("grp", "a", "b"), "grp",
      col("a"), col("b")).head()
    assert(out.getAs[Long]("po_micro") == 700000L)
    assert(out.getAs[Long]("pe_micro") == 500000L)
    assert(out.getAs[Long]("kappa_micro") == 400000L) // (0.7−0.5)/0.5
  }

  test("poissonBootstrapCI: deterministic, partitioning-invariant, brackets the mean") {
    val df = (1L to 200L).map(i => (s"s${i % 2}", i, 1000L * (i % 37)))
      .toDF("src", "id", "score")
    def run(d: org.apache.spark.sql.DataFrame) =
      Eval.poissonBootstrapCI(d, "src", "id", col("score"), b = 32)
        .orderBy("grp").collect().toSeq
    val a = run(df)
    val b = run(df.repartition(7))
    assert(a == b, "bootstrap must be a pure function of (seed, id, rep)")
    a.foreach { r =>
      assert(r.getAs[Long]("n_reps") == 32L)
      assert(r.getAs[Long]("boot_lo_micro") <= r.getAs[Long]("mean_micro"))
      assert(r.getAs[Long]("boot_hi_micro") >= r.getAs[Long]("mean_micro"))
      assert(r.getAs[Long]("boot_lo_micro") < r.getAs[Long]("boot_hi_micro"))
    }
    // a different seed moves the interval (the draw is seed-sensitive)
    val c = Eval.poissonBootstrapCI(df, "src", "id", col("score"), b = 32,
      seed = "boot2|").orderBy("grp").collect().toSeq
    assert(a != c)
  }

  test("tournamentWinRates: exact score ties go to the smaller id") {
    // one bucket; entities alternate; ALL scores equal → lead pairing
    // yields the 9 overlapping adjacent pairs (1,2)...(9,10), every one
    // cross-entity, and the smaller id of each pair wins the tie:
    // B (odd ids) wins the 5 odd-led pairs, A the 4 even-led ones
    val df = (1L to 10L).map(i => (i, if (i % 2 == 0) "A" else "B", 500L))
      .toDF("id", "entity", "score")
    val out = Eval.tournamentWinRates(df, "id", "entity", col("score"),
        nBuckets = 1, seed = "t|")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("A").getAs[Long]("n_pairs") == 9L)
    assert(out("B").getAs[Long]("n_pairs") == 9L)
    assert(out("A").getAs[Long]("n_wins") == 4L)
    assert(out("B").getAs[Long]("n_wins") == 5L)
    assert(out("B").getAs[Long]("winrate_micro") == 555556L)
  }

  test("tournamentWinRates: one-sided outcomes leave the logit NULL") {
    val df = Seq((1L, "A", 1L), (2L, "B", 2L)).toDF("id", "entity", "score")
    val out = Eval.tournamentWinRates(df, "id", "entity", col("score"),
        nBuckets = 1, seed = "t|")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("B").getAs[Long]("n_wins") == 1L)
    assert(out("A").isNullAt(out("A").fieldIndex("logit_micro")))
    assert(out("B").isNullAt(out("B").fieldIndex("logit_micro")))
  }

  test("tournamentWinRates: same-entity pairs are excluded; scores decide") {
    val df = Seq((1L, "A", 10L), (2L, "A", 20L), (3L, "B", 30L), (4L, "B", 5L))
      .toDF("id", "entity", "score")
    // bucket order by id: pairs (1,2) same-entity → dropped,
    // (2,3): B wins 30>20, (3,4) same-entity → dropped
    val out = Eval.tournamentWinRates(df, "id", "entity", col("score"),
        nBuckets = 1, seed = "t|")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("A").getAs[Long]("n_pairs") == 1L && out("A").getAs[Long]("n_wins") == 0L)
    assert(out("B").getAs[Long]("n_pairs") == 1L && out("B").getAs[Long]("n_wins") == 1L)
  }

  test("POISSON1_CDF_MICRO matches floor(1e6·e^-1·Σ 1/i!)") {
    var term = 1.0
    var cum = 0.0
    val expected = (0 until 7).map { i =>
      if (i > 0) term /= i
      cum += term
      math.floor(1e6 * math.exp(-1.0) * cum).toLong
    }
    // recompute independently; guards against editing the literal table
    // in one place only (oracle CASE and Spark weights both render it)
    assert(Eval.POISSON1_CDF_MICRO == expected)
  }
}
