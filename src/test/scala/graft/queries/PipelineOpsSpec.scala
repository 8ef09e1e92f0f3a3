package graft.queries

import graft.SparkSpec

/** Semantics of the r10 corpus-monitoring composites (q124–q127) on
  * crafted corpora — the properties the synthetic testdata can't pin
  * (no reorder-duplicates exist in it, and its similarity structure is
  * too diffuse for hand-checked values).
  */
class PipelineOpsSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  private def corpusDir(rows: Seq[(Long, String, String, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ops").toString
    rows.map { case (id, text, lang, src) => (id, text, lang, src, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q125 bag dedup: reordered token multisets family together; exact hash would not") {
    val dir = corpusDir(Seq(
      (1L, "alpha beta gamma", "en", "web"),
      (2L, "gamma beta alpha", "en", "web"),   // reordering of doc 1
      (3L, "alpha beta", "en", "web")))        // subset — NOT a bag match
    val out = graft.SparkEntry.queries("q125_bag_dedup")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(1L) === ((1L, 2L)) && out(2L) === ((1L, 2L)),
      "reordered copies must share a family with the min-id keeper")
    assert(out(3L) === ((3L, 1L)), "a subset is not a multiset match")
    // the property q32-style exact dedup lacks: the texts differ bytewise
    import spark.implicits._
    val exact = Seq("alpha beta gamma", "gamma beta alpha").toDF("text")
      .select(md5(col("text"))).distinct().count()
    assert(exact === 2L)
  }

  test("q124 source similarity: identical sources estimate 1.0, disjoint estimate 0") {
    val shared = (0 until 60).map(i => s"tok$i").mkString(" ")
    val other = (100 until 160).map(i => s"zzz$i").mkString(" ")
    val dir = corpusDir(Seq(
      (1L, shared, "en", "a"),
      (2L, shared, "en", "b"),    // b == a gram-for-gram
      (3L, other, "en", "c")))    // c disjoint from both
    val rows = graft.SparkEntry.queries("q124_source_similarity")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    val (interAb, estAb, exAb) = rows(("a", "b"))
    assert(exAb === 1000000L && estAb === 1000000L && interAb === 58L,
      s"identical gram sets must agree at 1.0 (got $exAb est $estAb inter $interAb)")
    val (_, estAc, exAc) = rows(("a", "c"))
    assert(exAc === 0L && estAc === 0L, "disjoint sources must score 0")
  }

  test("q126 embedding drift: identical vectors cohere at cos 1; a zero centroid guards to 0") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-emb").toString
    Seq(
      (1L, Array(3.0f, 4.0f), 0),    // label 0: two identical vectors
      (2L, Array(3.0f, 4.0f), 0),
      (3L, Array(1.0f, 0.0f), 1),    // label 1: opposite vectors → centroid 0
      (4L, Array(-1.0f, 0.0f), 1))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = graft.SparkEntry.queries("q126_embedding_drift")(spark, dir)
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // |(3,4)| = 5 → 5e6 micro; every member IS the centroid → cos exactly 1
    assert(out(0) === ((2L, 5000000L, 5000000L, 1000000L)))
    // centroid of (1,0),(−1,0) is the zero vector: norm 0, cos guarded to 0
    val (n1, cn1, mn1, mc1) = out(1)
    assert(n1 === 2L && cn1 === 0L && mn1 === 1000000L && mc1 === 0L)
  }

  test("q128 dup inflation: reordered + exact copies inflate; keeper mass excludes them") {
    val dir = corpusDir(Seq(
      (1L, "a b c d", "en", "web"),       // keeper (min id)
      (2L, "a b c d", "en", "web"),       // exact copy
      (3L, "d c b a", "en", "web"),       // reordered copy — same bag family
      (4L, "x y", "en", "web")))          // singleton
    val r = graft.SparkEntry.queries("q128_dup_inflation")(spark, dir).collect().head
    // (source, n_docs, n_exact_unique, n_bag_unique, tokens, tokens_bag_unique, inflation)
    assert(r.getLong(1) === 4L)
    assert(r.getLong(2) === 3L, "exact dedup sees texts 'abcd', 'dcba', 'xy'")
    assert(r.getLong(3) === 2L, "bag dedup families {1,2,3} and {4}")
    assert(r.getLong(4) === 14L && r.getLong(5) === 6L)  // 4+4+4+2 vs 4+2
    assert(r.getLong(6) === 2333333L)                    // 14/6 inflation
  }

  test("q127 head coverage: hand-computed curve, n_terms caps at the vocabulary") {
    // 12 distinct tokens, token i repeated i times → total 78; top-10 by
    // count = tokens 12..3 → 75 covered
    val text = (1 to 12).flatMap(i => Seq.fill(i)(s"w$i")).mkString(" ")
    val dir = corpusDir(Seq((1L, text, "en", "web")))
    val out = graft.SparkEntry.queries("q127_head_coverage")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out(10L) === ((10L, 75L, 78L, 961538L)))
    // vocab (12) < k: n_terms caps at 12, full coverage
    assert(out(100L) === ((12L, 78L, 78L, 1000000L)))
    assert(out(1000L) === ((12L, 78L, 78L, 1000000L)))
  }

  test("q131 calibration core: histogram cume_dist matches hand values; guard trips") {
    import spark.implicits._
    val df = Seq(("g1", 10L), ("g1", 20L), ("g1", 20L), ("g1", 30L),
      ("g2", 5L)).toDF("source", "s")
    val out = graft.text.Calibrate.cumeDist(df, "source", col("s"))
      .select("source", "score_micro", "pct_micro")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    // g1: 10 → 1/4, 20 → 3/4 (ties share the cell), 30 → 4/4; g2 singleton → 1
    assert(out(("g1", 10L)) === 250000L)
    assert(out(("g1", 20L)) === 750000L)
    assert(out(("g1", 30L)) === 1000000L)
    assert(out(("g2", 5L)) === 1000000L)
    // an unbounded histogram must fail loudly, not OOM the window
    val e = intercept[IllegalArgumentException] {
      graft.text.Calibrate.cumeDist(df, "source", col("s"), maxHistCells = 2L)
    }
    assert(e.getMessage.contains("maxHistCells"))
  }

  test("q132 source KL: corpus-identical distributions score exactly 0; disjoint scores ln-exact") {
    val dir = corpusDir(Seq(
      (1L, "x y", "en", "a"),
      (2L, "x y", "en", "b"),     // a and b both match the corpus marginal of {x, y}
      (3L, "z w", "en", "c")))    // c disjoint — and it skews a/b too
    // corpus: x:1? no — x:2 y:2 z:1 w:1, T=6. For source a (T_g=2):
    // term x: (1/2)·ln((1·6)/(2·2)); same for y.
    val expA = {
      val c = math.floor(0.5 * math.log(6.0 / 4.0) * 1e6 + 0.5).toLong
      2 * c
    }
    val expC = {
      val c = math.floor(0.5 * math.log(6.0 / 2.0) * 1e6 + 0.5).toLong
      2 * c
    }
    val out = graft.SparkEntry.queries("q132_source_kl")(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(3))).toMap
    assert(out("a") === ((2L, expA)) && out("b") === ((2L, expA)))
    assert(out("c") === ((2L, expC)))
    // the zero case: a corpus where every source IS the corpus marginal
    val dir0 = corpusDir(Seq((1L, "x y", "en", "a"), (2L, "y x", "en", "b")))
    val kl0 = graft.SparkEntry.queries("q132_source_kl")(spark, dir0)
      .collect().map(_.getLong(3))
    assert(kl0.forall(_ === 0L), "identical distributions must score exactly 0")
  }

  test("q133 naive Bayes: separable vocabularies classify perfectly; ties break high") {
    val dir = corpusDir(Seq(
      (1L, "the cat sat", "en", "web"),
      (2L, "the dog sat", "en", "web"),
      (3L, "le chat assis", "fr", "web"),
      (4L, "le chien assis", "fr", "web")))
    val rows = graft.SparkEntry.queries("q133_naive_bayes")(spark, dir).collect()
    assert(rows.length === 4)
    assert(rows.forall(_.getInt(4) === 1), s"separable vocab must classify " +
      s"perfectly: ${rows.mkString(";")}")
    // symmetric corpus → every per-label score identical → the max(struct)
    // tie rule must pick the lexicographically larger label for EVERY doc
    val dirTie = corpusDir(Seq((1L, "m", "en", "web"), (2L, "m", "fr", "web")))
    val tie = graft.SparkEntry.queries("q133_naive_bayes")(spark, dirTie).collect()
    assert(tie.forall(_.getString(2) === "fr"),
      "exact score ties must break to the larger label on both engines")
  }

  test("q134 PQ: a vector planted at a codebook entry assigns to it with ~0 SSE") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-pq").toString
    val codes = Array(3, 5, 0, 7)
    val planted = (0 until 4).flatMap(s =>
      graft.sim.Similarity.pqCentroidVec(s, codes(s), 16).map(_.toFloat)).toArray
    Seq((1L, planted, 0))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = graft.SparkEntry.queries("q134_pq_audit")(spark, dir)
      .collect().map(r => r.getInt(1) -> (r.getInt(2), r.getLong(3))).toMap
    (0 until 4).foreach { s =>
      val (code, sse) = out(s)
      assert(code === codes(s), s"subspace $s must assign to the planted code")
      // float32 storage rounds the planted doubles — SSE is tiny, not 0
      assert(sse < 100L, s"planted vector SSE should be ~0, got $sse micro")
    }
  }

  test("q135 RRF core: rank-only fusion, union semantics, exact micro contributions") {
    import spark.implicits._
    val r1 = Seq((0L, 10L, 1), (0L, 11L, 2)).toDF("query_id", "doc_id", "rank")
    val r2 = Seq((0L, 11L, 1), (0L, 12L, 2)).toDF("query_id", "doc_id", "rank")
    val out = graft.text.Retrieval.rrfFuse(Seq(r1, r2), k0 = 60, k = 10)
      .collect().map(r => r.getLong(1) -> (r.getLong(2), r.getLong(3), r.getInt(4)))
      .toMap
    // floor(1e6/61 + .5) = 16393, floor(1e6/62 + .5) = 16129
    assert(out(11L) === ((2L, 16393L + 16129L, 1)),
      "doc in both rankers sums both contributions and wins")
    assert(out(10L) === ((1L, 16393L, 2)))
    assert(out(12L) === ((1L, 16129L, 3)))
  }

  test("q136 MMR: the greedy skips the near-duplicate a plain top-k would take") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-mmr").toString
    Seq(
      (0L, Array(1.0f, 0.0f), 0),     // query
      (1L, Array(1.0f, 0.05f), 0),    // best candidate
      (2L, Array(1.0f, 0.06f), 0),    // near-duplicate of 1 (sim ≈ 1)
      (3L, Array(0.6f, -0.8f), 0))    // diverse, lower relevance
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val emb = graft.core.Tables.embeddings(spark, dir)
    // relevance rank order is 1, 2, 3 — a plain top-k keeps the near-dup
    val plain = graft.sim.Similarity.bruteForceTopK(emb,
        emb.filter(col("vec_id") === 0L), "vec_id", "embedding", 3)
      .orderBy("rank").collect().map(_.getLong(1)).toSeq
    assert(plain === Seq(1L, 2L, 3L))
    // at λ=0.5 the redundancy penalty reorders: 1, then 3, then 2
    val mmr = graft.sim.Similarity.mmrSelect(emb, "vec_id", "embedding",
        col("vec_id") === 0L, nCandidates = 3, k = 3, lamX10 = 5)
      .orderBy("pick").collect().map(r => (r.getLong(1), r.getInt(2))).toSeq
    assert(mmr === Seq((1L, 1), (3L, 2), (2L, 3)),
      s"MMR must pick the diverse candidate second, got $mmr")
    // λ=1 (lamX10=10) recovers pure relevance order
    val pure = graft.sim.Similarity.mmrSelect(emb, "vec_id", "embedding",
        col("vec_id") === 0L, nCandidates = 3, k = 3, lamX10 = 10)
      .orderBy("pick").collect().map(_.getLong(1)).toSeq
    assert(pure === plain)
  }

  test("q137 Pearson core: perfect ±1, zero-variance and singleton guards") {
    import spark.implicits._
    val df = Seq(
      ("up", 1L, 2L), ("up", 2L, 4L), ("up", 3L, 6L),      // y = 2x → +1
      ("down", 1L, 30L), ("down", 2L, 20L), ("down", 3L, 10L), // → −1
      ("flat", 1L, 7L), ("flat", 2L, 7L),                   // var(y) = 0 → null
      ("one", 5L, 5L))                                      // n = 1 → null
      .toDF("source", "x", "y")
    val out = graft.text.Calibrate.groupedPearson(df, "source", col("x"), col("y"))
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    assert(out("up") === Some(1000000L))
    assert(out("down") === Some(-1000000L))
    assert(out("flat") === None && out("one") === None)
  }

  test("q138 preference pairs: argmax/argmin tie-breaks, margin gate, degenerate groups") {
    import spark.implicits._
    val df = Seq(
      ("g1", 1L, 10L), ("g1", 2L, 20L), ("g1", 3L, 30L),  // clean pair 3 vs 1
      ("g2", 4L, 50L), ("g2", 5L, 50L), ("g2", 6L, 10L),  // chosen tie → id 4
      ("g3", 7L, 10L), ("g3", 8L, 12L),                   // margin 2 < 15 → drop
      ("g4", 9L, 40L))                                    // singleton → drop
      .toDF("grp", "id", "sm")
    val out = graft.text.Classify.preferencePairs(df, "id", Seq("grp"),
        col("sm"), minMarginMicro = 15L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(2), r.getLong(3), r.getLong(6))).toMap
    assert(out("g1") === ((3L, 1L, 20L)))
    assert(out("g2") === ((4L, 6L, 40L)), "chosen score ties break to the smaller id")
    assert(out.size === 2, s"g3 (thin margin) and g4 (singleton) must drop: $out")
  }

  test("q139 class weights: n=1 weighs exactly 1.0, weights fall with n, shares sum to ~1") {
    import spark.implicits._
    val df = (Seq.fill(1)(0) ++ Seq.fill(10)(1) ++ Seq.fill(100)(2))
      .zipWithIndex.map { case (l, i) => (i.toLong, l) }.toDF("vec_id", "label")
    val out = graft.text.Classify.classWeights(df, "label", beta = 0.999)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(out(0)._2 === 1000000L, "(1-β)/(1-β^1) is exactly 1")
    assert(out(0)._2 > out(1)._2 && out(1)._2 > out(2)._2,
      "effective-number weights must decrease with class size")
    val shareSum = out.values.map(_._3).sum
    assert(math.abs(shareSum - 1000000L) <= 2L,
      s"shares are a partition of the weight mass, got $shareSum")
  }

  test("q140 chi2: independent table contributes 0; zero cells contribute E; guard trips") {
    import spark.implicits._
    // independent: rows a(4), b(6) × cols en/fr split 50/50 everywhere
    val ind = Seq.fill(2)(("a", "en")) ++ Seq.fill(2)(("a", "fr")) ++
      Seq.fill(3)(("b", "en")) ++ Seq.fill(3)(("b", "fr"))
    val out = graft.text.Calibrate.chiSquare(ind.toDF("source", "lang"),
        "source", "lang")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(6), r.getLong(7))).toMap
    assert(out.size === 4)
    out.foreach { case (k, (_, _, contrib)) =>
      assert(contrib === 0L, s"independent table must contribute 0 at $k")
    }
    // perfectly dependent 2×2: a→en only, b→fr only; the ZERO cells must
    // exist and carry contribution E = 1·2/4... here rows 2,2 cols 2,2 →
    // every cell E=1, contribs (O-1)²/1 = 1 each
    val dep = Seq(("a", "en"), ("a", "en"), ("b", "fr"), ("b", "fr"))
    val d = graft.text.Calibrate.chiSquare(dep.toDF("source", "lang"),
        "source", "lang")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(7))).toMap
    assert(d.size === 4, "the full R×C grid must be emitted, zero cells included")
    assert(d(("a", "fr"))._1 === 0L && d(("a", "fr"))._2 === 1000000L,
      "a zero cell contributes its full E")
    assert(d(("a", "en"))._2 === 1000000L)
    val e = intercept[IllegalArgumentException] {
      graft.text.Calibrate.chiSquare(dep.toDF("source", "lang"),
        "source", "lang", maxCells = 3L)
    }
    assert(e.getMessage.contains("maxCells") || e.getMessage.contains("cells"))
  }

  test("q141 feature hashing: identical texts vectorize identically; mass and parity invariants") {
    val dir = corpusDir(Seq(
      (1L, "alpha beta gamma alpha", "en", "web"),
      (2L, "alpha beta gamma alpha", "en", "web"),   // same bag → same vector
      (3L, "delta", "en", "web")))
    val rows = graft.SparkEntry.queries("q141_feature_hash")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3)))
    val byDoc = rows.groupBy(_._1._1)
    assert(byDoc(1L).map { case ((_, d), v) => d -> v }.toMap ===
      byDoc(2L).map { case ((_, d), v) => d -> v }.toMap)
    // Σ n_terms over dims == token count; |value| ≤ n_terms, same parity
    assert(byDoc(1L).map(_._2._1).sum === 4L)
    rows.foreach { case ((_, _), (n, v)) =>
      assert(math.abs(v) <= n && (n - v) % 2 == 0,
        s"value $v must be a ± partial sum of $n signs")
    }
  }

  test("q142 bigram entropy: deterministic chain scores exactly 0; branching scores ln-exact") {
    val dir = corpusDir(Seq(
      (1L, "a b a b a b", "en", "web"),   // every next token determined → H = 0
      (2L, "a a a b", "en", "web"),       // c(a,a)=2 c(a,b)=1 c_a(a)=3
      (3L, "x", "en", "web")))            // < 2 tokens → no row
    val out = graft.SparkEntry.queries("q142_bigram_entropy")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(1L) === ((5L, 0L)), "a deterministic chain has entropy exactly 0")
    val expected = math.floor(2.0 * (math.log(3.0) - math.log(2.0)) * 1e6 + 0.5).toLong +
      math.floor(1.0 * (math.log(3.0) - math.log(1.0)) * 1e6 + 0.5).toLong
    assert(out(2L) === ((3L, expected)))
    assert(!out.contains(3L), "a 1-token doc has no bigrams")
  }

  test("q143 temperature mixture: α=1 is proportional with boost 1; α<1 boosts the tail") {
    val text9 = Seq.fill(9)("w").mkString(" ")
    val dir = corpusDir(Seq((1L, text9, "en", "big"), (2L, "w", "en", "small")))
    val docs = graft.core.Tables.documents(spark, dir)
    val prop = graft.text.Terms.temperatureMixture(docs, "source", "text", 1.0)
      .collect().map(r => r.getString(0) -> (r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(prop("big") === ((900000L, 900000L, 1000000L)))
    assert(prop("small") === ((100000L, 100000L, 1000000L)))
    val temp = graft.text.Terms.temperatureMixture(docs, "source", "text", 0.5)
      .collect().map(r => r.getString(0) -> (r.getLong(3), r.getLong(4))).toMap
    // α=0.5: w = √p → q(small) = √.1/(√.9+√.1) ≈ 0.25, boost ≈ 2.5
    assert(temp("small")._1 > 100000L && temp("small")._2 > 1000000L,
      s"temperature must upsample the tail source: ${temp("small")}")
    assert(temp("big")._2 < 1000000L, "the head source is downsampled")
  }

  test("q144 KS: matching distributions score 0; disjoint supports score the true D; guard trips") {
    import spark.implicits._
    val same = Seq(("a", 1L), ("a", 2L), ("b", 1L), ("b", 2L)).toDF("source", "v")
    val s = graft.text.Calibrate.ksByGroup(same, "source", "v")
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(s("a") === 0L && s("b") === 0L,
      "a group matching the corpus marginal has D = 0")
    // a={1,1}, b={2,2}: marginal ECDF(1)=.5, group ECDFs 1 and 0 → D=.5
    val disj = Seq(("a", 1L), ("a", 1L), ("b", 2L), ("b", 2L)).toDF("source", "v")
    val d = graft.text.Calibrate.ksByGroup(disj, "source", "v")
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(d("a") === 500000L && d("b") === 500000L)
    val e = intercept[IllegalArgumentException] {
      graft.text.Calibrate.ksByGroup(disj, "source", "v", maxCells = 2L)
    }
    assert(e.getMessage.contains("maxCells") || e.getMessage.contains("grid"))
  }

  test("q145 Moore-Lewis: target-like docs keep, corpus-like drop, values ln-exact") {
    import org.apache.spark.sql.functions.col
    val dir = corpusDir(Seq(
      (1L, "t t", "en", "target"),       // the target-domain sample
      (2L, "t t", "en", "web"),          // looks like the target → keep
      (3L, "g g", "en", "web")))         // general-only vocab → drop
    val docs = graft.core.Tables.documents(spark, dir)
    val out = graft.text.Retrieval.mooreLewisScore(docs, "doc_id", "text",
        col("source") === "target")
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getInt(3))).toMap
    assert(!out.contains(1L), "target docs are the sample, not candidates")
    // model: c_tgt(t)=2 c_all(t)=4; c_tgt(g)=0 c_all(g)=2; T_tgt=2 T_all=6 V=2
    def lr(cT: Long, cA: Long) = math.floor(
      (math.log(cT + 1.0) - math.log(2.0 + 2.0) -
        (math.log(cA + 1.0) - math.log(6.0 + 2.0))) * 1e6 + 0.5).toLong
    assert(out(2L) === ((2 * lr(2, 4), 1)), s"got ${out(2L)}")
    assert(out(3L) === ((2 * lr(0, 2), 0)))
    assert(out(2L)._1 > 0 && out(3L)._1 < 0)
  }

  test("q146 RBO: identical rankings score 1−p^k; disjoint rankings emit 0, not absence") {
    import spark.implicits._
    val a = Seq((0L, 10L, 1), (0L, 11L, 2), (1L, 20L, 1))
      .toDF("query_id", "doc_id", "rank")
    val b = Seq((0L, 10L, 1), (0L, 11L, 2), (1L, 30L, 1))
      .toDF("query_id", "doc_id", "rank")
    val out = graft.text.Retrieval.rboAgreement(a, b, k = 2, p = 0.9)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val wSum = graft.text.Retrieval.rboWeights(2, 0.9).sum
    assert(out(0L) === ((2L, wSum)),
      s"identical prefixes must sum the whole weight table (${out(0L)} vs $wSum)")
    // Σw = 1−p^k up to the per-entry micro snap
    assert(math.abs(wSum - math.floor((1.0 - 0.9 * 0.9) * 1e6 + 0.5).toLong) <= 2)
    assert(out(1L) === ((0L, 0L)), "zero overlap is RBO 0, present in the output")
  }

  test("q147 winsorized mean: exact integer-rank quantiles clamp the tails") {
    import spark.implicits._
    val df = (1L to 10L).map(v => ("g", v)).toDF("source", "v")
    val out = graft.text.Calibrate.winsorizedMean(df, "source",
        org.apache.spark.sql.functions.col("v"), pLo = 10, pHi = 90)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // k_lo = ceil(1.0) = 1 → lo = 1; k_hi = ceil(9.0) = 9 → hi = 9;
    // clamped sum = (1+..+9) + 9 = 54 → floor(5.4 + .5) = 5
    assert(out.toSeq === Seq((10L, 1L, 9L, 5L)))
    // heavier trim: P20/P80 → lo=2 hi=8;
    // sum = 2 + (2+3+..+8) + 8 + 8 = 53 → floor(5.3 + .5) = 5
    val out2 = graft.text.Calibrate.winsorizedMean(df, "source",
        org.apache.spark.sql.functions.col("v"), pLo = 20, pHi = 80)
      .collect().map(r => (r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out2.toSeq === Seq((2L, 8L, 5L)))
  }

  test("q148 diversity: uniform maximizes Shannon; a one-term source pins both indices") {
    val dir = corpusDir(Seq(
      (1L, "a a b", "en", "mixed"),
      (2L, "m m m m", "en", "mill")))
    val out = graft.SparkEntry.queries("q148_source_diversity")(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // mixed: T=3, s1 = floor(2ln2·1e6+.5) = 1386294; H = ln3 − s1/3e6
    val s1 = math.floor(2.0 * math.log(2.0) * 1e6 + 0.5)
    val hExp = math.floor((math.log(3.0) - s1 / 3e6) * 1e6 + 0.5).toLong
    assert(out("mixed") === ((2L, 3L, hExp, 333333L)))
    // a single repeated term: H exactly 0, Simpson exactly 1
    assert(out("mill") === ((1L, 4L, 0L, 1000000L)))
  }

  test("q149 dedup eval: identical in-block pairs recall 1; cross-block truth is excluded") {
    val dup = (0 until 20).map(i => s"tok$i").mkString(" ")
    val other = (100 until 120).map(i => s"zzz$i").mkString(" ")
    val dir = corpusDir(Seq(
      (1L, dup, "en", "a"),
      (2L, dup, "en", "a"),      // identical, same block → the one truth pair
      (3L, dup, "en", "b"),      // identical but OTHER block → not ground truth
      (4L, other, "en", "a")))   // unrelated
    val r = graft.SparkEntry.queries("q149_dedup_recall")(spark, dir).collect().head
    assert(r.getLong(0) === 1L, s"blocked ground truth is the in-block pair only: $r")
    assert(r.getLong(2) === 1L, "identical signatures must survive banding")
    assert(r.getLong(4) === 1000000L, "recall on an identical pair is exactly 1")
    // candidates may include the cross-block identical pair — it is
    // filtered by the block restriction, not verified
    assert(r.getLong(1) >= 1L)
  }

  test("q150 cross perplexity: identical sources are interchangeable, disjoint pay ln(T+V)") {
    val dir = corpusDir(Seq(
      (1L, "x x", "en", "a"),
      (2L, "x x", "en", "b"),    // b is a's clone
      (3L, "z z", "en", "c")))   // c shares nothing
    val out = graft.SparkEntry.queries("q150_cross_perplexity")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(3)).toMap
    assert(out.size === 9, "the full S×S grid must be emitted")
    // self-xent for a: ln(2+2) − floor(2·ln3·1e6+.5)/(2·1e6)
    val s = math.floor(2.0 * math.log(3.0) * 1e6 + 0.5)
    val selfA = math.floor((math.log(4.0) - s / 2e6) * 1e6 + 0.5).toLong
    assert(out(("a", "a")) === selfA)
    // clones are interchangeable in every role
    assert(out(("a", "b")) === selfA && out(("b", "a")) === selfA)
    // zero shared vocabulary: the sum vanishes, xent = ln(T_t + V)
    val disjoint = math.floor(math.log(4.0) * 1e6 + 0.5).toLong
    assert(out(("c", "a")) === disjoint)
    assert(out(("c", "a")) > out(("a", "a")),
      "a foreign model must cost more nats than the home model")
  }

  test("q157 Spearman core: rank-perfect ±1 under nonlinearity, tie midranks, guards") {
    import spark.implicits._
    val df = Seq(
      // y = x³: monotone but NOT linear — Spearman 1, Pearson < 1
      ("up", 1L, 1L), ("up", 2L, 8L), ("up", 3L, 27L), ("up", 4L, 64L),
      ("down", 1L, 64L), ("down", 2L, 27L), ("down", 3L, 8L),
      // ties both sides: midranks x (1.5, 1.5, 3), y (1, 2.5, 2.5) → ρ = 0.5
      ("tied", 1L, 1L), ("tied", 1L, 2L), ("tied", 2L, 2L),
      ("flat", 5L, 1L), ("flat", 5L, 2L)) // zero x-variance → NULL
      .toDF("source", "x", "y")
    val out = graft.text.Calibrate.groupedSpearman(df, "source",
        col("x"), col("y"))
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    assert(out("up") === Some(1000000L))
    assert(out("down") === Some(-1000000L))
    assert(out("tied") === Some(500000L))
    assert(out("flat") === None)
    intercept[IllegalArgumentException] {
      graft.text.Calibrate.groupedSpearman(df, "source", col("x"), col("y"),
        maxHistCells = 3L).collect()
    }
    intercept[IllegalArgumentException] {
      graft.text.Calibrate.groupedSpearman(df, "source", col("x"), col("y"),
        maxGroupRows = 3L).collect()
    }
  }

  test("q156 DP release: deterministic per (seed, cell), seed-sensitive, clamp fires") {
    import spark.implicits._
    val df = Seq(("a", 1), ("a", 2), ("b", 1), ("c", 1), ("d", 1))
      .toDF("g", "v")
    def run(eps: Double, seed: String) =
      graft.text.Eval.dpNoisyCounts(df, Seq("g"), eps, seed)
        .orderBy("g").collect().toSeq
    assert(run(1.0, "dp|") == run(1.0, "dp|"), "re-release must be idempotent")
    assert(run(1.0, "dp|") != run(1.0, "dp2|"), "a new seed is a new draw")
    // near-zero noise: released counts equal the exact histogram
    val exact = run(1e9, "dp|").map(r => r.getString(0) -> r.getAs[Long]("released")).toMap
    assert(exact === Map("a" -> 2L, "b" -> 1L, "c" -> 1L, "d" -> 1L))
    // strong noise: at ε = 0.001 the Laplace scale is 1000, so any cell
    // whose seeded draw lands below ½ goes deeply negative — the
    // non-negativity clamp must fire somewhere while raw noisy_micro
    // stays visibly negative (deterministic for this seed + key set)
    val strong = run(0.001, "dp|")
    assert(strong.exists(_.getAs[Long]("noisy_micro") < 0L),
      s"expected a negative raw draw in $strong")
    assert(strong.forall(_.getAs[Long]("released") >= 0L))
    assert(strong.exists(r => r.getAs[Long]("released") == 0L
      && r.getAs[Long]("noisy_micro") < 0L), "clamp must fire on a negative cell")
  }

  test("q158 ADC: exact ranking when corpus vectors sit on the codebook grid") {
    import spark.implicits._
    import graft.sim.Similarity
    val dims = 4; val m = 2; val ksub = 2; val dsub = 2
    def cent(s: Int, c: Int) = Similarity.pqCentroidVec(s, c, dsub)
    // corpus = all 4 codebook concatenations → per-subspace SSE of each
    // corpus vector is 0, so ADC distance == true squared L2 distance
    val corpus = for (a <- 0 until ksub; b <- 0 until ksub)
      yield ((a * ksub + b).toLong, (cent(0, a) ++ cent(1, b)).toSeq)
    val q = Seq((100L, Seq(0.3, -0.2, 0.8, 0.1)))
    val df = (corpus ++ q).toDF("vec_id", "embedding")
    val out = Similarity.pqAdcTopK(df, "vec_id", "embedding",
        dims, m, ksub, queryPred = col("vec_id") === 100L, k = 4)
      .orderBy("rank").collect()
    assert(out.length == 4 && out.forall(_.getAs[Long]("query_id") == 100L))
    // expected: micro-snapped per-subspace SSE sums, the operator's own
    // decomposition (sequential dots — same fold as the kernel)
    def seqDot(x: Seq[Double], y: Seq[Double]) =
      x.indices.foldLeft(0.0)((acc, i) => acc + x(i) * y(i))
    val qv = q.head._2
    val expected = corpus.map { case (id, v) =>
      val t = (0 until m).map { s =>
        val qs = qv.slice(s * dsub, s * dsub + dsub)
        val cs = v.slice(s * dsub, s * dsub + dsub)
        math.floor(((seqDot(qs, qs) - 2.0 * seqDot(qs, cs)) + seqDot(cs, cs))
          * 1e6 + 0.5).toLong
      }.sum
      id -> t
    }.sortBy { case (id, t) => (t, id) }
    assert(out.map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("adc_micro")))
      .toSeq === expected)
    // ranking must be repartition-invariant
    val again = Similarity.pqAdcTopK(df.repartition(5), "vec_id", "embedding",
        dims, m, ksub, queryPred = col("vec_id") === 100L, k = 4)
      .orderBy("rank").collect()
    assert(out.map(_.toSeq).toSeq === again.map(_.toSeq).toSeq)
  }

  test("q161 Gini core: uniform frequencies → 0, hand-checked concentration") {
    import spark.implicits._
    val df = Seq(
      ("u", "a b a b"),   // counts (2, 2): perfectly uniform → 0
      ("k", "x y y y"))   // counts (1, 3): G = 2/(2·4) = 0.25
      .toDF("source", "text")
    val out = graft.text.CorpusStats.giniTokenMass(df, "source", "text")
      .collect().map(r => r.getString(0) -> r.getAs[Long]("gini_micro")).toMap
    assert(out("u") == 0L)
    assert(out("k") == 250000L)
  }

  test("q162 burstiness core: absent (term, bin) cells count as zero") {
    import spark.implicits._
    // t lives only in s1, u only in s2: with the zero cells each has
    // Fano = (2·16 − 16)/(2·4) = 2; omitting the zero cell gives 0 —
    // exactly the variance-understatement the grid expand prevents
    val df = Seq(("s1", "t t t t"), ("s2", "u u u u")).toDF("source", "text")
    val out = graft.text.CorpusStats.tokenBurstiness(df, "source", "text",
        topK = 5)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("fano_micro")).toMap
    assert(out("t") == 2000000L && out("u") == 2000000L)
  }

  test("q163 Zipf core: exact −1 slope on a constructed 2-point curve") {
    import spark.implicits._
    // counts (4, 2) at ranks (1, 2): snapped points make the slope
    // EXACTLY −1 (ln4 = 2·ln2 survives the micro snap additively)
    val df = Seq(("s", "a a a a b b")).toDF("source", "text")
    val out = graft.text.CorpusStats.zipfSlope(df, "text", topN = 10).head()
    assert(out.getAs[Long]("n") == 2L)
    assert(out.getAs[Long]("slope_micro") == -1000000L)
    // degenerate: a single point has no slope
    val one = graft.text.CorpusStats.zipfSlope(
      Seq(("s", "only only")).toDF("source", "text"), "text", 10).head()
    assert(one.isNullAt(one.fieldIndex("slope_micro")))
  }

  test("q164 conformal core: exact p-values, grid and calibration guards") {
    import spark.implicits._
    val df = (Seq((1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L), (5L, 50L)) ++
      Seq((6L, 5L), (7L, 25L), (8L, 50L), (9L, 99L)))
      .toDF("doc_id", "sc")
    val out = graft.text.Calibrate.conformalPValues(df, "doc_id",
        col("doc_id") <= 5, col("sc"))
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("p_micro")).toMap
    assert(out.keySet == Set(6L, 7L, 8L, 9L))
    assert(out(6L) == 166667L)   // (1+0)/6
    assert(out(7L) == 500000L)   // (1+2)/6
    assert(out(8L) == 1000000L)  // ≥ all five calibration scores
    assert(out(9L) == 1000000L)
    intercept[IllegalArgumentException] { // score off the grid fails loudly
      graft.text.Calibrate.conformalPValues(
        df.withColumn("sc", col("sc") + 10), "doc_id",
        col("doc_id") <= 5, col("sc"))
    }
    intercept[IllegalArgumentException] { // empty calibration set
      graft.text.Calibrate.conformalPValues(df, "doc_id",
        lit(false), col("sc"))
    }
  }

  test("q171 bucket core: zero gap, power-of-two edges, sub-second floor") {
    import spark.implicits._
    import org.apache.spark.sql.functions.timestamp_micros
    val dir = java.nio.file.Files.createTempDirectory("graft-ev").toString
    // one user; gaps between consecutive events: 0s, 1s, 2s, 3s, 8s, 0.4s
    val tsu = Seq(0L, 0L, 1000000L, 3000000L, 6000000L, 14000000L, 14400000L)
    tsu.zipWithIndex.map { case (t, i) =>
      (i.toLong, t, 1L, "e", 1.0, "{}") }
      .toDF("event_id", "tsu", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros(col("tsu"))).drop("tsu")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = graft.SparkEntry.queries("q171_interarrival_hist")(spark, dir)
      .collect().map(r => r.getAs[Long]("bucket") -> r.getAs[Long]("n")).toMap
    // gaps 0 and 0.4s (floored to 0) → bucket 0 (n=2); 1s → 1; 2s,3s → 2; 8s → 4
    assert(out === Map(0L -> 2L, 1L -> 1L, 2L -> 2L, 4L -> 1L))
  }

  test("q172 QL core: zero-overlap docs still score (length term only)") {
    import spark.implicits._
    // query doc 0 shares terms with doc 1 only; doc 2 is disjoint vocab
    // — with k covering the corpus, the disjoint doc must appear via
    // the grid's length term (coalesce(present, 0)), ranked below the
    // overlapping doc, and a LONGER disjoint doc must rank below a
    // shorter one (the dl term is the only discriminator)
    val docs = Seq(
      (0L, "a a b"), (1L, "a b b"), (2L, "z z z"), (3L, "z z z z z z"))
      .toDF("doc_id", "text")
    val out = graft.text.Retrieval.qlDirichletTopK(docs, "doc_id", "text",
        queryPred = col("doc_id") === 0L, mu = 10.0, k = 4)
      .orderBy("rank").collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSeq == Seq(1L, 2L, 3L),
      "overlap first, then disjoint docs by ascending length")
    // hand-check doc 2's score: qconst(q={a:2,b:1}) − 3·ln(3+10)
    val T = 15.0 // total tokens
    def snap(x: Double) = math.floor(x * 1e6 + 0.5).toLong
    val qconst = snap(2.0 * math.log(10.0 * 3.0 / T)) +
      snap(1.0 * math.log(10.0 * 3.0 / T))
    val expected2 = qconst - snap(3.0 * math.log(3.0 + 10.0))
    assert(out(1).getAs[Long]("score_micro") == expected2)
  }

  test("q165 Welch core: hand-checked t, degenerate variances NULL") {
    import spark.implicits._
    val df = Seq(("g", 10L), ("g", 20L), ("h", 30L), ("h", 40L))
      .toDF("source", "v")
    val out = graft.text.Calibrate.welchTTest(df, "source", col("v"))
      .collect().map(r => r.getString(0) -> r).toMap
    // g vs h: (15−35)/√(50/2 + 50/2) = −2.8284271…
    assert(out("g").getAs[Long]("t_micro") == -2828427L)
    assert(out("h").getAs[Long]("t_micro") == 2828427L)
    assert(out("g").getAs[Long]("mean_group_micro") == 150000L)
    // both sides constant → se = 0 → NULL
    val flat = Seq(("z", 5L), ("z", 5L), ("w", 5L), ("w", 5L))
      .toDF("source", "v")
    val f = graft.text.Calibrate.welchTTest(flat, "source", col("v"))
      .collect()
    assert(f.forall(r => r.isNullAt(r.fieldIndex("t_micro"))))
    // singleton group → NULL (n < 2 guard)
    val single = Seq(("s", 1L), ("r", 2L), ("r", 9L), ("r", 4L))
      .toDF("source", "v")
    val sOut = graft.text.Calibrate.welchTTest(single, "source", col("v"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(sOut("s").isNullAt(sOut("s").fieldIndex("t_micro")))
  }

  test("q166 Mann-Whitney core: separation U = 0, all-ties degenerate NULL") {
    import spark.implicits._
    val df = Seq(("g", 1L), ("g", 2L), ("h", 3L), ("h", 4L))
      .toDF("source", "v")
    val out = graft.text.Calibrate.mannWhitney(df, "source", col("v"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("g").getAs[Long]("u2") == 0L) // complete separation
    assert(out("h").getAs[Long]("u2") == 8L) // doubled U = 2·n1·n2 − 0
    // z = ±4/√(20/3) = ±1.5491933…
    assert(out("g").getAs[Long]("z_micro") == -1549193L)
    assert(out("h").getAs[Long]("z_micro") == 1549193L)
    // every value tied: U = n1·n2/2 exactly, variance collapses → NULL z
    val ties = Seq(("g", 1L), ("g", 1L), ("h", 1L), ("h", 1L))
      .toDF("source", "v")
    val t = graft.text.Calibrate.mannWhitney(ties, "source", col("v"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(t("g").getAs[Long]("u2") == 4L) // doubled n1·n2/2
    assert(t("g").isNullAt(t("g").fieldIndex("z_micro")))
  }

  test("q167 BH core: textbook rejection set, none-qualify sentinel") {
    import spark.implicits._
    // m = 4, α = 0.25·1e6: p = (10'000, 100'000, 200'000, 900'000)
    // BH: p(2) = 1e5 ≤ 0.25·2/4 = 125'000 ✓, p(3) = 2e5 ≤ 187'500 ✗
    val df = Seq((1L, 10000L), (2L, 100000L), (3L, 200000L), (4L, 900000L))
      .toDF("id", "p")
    val out = graft.text.Calibrate.bhReject(df, "id", col("p"),
        alphaMicro = 250000L)
      .collect().map(r => r.getAs[Long]("id") -> r).toMap
    assert(out(1L).getAs[Boolean]("rejected") && out(2L).getAs[Boolean]("rejected"))
    assert(!out(3L).getAs[Boolean]("rejected") && !out(4L).getAs[Boolean]("rejected"))
    assert(out(1L).getAs[Long]("threshold_p_micro") == 100000L)
    assert(out(1L).getAs[Long]("n_rejected") == 2L)
    // nothing qualifies → sentinel threshold −1, zero rejections
    val none = Seq((1L, 800000L), (2L, 900000L)).toDF("id", "p")
    val n = graft.text.Calibrate.bhReject(none, "id", col("p"),
      alphaMicro = 100000L).collect()
    assert(n.forall(r => !r.getAs[Boolean]("rejected")
      && r.getAs[Long]("threshold_p_micro") == -1L
      && r.getAs[Long]("n_rejected") == 0L))
  }
}
