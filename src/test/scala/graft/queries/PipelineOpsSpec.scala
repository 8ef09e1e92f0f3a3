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

  test("q176 PSI core: whole-corpus group scores exactly 0, a shifted group reads as drift") {
    import spark.implicits._
    // a group that IS the corpus has p ≡ q even after add-one smoothing
    // — every (p − q)·ln(p/q) term is exactly 0
    val whole = Seq(("A", 1L), ("A", 1L), ("A", 9L)).toDF("grp", "v")
    val out = graft.text.Calibrate.psiByGroup(whole, "grp", col("v"))
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(out === Map("A" -> 0L))
    // proportionally identical SUBgroups are near-zero but not exactly 0:
    // add-one smoothing divides by n_g + B vs N + B (documented behavior)
    val same = Seq(("A", 1L), ("A", 1L), ("A", 9L), ("B", 1L), ("B", 1L), ("B", 9L))
      .toDF("grp", "v")
    val out1 = graft.text.Calibrate.psiByGroup(same, "grp", col("v"))
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(out1.values.forall(p => p >= 0L && p < 10000L),
      s"matching subgroups must read clearly stable, got $out1")
    // concentrate group C in one bucket the rest of the corpus avoids —
    // PSI must be strictly positive for BOTH sides of the shift
    val shifted = Seq(("A", 1L), ("A", 1L), ("A", 9L), ("C", 900L), ("C", 901L),
      ("C", 902L)).toDF("grp", "v")
    val out2 = graft.text.Calibrate.psiByGroup(shifted, "grp", col("v"))
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(out2("C") > 100000L && out2("A") > 100000L,
      s"a total bucket shift must read as major drift, got $out2")
  }

  test("q177 margin calibration: symmetric tie lands in bucket 0 at 50% accuracy") {
    import spark.implicits._
    // perfectly symmetric labels: both docs score identically under A
    // and B → margin 0 (bucket 0); the tie-break picks the larger label
    // for both, so exactly one of the two is correct
    val docs = Seq((1L, "x x", "A"), (2L, "x x", "B")).toDF("doc_id", "text", "lang")
    val out = graft.text.Classify.nbMarginCalibration(docs, "doc_id", "text", "lang")
      .collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getLong(0) === 0L && r.getLong(1) === 2L && r.getLong(2) === 1L &&
      r.getLong(3) === 500000L)
    // separable labels: wide positive margins, all correct
    val sep = Seq((1L, "cat cat cat", "A"), (2L, "cat cat", "A"),
      (3L, "dog dog dog", "B"), (4L, "dog dog", "B")).toDF("doc_id", "text", "lang")
    val out2 = graft.text.Classify.nbMarginCalibration(sep, "doc_id", "text", "lang")
      .collect()
    assert(out2.forall(r => r.getLong(0) > 0L && r.getLong(1) === r.getLong(2)),
      "separable vocab must give nonzero margins and perfect accuracy")
    assert(out2.map(_.getLong(1)).sum === 4L, "buckets partition the docs")
  }

  test("q178 MMD: planted centroids give the exact euclidean distance") {
    import spark.implicits._
    // label 0 at (0,0), label 1 at (3,4) — dist_micro must be exactly
    // 5e6; label 2 duplicates label 0 so its pair with 0 scores 0
    val rows = Seq(
      (1L, Array(0f, 0f), 0), (2L, Array(0f, 0f), 0),
      (3L, Array(3f, 4f), 1), (4L, Array(3f, 4f), 1),
      (5L, Array(0f, 0f), 2))
    val dir = java.nio.file.Files.createTempDirectory("graft-mmd").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = graft.SparkEntry.queries("q178_mmd_matrix")(spark, dir)
      .collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(3)).toMap
    assert(out((0, 1)) === 5000000L)
    assert(out((0, 2)) === 0L)
    assert(out((1, 2)) === 5000000L)
  }

  test("q179 silhouette: a vector ON its centroid scores the full 1e6") {
    import spark.implicits._
    // vectors exactly on centroid directions: cos to own centroid = 1
    // (a = 0) ⇒ s = (b − 0)/b = 1e6 regardless of b
    val c0 = graft.sim.Similarity.centroidVec(0, 4).map(_.toFloat)
    val c1 = graft.sim.Similarity.centroidVec(1, 4).map(_.toFloat)
    val df = Seq((1L, c0), (2L, c1)).toDF("vec_id", "embedding")
    val out = graft.sim.Similarity.silhouetteByCell(df, "vec_id", "embedding",
        dims = 4, centroids = 3)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out === Map(0 -> ((1L, 1000000L)), 1 -> ((1L, 1000000L))))
  }

  test("q180 KM core: hand-checked risk sets, censoring, and the d=n sentinel") {
    import spark.implicits._
    val day = 86400L
    def ts(d: Long, h: Long) = new java.sql.Timestamp((d * day + h * 3600) * 1000)
    // A converts day 0, B converts day 2, C censored at day 1
    val ev = Seq(
      (1L, ts(0, 9), "view"), (1L, ts(0, 10), "purchase"),
      (2L, ts(0, 9), "view"), (2L, ts(2, 9), "purchase"),
      (3L, ts(0, 9), "view"), (3L, ts(1, 9), "view"))
      .toDF("user_id", "ts", "event_type")
    val out = graft.ops.Survival.kaplanMeier(ev, "user_id", "ts",
        col("event_type") === "purchase")
      .orderBy("dur_days").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    def snap(x: Double) = math.floor(x * 1e6 + 0.5).toLong
    val t0 = snap(math.log(2.0 / 3.0))
    assert(out(0) === ((0L, 3L, 1L, 0L, t0)))
    assert(out(1) === ((1L, 2L, 0L, 1L, t0)),
      "a censor-only day holds the curve and shrinks the risk set")
    assert(out(2) === ((2L, 1L, 1L, 0L, t0 - 1000000000000000L)),
      "exhausting the risk set pins the -1e15 sentinel (S = 0)")
  }

  test("q181 Hill core: hand frequencies give the exact estimator") {
    import spark.implicits._
    // freqs a:8 b:4 c:2 d:1; k=2 → head = {8,4,2}, f_tail = 2
    val docs = Seq((1L, ("a " * 8 + "b " * 4 + "c c d").trim))
      .toDF("doc_id", "text")
    val r = graft.text.CorpusStats.hillTailIndex(docs, "text", k = 2)
      .collect().head
    def snap(x: Double) = math.floor(x * 1e6 + 0.5).toLong
    val h = math.floor((snap(math.log(4.0)) + snap(math.log(2.0))
      + 0.0).toDouble / 2.0 + 0.5).toLong
    assert(r.getLong(0) === 2L && r.getLong(1) === 2L)
    assert(r.getLong(2) === h)
    assert(r.getLong(3) === math.floor(1e12 / h + 0.5).toLong)
  }

  test("q182 RFM core: hand-checked quintiles with a monetary tie") {
    import spark.implicits._
    val day = 86400L
    def ts(d: Long) = new java.sql.Timestamp(d * day * 1000)
    val ev = Seq(
      (1L, ts(9), "purchase", 10.0), (2L, ts(5), "purchase", 5.0),
      (2L, ts(4), "purchase", 5.0), (3L, ts(1), "view", 0.0))
      .toDF("user_id", "ts", "event_type", "value")
    val dir = java.nio.file.Files.createTempDirectory("graft-rfm").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = graft.SparkEntry.queries("q182_rfm_segments")(spark, dir)
      .collect().map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("rec_days"), r.getAs[Long]("freq"),
          r.getAs[Long]("mon_centi"), r.getAs[String]("segment")))).toMap
    // n=3: pct steps 333333/666667/1000000 → ceil5 = 2/4/5
    assert(out(1L) === ((0L, 1L, 1000L, "445")))
    assert(out(2L) === ((4L, 2L, 1000L, "255")),
      "monetary tie: both 10-unit users share cum=3 → m=5")
    assert(out(3L) === ((8L, 0L, 0L, "122")))
  }

  test("q183 dHash core: one-char edits stay near, unrelated texts go far") {
    import graft.multimodal.{Bmp, Multimodal}
    val rnd = new scala.util.Random(7)
    val base = (0 until 600).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val edited = base.updated(300, if (base(300) == 'q') 'r' else 'q')
    val other = (0 until 600).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    def h(t: String) = Bmp.dHash(Multimodal.texturedBmpFixture(t))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(h(base) === h(base), "deterministic")
    assert(ham(h(base), h(edited)) <= 10,
      s"a one-char edit touches ~2 of 72 sampled windows, " +
        s"got ${ham(h(base), h(edited))}")
    assert(ham(h(base), h(other)) > 16,
      s"unrelated texts avalanche apart, got ${ham(h(base), h(other))}")
    // identical texts pair through the banding engine end to end
    import spark.implicits._
    val docs = Seq((1L, base), (2L, base), (3L, other)).toDF("doc_id", "text")
    val media = Multimodal.texturedImageFixtures(spark, docs).toDF()
    val pairs = graft.text.NearDup.hammingPairs(
        Multimodal.imageDHashes(spark, media),
        "doc_id", "dhash", bits = 64, bands = 8, maxHamming = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq === Seq((1L, 2L)))
  }

  test("q184 audio fingerprint: edit locality, avalanche, banded pairing") {
    import graft.multimodal.{Multimodal, Wav}
    val rnd = new scala.util.Random(11)
    val base = (0 until 600).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val edited = base.updated(300, if (base(300) == 'q') 'r' else 'q')
    val other = (0 until 600).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    def h(t: String): Long = {
      val e = Wav.frameAbsSums(Multimodal.texturedWavFixture(t), 64)
      assert(e.length === 65, "fixture is 65 constant frames")
      (0 until 64).foldLeft(0L)((acc, f) =>
        if (e(f + 1) > e(f)) acc | (1L << f) else acc)
    }
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(h(base), h(edited)) <= 10,
      s"one-char edit touches ~2 of 65 windows, got ${ham(h(base), h(edited))}")
    assert(ham(h(base), h(other)) > 16,
      s"unrelated texts avalanche apart, got ${ham(h(base), h(other))}")
    import spark.implicits._
    val docs = Seq((1L, base), (2L, base), (3L, other)).toDF("doc_id", "text")
    val media = Multimodal.texturedAudioFixtures(spark, docs).toDF()
    val pairs = graft.text.NearDup.hammingPairs(
        Multimodal.audioEnergyHashes(spark, media),
        "doc_id", "ahash", bits = 64, bands = 8, maxHamming = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq === Seq((1L, 2L)))
  }

  test("q185 recall curve: monotone in nprobe, exact at full probe budget") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val vecs = (0L until 60L).map(i =>
      (i, Array.fill(8)(rnd.nextFloat() * 2f - 1f)))
    val df = vecs.toDF("vec_id", "embedding")
    val out = graft.sim.Similarity.ivfRecallCurve(df, "vec_id", "embedding",
        dims = 8, centroids = 4, nprobes = Seq(1, 2, 4), k = 3,
        queryPred = col("vec_id") % 10 === 0)
      .orderBy("nprobe").collect()
      .map(r => r.getInt(0) -> r.getLong(4))
    assert(out.map(_._1).toSeq === Seq(1, 2, 4))
    assert(out.map(_._2).toSeq === out.map(_._2).toSeq.sorted,
      "recall must not decrease with probe budget")
    assert(out.last._2 === 1000000L,
      "probing every cell IS the brute-force scan — recall exactly 1")
  }

  test("q186 regularity: a metronome user flags, a bursty one does not") {
    import spark.implicits._
    def ts(s: Long) = new java.sql.Timestamp(s * 1000)
    // user 1: exact 60 s cadence (CV² = 0); user 2: gaps 1s/1s/1s/597s
    val ev = ((1 to 6).map(i => (100L + i, ts(i * 60L), 1L, "view", 0.0, "{}")) ++
      Seq((201L, ts(1), 2L, "view", 0.0, "{}"), (202L, ts(2), 2L, "view", 0.0, "{}"),
        (203L, ts(3), 2L, "view", 0.0, "{}"), (204L, ts(4), 2L, "view", 0.0, "{}"),
        (205L, ts(601), 2L, "view", 0.0, "{}")))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = java.nio.file.Files.createTempDirectory("graft-bot").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = graft.SparkEntry.queries("q186_bot_regularity")(spark, dir)
      .collect().map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("cv2_micro"), r.getAs[Int]("is_regular")))).toMap
    assert(out(1L) === ((0L, 1)), "constant cadence is CV² = 0 → flagged")
    // user 2: n=4, gaps (1,1,1,597): S=600, Σg²=356412; CV² = (4·356412−360000)/360000
    val cv2 = math.floor((4L * 356412L - 360000L).toDouble * 1e6 / 360000.0 + 0.5).toLong
    assert(out(2L) === ((cv2, 0)), s"bursty user must not flag (cv2=$cv2)")
  }

  test("q187 label noise: the planted mislabel surfaces, clean docs stay out") {
    import spark.implicits._
    // separable vocab; doc 5 is a "cat" document mislabeled B
    val docs = Seq(
      (1L, "cat cat cat", "A"), (2L, "cat cat", "A"), (3L, "cat", "A"),
      (4L, "dog dog dog", "B"), (5L, "cat cat cat cat", "B"),
      (6L, "dog dog", "B")).toDF("doc_id", "text", "lang")
    val out = graft.text.Classify.labelNoiseCandidates(docs, "doc_id", "text",
        "lang", minMarginMicro = 1L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(out.toSeq === Seq((5L, "B", "A")),
      s"exactly the planted mislabel, got ${out.toSeq}")
  }

  test("q188 k-core: K4 survives 3-core peeling, pendants die") {
    import spark.implicits._
    // K4 on {1,2,3,4} (every degree 3) + pendant 5—1
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (1L, 5L)).toDF("a", "b")
    val out = graft.graph.KCore.peel(edges, "a", "b", k = 3, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L),
      "the 3-core is exactly K4 with interior degrees")
  }

  test("q188 k-core: cascading peels run every budgeted round; fixpoint early exit is result-neutral") {
    import spark.implicits._
    // path 1-2-3-4-5 into a triangle {5,6,7}: at k=2 the path peels ONE
    // node per round (a true cascade — the r19 fixpoint early exit must
    // not fire while edges are still dropping)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
      (6L, 7L), (5L, 7L)).toDF("a", "b")
    val r3 = graft.graph.KCore.peel(edges, "a", "b", k = 2, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r3 === Map(4L -> 1L, 5L -> 3L, 6L -> 2L, 7L -> 2L),
      s"after exactly 3 peels nodes 1..3 are gone and 4 still hangs on, got $r3")
    // past the fixpoint (round 4 drops node 4, round 5 changes nothing):
    // any larger budget must return the identical converged core — the
    // early exit makes rounds 5+ free, never different
    val r5 = graft.graph.KCore.peel(edges, "a", "b", k = 2, rounds = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val r9 = graft.graph.KCore.peel(edges, "a", "b", k = 2, rounds = 9)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r5 === Map(5L -> 2L, 6L -> 2L, 7L -> 2L), s"converged 2-core is the triangle, got $r5")
    assert(r9 === r5, "budgets past the fixpoint are result-identical")
  }

  test("q189 Neyman: zero-variance strata get nothing; remainders sum exactly") {
    import spark.implicits._
    val a = Seq(("A", 5L), ("A", 5L), ("B", 0L), ("B", 10L)).toDF("s", "x")
    val out = graft.text.Terms.neymanAllocation(a, "s", col("x"), budget = 7L)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(out === Map("A" -> 0L, "B" -> 7L),
      "a constant stratum carries no sampling information")
    // three identical strata, budget 10: base 3 each, equal remainders —
    // the tie rule hands the extra draw to the lexicographically first
    val b = Seq(("a", 1L), ("a", 3L), ("b", 1L), ("b", 3L), ("c", 1L),
      ("c", 3L)).toDF("s", "x")
    val out2 = graft.text.Terms.neymanAllocation(b, "s", col("x"), budget = 10L)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(out2 === Map("a" -> 4L, "b" -> 3L, "c" -> 3L))
    assert(out2.values.sum === 10L, "apportionment must sum to the budget")
  }

  test("q190 prefix join: fuzz equals the quadratic truth — no false negatives") {
    import spark.implicits._
    val rnd = new scala.util.Random(19)
    val vocab = (0 until 12).map(i => s"w$i")
    // near-dup structure: half the docs are light edits of a template
    val template = (0 until 20).map(_ => vocab(rnd.nextInt(vocab.size)))
    val docs = (0L until 40L).map { i =>
      val toks =
        if (i % 2 == 0) template.map(t =>
          if (rnd.nextInt(10) == 0) vocab(rnd.nextInt(vocab.size)) else t)
        else (0 until 5 + rnd.nextInt(25)).map(_ => vocab(rnd.nextInt(vocab.size)))
      (i, toks.mkString(" "))
    }
    val df = docs.toDF("doc_id", "text")
    val got = graft.text.NearDup.prefixJaccardPairs(df, "doc_id", "text",
        n = 3, minJaccard = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // quadratic ground truth on exact shingle STRING sets
    def sh(t: String): Set[String] =
      t.split(" ").filter(_.nonEmpty).sliding(3).filter(_.size == 3)
        .map(_.mkString(" ")).toSet
    val sets = docs.map { case (i, t) => i -> sh(t) }.toMap
    val truth = (for {
      a <- docs.map(_._1); b <- docs.map(_._1) if a < b
      sa = sets(a); sb = sets(b)
      if sa.nonEmpty && sb.nonEmpty
      c = (sa intersect sb).size
      j = BigDecimal(c.toDouble / (sa.size + sb.size - c))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      if j >= 0.5
    } yield (a, b) -> j).toMap
    assert(got === truth,
      s"prefix filter must be lossless: missing ${truth.keySet -- got.keySet}, " +
        s"extra ${got.keySet -- truth.keySet}")
    assert(truth.nonEmpty, "fixture must actually produce qualifying pairs")
  }

  test("q191 Heaps: all-new tokens fit beta=1 exactly, a frozen vocab fits 0") {
    import spark.implicits._
    // every token corpus-unique → V(T) = T at every checkpoint → the
    // log-log points are y = x and the LS slope is exactly 1e6
    val fresh = (0L until 20L).map(i =>
      (i, (0 until 5).map(j => s"u${i}_$j").mkString(" "), "new"))
    // frozen vocabulary → V constant → slope exactly 0
    val frozen = (100L until 120L).map(i => (i, "a b c d e", "old"))
    val df = (fresh ++ frozen).toDF("doc_id", "text", "source")
    val out = graft.text.CorpusStats.heapsExponent(df, "source", "doc_id", "text")
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(out("new") === 1000000L, s"all-new tokens must fit beta=1, got $out")
    assert(out("old") === 0L, s"a frozen vocabulary must fit beta=0, got $out")
  }

  test("q192 compression: repetitive < natural < random, deterministic") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val rep = "ab" * 300
    val nat = ("the quick brown fox jumps over the lazy dog and then " * 12).take(600)
    val random = (0 until 600).map(_ => (33 + rnd.nextInt(90)).toChar).mkString
    val df = Seq((1L, rep), (2L, nat), (3L, random)).toDF("doc_id", "text")
    val out = graft.text.TextOps.compressionStats(spark, df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out(1L) < out(2L) && out(2L) < out(3L),
      s"ratio must order repetitive < natural < random, got $out")
    assert(out(3L) > 800000L, "near-random text must be near-incompressible")
    val out2 = graft.text.TextOps.compressionStats(spark, df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out === out2, "deterministic re-run")
  }

  test("q192 deflate matches Python-zlib golden byte counts (independent oracle)") {
    import spark.implicits._
    // goldens precomputed with CPython zlib.compressobj(6, DEFLATED, -15)
    // — an independent RFC 1951 implementation; same role as
    // tools/check.py's extras arm, but runnable inside sbt test with no
    // driver in the loop. (text, n_raw, n_deflate):
    val golden = Seq(
      ("", 0L, 2L),
      ("a", 1L, 3L),
      ("ab" * 300, 600L, 10L),
      ("the quick brown fox jumps over the lazy dog 0123456789", 54L, 55L),
      ("hello world\nhello world\n" * 7, 168L, 17L),
      ("élève naïve 世界 😀", 26L, 28L))
    val df = golden.zipWithIndex
      .map { case ((t, _, _), i) => (i.toLong, t) }.toDF("doc_id", "text")
    val out = graft.text.TextOps.compressionStats(spark, df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    golden.zipWithIndex.foreach { case ((t, nRaw, nDef), i) =>
      assert(out(i.toLong) === ((nRaw, nDef)),
        s"deflate mismatch vs zlib golden for ${t.take(20)}")
    }
  }

  test("q192 signal face: n_raw/text_md5 match column-function truth; null-safe") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq((1L, "hello world"), (2L, ""), (3L, "élève 世界"))
      .toDF("doc_id", "text")
      .union(Seq((4L, null.asInstanceOf[String])).toDF("doc_id", "text"))
    val sig = graft.text.TextOps.compressionSignal(spark, df, "doc_id", "text")
    // the signal's byte count and digest are computed in-map on the SAME
    // bytes the deflater consumed; pin them against Spark's independent
    // column implementations (null → '' mirrors the oracle's coalesce)
    val truth = df.select(col("doc_id"),
      octet_length(coalesce(col("text"), lit(""))).cast("long").as("n_raw"),
      md5(coalesce(col("text"), lit("")).cast("binary")).as("text_md5"))
    assert(sig.exceptAll(truth).isEmpty && truth.exceptAll(sig).isEmpty)
  }

  test("q193 LOO valuation: removing the noisy source raises accuracy; " +
      "exclusive-vocab docs drop from that model's eval") {
    import spark.implicits._
    val clean = Seq(
      (1L, "cat cat cat", "A", "good"), (2L, "cat cat", "A", "good"),
      (3L, "dog dog dog", "B", "good"), (4L, "dog dog", "B", "good"),
      (5L, "cat cat cat cat", "A", "good2"), (6L, "dog dog dog dog", "B", "good2"))
    // 'noisy' floods label B with ENOUGH cat-vocabulary to flip the
    // full model's cat verdict to B (a balanced poisoning only MOVES
    // errors — accuracy needs the poisoned mass to dominate)
    val noisy = (7L to 9L).map(i => (i, ("cat " * 10).trim, "B", "noisy"))
    // 'island' owns its entire vocabulary — its doc is unscoreable
    // under the model trained without it
    val island = Seq((0L, "zzz zzz zzz", "A", "island"))
    val df = (clean ++ noisy ++ island).toDF("doc_id", "text", "lang", "source")
    // eval on the TRUSTED slice only (the valuation protocol: never let
    // the suspect data grade itself)
    val out = graft.text.Classify.looSourceValuation(df, "doc_id", "text",
        "lang", "source", evalPred = col("doc_id") <= 6)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(4), r.getLong(5)))).toMap
    assert(out("noisy")._2 === 1000000L && out("noisy")._3 > 0L,
      s"holding out the label-noise source must raise accuracy, got $out")
    // island's doc is OOV under LOO(island) → dropped from its scoring
    assert(out("island")._1 === 6L,
      s"exclusive-vocab docs must drop from the held-out model's eval, got $out")
    assert(out("good")._1 === 7L, "other models score every trusted doc")
  }

  test("q217 sampled LOO: k covering the slice equals the exact face; " +
      "a small k bounds n_eval at the per-label sample (VERDICT r13 #3)") {
    import spark.implicits._
    val clean = Seq(
      (1L, "cat cat cat", "A", "good"), (2L, "cat cat", "A", "good"),
      (3L, "dog dog dog", "B", "good"), (4L, "dog dog", "B", "good"),
      (5L, "cat cat cat cat", "A", "good2"), (6L, "dog dog dog dog", "B", "good2"))
    val noisy = (7L to 9L).map(i => (i, ("cat " * 10).trim, "B", "noisy"))
    val df = (clean ++ noisy).toDF("doc_id", "text", "lang", "source")
    val evalPred = col("doc_id") <= 6
    val exact = graft.text.Classify.looSourceValuation(df, "doc_id", "text",
      "lang", "source", evalPred)
    // k >= per-label candidate count → the sample IS the slice: the
    // sampled face must be row-identical to the exact face
    val full = graft.text.Classify.looSourceValuationSampled(df, "doc_id",
      "text", "lang", "source", evalPred, perLabelK = 10)
    assert(full.exceptAll(exact).isEmpty && exact.exceptAll(full).isEmpty,
      "a sample covering the slice must reproduce the exact valuation")
    // k=1 → one eval doc per label (2 labels): n_eval = 2, and every
    // non-exclusive model scores exactly those docs; model scores for
    // sampled docs are the exact face's (only the denominator changes)
    val s1 = graft.text.Classify.looSourceValuationSampled(df, "doc_id",
      "text", "lang", "source", evalPred, perLabelK = 1)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(s1.values.forall(_._2 === 2L), s"n_eval must be L*k = 2: $s1")
    assert(s1("good")._1 === 2L, s"each model scores the sampled docs: $s1")
  }

  test("q194 confusion: hand cells with exact row/column shares") {
    val dir = corpusDir(Seq(
      (1L, "the and of it", "en", "w"),   // correctly-labeled English
      (2L, "the and of them", "de", "w"), // mislabeled — predicts en
      (3L, "der die und das", "de", "w")))
    val out = graft.SparkEntry.queries("q194_langid_confusion")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // key = (label, pred); columns: n, row_share, col_share
    assert(out(("en", "en")) === ((1L, 1000000L, 500000L)))
    assert(out(("de", "en")) === ((1L, 500000L, 500000L)),
      "the mislabeled doc splits en's column and de's row")
    assert(out(("de", "de")) === ((1L, 500000L, 1000000L)))
  }

  test("q195 Theil-Sen: the median slope shrugs off one outlier") {
    import spark.implicits._
    def ts(h: Long) = new java.sql.Timestamp(h * 3600 * 1000)
    val ev = Seq(
      (1L, ts(0), 7L, "view", 0.10, "{}"), (2L, ts(1), 7L, "view", 0.20, "{}"),
      (3L, ts(2), 7L, "view", 0.30, "{}"), (4L, ts(3), 7L, "view", 0.40, "{}"),
      (5L, ts(4), 7L, "view", 50.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = java.nio.file.Files.createTempDirectory("graft-ts").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = graft.SparkEntry.queries("q195_theilsen_trend")(spark, dir)
      .collect()
    assert(out.length === 1)
    // clean pairs (6 of 10) all slope exactly 10 centi/hour = 1e7 micro;
    // the median rank 5 lands inside them — the outlier's 4 pairs don't move it
    assert(out.head.getAs[Long]("n_pairs") === 10L)
    assert(out.head.getAs[Long]("ts_slope_micro") === 10000000L)
  }

  test("q196 windowed funnel: inside/outside window and pre-view purchases") {
    import spark.implicits._
    def ts(s: Long) = new java.sql.Timestamp(s * 1000)
    val ev = Seq(
      (1L, ts(100), 1L, "view", 0.0, "{}"),
      (2L, ts(100 + 3600), 1L, "purchase", 5.0, "{}"),      // within 24 h
      (3L, ts(200), 2L, "view", 0.0, "{}"),
      (4L, ts(200 + 90000), 2L, "purchase", 5.0, "{}"),     // 25 h — outside
      (5L, ts(50), 3L, "purchase", 5.0, "{}"),              // BEFORE the view
      (6L, ts(300), 3L, "view", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = java.nio.file.Files.createTempDirectory("graft-wf").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = graft.SparkEntry.queries("q196_windowed_funnel")(spark, dir)
      .collect().map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Int]("converted"), Option(r.getAs[Any]("latency_s"))))).toMap
    assert(out(1L) === ((1, Some(3600L))))
    assert(out(2L) === ((0, None)), "a purchase past the window is no conversion")
    assert(out(3L) === ((0, None)), "a purchase before the view never attributes")
  }

  test("q197 CUPED: perfect pre/post correlation equalizes the arms exactly") {
    import spark.implicits._
    // y = 2x per user ⇒ θ = 2 ⇒ ȳ_cuped = 2·x̄ identically in both arms:
    // the adjustment removes ALL assignment imbalance
    val rnd = new scala.util.Random(31)
    def ts(h: Long) = new java.sql.Timestamp(h * 3600 * 1000)
    val ev = (1L to 60L).flatMap { u =>
      val v = 1.0 + rnd.nextInt(50)
      Seq((u * 2, ts(u % 5), u, "view", v, "{}"),          // pre period
        (u * 2 + 1, ts(400 + u % 5), u, "view", 2 * v, "{}")) // post period
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = java.nio.file.Files.createTempDirectory("graft-cuped").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = graft.SparkEntry.queries("q197_cuped_readout")(spark, dir)
      .collect().map(r => r.getAs[Long]("arm") ->
        ((r.getAs[Long]("mean_raw_micro"), r.getAs[Long]("mean_cuped_micro"))))
      .toMap
    assert(out.size === 2, "both hash arms populated")
    val Seq(a, b) = out.values.toSeq
    assert(a._2 === b._2,
      s"perfectly-correlated covariate must equalize cuped means, got $out")
    assert(a._1 !== b._1, "raw means differ (the imbalance CUPED removes)")
  }

  test("q198 EB shrinkage: small samples shrink hard, large ones barely move") {
    import graft.text.TextOps
    import org.apache.spark.sql.functions.col
    // find a passing and a failing text by ASKING the score function —
    // the spec must not hardcode the quality formula
    val probe = Seq(
      "The quick brown fox jumps over the lazy dog near the riverbank today.",
      "x x x x x")
    val scored = {
      import spark.implicits._
      probe.toDF("text").select(TextOps.qualityScore(col("text")).as("s"))
        .collect().map(_.getDouble(0))
    }
    val (passText, failText) =
      (probe(if (scored(0) >= 0.55) 0 else 1),
        probe(if (scored(0) >= 0.55) 1 else 0))
    assert(scored.exists(_ >= 0.55) && scored.exists(_ < 0.55),
      s"probe texts must straddle the gate, scores were ${scored.toSeq}")
    val docs =
      (1L to 20L).map(i => (i, passText, "en", "bigA")) ++
      (21L to 40L).map(i => (i, failText, "en", "bigA")) ++
      (41L to 60L).map(i => (i, passText, "en", "bigB")) ++
      (61L to 80L).map(i => (i, failText, "en", "bigB")) ++
      Seq((81L, passText, "en", "tiny"), (82L, passText, "en", "tiny"))
    val dir = corpusDir(docs.map { case (i, t, l, s) => (i, t, l, s) })
    val out = graft.SparkEntry.queries("q198_eb_shrinkage")(spark, dir)
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Long]("rate_micro"), r.getAs[Long]("shrunk_micro")))).toMap
    // tiny (n=2, raw 1.0) must be pulled far toward the ~0.5 prior;
    // the n=40 sources barely move
    val tinyPull = out("tiny")._1 - out("tiny")._2
    val bigPull = math.abs(out("bigA")._1 - out("bigA")._2)
    assert(tinyPull > 100000L,
      s"a 2-doc perfect rate must shrink hard, got $out")
    assert(bigPull < tinyPull / 4,
      s"large samples must move far less, got $out")
  }

  test("q199 MASE: a pure weekly-period series scores 0, a trend favors naive") {
    import spark.implicits._
    def ts(day: Long) = new java.sql.Timestamp(day * 86400 * 1000 + 3600000)
    // 'weekly': counts cycle with period 7 → seasonal error 0 → MASE 0;
    // 'trend': counts rise by 1/day → e1 = 1, e7 = 7 → MASE exactly 7e6
    val weekly = (0L until 21L).flatMap { d =>
      (0 until (1 + (d % 7).toInt)).map(i =>
        (d * 100 + i, ts(d), i.toLong, "weekly", 0.0, "{}"))
    }
    val trend = (0L until 21L).flatMap { d =>
      (0 until (1 + d.toInt)).map(i =>
        (10000 + d * 100 + i, ts(d), i.toLong, "trend", 0.0, "{}"))
    }
    val ev = (weekly ++ trend)
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = java.nio.file.Files.createTempDirectory("graft-mase").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = graft.SparkEntry.queries("q199_mase_backtest")(spark, dir)
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Long]("n_days"), r.getAs[Long]("mase_micro")))).toMap
    assert(out("weekly") === ((14L, 0L)),
      s"a period-7 series has zero seasonal error, got $out")
    assert(out("trend") === ((14L, 7000000L)),
      s"a unit trend makes the weekly forecast exactly 7x worse, got $out")
  }

  test("q200 lift: always-together pair lifts above 1, disjoint pair gets 0 cell") {
    import spark.implicits._
    def ts(day: Long) = new java.sql.Timestamp(day * 86400 * 1000 + 60000)
    // users 1-2: a+b together each day; users 3-4: c alone — (a,b) lift
    // = N/(na·nb) · nab = 4·2/(2·2)... hand: baskets N=4·? compute below
    val ev = (0L until 2L).flatMap { d =>
      Seq((d * 10 + 1, ts(d), 1L, "a", 0.0, "{}"),
        (d * 10 + 2, ts(d), 1L, "b", 0.0, "{}"),
        (d * 10 + 3, ts(d), 2L, "a", 0.0, "{}"),
        (d * 10 + 4, ts(d), 2L, "b", 0.0, "{}"),
        (d * 10 + 5, ts(d), 3L, "c", 0.0, "{}"),
        (d * 10 + 6, ts(d), 4L, "c", 0.0, "{}"))
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = java.nio.file.Files.createTempDirectory("graft-lift").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = graft.SparkEntry.queries("q200_event_lift")(spark, dir)
      .collect().map(r => (r.getAs[String]("et_a"), r.getAs[String]("et_b")) ->
        ((r.getAs[Long]("n_ab"), r.getAs[Long]("lift_micro")))).toMap
    // N = 8 baskets; na = nb = 4, nab = 4 → lift = 4·8/(4·4) = 2.0
    assert(out(("a", "b")) === ((4L, 2000000L)),
      s"always-together pair lifts to exactly 2.0 here, got $out")
    assert(!out.contains(("a", "c")) && !out.contains(("b", "c")),
      "never-co-occurring pairs emit no cell (n_ab = 0)")
  }

  test("q201 log-rank: identical cohorts score exactly 0, divergent ones don't") {
    import spark.implicits._
    def ts(day: Long, h: Long) = new java.sql.Timestamp((day * 86400 + h * 3600) * 1000)
    // mirror cohorts: same sizes, same conversion days ⇒ at every day
    // d1 = d_all·n1/n EXACTLY ⇒ every O−E term is 0
    val mirror = (0L until 10L).flatMap { u =>
      val c = u % 2 // cohort by explicit column below
      Seq((u * 10, ts(0, 1), u, "view", 0.0), (u * 10 + 1, ts(u / 2 + 1, 2), u, "purchase", 1.0))
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = graft.ops.Survival.logRank(
        mirror.withColumn("cohort", (col("user_id") % 2).cast("long")),
        "user_id", "ts", col("event_type") === "purchase", col("cohort"))
      .collect().head
    assert(out.getLong(0) === 0L, "mirrored cohorts: every O−E term is 0")
    assert(out.getLong(2) === 0L)
    // divergent: cohort 1 converts day 1, cohort 0 day 9 — |z| large
    val div = (0L until 20L).flatMap { u =>
      val d = if (u % 2 == 1) 1L else 9L
      Seq((u * 10, ts(0, 1), u, "view", 0.0), (u * 10 + 1, ts(d, 2), u, "purchase", 1.0))
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
    val out2 = graft.ops.Survival.logRank(
        div.withColumn("cohort", (col("user_id") % 2).cast("long")),
        "user_id", "ts", col("event_type") === "purchase", col("cohort"))
      .collect().head
    assert(math.abs(out2.getLong(2)) > 1960000L,
      s"early-vs-late cohorts must reject equal hazards, z=${out2.getLong(2)}")
  }

  test("q202 Benford: the literal table is the law; a spiked digit flags") {
    import spark.implicits._
    // a log-uniform sample follows Benford; an all-9s ledger does not
    val rnd = new scala.util.Random(41)
    def row(id: Long, cents: Long) =
      (id, new java.sql.Timestamp(1000L + id), id % 7, "purchase",
        cents / 100.0, "{}")
    val benign = (1L to 4000L).map(i =>
      row(i, math.pow(10.0, rnd.nextDouble() * 4).toLong.max(1)))
    val spiked = (4001L to 4400L).map(i => row(i, 900L + (i % 90)))
    val dir = java.nio.file.Files.createTempDirectory("graft-ben").toString
    (benign ++ spiked)
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = graft.SparkEntry.queries("q202_benford_audit")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getAs[Long]("benford_micro"), r.getAs[Long]("chi2_contrib_micro"))))
      .toMap
    assert(out(1L)._1 === 301030L && out(9L)._1 === 45757L,
      "the literal table must be log10(1+1/d) micro-snapped")
    assert(out(9L)._2 > out.filterKeys(_ <= 4).values.map(_._2).max,
      s"the spiked digit must carry the largest chi2 contribution, got $out")
  }

  test("q203 TextTiling: a stapled doc shows the seam, a homogeneous one doesn't") {
    // doc 1: two disjoint 40-token vocabularies stapled → the block-2/3
    // gap has sim EXACTLY 0 → one boundary; doc 2: one vocabulary
    val half1 = (0 until 40).map(i => s"alpha${i % 10}").mkString(" ")
    val half2 = (0 until 40).map(i => s"omega${i % 10}").mkString(" ")
    val homog = (0 until 80).map(i => s"base${i % 10}").mkString(" ")
    val dir = corpusDir(Seq(
      (1L, s"$half1 $half2", "en", "w"), (2L, homog, "en", "w")))
    val out = graft.SparkEntry.queries("q203_texttiling")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getAs[Long]("n_blocks"), r.getAs[Long]("n_boundaries"),
          r.getAs[Long]("min_sim_micro")))).toMap
    assert(out(1L) === ((4L, 1L, 0L)),
      s"the seam gap must score exactly 0 and flag one boundary, got $out")
    assert(out(2L)._2 === 0L && out(2L)._3 === 1000000L,
      s"identical blocks have sim exactly 1, got $out")
  }

  test("q204 Simpson: a planted reversal flags; aligned strata don't") {
    import spark.implicits._
    // classic structure: within BOTH strata y falls with x (slope −1e6
    // exactly), but stratum B sits at higher x AND higher y, so the
    // pooled slope is positive → both strata flag
    val df = Seq(
      ("A", 1L, 10L), ("A", 2L, 9L), ("A", 3L, 8L),
      ("B", 11L, 30L), ("B", 12L, 29L), ("B", 13L, 28L)).toDF("g", "x", "y")
    val out = graft.text.Calibrate.groupedSlopeFlip(df, "g", col("x"), col("y"))
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Long]("slope_micro"), r.getAs[Int]("sign_flipped")))).toMap
    assert(out("A") === ((-1000000L, 1)) && out("B") === ((-1000000L, 1)),
      s"the reversal must flag both strata, got $out")
    // aligned strata: same negative trend, same level → pooled negative
    val df2 = Seq(
      ("A", 1L, 10L), ("A", 2L, 9L), ("A", 3L, 8L),
      ("B", 1L, 11L), ("B", 2L, 10L), ("B", 3L, 9L)).toDF("g", "x", "y")
    val out2 = graft.text.Calibrate.groupedSlopeFlip(df2, "g", col("x"), col("y"))
      .collect().map(r => r.getString(0) -> r.getAs[Int]("sign_flipped")).toMap
    assert(out2 === Map("A" -> 0, "B" -> 0))
  }

  test("q205 multimodal closure: either modality's link families docs together") {
    val rnd = new scala.util.Random(47)
    val words = (0 until 40).map(_ => s"w${rnd.nextInt(12)}")
    // A-B: high shingle overlap (text link; chars differ enough that the
    // one-char-edit image guarantee doesn't apply), C-D: exact copies
    // (both modalities fire), E: unrelated
    val a = words.mkString(" ")
    val b = (words.take(38) ++ Seq("zz1", "zz2")).mkString(" ")
    val c = (0 until 40).map(_ => s"c${rnd.nextInt(9)}").mkString(" ")
    val e = (0 until 40).map(_ => s"e${rnd.nextInt(9)}").mkString(" ")
    val dir = corpusDir(Seq((1L, a, "en", "w"), (2L, b, "en", "w"),
      (3L, c, "en", "w"), (4L, c, "en", "w"), (5L, e, "en", "w")))
    val out = graft.SparkEntry.queries("q205_multimodal_dedup")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.get(1L).contains(1L) && out.get(2L).contains(1L),
      s"the text link must family A with B under keeper A, got $out")
    assert(out.get(3L).contains(3L) && out.get(4L).contains(3L),
      s"exact copies family under the min id via both modalities, got $out")
    assert(!out.contains(5L), "an unlinked doc joins no family")
  }

  test("q208 trimodal closure: refines q205 merge-only; audio pairs are connected; " +
      "exact copies keep their q205 family") {
    val rnd = new scala.util.Random(47)
    val words = (0 until 40).map(_ => s"w${rnd.nextInt(12)}")
    val a = words.mkString(" ")
    val b = (words.take(38) ++ Seq("zz1", "zz2")).mkString(" ")
    val c = (0 until 40).map(_ => s"c${rnd.nextInt(9)}").mkString(" ")
    val e = (0 until 40).map(_ => s"e${rnd.nextInt(9)}").mkString(" ")
    val dir = corpusDir(Seq((1L, a, "en", "w"), (2L, b, "en", "w"),
      (3L, c, "en", "w"), (4L, c, "en", "w"), (5L, e, "en", "w")))
    val m205 = graft.SparkEntry.queries("q205_multimodal_dedup")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val m208 = graft.SparkEntry.queries("q208_trimodal_dedup")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // merge-only refinement: every doc familied by q205 is familied by
    // q208, and two docs sharing a q205 keeper share a q208 keeper
    assert(m205.keySet.subsetOf(m208.keySet),
      s"q208 dropped members q205 had: ${m205.keySet -- m208.keySet}")
    for (x <- m205.keySet; y <- m205.keySet
         if m205(x) == m205(y) && m208(x) != m208(y))
      fail(s"q205 family ($x,$y) split by q208: $m208")
    // audio connectivity: every q184 audio pair shares one q208 family
    val aud = graft.SparkEntry.queries("q184_audio_neardup")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    for ((x, y) <- aud)
      assert(m208.get(x).isDefined && m208(x) === m208(y),
        s"audio pair ($x,$y) not familied together: $m208")
    // the exact-copy pair still families (all three modalities agree)
    assert(m208.get(3L).contains(3L) && m208.get(4L).contains(3L))
    assert(!m208.contains(5L) || aud.exists(p => p._1 == 5L || p._2 == 5L),
      "an unlinked doc joins no family")
  }

  test("q210 occupancy cap: hub-bucket cliques vanish, small-bucket cliques survive") {
    import spark.implicits._
    import graft.graph.Triangles
    // 45 users co-visit 4 'view' hour-buckets (occupancy 45 > cap 40 —
    // every bucket a hub: C(45,2) edges uncapped, ZERO capped); 3 users
    // co-visit 4 'click' buckets (occupancy 3 — survives the cap)
    val hub = for (u <- 1L to 45L; h <- 0L until 4L)
      yield (u, "view", h)
    val small = for (u <- 100L to 102L; h <- 0L until 4L)
      yield (u, "click", h)
    val df = (hub ++ small).toDF("user_id", "event_type", "hb")
    val capped = Triangles.coOccurrenceEdges(df, "user_id",
        Seq("event_type", "hb"), minShared = 4L, maxOccupancy = 40L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped === Set((100L, 101L), (100L, 102L), (101L, 102L)),
      s"only the small clique survives the cap: $capped")
    val uncapped = Triangles.coOccurrenceEdges(df, "user_id",
        Seq("event_type", "hb"), minShared = 4L)
      .count()
    assert(uncapped === 45L * 44 / 2 + 3,
      s"uncapped keeps the hub clique: $uncapped")
    // boundary: cap exactly at the hub occupancy keeps it
    val at = Triangles.coOccurrenceEdges(df, "user_id",
        Seq("event_type", "hb"), minShared = 4L, maxOccupancy = 45L)
      .count()
    assert(at === 45L * 44 / 2 + 3, "cap is inclusive at the bound")
  }

  test("hammingPairs fuzz: equals the quadratic truth at two thresholds") {
    import spark.implicits._
    val rnd = new scala.util.Random(53)
    // 60 random hashes + 40 near-dups made by flipping <= 5 bits of a
    // random base — exercises both the pigeonhole guarantee and the
    // precision filter, including negative (bit-63) hashes
    val base = (0 until 60).map(i => (i.toLong, rnd.nextLong()))
    val near = (60 until 100).map { i =>
      val (_, h) = base(rnd.nextInt(60))
      val flips = rnd.nextInt(6)
      val h2 = (0 until flips).foldLeft(h)((acc, _) =>
        acc ^ (1L << rnd.nextInt(64)))
      (i.toLong, h2)
    }
    val all = base ++ near
    for (tau <- Seq(2, 5)) {
      val got = graft.text.NearDup.hammingPairs(all.toDF("id", "h"),
          "id", "h", bits = 64, bands = 8, maxHamming = tau)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
      val truth = (for {
        (ia, ha) <- all; (ib, hb) <- all if ia < ib
        d = java.lang.Long.bitCount(ha ^ hb) if d <= tau
      } yield (ia, ib) -> d).toMap
      assert(got === truth,
        s"tau=$tau: missing ${truth.keySet -- got.keySet}, " +
          s"extra ${got.keySet -- truth.keySet}")
      assert(truth.nonEmpty, s"tau=$tau fixture must produce pairs")
    }
  }

  test("hammingAutoBands: floor held through the occupancy hold, steps to the " +
      "widest valid count at scale, never below the pigeonhole bound (VERDICT r13 #1)") {
    import graft.text.NearDup.hammingAutoBands
    // floor held at every oracle scale: occupancy n>>8 <= 128 ⇔ n <= 33023
    for (n <- Seq(0L, 500L, 5500L, 33023L))
      assert(hammingAutoBands(n, 64, 8, 2) === 8, s"n=$n must hold the floor")
    // past the hold: step to bands=4 (the only smaller 64-divisor > maxHamming)
    for (n <- Seq(33024L, 1000000L, 20000000L))
      assert(hammingAutoBands(n, 64, 8, 2) === 4, s"n=$n must step to 4")
    // maxHamming=3 still admits bands=4 (complete to 3 flips = the contract)
    assert(hammingAutoBands(20000000L, 64, 8, 3) === 4)
    // maxHamming=4 pins the ladder at 8 — no valid smaller count exists
    // (bands 5..7 don't divide 64; pigeonhole needs bands > 4)
    assert(hammingAutoBands(20000000L, 64, 8, 4) === 8)
    // a 16-band floor has the full 8 → 4 ladder below it
    assert(hammingAutoBands(20000000L, 64, 16, 2) === 4)
    assert(hammingAutoBands(100L, 64, 16, 2) === 16)
    // contract violations refuse loudly
    intercept[IllegalArgumentException](hammingAutoBands(10L, 64, 8, 8))
    intercept[IllegalArgumentException](hammingAutoBands(10L, 64, 7, 2))
  }

  test("hammingCorpusFlagsAuto: bit-identical to the fixed call under the hold; " +
      "the stepped dial preserves the dup verdict (VERDICT r13 #1)") {
    import spark.implicits._
    val rnd = new scala.util.Random(71)
    // 600 corpus hashes: small enough for the default hold (600>>8=2
    // <= 128 -> bands 8), large enough that targetOccupancy=1 forces
    // the 8 -> 4 step below
    val corpus = (0 until 600).map(i => (i.toLong, rnd.nextLong()))
    // batch: near-dups of corpus hashes (<= 2 flips) + fresh randoms
    val dups = (1000 until 1020).map { i =>
      val h = corpus(rnd.nextInt(600))._2
      val h2 = h ^ (1L << rnd.nextInt(64)) ^ (1L << rnd.nextInt(64))
      (i.toLong, h2)
    }
    val fresh = (2000 until 2020).map(i => (i.toLong, rnd.nextLong()))
    val cdf = corpus.toDF("doc_id", "fp")
    val bdf = (dups ++ fresh).toDF("doc_id", "fp")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // under the hold (n=600): the Auto IS the fixed bands=8 call
    val fixed = graft.text.NearDup.hammingCorpusFlags(
      graft.text.NearDup.hammingBandRows(cdf, "doc_id", "fp", 64, 8),
      bdf, "doc_id", "fp", 64, 8)
    val auto = graft.text.NearDup.hammingCorpusFlagsAuto(
      cdf, bdf, "doc_id", "fp", bits = 64, floorBands = 8, maxHamming = 2)
    assert(rows(auto) === rows(fixed), "Auto must be bit-identical under the hold")
    // force the step (targetOccupancy=1 makes n=600 'large'): the DUP
    // VERDICT at the maxHamming contract is unchanged — pigeonhole is
    // complete at radius 2 under BOTH counts; only above-radius
    // best_hamming values may differ
    val stepped = graft.text.NearDup.hammingCorpusFlagsAuto(
      cdf, bdf, "doc_id", "fp", bits = 64, floorBands = 8, maxHamming = 2,
      targetOccupancy = 1L)
    def verdicts(s: Set[(Long, Long)]) =
      s.filter(_._2 <= 2L).map(_._1)
    assert(verdicts(rows(stepped)) === verdicts(rows(fixed)),
      "re-banding must preserve the <= maxHamming dup verdict")
    assert(verdicts(rows(fixed)).nonEmpty, "fixture must flag planted dups")
  }

  test("q206 Rayleigh: a fixed-hour ritual maxes R; a uniform clock stays null") {
    import spark.implicits._
    def ts(day: Long, sec: Long) = new java.sql.Timestamp((day * 86400 + sec) * 1000)
    val rnd = new scala.util.Random(59)
    // 'ritual' fires at exactly 09:00:00 every day → all θ equal →
    // R = 1 (±1 micro from the snap) and z ≈ n·1e6; 'uniform' spreads
    // around the clock → z far below the 3.0 threshold
    val ritual = (0L until 50L).map(i =>
      (i, ts(i % 25, 9 * 3600), i % 7, "ritual", 0.0, "{}"))
    val uniform = (100L until 500L).map(i =>
      (i, ts(i % 25, rnd.nextInt(86400).toLong), i % 7, "uniform", 0.0, "{}"))
    val dir = java.nio.file.Files.createTempDirectory("graft-ray").toString
    (ritual ++ uniform)
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = graft.SparkEntry.queries("q206_rayleigh_diurnal")(spark, dir)
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Long]("r_micro"), r.getAs[Long]("z_micro"),
          r.getAs[Int]("nonuniform")))).toMap
    assert(math.abs(out("ritual")._1 - 1000000L) <= 1L,
      s"identical clock angles give R = 1 to the snap, got $out")
    assert(out("ritual")._3 === 1, "the ritual must reject uniformity")
    assert(out("uniform")._3 === 0,
      s"a uniform clock must not reject, got $out")
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
