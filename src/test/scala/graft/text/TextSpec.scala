package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sim.Similarity

class TextSpec extends SparkSpec {

  test("shingles: short-doc guard returns empty, not a descending sequence") {
    import spark.implicits._
    val df = TextOps.withWordShingles(Seq("a b", "a b c d").toDF("text"), "text", 3, "sh")
      .select(size($"sh").as("n"))
      .as[Int].collect().toSeq
    assert(df === Seq(0, 2))
  }

  test("exact near-dup pair found by minhash LSH; disjoint docs are not") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again today"),
      (3L, "completely different words about spark catalyst tungsten engine"))
      .toDF("doc_id", "text")
      .transform(d => TextOps.withWordShingles(d, "text", 3, "sh"))
    val pairs = NearDup.minhashLshPairs(docs, "doc_id", "sh")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("simhash: identical docs identical; unrelated docs differ") {
    import spark.implicits._
    val df = Seq(
      (1L, "alpha beta gamma delta"), (2L, "alpha beta gamma delta"),
      (3L, "omega psi chi phi")).toDF("doc_id", "text")
    val fp = NearDup.simhash(df, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    assert(fp(1L) === fp(2L))
    assert(fp(1L) !== fp(3L))
  }

  test("sorted_intersect_count: primitive merge equals array_intersect size") {
    import spark.implicits._
    val df = Seq(
      (Seq(1L, 3L, 5L, 9L), Seq(2L, 3L, 9L, 11L)),   // common {3,9}
      (Seq.empty[Long], Seq(1L, 2L)),                  // empty side
      (Seq(7L), Seq(7L)))                              // identical singleton
      .toDF("x", "y")
    val out = df.select(
        graft.plans.ArrayOps.sortedIntersectCount(df, "x", "y").as("c"),
        size(array_intersect($"x", $"y")).as("ref"))
      .as[(Int, Int)].collect().toSeq
    assert(out.forall(p => p._1 == p._2) && out.map(_._1) === Seq(2, 0, 1))
  }

  test("cosine: known vectors") {
    import spark.implicits._
    val df = Seq((Array(1.0, 0.0), Array(0.0, 1.0)), (Array(1.0, 1.0), Array(1.0, 1.0)))
      .toDF("a", "b")
      .select(round(Similarity.cosine(spark, $"a", $"b"), 9).as("c"))
      .as[Double].collect().toSeq
    assert(df === Seq(0.0, 1.0))
  }

  test("langId and quality are total (no nulls) on arbitrary text") {
    import spark.implicits._
    val df = TextOps.withLangId(
        Seq("", "   ", "the the the", "中文 text").toDF("text"), "text", "l")
      .select($"l", TextOps.qualityScore($"text").as("q"))
    assert(df.filter($"l".isNull || $"q".isNull).count() === 0)
  }

  test("trained char-gram language-ID: width adjudication (VERDICT r14 #5 / r15 #5)") {
    import spark.implicits._
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.01")
    val n = docs.count().toDouble
    val heurAcc = TextOps.withLangId(docs, "text", "pred")
      .filter($"pred" === $"lang").count() / n
    def diag(conf: org.apache.spark.sql.DataFrame): Double =
      conf.filter($"label" === $"pred_lang")
        .agg(org.apache.spark.sql.functions.sum($"n")).as[Long].head() / n
    val conf4 = Classify.charLangIdConfusion(docs, "doc_id", "text", "lang",
      n = 4)
    val acc3 = diag(Classify.charLangIdConfusion(docs, "doc_id", "text",
      "lang", n = 3))
    val accMix = diag(Classify.charLangIdConfusionMixed(docs, "doc_id",
      "text", "lang", Seq(2, 3, 4)))
    val acc4 = diag(conf4)
    // the r16 adjudication ordering: every trained form beats the
    // marker heuristic; the prescribed {2,3,4} mix beats plain 3-grams
    // (the VERDICT r15 #5 prediction, confirmed); single-width 4 beats
    // the mix at a third of its gram extent — which is why q220
    // registers width 4 and the mix stays a capability
    assert(acc3 > heurAcc,
      f"3-gram NB ($acc3%.3f) must beat the marker heuristic ($heurAcc%.3f)")
    assert(accMix > acc3,
      f"mixed 2+3+4 NB ($accMix%.3f) must beat 3-gram ($acc3%.3f)")
    assert(acc4 > accMix,
      f"4-gram NB ($acc4%.3f) must beat mixed 2+3+4 ($accMix%.3f) at 1/3 extent")
    // the census is well-formed: per-label row shares sum to ~1e6
    val rowSums = conf4.groupBy($"label")
      .agg(org.apache.spark.sql.functions.sum($"row_share_micro").as("s"))
      .select($"s").as[Long].collect()
    assert(rowSums.nonEmpty &&
      rowSums.forall(s => math.abs(s - 1000000L) <= 10L),
      s"row shares must sum to ~1e6 per label: ${rowSums.toSeq}")
  }

  test("lineFrequencyFilter: df-bound drop, order restored, empty lines ignored (r16)") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha\n\nshared boilerplate\nomega"), // empty line ignored
      (2L, "beta\nshared boilerplate"),
      (3L, "shared boilerplate"))                 // nothing survives
      .toDF("doc_id", "text")
    val out = TextOps.lineFrequencyFilter(docs, "doc_id", "text", maxDocFreq = 2L)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toList
    assert(out === List(
      (1L, 3L, 2L, "alpha\nomega"),   // order restored across the drop
      (2L, 2L, 1L, "beta"),
      (3L, 1L, 0L, "")))
    // a doc with ONLY empty lines emits no row (group-by semantics)
    assert(TextOps.lineFrequencyFilter(
      Seq((9L, "\n\n")).toDF("doc_id", "text"), "doc_id", "text", 2L)
      .count() === 0L)
  }

  test("naiveBayesScoresWith degenerate inputs: empty frame, null label (ADVICE r15)") {
    import spark.implicits._
    // empty input: an empty score frame of the right schema, not a
    // NoSuchElementException at labelSeq.head
    val empty = Classify.naiveBayesScores(
      Seq.empty[(Long, String, String)].toDF("doc_id", "text", "lang"),
      "doc_id", "text", "lang")
    assert(empty.columns.toSeq ===
      Seq("doc_id", "label_true", "label", "total_micro"))
    assert(empty.count() === 0L)
    // null label: a loud contract error naming the violation, not an NPE
    val e = intercept[IllegalArgumentException] {
      Classify.naiveBayesScores(
        Seq((1L, "a b", "en"), (2L, "c d", null.asInstanceOf[String]))
          .toDF("doc_id", "text", "lang"),
        "doc_id", "text", "lang")
    }
    assert(e.getMessage.contains("null label"))
  }

  test("withLangId survives a pre-existing __lang_s column") {
    import spark.implicits._
    // r04 hardcoded "__lang_s" as the temp name, silently clobbering and
    // then dropping a caller column of that name; now the temp is
    // suffixed with the output column, and a true collision fails loudly
    val df = TextOps.withLangId(
      Seq(("the cat is the", "keep-me")).toDF("text", "__lang_s"), "text", "l")
    assert(df.columns.toSeq === Seq("text", "__lang_s", "l"))
    assert(df.select($"__lang_s").as[String].head() === "keep-me")
    assertThrows[IllegalArgumentException](TextOps.withLangId(
      Seq(("x", "boom")).toDF("text", "__lang_s_l"), "text", "l"))
  }

  test("langId golden predictions incl. occurrence counting and tie-breaks") {
    import spark.implicits._
    val df = TextOps.withLangId(Seq(
      (1, "the cat is of the house and proud"), // en markers dominate
      (2, "der hund und die katze ist da"),     // de
      (3, "el perro y la casa es de juan"),     // es+de share 'de'; es wins count
      (4, "le chat et les maisons est une"),    // fr
      (5, "总结 summary 中文"),                  // any CJK → zh
      (6, "nothing matching here"),             // all scores 0 → en tie-break
      (7, "the the the das das")                // OCCURRENCES: en 3 > de 2
    ).toDF("id", "text"), "text", "l").select($"id", $"l")
      .as[(Int, String)].collect().sortBy(_._1).toSeq
    assert(df === Seq(1 -> "en", 2 -> "de", 3 -> "es", 4 -> "fr",
      5 -> "zh", 6 -> "en", 7 -> "en"))
  }

  test("repetitionSignals: golden counts, ties lexicographic, 1-token doc guarded") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b a b a"),     // bigrams: "a b"×2, "b a"×2 → tie, "a b" wins
      (2L, "x y z"),         // all bigrams unique → smallest wins
      (3L, "solo"))          // no bigram → ("", 0)
      .toDF("doc_id", "text")
    val out = Terms.repetitionSignals(df, "doc_id", "text")
      .as[(Long, Int, Int, String, Long)].collect().sortBy(_._1).toSeq
    assert(out === Seq(
      (1L, 5, 2, "a b", 2L),
      (2L, 3, 3, "x y", 1L),
      (3L, 1, 1, "", 0L)))
  }

  test("distinctiveTerms: rarest-document-frequency term wins, tf then lexicographic ties") {
    import spark.implicits._
    val df = Seq(
      (1L, "common common rare1"),   // rare1 df=1 beats common df=3
      (2L, "common rare2 rare2"),    // rare2 df=1, tf=2
      (3L, "common aaa bbb"))        // aaa/bbb both df=1 tf=1 → aaa
      .toDF("doc_id", "text")
    val out = Terms.distinctiveTerms(df, "doc_id", "text")
      .as[(Long, String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(out === Seq(
      (1L, "rare1", 1L, 1L),
      (2L, "rare2", 2L, 1L),
      (3L, "aaa", 1L, 1L)))
  }

  test("vocabulary: top-N cut by total occurrences with lexicographic ties") {
    import spark.implicits._
    val df = Seq((1L, "b b a a c"), (2L, "b a d")).toDF("doc_id", "text")
    // totals: a=3 b=3 c=1 d=1; docs: a=2 b=2 c=1 d=1
    val out = Terms.vocabulary(df, "doc_id", "text", topN = 3)
      .as[(String, Long, Long)].collect().toSeq
    assert(out === Seq(("a", 3L, 2L), ("b", 3L, 2L), ("c", 1L, 1L)))
  }

  test("vocabCoverage: empty corpus degrades to a zero curve, not NPE") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val out = Terms.vocabCoverage(empty, "doc_id", "text", Seq(2, 5))
      .as[(Long, Long, Long)].collect().toSeq
    assert(out === Seq((2L, 0L, 0L), (5L, 0L, 0L)))
  }

  test("mixtureSample: integer weights exact, fractional bounded, zero drops, reruns identical") {
    import spark.implicits._
    val docs = (1L to 200L).map(i =>
      (i, Seq("a", "b", "c", "drop")((i % 4).toInt))).toDF("doc_id", "lang")
    val weights = Map("a" -> 2.0, "b" -> 0.5, "c" -> 1.25)
    def run() = Terms.mixtureSample(docs, "doc_id", "lang", weights)
      .as[(Long, String, Long)].collect().toSeq
    val out = run()
    val perDoc = out.groupBy(_._1).view.mapValues(_.length).toMap
    val byShard = out.groupBy(_._2)
    // integer weight: exactly w copies each
    assert(byShard("a").groupBy(_._1).forall(_._2.length == 2))
    // fractional: copies in {floor, ceil}; and the hash actually splits
    assert(perDoc.filterKeys(k => k % 4 == 1).values.forall(n => n >= 0 && n <= 1))
    assert(byShard("c").groupBy(_._1).values.map(_.length).toSet === Set(1, 2))
    // weight 0 / missing shard: absent entirely
    assert(!out.exists(_._2 == "drop"))
    // determinism: identical output on a re-run
    assert(run().toSet === out.toSet)
    // SEED PINS (hand-computed from the md5('mix|'||id) prefix): these
    // catch silent drift of the hash recipe — seed string, substring
    // width, or divisor — that every distribution-level assertion above
    // is blind to. u(1)=0.032<0.5 kept; u(17)=0.607>=0.5 dropped;
    // u(18)=0.075<0.25 -> 2 copies; u(2)=0.434>=0.25 -> 1 copy.
    assert(perDoc.get(1L) === Some(1) && perDoc.get(17L) === None)
    assert(perDoc.get(18L) === Some(2) && perDoc.get(2L) === Some(1))
  }

  test("sequencePacking: per-shard running offsets and block-granular chunk ids") {
    import spark.implicits._
    val df = Seq(
      (1L, "en", "a b c"),        // en: start 0, chunk 0
      (3L, "en", "d e"),          // en: start 3, chunk 0
      (5L, "en", "f g h i"),      // en: start 5, chunk 1 (block=4)
      (2L, "de", "x y"))          // de shard independent: start 0
      .toDF("doc_id", "lang", "text")
    val out = Terms.sequencePacking(df, "doc_id", "text", "lang", blockTokens = 4)
      .as[(Long, String, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(out === Seq(
      (1L, "en", 3L, 0L, 0L),
      (2L, "de", 2L, 0L, 0L),
      (3L, "en", 2L, 3L, 0L),
      (5L, "en", 4L, 5L, 1L)))
  }

  test("oovStats: tokens outside the top-N vocabulary counted, vocab ties lexicographic") {
    import spark.implicits._
    val df = Seq((1L, "a a b rare"), (2L, "a b b")).toDF("doc_id", "text")
    // totals: a=3, b=3, rare=1 → top-2 vocab = {a, b}; "rare" is OOV
    val out = Terms.oovStats(df, "doc_id", "text", topN = 2)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(out === Seq((1L, 4L, 1L), (2L, 3L, 0L)))
  }

  test("simhashPairs: near-identical docs pair at low hamming, unrelated do not pair") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again today"),
      (3L, "entirely disjoint vocabulary about catalyst tungsten codegen shuffles"))
      .toDF("doc_id", "text")
    val pairs = NearDup.simhashPairs(docs, "doc_id", "text",
        bits = 48, bands = 8, maxHamming = 7)
      .as[(Long, Long, Int)].collect().toSeq
    assert(pairs.map(p => (p._1, p._2)) === Seq((1L, 2L)))
    assert(pairs.head._3 <= 7)
    // completeness knob is enforced: maxHamming >= bands would lose pairs
    intercept[IllegalArgumentException] {
      NearDup.simhashPairs(docs, "doc_id", "text", bits = 48, bands = 4,
        maxHamming = 4)
    }
  }

  test("blockedJaccard finds a pair whose Jaccard ROUNDS UP to the threshold") {
    import spark.implicits._
    // A ⊂ B with |A|=5000, |B|=10001: J = 5000/10001 = 0.49995000...,
    // round(J,4) = 0.5 — passes the final filter (and the all-pairs
    // oracle) while the TRUE Jaccard sits below minJaccard. The candidate
    // bounds must be computed from the effective threshold t−5e-5 or this
    // pair never reaches verification (the r03 review finding: size
    // ratio 2.0002 also needs band-diff 2, not 1).
    val a = (1 to 5000).map(i => s"s$i")
    val b = (1 to 10001).map(i => s"s$i")
    val df = Seq((1L, a), (2L, b)).toDF("doc_id", "sh")
      .withColumn("blk", lit("x"))
    val pairs = NearDup.blockedJaccardPairs(df, "doc_id", "sh", Seq("blk"),
        minJaccard = 0.5)
      .select($"id_a", $"id_b", $"jaccard")
      .as[(Long, Long, Double)].collect().toSeq
    assert(pairs === Seq((1L, 2L, 0.5)))
  }

  test("clusterEdges: round joins exchange only the labels side") {
    import spark.implicits._
    // a chain graph — several propagation rounds, like real LSH output
    val pairs = (1L to 40L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val edges = NearDup.clusterEdges(pairs, "id_a", "id_b")
    try {
      // an arbitrary labels-shaped frame with NO useful partitioning,
      // exactly what round >= 2 feeds back into the join
      val labels = (1L to 41L).map(i => (i, math.min(i, 3L))).toDF("id", "label")
      val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val joined = edges.join(labels, edges("dst") === labels("id"))
        val lines = joined.queryExecution.executedPlan.toString.linesIterator.toVector
        val join = lines.indexWhere(l =>
          l.contains("SortMergeJoin") || l.contains("ShuffledHashJoin"))
        val scan = lines.indexWhere(_.contains("Scan ExistingRDD"))
        assert(join >= 0 && scan > join, s"unexpected plan shape:\n${lines.mkString("\n")}")
        // edges side = join's first child, ending at the checkpoint scan:
        // the baked-in HashPartitioning(dst) must satisfy the join's
        // distribution with no Exchange; only labels may shuffle
        val edgesSide = lines.slice(join + 1, scan + 1)
        assert(!edgesSide.exists(_.contains("Exchange")),
          s"edges side still shuffles per round:\n${edgesSide.mkString("\n")}")
        assert(lines.drop(scan + 1).exists(_.contains("Exchange")),
          "expected the labels-side exchange below the checkpoint scan")
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      // and the full loop over the same chain still converges correctly
      // on BOTH strategies: the broadcast fast path (default — these
      // edges are tiny) and the forced partitioned sort-merge path the
      // at-scale shape uses
      // maxLocalPairs = 0 pins the DISTRIBUTED tiers — the default would
      // resolve this tiny chain on the driver and never run the loop
      val keepers = NearDup.dedupClusters(pairs, "id_a", "id_b",
          maxLocalPairs = 0L)
        .as[(Long, Long)].collect().toMap
      assert(keepers.size === 41 && keepers.values.forall(_ == 1L))
      val keepersSmj = NearDup.dedupClusters(pairs, "id_a", "id_b",
          maxBroadcastEdges = 0L, maxLocalPairs = 0L)
        .as[(Long, Long)].collect().toMap
      assert(keepersSmj === keepers)
      // and the default engages the LOCAL tier on the same input with the
      // identical result — the three strategies are one contract
      val keepersLocal = NearDup.dedupClusters(pairs, "id_a", "id_b")
        .as[(Long, Long)].collect().toMap
      assert(keepersLocal === keepers)
    } finally graft.core.Checkpoints.release(edges)
  }

  test("dedupClusters: local union-find tier matches the distributed loop on random graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(1837)
    for (trial <- 1 to 3) {
      // sparse random graph over a sparse id space: multiple components,
      // duplicate and reversed pairs, self-loops — everything LSH emits
      val n = 120 + trial * 40
      val ids = Seq.fill(n)(rnd.nextLong(10000)).distinct
      val pairs = Seq.fill(n * 2) {
        val a = ids(rnd.nextInt(ids.length)); val b = ids(rnd.nextInt(ids.length))
        (a, b)
      }.toDF("id_a", "id_b")
      val local = NearDup.dedupClusters(pairs, "id_a", "id_b")
        .as[(Long, Long)].collect().toMap
      val dist = NearDup.dedupClusters(pairs, "id_a", "id_b", maxLocalPairs = 0L)
        .as[(Long, Long)].collect().toMap
      assert(local === dist, s"trial=$trial")
    }
  }

  test("dedupClusters: hub-skew star graph converges in O(1) rounds on both strategies") {
    import spark.implicits._
    // one hub paired with every other node — the adversarial dst-skew
    // shape for the dst-partitioned layout (every edge INTO the hub
    // lands in one partition). Correctness must hold and convergence
    // stays O(1): the hub is the min id, so the seed round labels
    // every spoke directly.
    val pairs = (2L to 400L).map(i => (1L, i)).toDF("id_a", "id_b")
    for (threshold <- Seq(Long.MaxValue, 0L)) {
      val got = NearDup.dedupClusters(pairs, "id_a", "id_b",
          maxBroadcastEdges = threshold, maxLocalPairs = 0L)
        .as[(Long, Long)].collect().toMap
      assert(got.size === 400 && got.values.forall(_ == 1L),
        s"threshold=$threshold")
    }
  }

  test("scoredKeepers: highest score wins the family, min id breaks ties") {
    import spark.implicits._
    // two families: {1,2,3} (chain) and {10,11}; singleton docs absent
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val clusters = NearDup.dedupClusters(pairs, "id_a", "id_b")
    val scores = Seq(
      1L -> 0.20, 2L -> 0.90, 3L -> 0.50,  // family 1: doc 2 best
      10L -> 0.70, 11L -> 0.70             // family 10: exact tie → min id
    ).toDF("doc_id", "q")
    val out = NearDup.scoredKeepers(clusters, scores, "q")
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(out === Map(
      1L -> (1L, 2L), 2L -> (1L, 2L), 3L -> (1L, 2L),
      10L -> (10L, 10L), 11L -> (10L, 10L)))
  }

  test("tokenBudget: hand-computed mixture table incl. missing target and deficit") {
    import spark.implicits._
    // grp a: 2 docs, 4+6=10 tokens; grp b: 1 doc, 30 tokens → total 40
    val docs = Seq(
      (1L, "a", "w x y z"),
      (2L, "a", "q r s t u v"),
      (3L, "b", Seq.fill(30)("t").mkString(" "))).toDF("doc_id", "lang", "text")
    val out = Terms.tokenBudget(docs, "text", "lang",
        Map("a" -> 750000L), budget = 100L)
      .as[(String, Long, Long, Long, Long, Long, Long, Int)]
      .collect().map(r => r._1 -> r).toMap
    // a: share = 10/40 = 250000µ; alloc = round(100·0.75) = 75 tokens;
    // rate = 75/10 = 7.5× = 7500000µ; 75 > 10 → deficit
    assert(out("a") === (("a", 2L, 10L, 250000L, 750000L, 75L, 7500000L, 1)))
    // b: no target → 0 everywhere, surplus
    assert(out("b") === (("b", 1L, 30L, 750000L, 0L, 0L, 0L, 0)))
  }

  test("corpusShuffle: a seeded permutation — partitioning-invariant, dense per-shard positions") {
    import spark.implicits._
    val docs = (1L to 500L).toDF("doc_id")
    val a = Terms.corpusShuffle(docs, "doc_id", "s1", nShards = 8)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    // same seed on a differently-partitioned input: identical assignment
    val b = Terms.corpusShuffle(docs.repartition(13), "doc_id", "s1", nShards = 8)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(a.toSeq === b.toSeq)
    // every doc appears once; positions are dense 0..n-1 within each shard
    assert(a.map(_._1).distinct.length === 500)
    a.groupBy(_._2).foreach { case (shard, rows) =>
      assert(rows.map(_._3).sorted.toSeq === (0L until rows.length).toSeq,
        s"shard $shard positions not dense")
    }
    // a different seed actually permutes (some doc moves shard or pos)
    val c = Terms.corpusShuffle(docs, "doc_id", "s2", nShards = 8)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(c.toSeq !== a.toSeq)
  }

  test("stitchPairs: adjacency reconstructed from content overlap only") {
    import spark.implicits._
    // chain 1→2→3 by 4-char overlaps; 9 overlaps nothing; 7's head equals
    // its own tail (self-match must be suppressed, not emitted)
    val shards = Seq(
      (1L, "abcdefgh"),
      (2L, "efghijkl"),
      (3L, "ijklmnop"),
      (7L, "wxyzwxyz"),
      (9L, "qqqqrrrr")).toDF("id", "t")
    val out = TextOps.stitchPairs(shards, "id", "t", 4)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(out === Set((1L, 2L), (2L, 3L)))
    // rows shorter than k never enter the join
    val short = Seq((1L, "ab"), (2L, "ab")).toDF("id", "t")
    assert(TextOps.stitchPairs(short, "id", "t", 4).count() === 0)
  }

  test("waterfillBudget: cap solves the budget; unbinding budget flags -1") {
    import spark.implicits._
    def doc(id: Long, src: String, n: Int) =
      (id, src, Seq.fill(n)("t").mkString(" "))
    // a:10, b:20, c:40 tokens; budget 50: f(a)=30<50, f(b)=50≥50 → the
    // cap sits in b's segment: c = (50−10)/2 = 20 → alloc 10+20+20 = 50
    val docs = Seq(doc(1, "a", 10), doc(2, "b", 20), doc(3, "c", 40))
      .toDF("doc_id", "source", "text")
    val out = Terms.waterfillBudget(docs, "text", "source", budget = 50L)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(out("a") === (("a", 1L, 10L, 20000000L, 10000000L)))
    assert(out("b") === (("b", 1L, 20L, 20000000L, 20000000L)))
    assert(out("c") === (("c", 1L, 40L, 20000000L, 20000000L)))
    // allocations must sum EXACTLY to the budget when it binds
    assert(out.values.map(_._5).sum === 50L * 1000000L)
    // budget ≥ corpus: cap unbounded (−1), everyone keeps everything
    val loose = Terms.waterfillBudget(docs, "text", "source", budget = 70L)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(loose.forall(_._4 === -1L))
    assert(loose.map(_._5).sum === 70L * 1000000L)
    // budget below the SMALLEST group: cap < min(tokens), uniform split
    val tight = Terms.waterfillBudget(docs, "text", "source", budget = 9L)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(tight.forall(_._4 === 3000000L), tight.mkString(","))
    assert(tight.forall(_._5 === 3000000L))
  }

  test("manifestMerge: incremental fold equals the one-shot manifest; edits flip the cell") {
    import spark.implicits._
    def corpus(rows: (Long, String, String, String)*) =
      rows.map { case (id, t, l, s) => (id, t, l, s) }
        .toDF("doc_id", "text", "lang", "source")
    val a = corpus((1L, "a b", "en", "web"), (2L, "c d e", "en", "web"),
      (3L, "x", "de", "crawl"))
    val b = corpus((4L, "f g", "en", "web"), (5L, "y z", "fr", "books"))
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select("source", "lang", "n_docs", "n_tokens", "min_id", "max_id",
        "content_checksum")
      .as[(String, String, Long, Long, Long, Long, Long)].collect().toSet
    // the algebra: merge(manifest(A), B) == manifest(A ∪ B), bit-exact
    val oneShot = canon(TextOps.corpusManifest(a.unionByName(b)))
    val folded = canon(TextOps.manifestMerge(TextOps.corpusManifest(a), b))
    assert(folded === oneShot && oneShot.size === 3)
    // a single altered character flips exactly its (source, lang) cell
    val tampered = canon(TextOps.corpusManifest(
      corpus((1L, "a B", "en", "web"), (2L, "c d e", "en", "web"),
        (3L, "x", "de", "crawl")).unionByName(b)))
    val diff = tampered.diff(oneShot).map(r => (r._1, r._2))
    assert(diff === Set(("web", "en")))
  }

  test("waterfillBudget: degenerate group cardinality fails loudly, not single-task") {
    import spark.implicits._
    // groupCol = the per-document key: the measured-group-count guard
    // must reject it BEFORE the unpartitioned windows serialize a
    // corpus-sized frame into one task (the groupedQuantile doctrine)
    val perDoc = (1L to 50L).map(i => (i, s"d$i", "w x y z")).toDF("doc_id", "source", "text")
    val e = intercept[IllegalArgumentException] {
      Terms.waterfillBudget(perDoc, "text", "source", budget = 10L, maxGroups = 20L)
    }
    assert(e.getMessage.contains("maxGroups"))
    assert(e.getMessage.contains("range-partitioned")) // names the distributed alternative
    // at-or-under the bound still computes
    assert(Terms.waterfillBudget(perDoc, "text", "source",
      budget = 10L, maxGroups = 50L).count() === 50L)
  }

  test("containment pairs: an embedded copy scores ~1 on the contained side") {
    import spark.implicits._
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    // doc 2 CONTAINS doc 1 (same text + a distinct tail): Jaccard < 1 but
    // containment(A in B) must be exactly 1.0
    val docs = Seq((1L, base), (2L, base + " extra trailing words here")).toDF("doc_id", "text")
    val out = NearDup.minhashLshContainmentFromRows(
        TextOps.wordShingleRows(docs, "doc_id", "text", 3), k = 16, bands = 8)
      .as[(Long, Long, Double, Double)].collect()
    assert(out.length === 1)
    val (a, b, ca, cb) = out.head
    assert((a, b) === ((1L, 2L)))
    // doc 1: 38 distinct 3-gram shingles, all present in doc 2's 42
    assert(ca === 1.0)
    assert(cb === math.rint(38.0 / 42.0 * 10000) / 10000)
  }

  test("weightedSample: weight-proportional ranks match an independent JVM reference") {
    import spark.implicits._
    // independent reference: JDK md5 → u → ln(u)/w ranking, no Spark
    val rows = (1L to 50L).map(i => (i, if (i % 2 == 0) "even" else "odd", i * 3))
    val md = java.security.MessageDigest.getInstance("MD5")
    def key(id: Long, w: Long): Double = {
      val hex = md.digest(s"wres|$id".getBytes("UTF-8")).map("%02x".format(_)).mkString
      val u = (java.lang.Long.parseLong(hex.take(8), 16) + 1L).toDouble / 4294967296.0
      math.log(u) / w.toDouble
    }
    val expected = rows.groupBy(_._2).flatMap { case (g, rs) =>
      rs.sortBy(r => (-key(r._1, r._3), r._1)).take(5).zipWithIndex
        .map { case (r, i) => (r._1, g, r._3, i + 1) }
    }.toSet
    val got = Terms.weightedSample(rows.toDF("doc_id", "lang", "w"),
        "doc_id", "lang", "w", k = 5)
      .as[(Long, String, Long, Int)].collect().toSet
    assert(got === expected)
    // heavier weights must win more slots than a uniform draw would give:
    // re-weight doc 2 to dominate and confirm it enters the sample
    val skew = rows.map { case (id, g, _) => (id, g, if (id == 2L) 100000L else 1L) }
    val topSkew = Terms.weightedSample(skew.toDF("doc_id", "lang", "w"),
        "doc_id", "lang", "w", k = 1).as[(Long, String, Long, Int)].collect()
    assert(topSkew.find(_._2 == "even").map(_._1).contains(2L))
  }

  test("dedupSweep: hand curve incl. zero-survivor threshold rows") {
    import spark.implicits._
    val pairs = Seq(
      (1L, 2L, 0.95), (1L, 3L, 0.95), (4L, 5L, 0.60), (6L, 7L, 0.20))
      .toDF("id_a", "id_b", "jaccard")
    val out = NearDup.dedupSweep(pairs, "jaccard", Seq(0.1, 0.5, 0.9, 0.99))
      .as[(Double, Long, Long)].collect().sortBy(_._1).toSeq
    assert(out === Seq(
      (0.1, 4L, 7L),    // all pairs, docs {1..7}
      (0.5, 3L, 5L),    // drops (6,7): docs {1,2,3,4,5}
      (0.9, 2L, 3L),    // keeps the 0.95 pair family: docs {1,2,3}
      (0.99, 0L, 0L)))  // nothing survives — row still present
  }

  test("dedupClusters: caller-session conf is never touched; result is caller-rooted") {
    import spark.implicits._
    val pairs = (1L to 30L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val beforeParts = spark.conf.get("spark.sql.shuffle.partitions")
    val beforeAqe = spark.conf.get("spark.sql.adaptive.enabled")
    // force the child-session loop — the tier this test is about
    val out = NearDup.dedupClusters(pairs, "id_a", "id_b", maxLocalPairs = 0L)
    // the loop runs on a child session: even while the returned frame is
    // still lazy, the caller's conf has its original values (the old
    // implementation only RESTORED them, so a query planned mid-loop
    // could observe loop settings)
    assert(spark.conf.get("spark.sql.shuffle.partitions") === beforeParts)
    assert(spark.conf.get("spark.sql.adaptive.enabled") === beforeAqe)
    // re-rooted: downstream plans (joins with caller frames) never
    // reference the child session
    assert(out.sparkSession eq spark)
    val keepers = out.as[(Long, Long)].collect().toMap
    assert(keepers.size === 31 && keepers.values.forall(_ == 1L))
    assert(spark.conf.get("spark.sql.shuffle.partitions") === beforeParts)
    assert(spark.conf.get("spark.sql.adaptive.enabled") === beforeAqe)
  }

  test("persisted corpus band index: bucket-pruned probe, no corpus-side shuffle in band join") {
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
    val bandFrame = NearDup.corpusIndex(
      docs.filter(col("doc_id") % 5 =!= 0), "doc_id", "text").bands
    val tbl = "corpus_band_index_spec"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    bandFrame.write.bucketBy(8, "band_hash").sortBy("band_hash")
      .format("parquet").saveAsTable(tbl)
    val t = spark.table(tbl)
    val probeHash = t.select(col("band_hash")).head().getString(0)
    // autoBucketedScan hides pruning on bare filter scans (see the IVF
    // spec); a real probe pipeline keeps it on and still wins on the join
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try {
      // (a) a band-hash equality probe reads only its bucket
      val scanPlan = t.filter(col("band_hash") === probeHash)
        .queryExecution.executedPlan.toString
      val sel = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
      val m = sel.findFirstMatchIn(scanPlan)
      assert(m.isDefined, s"no bucket pruning in plan:\n$scanPlan")
      assert(m.get.group(1).toInt < m.get.group(2).toInt)
      // (b) the batch-bands probe join shuffles ONLY the batch side into
      // the bucket layout — the corpus index itself is never exchanged
      // (broadcast disabled to force the at-scale shuffle-join shape)
      val batchBands = NearDup.corpusIndex(
        docs.filter(col("doc_id") % 5 === 0), "doc_id", "text").bands
      val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val joined = t.as("c").join(batchBands.as("b"),
          col("c.band_hash") === col("b.band_hash"))
        val lines = joined.queryExecution.executedPlan.toString.linesIterator.toVector
        // corpus side = the join's FIRST child, ending at the bucketed
        // scan: it must contain no shuffle (the batch side keeps its own
        // internal shuffles and one exchange INTO the bucket layout)
        val join = lines.indexWhere(_.contains("SortMergeJoin"))
        val scan = lines.indexWhere(_.contains("Bucketed: true"))
        assert(join >= 0 && scan > join, s"unexpected plan shape:\n${lines.mkString("\n")}")
        val corpusSide = lines.slice(join, scan + 1)
        assert(!corpusSide.exists(_.contains("Exchange")),
          s"corpus index side still shuffles:\n${corpusSide.mkString("\n")}")
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
    } finally {
      spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "true")
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
    }
  }

  test("incrementalDedupIndexed over reopened persisted index tables matches the direct path") {
    import spark.implicits._
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
    val corpus = docs.filter(col("doc_id") % 5 =!= 0)
    val batch = docs.filter(col("doc_id") % 5 === 0)
    val direct = NearDup.incrementalDedup(corpus, batch, "doc_id", "text",
        minJaccard = 0.5)
      .as[(Long, String, Option[Long], Option[Double])].collect().toSet
    val idx = NearDup.corpusIndex(corpus, "doc_id", "text")
    val tbls = Seq("cidx_bands" -> idx.bands, "cidx_sets" -> idx.sets,
      "cidx_hashes" -> idx.hashes)
    tbls.foreach { case (n, df) => spark.sql(s"DROP TABLE IF EXISTS $n") }
    idx.bands.write.bucketBy(8, "band_hash").format("parquet").saveAsTable("cidx_bands")
    idx.sets.write.format("parquet").saveAsTable("cidx_sets")
    idx.hashes.write.bucketBy(8, "ch").format("parquet").saveAsTable("cidx_hashes")
    try {
      val reopened = NearDup.CorpusIndex(spark.table("cidx_bands"),
        spark.table("cidx_sets"), spark.table("cidx_hashes"))
      val indexed = NearDup.incrementalDedupIndexed(reopened, batch,
          "doc_id", "text", minJaccard = 0.5)
        .as[(Long, String, Option[Long], Option[Double])].collect().toSet
      assert(indexed === direct)
      assert(direct.exists(_._2 == "near"), "fixture should exercise the near path")
    } finally tbls.foreach { case (n, _) => spark.sql(s"DROP TABLE IF EXISTS $n") }
  }

  test("winnowing: density below 1, shared-run guarantee, short-doc fallback") {
    import spark.implicits._
    val shared = "alpha beta gamma delta epsilon zeta eta theta" // 8 tokens
    val docs = Seq(
      (1L, s"one two three four five six $shared nine ten eleven twelve"),
      (2L, s"$shared completely different tail content here now"),
      (3L, "tiny doc four tokens"),       // 4 tokens → 1 gram → global-min path
      (4L, "three token doc"))            // < k tokens → no fingerprints
      .toDF("doc_id", "text")
    val fps = TextOps.winnowedFingerprints(docs, "doc_id", "text", k = 4, w = 4)
      .as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // guarantee: docs 1 and 2 share an 8-token run >= w+k-1 = 7 → must
    // share at least one fingerprint
    assert(fps(1L).intersect(fps(2L)).nonEmpty,
      s"winnowing guarantee violated: ${fps(1L)} vs ${fps(2L)}")
    // density: fewer fingerprints than grams (doc 1 has 15 grams)
    assert(fps(1L).size < 15 && fps(1L).nonEmpty)
    assert(fps(3L).size === 1, "4-token doc has exactly its one gram hash")
    assert(!fps.contains(4L), "sub-k doc must emit nothing")
    // determinism: rerun is identical
    val again = TextOps.winnowedFingerprints(docs, "doc_id", "text", k = 4, w = 4)
      .as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(again === fps)
  }

  test("fingerprintOverlapPairs: shared passage pairs, boilerplate fps dropped") {
    import spark.implicits._
    val passage = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val boiler = "standard legal disclaimer footer text all rights reserved"
    // 1 and 2 share a 10-token passage; 3 is unrelated; the boilerplate
    // footer appears in ALL docs (> maxDocFreq=3 would need 4 docs — use
    // maxDocFreq=2 so the 3-doc footer is dropped as boilerplate)
    val docs = Seq(
      (1L, s"$passage unique opening one two three $boiler"),
      (2L, s"totally different start here $passage $boiler"),
      (3L, s"unrelated content about catalyst tungsten shuffles $boiler"))
      .toDF("doc_id", "text")
    val pairs = TextOps.fingerprintOverlapPairs(docs, "doc_id", "text",
        k = 4, w = 4, maxDocFreq = 2, minShared = 2)
      .as[(Long, Long, Long)].collect().toSeq.sortBy(p => (p._1, p._2))
    // only (1,2) — via the shared passage; the footer fps (df=3) are
    // dropped, so doc 3 pairs with nobody
    assert(pairs.map(p => (p._1, p._2)) === Seq((1L, 2L)))
    assert(pairs.head._3 >= 2)
    // raising the frequency cap admits the footer: doc 3 may now pair,
    // but only if it shares >= minShared SELECTED fps — with one footer
    // run its overlap stays below 2, so (1,2) remains the only pair
    // unless the footer contributes >= 2 winnowed fps
    val loose = TextOps.fingerprintOverlapPairs(docs, "doc_id", "text",
        k = 4, w = 4, maxDocFreq = 3, minShared = 1)
      .as[(Long, Long, Long)].collect().toSeq
    assert(loose.map(p => (p._1, p._2)).toSet.contains((1L, 2L)))
    assert(loose.exists(p => p._1 == 3L || p._2 == 3L),
      "with the cap loosened the shared footer must link doc 3")
  }

  test("CorpusBuild tool: build-once/probe-many round-trip matches the direct path") {
    import spark.implicits._
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
    val corpus = docs.filter(col("doc_id") % 5 =!= 0)
    val batch = docs.filter(col("doc_id") % 5 === 0)
    val out = java.nio.file.Files.createTempDirectory("graft-corpus").toString
    // NON-default signature params: the probe must recover them from the
    // persisted meta, not from its own defaults — a k/bands mismatch is
    // silent (empty candidate join, everything 'new'), which is exactly
    // why they are part of the artifact
    graft.tools.CorpusBuild.build(spark, corpus, out, k = 32, bands = 16,
      buckets = 4)
    try {
      val opened = graft.tools.CorpusBuild.openIndex(spark, out)
      assert(opened.meta === graft.tools.CorpusBuild.IndexMeta(32, 16, 4))
      // (a) the reopened index answers a tick EXACTLY like the direct path
      val direct = NearDup.incrementalDedup(corpus, batch, "doc_id", "text",
          k = 32, bands = 16, minJaccard = 0.5)
        .as[(Long, String, Option[Long], Option[Double])].collect().toSet
      val served = NearDup.incrementalDedupIndexed(opened.index, batch,
          "doc_id", "text", k = opened.meta.k, bands = opened.meta.bands,
          minJaccard = 0.5)
        .as[(Long, String, Option[Long], Option[Double])].collect().toSet
      assert(served === direct)
      assert(direct.exists(_._2 == "near"), "fixture should exercise the near path")
      // (b) the reopened band table still bucket-prunes an equality probe
      spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      try {
        val probe = opened.index.bands.select(col("band_hash")).head().getString(0)
        val plan = opened.index.bands.filter(col("band_hash") === probe)
          .queryExecution.executedPlan.toString
        val m = "SelectedBucketsCount: (\\d+) out of (\\d+)".r.findFirstMatchIn(plan)
        assert(m.isDefined && m.get.group(1).toInt < m.get.group(2).toInt,
          s"reopened band index lost bucket pruning:\n$plan")
      } finally
        spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "true")
    } finally graft.tools.CorpusBuild.dropTables(spark, out)
  }

  test("incrementalDedup: exact beats near, near picks best corpus match, rest are new") {
    import spark.implicits._
    val corpus = Seq(
      (10L, "the quick brown fox jumps over the lazy dog again and again"),
      (11L, "an unrelated corpus document about catalyst and tungsten"),
      (12L, "the quick brown fox jumps over the lazy dog again and again"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (5L, "the quick brown fox jumps over the lazy dog again and again"),  // exact (10 & 12 → min 10)
      (6L, "the quick brown fox jumps over the lazy dog again and again today"), // near
      (7L, "completely novel content that matches nothing in the corpus at all"))
      .toDF("doc_id", "text")
    val out = NearDup.incrementalDedup(corpus, batch, "doc_id", "text",
        minJaccard = 0.3)
      .as[(Long, String, Option[Long], Option[Double])]
      .collect().sortBy(_._1).toSeq
    assert(out.map(r => (r._1, r._2)) === Seq((5L, "exact"), (6L, "near"), (7L, "new")))
    assert(out(0)._3 === Some(10L) && out(0)._4 === Some(1.0))
    assert(out(1)._3.exists(id => id == 10L || id == 12L))
    assert(out(1)._4.exists(j => j > 0.3 && j < 1.0))
    assert(out(2)._3.isEmpty && out(2)._4.isEmpty)
  }

  test("canonicalizeUrl: each rule fires alone; already-canonical is a fixpoint") {
    import spark.implicits._
    val cases = Seq(
      // (input, expected canonical) — one rule per row
      ("HTTPS://EXAMPLE.com/a", "https://example.com/a"),           // scheme+host case
      ("http://example.com:80/a", "http://example.com/a"),          // http default port
      ("https://example.com:443/a", "https://example.com/a"),       // https default port
      ("http://example.com:8080/a", "http://example.com:8080/a"),   // NON-default port kept
      ("https://example.com/a/#sec", "https://example.com/a"),      // fragment + trailing slash
      ("https://example.com//a//", "https://example.com//a"),       // only TRAILING slashes trim
      ("https://example.com", "https://example.com/"),              // empty path → root
      ("https://example.com/?", "https://example.com/"),            // empty query drops the ?
      ("https://example.com/a?utm_source=x&utm_campaign=y", "https://example.com/a"),
      ("https://example.com/a?gclid=1&id=2&fbclid=3&ref=h", "https://example.com/a?id=2"),
      ("https://example.com/a?z=1&b=2&a=3", "https://example.com/a?a=3&b=2&z=1"), // param sort
      ("https://example.com/a?a=3&b=2&z=1", "https://example.com/a?a=3&b=2&z=1")) // fixpoint
    val got = cases.map(_._1).toDF("url")
      .select(graft.text.TextOps.canonicalizeUrl($"url")).as[String].collect()
    got.zip(cases).foreach { case (g, (in, want)) =>
      assert(g === want, s"canonicalizeUrl($in)") }
    // canonicalization is idempotent over the whole battery
    val twice = got.toSeq.toDF("url")
      .select(graft.text.TextOps.canonicalizeUrl($"url")).as[String].collect()
    assert(twice.toSeq === got.toSeq)
  }

  test("fuzzyUrlKey + urlDedup: scheme/www fuzz collapses; distinct resources survive") {
    import spark.implicits._
    val urls = Seq(
      (1L, "http://www.example.com/a?id=1"),
      (2L, "https://example.com/a/?id=1#x"),
      (3L, "HTTPS://WWW.Example.com:443/a?utm_source=t&id=1"),
      (4L, "https://example.com/b?id=1"), // different path: own group
      (5L, "https://example.com/a?id=2")) // different kept param: own group
      .toDF("doc_id", "url")
    val out = graft.text.TextOps.urlDedup(urls, "doc_id", "url")
      .as[(String, Long, String, Long)].collect().sortBy(_._2)
    assert(out.length === 3)
    val g1 = out(0)
    assert(g1._1 === "https://example.com/a?id=1" && g1._2 === 1L && g1._4 === 3L)
    // canon_url keeps the faithful spelling (min = the http variant here)
    assert(g1._3 === "http://www.example.com/a?id=1")
    assert(out(1)._2 === 4L && out(1)._4 === 1L)
    assert(out(2)._2 === 5L && out(2)._4 === 1L)
  }
}
