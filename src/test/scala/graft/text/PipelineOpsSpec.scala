package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.graph.PageRank

/** Round-6 pipeline operators: hashing-trick TF-IDF, stride chunking,
  * exact top-quantile gate, capped dedup, integer PageRank. Every
  * constant below is computed INDEPENDENTLY (by hand or by a different
  * formula) from the operator under test.
  */
class PipelineOpsSpec extends SparkSpec {

  test("hashedTfIdf: tf sums to token count; idf matches hand formula; w snapped") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b a c"),   // 4 tokens
      (2L, "a a a a"),   // 4 tokens
      (3L, "d e f g h")) // 5 tokens
      .toDF("doc_id", "text")
    val out = Terms.hashedTfIdf(docs, "doc_id", "text", dims = 1024).cache()
    // with 1024 dims and 8 distinct single-char tokens, collisions are
    // possible but tf must still sum to the corpus token count
    assert(out.agg(sum("tf")).head.getLong(0) === 13L)
    // doc 2 is one token repeated: exactly one dim, tf 4
    val d2 = out.filter($"doc_id" === 2L).collect()
    assert(d2.length === 1 && d2(0).getAs[Long]("tf") === 4L)
    // every row: w_micro == floor(tf * ln((N+1)/(df+1)) * 1e6 + 0.5), N=3
    val bad = out.filter(
      col("w_micro") =!= floor(col("tf") * log((lit(3.0) + 1.0) / (col("df") + lit(1.0))) * 1e6 + 0.5).cast("long"))
    assert(bad.count() === 0)
    // dims bound respected
    assert(out.agg(max("dim")).head.getLong(0) < 1024L)
    out.unpersist()
  }

  test("chunkWindows tiles every doc: full windows then a clipped tail") {
    import spark.implicits._
    // 7 tokens, len=4, stride=2 -> starts 0,2,4,6 with lens 4,4,3,1
    val docs = Seq((1L, "t0 t1 t2 t3 t4 t5 t6"), (2L, ""), (3L, "x")).toDF("doc_id", "text")
    val rows = Terms.chunkWindows(docs, "doc_id", "text", len = 4, stride = 2)
      .orderBy("doc_id", "chunk_id")
      .select("doc_id", "chunk_id", "start_tok", "chunk_len")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(rows === Seq(
      (1L, 0L, 0L, 4L), (1L, 1L, 2L, 4L), (1L, 2L, 4L, 3L), (1L, 3L, 6L, 1L),
      (3L, 0L, 0L, 1L))) // empty doc 2 emits nothing
  }

  test("topQuantileGate == brute-force top-K by (score desc, id asc), incl. ties") {
    import spark.implicits._
    // scores engineered so the threshold bucket has a 3-way tie and the
    // quota splits it: 10 docs, frac 0.5 -> K = 5
    val docs = (1L to 10L).map { i =>
      val score = if (i <= 3) 0.9 else if (i <= 8) 0.5 else 0.1
      (i, score)
    }.toDF("doc_id", "s")
    val got = Terms.topQuantileGate(docs, "doc_id", col("s"), frac = 0.5)
      .select("doc_id").as[Long].collect().toSet
    // brute force: ids 1,2,3 at 0.9 then ids 4,5 of the 0.5 tie (doc order)
    assert(got === Set(1L, 2L, 3L, 4L, 5L))
    // frac = 1.0 keeps everything
    assert(Terms.topQuantileGate(docs, "doc_id", col("s"), 1.0).count() === 10L)
  }

  test("topQuantileGate degenerate shape: dominant tie bucket takes the range walk") {
    import spark.implicits._
    // 400 docs all at one score value + a handful above: the boundary
    // bucket IS the corpus. windowCap=16 forces the id-range walk; ids
    // are scattered across a wide sparse range so the walk must recurse.
    val docs = ((1L to 5L).map(i => (i * 1000000007L, 0.9)) ++
      (1L to 400L).map(i => (i * 999999937L + 13L, 0.5))).toDF("doc_id", "s")
    val got = Terms.topQuantileGate(docs, "doc_id", col("s"), frac = 0.25,
        windowCap = 16L)
      .select("doc_id").as[Long].collect().toSet
    // brute force in memory: K = ceil(0.25*405) = 102 -> 5 top + 97
    // smallest ids of the tie bucket
    val expect = ((1L to 5L).map(_ * 1000000007L) ++
      (1L to 400L).map(_ * 999999937L + 13L).sorted.take(97)).toSet
    assert(got === expect)
    // exact slice-boundary crossings (frac chosen so r lands on a
    // boundary for some slicing) still agree with brute force
    val got2 = Terms.topQuantileGate(docs, "doc_id", col("s"), frac = 1.0,
        windowCap = 16L).count()
    assert(got2 === 405L)
  }

  test("topQuantileGate / groupedMedian: unbounded score fails loudly, not at the driver") {
    import spark.implicits._
    val docs = (1L to 50L).map(i => (i, i.toDouble)).toDF("doc_id", "s")
    val e1 = intercept[IllegalArgumentException] {
      Terms.topQuantileGate(docs, "doc_id", col("s"), 0.5).count()
    }
    assert(e1.getMessage.contains("bounded quality"))
    val e2 = intercept[IllegalArgumentException] {
      Terms.groupedMedian(docs.withColumn("g", lit("x")), "g", col("s")).count()
    }
    assert(e2.getMessage.contains("bounded quality"))
  }

  test("groupedMedian: non-string group keys work; cell-cap violation is loud") {
    import spark.implicits._
    val docs = (1L to 40L).map(i => (i, i % 4, (i % 10) / 10.0)).toDF("doc_id", "g", "s")
    val medians = Terms.groupedMedian(docs, "g", col("s"))
      .select("grp", "median_micro").as[(String, Long)].collect().toMap
    // group g: scores are a permutation of {g/10, (g+4)/10, ... } — check
    // one by brute force: group 0 has scores {0.0,0.4,0.8}×... compute:
    val brute = (1L to 40L).map(i => (i % 4, (i % 10) / 10.0))
      .groupBy(_._1).map { case (g, xs) =>
        val s = xs.map(x => math.floor(x._2 * 1e6 + 0.5).toLong).sorted
        (g.toString, s((s.length + 1) / 2 - 1))
      }
    brute.foreach { case (g, m) => assert(medians(g) === m, s"group $g") }
    val e = intercept[IllegalArgumentException] {
      Terms.groupedMedian(docs, "doc_id", col("s"), maxHistCells = 10L).count()
    }
    assert(e.getMessage.contains("cells"))
  }

  test("groupedQuantile: p90/p25 match percentile_disc by hand, ties and exact ranks included") {
    import spark.implicits._
    // group a: scores 0.1..1.0 (n=10): p90 rank = ceil(9) = 9 -> 0.9;
    // p25 rank = ceil(2.5) = 3 -> 0.3. group b: ties {0.2,0.2,0.8}
    // (n=3): p90 rank = ceil(2.7) = 3 -> 0.8; p25 rank = 1 -> 0.2.
    val docs = ((1 to 10).map(i => ("a", i / 10.0)) ++
      Seq(("b", 0.2), ("b", 0.2), ("b", 0.8))).toDF("g", "s")
    def q(num: Long, den: Long) =
      Terms.groupedQuantile(docs, "g", col("s"), num, den)
        .select("grp", "quantile_micro").as[(String, Long)].collect().toMap
    assert(q(9L, 10L) === Map("a" -> 900000L, "b" -> 800000L))
    assert(q(1L, 4L) === Map("a" -> 300000L, "b" -> 200000L))
    // p = 1 is the max; the rational form makes exact multiples exact
    assert(q(1L, 1L) === Map("a" -> 1000000L, "b" -> 800000L))
  }

  test("dedupCapped keeps the k lowest ids per duplicate group") {
    import spark.implicits._
    val docs = Seq(
      (5L, "same"), (3L, "same"), (9L, "same"), (1L, "same"),
      (2L, "other"), (7L, "other"),
      (4L, "unique")).toDF("doc_id", "text")
    val kept = NearDup.dedupCapped(docs, "doc_id", "text", maxCopies = 2)
      .select("doc_id", "copy_rank")
      .as[(Long, Int)].collect().toMap
    // "same" group sorted: 1,3,5,9 -> keep 1,3; "other": 2,7; "unique": 4
    assert(kept === Map(1L -> 1, 3L -> 2, 2L -> 1, 7L -> 2, 4L -> 1))
  }

  test("pageRankMicro on the 3-path matches the hand-iterated integer recurrence") {
    import spark.implicits._
    // path graph 1-2-3: deg(1)=deg(3)=1, deg(2)=2.
    // r0 = 1_000_000 each.
    // iter1: c(1)=c(3)=r0(2) div 2=500_000 -> r=150_000+(500_000*85) div 100=575_000
    //        c(2)=r0(1)+r0(3)=2_000_000   -> r=150_000+1_700_000=1_850_000
    // iter2: c(1)=c(3)=1_850_000 div 2=925_000 -> r=150_000+786_250=936_250
    //        c(2)=575_000+575_000=1_150_000    -> r=150_000+977_500=1_127_500
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val ranks = PageRank.pageRankMicro(edges, "a", "b", iters = 2)
      .select("node", "rank_micro").as[(Long, Long)].collect().toMap
    assert(ranks === Map(1L -> 936250L, 2L -> 1127500L, 3L -> 936250L))
    // rank column is just micro / 1e6
    val r = PageRank.pageRankMicro(edges, "a", "b", iters = 2)
      .filter($"node" === 2L).select("rank").as[Double].head()
    assert(r === 1.1275)
  }

  test("pageRankMicro checkpointing is plan-only: bit-identical ranks, unlocks >20 iters") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L)).toDF("a", "b")
    val plain = PageRank.pageRankMicro(edges, "a", "b", iters = 7)
      .select("node", "rank_micro").as[(Long, Long)].collect().toMap
    val ckpt = PageRank.pageRankMicro(edges, "a", "b", iters = 7,
        checkpointEvery = 3)
      .select("node", "rank_micro").as[(Long, Long)].collect().toMap
    assert(plain === ckpt, "checkpointing changed integer ranks")
    // past the unrolled budget: rejected plain, accepted checkpointed —
    // and on this symmetric cycle the long run converges to equal ranks
    assertThrows[IllegalArgumentException] {
      PageRank.pageRankMicro(edges, "a", "b", iters = 40)
    }
    val long = PageRank.pageRankMicro(edges, "a", "b", iters = 40,
        checkpointEvery = 10)
      .select("node", "rank_micro").as[(Long, Long)].collect().toMap
    assert(long.values.toSet.size === 1,
      s"4-cycle must converge to equal ranks: $long")
  }

  test("duplicatedSpans merges runs, honours span threshold, ignores unique text") {
    import spark.implicits._
    // shared verbatim run of 10 tokens (s0..s9) inside otherwise-unique
    // docs; with n=3 the duplicated gram positions in doc 1 are
    // 2..9 (grams starting inside the shared run), span = [2, 9+2] = 11
    // tokens... the shared run occupies positions 2..11 in doc 1 and
    // 0..9 in doc 2; duplicated gram STARTS are 2..9 (doc 1) and 0..7
    // (doc 2), so spans are exactly the 10-token runs in each doc.
    val shared = (0 until 10).map(i => s"s$i").mkString(" ")
    val docs = Seq(
      (1L, s"u1 u2 $shared u3 u4"),
      (2L, s"$shared u5 u6 u7"),
      (3L, "all unique words here nothing repeats at all ever")).toDF("doc_id", "text")
    val spans = NearDup.duplicatedSpans(docs, "doc_id", "text",
      n = 3, minOccurrences = 2L, minSpanTokens = 10L)
      .select("doc_id", "span_start", "span_end", "span_tokens")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(spans === Set((1L, 2L, 11L, 10L), (2L, 0L, 9L, 10L)))
    // raising the threshold past the run length drops both spans
    assert(NearDup.duplicatedSpans(docs, "doc_id", "text", 3, 2L, 11L).count() === 0)
    // two separate shared runs in one doc must NOT merge across the gap
    val docs2 = Seq(
      (1L, s"$shared gap1 gap2 gap3 $shared"),
      (2L, shared)).toDF("doc_id", "text")
    val spans2 = NearDup.duplicatedSpans(docs2, "doc_id", "text", 3, 2L, 10L)
      .filter($"doc_id" === 1L)
      .select("span_start", "span_end").as[(Long, Long)].collect().toSet
    assert(spans2 === Set((0L, 9L), (13L, 22L)))
  }

  test("duplicatedSpans fuses islands whose TOKEN extents overlap") {
    import spark.implicits._
    // doc A shares s0..s3 with B and s3..s7 with C: A's duplicated gram
    // STARTS are {0,1} and {3,4,5} (n=3) — a start gap of 2 = n-1, so
    // the token ranges [0,3] and [3,7] overlap at token 3 and MUST fuse
    // into one 8-token span. A start-adjacency island rule instead
    // emits overlapping fragments of 4 and 5 tokens that both duck a
    // minSpanTokens=8 threshold (the bug class this pins).
    val docs = Seq(
      (1L, "s0 s1 s2 s3 s4 s5 s6 s7 x1 x2"),
      (2L, "s0 s1 s2 s3 y1"),
      (3L, "s3 s4 s5 s6 s7 z1")).toDF("doc_id", "text")
    val spans = NearDup.duplicatedSpans(docs, "doc_id", "text",
      n = 3, minOccurrences = 2L, minSpanTokens = 8L)
      .filter($"doc_id" === 1L)
      .select("span_start", "span_end", "span_tokens")
      .as[(Long, Long, Long)].collect().toSeq
    assert(spans === Seq((0L, 7L, 8L)))
    // conservation through the trim: 10 tokens - 8 cut = 2 kept
    val kept = NearDup.trimSpans(docs, "doc_id", "text", 3, 2L, 8L)
      .filter($"doc_id" === 1L)
      .select("text_trimmed", "n_tokens_kept").as[(String, Long)].head()
    assert(kept === (("x1 x2", 2L)))
  }

  test("duplicatedSpans fuses TOUCHING islands (period-n comb cannot fragment)") {
    import spark.implicits._
    // doc 1's duplicated gram starts are exactly {0, 3, 6} (n=3): each
    // 3-gram is shared with a different short doc, the cross-boundary
    // grams are unique. Token extents [0,2],[3,5],[6,8] touch without
    // overlapping — one contiguous 9-token duplicated region. The old
    // gap > n-1 rule split it into three 3-token spans that each ducked
    // minSpanTokens=9 (advisor, r06); the gap > n rule fuses them.
    val docs = Seq(
      (1L, "a0 a1 a2 b0 b1 b2 c0 c1 c2"),
      (2L, "a0 a1 a2 pb"),
      (3L, "b0 b1 b2 pc"),
      (4L, "c0 c1 c2 pd")).toDF("doc_id", "text")
    val spans = NearDup.duplicatedSpans(docs, "doc_id", "text",
      n = 3, minOccurrences = 2L, minSpanTokens = 9L)
      .select("doc_id", "span_start", "span_end", "span_tokens")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(spans === Set((1L, 0L, 8L, 9L)))
    // the fully-covered doc vanishes under trim; the short partners keep
    // their tails (their own 3-token spans are under the threshold)
    val out = NearDup.trimSpans(docs, "doc_id", "text", 3, 2L, 9L)
      .select("doc_id").as[Long].collect().toSet
    assert(out === Set(2L, 3L, 4L))
  }

  test("trimSpans cuts exactly the span ranges; full-dup docs vanish") {
    import spark.implicits._
    val shared = (0 until 10).map(i => s"s$i").mkString(" ")
    val docs = Seq(
      (1L, s"u1 u2 $shared u3 u4"), // span [2, 11] -> keeps u1 u2 u3 u4
      (2L, shared),                 // fully duplicated -> vanishes
      (3L, "totally unique content that survives intact")).toDF("doc_id", "text")
    val out = NearDup.trimSpans(docs, "doc_id", "text",
      n = 3, minOccurrences = 2L, minSpanTokens = 10L)
      .select("doc_id", "text_trimmed", "n_tokens_kept")
      .as[(Long, String, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out.keySet === Set(1L, 3L))
    assert(out(1L) === (("u1 u2 u3 u4", 4L)))
    assert(out(3L) === (("totally unique content that survives intact", 6L)))
  }

  test("cross-operator invariants on the sf0.001 corpus") {
    import spark.implicits._
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")

    // trim conservation: kept tokens + cut span tokens == doc tokens,
    // for every document (spans are disjoint maximal runs; trimSpans
    // cuts exactly the spans duplicatedSpans reports at the same params)
    val total = docs.select(col("doc_id"),
      TextOps.tokenCount(col("text")).cast("long").as("n"))
    val cut = NearDup.duplicatedSpans(docs, "doc_id", "text", 8, 2L, 24L)
      .groupBy("doc_id").agg(sum("span_tokens").as("cut"))
    val kept = NearDup.trimSpans(docs, "doc_id", "text", 8, 2L, 24L)
      .select(col("doc_id"), col("n_tokens_kept"))
    val bad = total.join(cut, Seq("doc_id"), "left")
      .join(kept, Seq("doc_id"), "left")
      .filter(coalesce(col("cut"), lit(0L)) + coalesce(col("n_tokens_kept"), lit(0L))
        =!= col("n"))
    assert(bad.count() === 0, "trim must conserve tokens exactly")

    // hashedTfIdf: per-doc tf mass equals the token count
    val tfMass = Terms.hashedTfIdf(docs, "doc_id", "text", 64)
      .groupBy("doc_id").agg(sum("tf").as("mass"))
    val badTf = total.join(tfMass, Seq("doc_id"), "left")
      .filter(coalesce(col("mass"), lit(0L)) =!= col("n"))
    assert(badTf.count() === 0, "hashing must not lose token occurrences")

    // chunkWindows tiling: starts are stride-multiples from 0; every
    // token position is covered by >= 1 window; lens are in (0, len]
    val ch = Terms.chunkWindows(docs, "doc_id", "text", 32, 16).cache()
    assert(ch.filter(pmod(col("start_tok"), lit(16L)) =!= 0L).count() === 0)
    assert(ch.filter(col("chunk_len") <= 0L || col("chunk_len") > 32L).count() === 0)
    val covered = ch.select(col("doc_id"),
        explode(sequence(col("start_tok"), col("start_tok") + col("chunk_len") - 1))
          .as("p")).distinct().groupBy("doc_id").agg(count(lit(1)).as("np"))
    val badCover = total.filter(col("n") > 0)
      .join(covered, Seq("doc_id"), "left")
      .filter(coalesce(col("np"), lit(0L)) =!= col("n"))
    assert(badCover.count() === 0, "windows must cover every token position")
    ch.unpersist()
  }

  test("sizedSemiJoin: forced-low threshold (shuffle path) equals broadcast path, plans differ") {
    import spark.implicits._
    val probe = Seq((1L, 10L), (2L, 20L), (3L, 30L), (4L, 20L), (5L, 99L))
      .toDF("id", "hg")
    val keys = Seq(20L, 99L, 777L).toDF("hg")
    val bcast = TextOps.sizedSemiJoin(probe, keys, "hg", maxBroadcastKeys = 1000L)
    val shuffled = TextOps.sizedSemiJoin(probe, keys, "hg", maxBroadcastKeys = 1L)
    assert(bcast.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
    assert(!shuffled.queryExecution.executedPlan.toString.contains("Broadcast"))
    val a = bcast.as[(Long, Long)].collect().toSet
    val b = shuffled.as[(Long, Long)].collect().toSet
    assert(a === b && a === Set((20L, 2L), (20L, 4L), (99L, 5L)))
  }

  test("q61 decontamination output is identical under a forced shuffle semi-join") {
    // the whole pipeline stage, not just the join primitive: grams of the
    // sf0.001 corpus vs its % 20 benchmark slice, both strategies
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
    def grams(df: org.apache.spark.sql.DataFrame) =
      TextOps.wordShingleRows(df, "doc_id", "text", 8)
        .select(col("id"), TextOps.gramHash64(spark, col("g")).as("hg"))
    val bench = grams(docs.filter(col("doc_id") % 20 === 0)).select("hg").distinct()
    val corpus = grams(docs.filter(col("doc_id") % 20 =!= 0))
    def hits(threshold: Long) =
      TextOps.sizedSemiJoin(corpus, bench, "hg", threshold)
        .select(col("id")).distinct()
        .collect().map(_.getLong(0)).toSet
    val viaBroadcast = hits(Long.MaxValue)
    val viaShuffle = hits(0L)
    assert(viaBroadcast === viaShuffle && viaBroadcast.nonEmpty)
  }

  test("leakage-safe split: near-dup pair members always share a split") {
    import spark.implicits._
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
    val pairs = NearDup.minhashLshPairsFromRows(
      TextOps.wordShingleRows(docs, "doc_id", "text", 3), k = 16, bands = 8)
      .select("id_a", "id_b").cache()
    assert(pairs.count() > 0, "fixture must contain near-dup pairs or the test is vacuous")
    val clusters = NearDup.dedupClusters(pairs, "id_a", "id_b")
    val split = docs.select(col("doc_id"))
      .join(clusters, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("keeper_id"), col("doc_id")).as("split_key"))
      .withColumn("b", (TextOps.hashPrefix("split|", col("split_key")) % 10).cast("int"))
      .select(col("doc_id"), col("b"))
    val leaked = pairs
      .join(split.withColumnRenamed("doc_id", "id_a").withColumnRenamed("b", "ba"), Seq("id_a"))
      .join(split.withColumnRenamed("doc_id", "id_b").withColumnRenamed("b", "bb"), Seq("id_b"))
      .filter(col("ba") =!= col("bb"))
    assert(leaked.count() === 0, "paired docs must never straddle a split boundary")
    pairs.unpersist()
  }

  test("groupedMedian == percentile_disc(0.5) on hand cases incl. even n and ties") {
    import spark.implicits._
    // group a: odd n=3, values .1 .2 .9 -> median .2
    // group b: even n=4, values .1 .4 .6 .8 -> disc median = 2nd = .4
    // group c: ties, n=5, values .3 .3 .3 .7 .7 -> median .3
    val docs = Seq(
      ("a", 0.1), ("a", 0.2), ("a", 0.9),
      ("b", 0.1), ("b", 0.4), ("b", 0.6), ("b", 0.8),
      ("c", 0.3), ("c", 0.3), ("c", 0.3), ("c", 0.7), ("c", 0.7))
      .toDF("k", "s")
    val out = Terms.groupedMedian(docs, "k", col("s"))
      .select("grp", "n_docs", "median_micro")
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out === Map("a" -> ((3L, 200000L)), "b" -> ((4L, 400000L)),
      "c" -> ((5L, 300000L))))
  }

  test("pageRankMicro: symmetric star — leaves equal, hub dominates") {
    import spark.implicits._
    val edges = Seq((10L, 1L), (10L, 2L), (10L, 3L), (10L, 4L)).toDF("a", "b")
    val ranks = PageRank.pageRankMicro(edges, "a", "b", iters = 3)
      .select("node", "rank_micro").as[(Long, Long)].collect().toMap
    val leaves = Set(1L, 2L, 3L, 4L).map(ranks)
    assert(leaves.size === 1, "symmetric leaves must tie exactly")
    assert(ranks(10L) > leaves.head, "hub must out-rank leaves")
  }
}
