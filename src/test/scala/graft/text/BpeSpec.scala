package graft.text

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.SparkSpec

/** BPE training against an INDEPENDENT in-memory reference — engine and
  * reference share no code, so a shared formula mistake cannot hide
  * (the oracle-correlated-bug lesson from the duplicated-spans round).
  */
class BpeSpec extends SparkSpec {

  /** Reference BPE: plain Scala, list-based, deliberately naive. */
  private def refTrain(words: Map[String, Long], numMerges: Int,
                       minCount: Long): (List[(String, String, Long)], Map[String, List[String]]) = {
    var state = words.map { case (w, c) => (w, c, w.split("").toList) }.toList
    var merges = List.empty[(String, String, Long)]
    var rounds = 0
    var done = false
    while (rounds < numMerges && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      state.foreach { case (_, c, syms) =>
        syms.zip(syms.drop(1)).foreach(p => counts(p) = counts.getOrElse(p, 0L) + c)
      }
      if (counts.isEmpty || counts.values.max < minCount) done = true
      else {
        val ((l, r), c) = counts.toSeq
          .sortBy { case ((a, b), n) => (-n, a, b) }.head
        merges :+= ((l, r, c))
        def mergeGreedy(s: List[String]): List[String] = s match {
          case a :: b :: rest if a == l && b == r => (a + b) :: mergeGreedy(rest)
          case a :: rest => a :: mergeGreedy(rest)
          case Nil => Nil
        }
        state = state.map { case (w, c2, syms) => (w, c2, mergeGreedy(syms)) }
        rounds += 1
      }
    }
    (merges, state.map { case (w, _, syms) => w -> syms }.toMap)
  }

  private def corpus(words: Map[String, Long]) = {
    import spark.implicits._
    // one doc per word repetition keeps the word-frequency table exact
    words.toSeq.flatMap { case (w, c) => Seq.fill(c.toInt)(w) }
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
  }

  test("classic Sennrich corpus: merges and final segmentation match the reference") {
    val words = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val (refMerges, refState) = refTrain(words, numMerges = 8, minCount = 2L)
    val (merges, state) = Bpe.trainBpe(corpus(words), "text", numMerges = 8)
    import spark.implicits._
    val gotMerges = merges.orderBy("merge_rank")
      .select("sym_l", "sym_r", "pair_count")
      .as[(String, String, Long)].collect().toList
    assert(gotMerges === refMerges)
    val gotState = state.select("word", "syms")
      .as[(String, Seq[String])].collect().map(p => p._1 -> p._2.toList).toMap
    assert(gotState === refState)
  }

  test("greedy overlap: merge (a,a) on aaaa gives [aa, aa], counts stay overlapping") {
    val words = Map("aaaa" -> 3L, "aa" -> 1L)
    // pair (a,a): aaaa contributes 3 overlapping pairs x3 + aa 1 -> 10
    import spark.implicits._
    val top = Bpe.topPairs(Bpe.initWords(corpus(words), "text"), 1)
      .as[(Int, String, String, Long)].head()
    assert(top === ((1, "a", "a", 10L)))
    val (merges, state) = Bpe.trainBpe(corpus(words), "text", numMerges = 1)
    assert(merges.as[(Int, String, String, Long)].head() === ((1, "a", "a", 10L)))
    val syms = state.filter(col("word") === "aaaa")
      .select("syms").as[Seq[String]].head()
    assert(syms === Seq("aa", "aa"))
  }

  test("segment applies trained merges in order to UNSEEN text, checkpoint batching on") {
    import spark.implicits._
    val words = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val (refMerges, _) = refTrain(words, numMerges = 8, minCount = 2L)
    val (merges, _) = Bpe.trainBpe(corpus(words), "text", numMerges = 8)
    // unseen words containing trained pieces + a fully novel one
    val fresh = Seq((1L, "lowest slowest xyz")).toDF("doc_id", "text")
    // batchMerges=2 forces several checkpoint truncations mid-chain
    val got = Bpe.segment(fresh, "doc_id", "text", merges, batchMerges = 2)
      .select("word_pos", "syms").as[(Int, Seq[String])].collect()
      .map(p => p._1 -> p._2.toList).toMap
    def refApply(w: String): List[String] =
      refMerges.foldLeft(w.split("").toList) { case (syms, (l, r, _)) =>
        def go(s: List[String]): List[String] = s match {
          case a :: b :: rest if a == l && b == r => (a + b) :: go(rest)
          case a :: rest => a :: go(rest)
          case Nil => Nil
        }
        go(syms)
      }
    assert(got === Map(0 -> refApply("lowest"), 1 -> refApply("slowest"),
      2 -> refApply("xyz")))
  }

  test("tokenizePack: hand-checked positions, ids, packing; fertility rollup (r16)") {
    import spark.implicits._
    // two shards, two docs each; 1 merge so the trained tokenizer is
    // hand-derivable: corpus pairs -> (a,b) wins (count 6: "ab" x4 +
    // "abc" x2... one per occurrence in the word table weighted by wc)
    val docs = Seq(
      (0L, "ab ab", "x"), (1L, "abc", "x"),
      (2L, "ab c", "y"), (3L, "cc ab", "y")).toDF("doc_id", "text", "lang")
    val out = Bpe.tokenizePack(docs, "doc_id", "text", "lang",
        numMerges = 1, blockTokens = 2)
      .orderBy("shard", "doc_id", "pos")
      .select("doc_id", "shard", "pos", "subword", "token_id",
        "global_tok", "chunk")
      .as[(Long, String, Long, String, Long, Long, Long)].collect().toList
    // merge 1 = (a,b): words segment as ab->[ab], abc->[ab,c], c->[c],
    // cc->[c,c]. Vocab by (count desc, subword asc): ab=5, c=4 ->
    // ab->0, c->1. Packing per shard in doc_id order, blockTokens=2.
    assert(out === List(
      (0L, "x", 0L, "ab", 0L, 0L, 0L),   // doc0: "ab ab" -> [ab, ab]
      (0L, "x", 1L, "ab", 0L, 1L, 0L),
      (1L, "x", 0L, "ab", 0L, 2L, 1L),   // doc1: "abc" -> [ab, c]
      (1L, "x", 1L, "c", 1L, 3L, 1L),
      (2L, "y", 0L, "ab", 0L, 0L, 0L),   // doc2: "ab c" -> [ab, c]
      (2L, "y", 1L, "c", 1L, 1L, 0L),
      (3L, "y", 0L, "c", 1L, 2L, 1L),    // doc3: "cc ab" -> [c, c, ab]
      (3L, "y", 1L, "c", 1L, 3L, 1L),
      (3L, "y", 2L, "ab", 0L, 4L, 2L)))
    // fertility over the same corpus: shard x -> 3 words, 4 subwords
    // (fertility 4/3), 7 chars; shard y -> 4 words, 5 subwords, 7 chars
    val fert = Bpe.fertility(docs, "doc_id", "text", "lang", numMerges = 1)
      .orderBy("shard")
      .select("shard", "n_words", "n_subwords", "n_chars",
        "fertility_micro", "chars_per_subword_micro")
      .as[(String, Long, Long, Long, Long, Long)].collect().toList
    assert(fert === List(
      ("x", 3L, 4L, 7L, 1333333L, 1750000L),
      ("y", 4L, 5L, 7L, 1250000L, 1400000L)))
  }

  test("trained-state segmentation tier equals the kernel-chain tier (r20)") {
    // the r20 sized dispatch (segment the training corpus by broadcast-
    // joining trainBpe's word-grain state vs re-running the kernel
    // chain) must be value-invisible: force the kernel chain with a
    // zero bound and compare both faces row-for-row
    import spark.implicits._
    val docs = Seq(
      (0L, "ab ab cc abc", "x"), (1L, "abc ab", "x"),
      (2L, "ab c cc cc", "y"), (3L, "cc ab abc abc", "y"),
      (4L, "b a ab ba", "y")).toDF("doc_id", "text", "lang")
    def key(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("shard", "doc_id", "pos")
        .select("doc_id", "shard", "pos", "subword", "token_id",
          "global_tok", "chunk")
        .as[(Long, String, Long, String, Long, Long, Long)].collect().toList
    val viaState = key(Bpe.tokenizePack(docs, "doc_id", "text", "lang",
      numMerges = 2, blockTokens = 3))
    val viaKernel = key(Bpe.tokenizePack(docs, "doc_id", "text", "lang",
      numMerges = 2, blockTokens = 3, maxBroadcastVocab = 0L))
    assert(viaState === viaKernel)
    val fertState = Bpe.fertility(docs, "doc_id", "text", "lang",
      numMerges = 2).orderBy("shard").collect().toList
    val fertKernel = Bpe.fertility(docs, "doc_id", "text", "lang",
      numMerges = 2, maxBroadcastVocab = 0L).orderBy("shard").collect().toList
    assert(fertState === fertKernel)
  }

  test("256-merge training parity vs the independent reference (VERDICT r16 #2)") {
    // the registered oracle face stays at 12 merges (the unrolled-CTE
    // tractability adjudication, SCALE.md §12 addendum) — so realistic
    // merge budgets are pinned HERE, engine vs the shared-nothing
    // reference, through 256 full rounds. Fixture: 100 distinct
    // 10-char words over {a..f}, each wc ≥ 2, so every pair a word
    // contains counts ≥ 2 and capacity is ~900 rounds — 256 never
    // dries up.
    val rnd = new scala.util.Random(170816L)
    val words = (0 until 100).map { _ =>
      (0 until 10).map(_ => "abcdef"(rnd.nextInt(6))).mkString
    }.distinct.zipWithIndex.map { case (w, i) => w -> (2L + i % 3) }.toMap
    val (refMerges, refState) = refTrain(words, numMerges = 256, minCount = 2L)
    assert(refMerges.size === 256,
      s"fixture must support 256 rounds, got ${refMerges.size}")
    val (merges, state) = Bpe.trainBpe(corpus(words), "text", numMerges = 256)
    import spark.implicits._
    val gotMerges = merges.orderBy("merge_rank")
      .select("sym_l", "sym_r", "pair_count")
      .as[(String, String, Long)].collect().toList
    assert(gotMerges === refMerges)
    val gotState = state.select("word", "syms")
      .as[(String, Seq[String])].collect().map(p => p._1 -> p._2.toList).toMap
    assert(gotState === refState)
  }

  test("tokenizePackLoose equals the strict face when training completes; " +
      "packs what trains past capacity") {
    import spark.implicits._
    val docs = Seq(
      (0L, "ab ab", "x"), (1L, "abc", "x"),
      (2L, "ab c", "y"), (3L, "cc ab", "y")).toDF("doc_id", "text", "lang")
    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    val strict = key(Bpe.tokenizePack(docs, "doc_id", "text", "lang",
      numMerges = 1, blockTokens = 2))
    val loose = key(Bpe.tokenizePackLoose(docs, "doc_id", "text", "lang",
      numMerges = 1, blockTokens = 2))
    assert(loose === strict, "the faces must agree when training completes")
    // past the corpus's merge capacity: the oracle face refuses loudly
    // (the unroll-desync guard), the loose face packs what trained
    val e = intercept[IllegalArgumentException] {
      Bpe.tokenizePack(docs, "doc_id", "text", "lang",
        numMerges = 50, blockTokens = 2)
    }
    assert(e.getMessage.contains("training stopped early"))
    assert(Bpe.tokenizePackLoose(docs, "doc_id", "text", "lang",
      numMerges = 50, blockTokens = 2).count() > 0L)
  }

  test("fuzz: random corpora match the reference through full training") {
    def sample[A](g: Gen[A], seed: Long): A =
      g.pureApply(Gen.Parameters.default.withSize(8), Seed(seed))
    val wordGen = Gen.listOfN(12,
      Gen.zip(Gen.listOfN(5, Gen.oneOf("a", "b", "c")).map(_.mkString),
              Gen.choose(1L, 6L)))
    (1 to 5).foreach { trial =>
      val words = sample(wordGen, 9100L + trial).toMap
      val (refMerges, refState) = refTrain(words, numMerges = 6, minCount = 2L)
      val (merges, state) = Bpe.trainBpe(corpus(words), "text", numMerges = 6)
      import spark.implicits._
      val gotMerges = merges.orderBy("merge_rank")
        .select("sym_l", "sym_r", "pair_count")
        .as[(String, String, Long)].collect().toList
      assert(gotMerges === refMerges, s"trial $trial words=$words")
      val gotState = state.select("word", "syms")
        .as[(String, Seq[String])].collect().map(p => p._1 -> p._2.toList).toMap
      assert(gotState === refState, s"trial $trial")
    }
  }

  test("BpeBuild lifecycle: reopened artifact tokenizes bit-identically " +
      "to the self-trained one-shot; OOV maps to UNK; ticks continue " +
      "shard offsets; replay converges (VERDICT r17 #3)") {
    import spark.implicits._
    import java.nio.file.Files
    val base = Files.createTempDirectory("bpebuild").toString
    // the hand-checked tokenizePack corpus, staged as a parquet sfDir
    // (Tables.documents reads documents.parquet with doc_id/text/lang)
    val docs = Seq(
      (0L, "ab ab", "x"), (1L, "abc", "x"),
      (2L, "ab c", "y"), (3L, "cc ab", "y")).toDF("doc_id", "text", "lang")
      .withColumn("source", lit("s")).withColumn("n_chars", length(col("text")).cast("long"))
    docs.write.parquet(s"$base/sf/documents.parquet")
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "shard", "pos", "subword", "token_id",
          "global_tok", "chunk").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getString(3), r.getLong(4), r.getLong(5), r.getLong(6))).toSet

    // build once (1 merge, blockTokens=2 — the hand-derivable shape)
    graft.tools.BpeBuild.build(spark, s"$base/sf", s"$base/index",
      numMerges = 1, blockTokens = 2)
    // reopened-artifact one-shot ≡ self-trained q221 face, bit-exact
    graft.tools.BpeBuild.tokenize(spark, s"$base/index", s"$base/sf",
      s"$base/oneshot")
    val selfTrained = key(Bpe.tokenizePack(docs, "doc_id", "text", "lang",
      numMerges = 1, blockTokens = 2))
    assert(key(spark.read.parquet(s"$base/oneshot")) === selfTrained,
      "reopened tokenizer must reproduce the self-trained packing exactly")

    // torn-artifact guard: a vocab that disagrees with _meta refuses
    spark.read.parquet(s"$base/index/vocab").limit(1).write
      .mode("overwrite").parquet(s"$base/index2/vocab")
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.rename(new org.apache.hadoop.fs.Path(s"$base/index/merges"),
      new org.apache.hadoop.fs.Path(s"$base/index2/merges"))
    fs.rename(new org.apache.hadoop.fs.Path(s"$base/index/_meta"),
      new org.apache.hadoop.fs.Path(s"$base/index2/_meta"))
    intercept[IllegalArgumentException] {
      graft.tools.BpeBuild.open(spark, s"$base/index2")
    }
    // restore the artifact for the tick half
    fs.rename(new org.apache.hadoop.fs.Path(s"$base/index2/merges"),
      new org.apache.hadoop.fs.Path(s"$base/index/merges"))
    fs.rename(new org.apache.hadoop.fs.Path(s"$base/index2/_meta"),
      new org.apache.hadoop.fs.Path(s"$base/index/_meta"))

    // OOV contract: unseen alphabet through the frozen rules is UNK=-1
    val oov = Bpe.tokenizeWithTrained(
      Seq((9L, "ab zq", "x")).toDF("doc_id", "text", "lang"),
      "doc_id", "text", "lang",
      spark.read.parquet(s"$base/index/merges"),
      spark.read.parquet(s"$base/index/vocab"), blockTokens = 2)
    val ids = oov.orderBy("pos").select("subword", "token_id")
      .as[(String, Long)].collect().toList
    assert(ids === List(("ab", 0L), ("z", -1L), ("q", -1L)),
      s"frozen vocab must UNK unseen symbols, never renumber: $ids")

    // tokenize TICKS: doc-id-ordered waves continue each shard's
    // global_tok where the standing corpus ended — ≡ one-shot numbering.
    // Staging contract is (doc_id, text, shard).
    val staged = docs.select(col("doc_id"), col("text"),
      col("lang").as("shard"))
    staged.filter(col("doc_id") <= 1L).write.mode("append")
      .parquet(s"$base/staging")
    graft.tools.BpeBuild.tokenizeTick(spark, s"$base/index",
      s"$base/staging", s"$base/ticked", s"$base/ckpt")
    staged.filter(col("doc_id") > 1L).write.mode("append")
      .parquet(s"$base/staging")
    graft.tools.BpeBuild.tokenizeTick(spark, s"$base/index",
      s"$base/staging", s"$base/ticked", s"$base/ckpt")
    assert(key(spark.read.parquet(s"$base/ticked/tokens")) === selfTrained,
      "two ticks must equal the one-shot packing bit-exactly")

    // FULL REPLAY: wipe the source checkpoint; the tick must drop the
    // re-delivered docs and rebuild (not double-fold) the offsets
    fs.delete(new org.apache.hadoop.fs.Path(s"$base/ckpt"), true)
    graft.tools.BpeBuild.tokenizeTick(spark, s"$base/index",
      s"$base/staging", s"$base/ticked", s"$base/ckpt")
    assert(key(spark.read.parquet(s"$base/ticked/tokens")) === selfTrained,
      "replay must converge")
    val off = spark.read.parquet(s"$base/ticked/_shard_offsets")
      .as[(String, Long)].collect().toMap
    assert(off === Map("x" -> 4L, "y" -> 5L),
      s"rebuilt offsets must equal the per-shard token totals: $off")

    // CRASH-WINDOW REPLAY CARRYING FRESH DOCS (ADVICE r18): a crash
    // between the token append and the offset fold leaves
    // _shard_offsets stale; if the checkpoint also died, the replayed
    // batch can carry fresh docs. Those must be numbered from bases
    // REBUILT from the token store, not from the stale standing
    // offsets — stale numbering would collide global_tok values that
    // no later rebuild could repair. Doctor the offsets stale, wipe
    // the source checkpoint, stage a fresh doc, tick.
    Seq(("x", 2L), ("y", 2L)).toDF("shard", "base_tok")
      .write.mode("overwrite").parquet(s"$base/ticked/_shard_offsets")
    fs.delete(new org.apache.hadoop.fs.Path(s"$base/ckpt"), true)
    Seq((4L, "ab ab", "x")).toDF("doc_id", "text", "shard")
      .write.mode("append").parquet(s"$base/staging")
    graft.tools.BpeBuild.tokenizeTick(spark, s"$base/index",
      s"$base/staging", s"$base/ticked", s"$base/ckpt")
    val docs5 = docs.select(col("doc_id"), col("text"), col("lang"))
      .union(Seq((4L, "ab ab", "x")).toDF("doc_id", "text", "lang"))
    assert(key(spark.read.parquet(s"$base/ticked/tokens")) ===
      key(Bpe.tokenizePack(docs5, "doc_id", "text", "lang",
        numMerges = 1, blockTokens = 2)),
      "fresh docs in a replayed batch must number from store-rebuilt " +
        "bases, never from the stale standing offsets")
    val off2 = spark.read.parquet(s"$base/ticked/_shard_offsets")
      .as[(String, Long)].collect().toMap
    assert(off2 === Map("x" -> 6L, "y" -> 5L),
      s"healed offsets must equal the post-append totals: $off2")
  }
}
