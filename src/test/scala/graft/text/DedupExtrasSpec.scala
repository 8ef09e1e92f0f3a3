package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.core.Tables

/** Round-8 additions: edit-similarity pairs, content-defined chunking,
  * count-min sketch.
  */
class DedupExtrasSpec extends SparkSpec {

  test("editSimilarityPairs: hand-computed pair, block and ASCII exclusions") {
    import spark.implicits._
    val docs = Seq(
      (1L, "abcdefghij", "en", "s1"), // pair with 2: lev=1, mx=10, sim=0.9
      (2L, "abcdefghiX", "en", "s1"),
      (3L, "zzzzzzzzzz", "en", "s1"), // lev=10 vs both -> sim 0.0
      (4L, "abcdefghij", "en", "s2"), // identical to 1 but other block
      (5L, "café abcdefghij", "en", "s1"), // non-ASCII: excluded
      (6L, "café abcdefghij", "en", "s1")  // would pair with 5 at 1.0
    ).toDF("doc_id", "text", "lang", "source")
    val out = NearDup.editSimilarityPairs(docs, "doc_id", "text",
        Seq("lang", "source"), minSim = 0.5)
      .as[(Long, Long, Double)].collect().toSet
    assert(out === Set((1L, 2L, 0.9)))
  }

  test("editSimilarityPairs: a pair AT the length-band boundary is kept") {
    import spark.implicits._
    // lev("aaaaaaaaaa","aaaa") = 6 = |10-4| -> sim = 0.4 exactly, and the
    // length band (1-0.4)*10 = 6 admits it with zero slack — the prune
    // must be >= -complete, not > .
    val docs = Seq(
      (1L, "aaaaaaaaaa", "en", "s1"),
      (2L, "aaaa", "en", "s1")
    ).toDF("doc_id", "text", "lang", "source")
    val out = NearDup.editSimilarityPairs(docs, "doc_id", "text",
        Seq("lang", "source"), minSim = 0.4)
      .as[(Long, Long, Double)].collect().toSet
    assert(out === Set((1L, 2L, 0.4)))
  }

  test("cdcChunks: chunks reconstruct every document exactly, in order") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id").cast("string").as("src"), col("text"))
    val rebuilt = TextOps.cdcChunks(docs, "text", "src")
      .groupBy("source")
      .agg(concat_ws("", sort_array(collect_list(struct(col("ord"), col("chunk"))))
        .getField("chunk")).as("rebuilt"))
    val joined = docs.join(rebuilt, docs("src") === rebuilt("source"))
    assert(joined.count() === docs.count())
    assert(joined.filter(col("text") =!= col("rebuilt")).count() === 0)
  }

  test("cdcChunks: appending a suffix preserves every earlier chunk") {
    import spark.implicits._
    // the CDC selling point: boundaries depend only on a local window, so
    // edits re-chunk their neighborhood, not the whole document
    val base = "the quick brown fox jumps over the lazy dog " * 8
    val docs = Seq(("a", base), ("b", base + " and then some extra tail"))
      .toDF("src", "text")
    val chunks = TextOps.cdcChunks(docs, "text", "src")
      .as[(String, Int, String)].collect()
      .groupBy(_._1).map { case (k, v) => k -> v.sortBy(_._2).map(_._3).toSeq }
    val (a, b) = (chunks("a"), chunks("b"))
    assert(a.size >= 2, s"base doc should chunk (got ${a.size} chunks)")
    assert(b.startsWith(a.dropRight(1)),
      "shared prefix must chunk identically in both docs")
  }

  test("countMin: estimates never undercount, and sketches merge cell-wise") {
    import spark.implicits._
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val harness = Sketch.countMinTopK(docs, "text", d = 3, width = 256, k = 15)
      .as[(String, Long, Long, Long)].collect()
    assert(harness.length === 15)
    assert(harness.forall(r => r._3 >= r._2), "CMS estimate is biased up only")
    assert(harness.forall(r => r._4 === r._3 - r._2))

    // mergeability: sketch(all) == cell-wise sum of the two halves'
    // sketches — the property that makes per-shard sketches roll up
    val toks = docs.select(explode(TextOps.tokens(col("text"))).as("tok"),
      col("doc_id"))
    val full = Sketch.countMinSketch(toks, "tok", d = 3, width = 256)
    val lo = Sketch.countMinSketch(toks.filter(col("doc_id") % 2 === 0), "tok", 3, 256)
    val hi = Sketch.countMinSketch(toks.filter(col("doc_id") % 2 === 1), "tok", 3, 256)
    val merged = lo.union(hi).groupBy("r", "bucket").agg(sum(col("c")).as("c"))
    val diff = full.as("f").join(merged.as("m"),
        col("f.r") === col("m.r") && col("f.bucket") === col("m.bucket"), "full")
      .filter(col("f.c").isNull || col("m.c").isNull || col("f.c") =!= col("m.c"))
    assert(diff.count() === 0)
  }

  test("dedupRecallEval: single-pass tier equals the split tier (r20)") {
    // maxBroadcastPairs = 0 forces the split (pre-r20) shape; the
    // default rides the candidate bit on the quadratic pass. Same five
    // output cells on a corpus with real dups, cross-block twins (band
    // candidates that must NOT count), and a no-shingle short doc.
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    def run(bound: Long) = NearDup.dedupRecallEval(docs, "doc_id", "text",
        Seq("lang", "source"), nGram = 3, k = 16, bands = 8,
        minJaccard = 0.5, maxBroadcastPairs = bound)
      .collect().map(_.toSeq).toSeq
    assert(run(Long.MaxValue) === run(0L))
  }
}
