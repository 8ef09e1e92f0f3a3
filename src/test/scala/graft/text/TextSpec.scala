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
    val df = Seq("", "   ", "the the the", "中文 text").toDF("text")
      .select(TextOps.langId($"text").as("l"), TextOps.qualityScore($"text").as("q"))
    assert(df.filter($"l".isNull || $"q".isNull).count() === 0)
  }
}
