package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The contains-join plan rewrite: fires on the exact shape, stays away
  * from everything else, and is bitwise the nested-loop join it replaces.
  */
class SubstringJoinSpec extends SparkSpec {

  private def hasExec(df: DataFrame): Boolean =
    df.queryExecution.executedPlan
      .collectFirst { case e: SubstringJoinExec => e }.nonEmpty

  test("rewrite fires and matches the nested-loop reference, edges included") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "key agg row scan"), (2L, "no hits here"), (3L, null: String),
      (4L, ""), (5L, "naïve ünicode blåbær"), (6L, "rowrowrow")
    ).toDF("doc_id", "text")
    val pats = Seq(
      (10L, "row"), (11L, "agg"), (12L, "zzz"), (13L, null: String),
      (14L, ""), (15L, "row"),            // duplicate pattern string
      (16L, "blåbær")                     // non-ASCII (UTF-8 self-sync)
    ).toDF("pat_id", "pat")
    val joined = SubstringJoin.containsJoin(corpus, pats, $"text", $"pat")
    assert(hasExec(joined), "rewrite must produce SubstringJoinExec:\n" +
      joined.queryExecution.executedPlan.toString)
    // reference: cross-join + filter — a different logical shape the rule
    // must NOT touch, planned by the builtin nested loop
    val ref = corpus.crossJoin(pats).filter($"text".contains($"pat"))
    assert(!hasExec(ref))
    val got = joined.select($"doc_id", $"pat_id").as[(Long, Long)]
      .collect().sorted.toSeq
    val want = ref.select($"doc_id", $"pat_id").as[(Long, Long)]
      .collect().sorted.toSeq
    assert(got === want)
    // spot-ensure the edges actually exercise something: the empty
    // pattern matches every non-null doc, nulls match nothing
    assert(want.count(_._2 == 14L) === 5)
    assert(!want.exists(_._2 == 13L) && !want.exists(_._1 == 3L))
    assert(want.filter(_._1 == 6L).map(_._2).sorted === Seq(10L, 14L, 15L))
  }

  test("composite or non-conforming conditions keep the builtin plan") {
    import spark.implicits._
    SubstringJoin.install(spark)
    val corpus = Seq((1L, "abc")).toDF("doc_id", "text")
    val pats = Seq((10L, "b", 1L)).toDF("pat_id", "pat", "k")
    // composite condition
    val composite = corpus.join(pats,
      $"text".contains($"pat") && $"doc_id" === $"k")
    assert(!hasExec(composite))
    assert(composite.count() === 1)
    // contains over two same-side columns
    val sameSide = corpus.join(pats, $"pat".contains($"pat"))
    assert(!hasExec(sameSide))
    // left outer keeps builtin
    val outer = corpus.join(pats, $"text".contains($"pat"), "left")
    assert(!hasExec(outer))
    assert(outer.count() === 1)
  }

  test("fuzz: random corpora equal the nested-loop reference") {
    import spark.implicits._
    val rnd = new scala.util.Random(77)
    def randStr(n: Int) = (1 to n).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
    (1 to 5).foreach { trial =>
      val corpus = (1 to 30).map(i => (i.toLong, randStr(3 + rnd.nextInt(20))))
        .toDF("doc_id", "text")
      val pats = (1 to 12).map(i => (i.toLong, randStr(1 + rnd.nextInt(4))))
        .toDF("pat_id", "pat")
      val fast = SubstringJoin.containsJoin(corpus, pats, $"text", $"pat")
        .select($"doc_id", $"pat_id").as[(Long, Long)].collect().sorted.toSeq
      val slow = corpus.crossJoin(pats).filter($"text".contains($"pat"))
        .select($"doc_id", $"pat_id").as[(Long, Long)].collect().sorted.toSeq
      assert(fast === slow, s"trial $trial")
    }
  }
}
