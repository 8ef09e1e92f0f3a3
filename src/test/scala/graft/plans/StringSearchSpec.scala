package graft.plans

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.SparkSpec

/** Aho–Corasick kernel vs the naive per-pattern `indexOf` reference —
  * small alphabet so shared prefixes, nested patterns, duplicates and
  * overlapping occurrences all arise naturally.
  */
class StringSearchSpec extends SparkSpec {

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default.withSize(14), Seed(seed))

  private def strGen(n: Int): Gen[String] =
    Gen.listOfN(n, Gen.oneOf('a', 'b')).map(_.mkString)

  test("automaton firstEnds equal per-pattern indexOf on random corpora") {
    (1 to 25).foreach { trial =>
      val nPats = 1 + trial % 7
      val pats = (0 until nPats).map { p =>
        sample(strGen(1 + (trial * 3 + p) % 6), 100L * trial + p)
      }.toArray
      val ac = AhoCorasick.build(pats)
      (0 until 8).foreach { t =>
        val text = sample(strGen((trial * 5 + t * 7) % 60), 9000L + 13L * trial + t)
        val got = ac.searchFirstEnds(text)
        pats.zipWithIndex.foreach { case (p, i) =>
          val idx = text.indexOf(p)
          val expect = if (idx < 0) -1 else idx + p.length - 1
          assert(got(i) === expect,
            s"trial=$trial text='$text' pat='$p' got=${got(i)} expect=$expect")
        }
      }
    }
  }

  test("nested, duplicate and overlapping patterns") {
    val pats = Array("ab", "b", "babab", "ab", "aaa")
    val ac = AhoCorasick.build(pats)
    val got = ac.searchFirstEnds("aababababaaaa")
    // indexOf ends: ab@1..2 → end 2; b@2 → end 2; babab@2..6 → end 6;
    // dup ab → end 2; aaa@9..11 → end 11
    assert(got.toSeq === Seq(2, 2, 6, 2, 11))
    assert(ac.searchFirstEnds("").toSeq === Seq(-1, -1, -1, -1, -1))
    assert(ac.searchFirstEnds("bbbb").toSeq === Seq(-1, 0, -1, -1, -1))
  }

  test("column API decodes (pidx, first_pos) and matches instr") {
    import spark.implicits._
    val pats = Array("agg", "row", "zzznope", "a")
    val docs = Seq((1L, "key agg row scan"), (2L, "no hits here?"),
      (3L, ""), (4L, "rowrow")).toDF("doc_id", "text")
    val out = docs
      .select($"doc_id", explode(StringSearch.multiPatternFirstMatch(
        spark, $"text", pats, "spec1")).as("m"))
      .select($"doc_id", shiftright($"m", 32).cast("int").as("pidx"),
        $"m".bitwiseAND(lit(0xffffffffL)).cast("int").as("first_pos"))
      .as[(Long, Int, Int)].collect().toSet
    assert(out === Set((1L, 0, 5), (1L, 1, 9), (1L, 3, 5), (4L, 1, 1)))
    // cross-check every emitted position against the builtin instr
    val byPat = docs.select($"doc_id",
        explode(StringSearch.multiPatternFirstMatch(
          spark, $"text", pats, "spec1")).as("m"))
      .select($"doc_id", element_at(typedlit(pats.toSeq),
          shiftright($"m", 32).cast("int") + 1).as("p"),
        $"m".bitwiseAND(lit(0xffffffffL)).cast("int").as("pos"))
      .join(docs, Seq("doc_id"))
      .select((instr($"text", $"p") === $"pos").as("ok")).as[Boolean].collect()
    assert(byPat.nonEmpty && byPat.forall(identity))
  }
}
