package graft.ops

import graft.SparkSpec

class SkewSpec extends SparkSpec {

  test("saltedJoin equals plain join, deterministically") {
    import spark.implicits._
    val big = Seq.tabulate(500)(i => (if (i % 10 == 0) "hot" else s"k$i", i))
      .toDF("k", "v")
    val small = Seq(("hot", 100), ("k3", 3), ("k7", 7)).toDF("k", "w")
    val plain = big.join(small, Seq("k")).select("k", "v", "w")
      .collect().map(_.toSeq).toSet
    val salted = Skew.saltedJoin(big, small, Seq("k"), salts = 8)
      .select("k", "v", "w").collect().map(_.toSeq).toSet
    assert(salted === plain)
    // run twice: the salt is deterministic, not RNG-based
    val again = Skew.saltedJoin(big, small, Seq("k"), salts = 8)
      .select("k", "v", "w").collect().map(_.toSeq).toSet
    assert(again === plain)
  }
}
