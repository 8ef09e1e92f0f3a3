package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec

class LmSketchSpec extends SparkSpec {

  test("bigramKn on 'a b a b c' matches the hand-derived KN table") {
    import spark.implicits._
    // bigrams: (a,b)x2 (b,a)x1 (b,c)x1
    // c1(a)=2 nf(a)=1; c1(b)=2 nf(b)=2; n_prec: a<-1, b<-1, c<-1; types=3
    val docs = Seq((1L, "a b a b c")).toDF("doc_id", "text")
    val out = NgramLm.bigramKn(docs, "doc_id", "text")
      .select("w1", "w2", "c12", "c1", "n_follow", "n_prec", "n_types", "p_kn")
      .as[(String, String, Long, Long, Long, Long, Long, Double)]
      .collect().map(r => (r._1, r._2) -> r).toMap
    assert(out.keySet === Set(("a", "b"), ("b", "a"), ("b", "c")))
    val (_, _, c12ab, c1a, nfA, npB, types, pAb) = out(("a", "b"))
    assert((c12ab, c1a, nfA, npB, types) === ((2L, 2L, 1L, 1L, 3L)))
    // same IEEE expression, evaluated independently here
    def kn(c12: Long, c1: Long, nf: Long, np: Long, nt: Long): Double =
      math.max(c12 - 0.75, 0.0) / c1 + ((0.75 * nf) / c1) * (np / nt.toDouble)
    assert(pAb === kn(2, 2, 1, 1, 3))
    assert(out(("b", "a"))._8 === kn(1, 2, 2, 1, 3))
    assert(out(("b", "c"))._8 === kn(1, 2, 2, 1, 3))
  }

  test("bigramKn: explicit mass + reserved backoff mass sums to 1 per context") {
    import spark.implicits._
    val docs = Seq((1L, "x y z x y x z y"), (2L, "y x y z z x")).toDF("doc_id", "text")
    val rows = NgramLm.bigramKn(docs, "doc_id", "text")
      .select("w2", "n_prec", "n_types")
      .as[(String, Long, Long)].collect()
    // sum_w2 p_kn(w2|w1) over ALL w2 in the vocabulary = 1: the max-part
    // sums to (c1 - D*n_follow)/c1 and the backoff part to
    // D*n_follow/c1 * sum(p_cont) with sum(p_cont) = 1 by construction.
    // Check the integer identity that makes it hold: sum of n_prec over
    // DISTINCT w2 equals n_types.
    val types = rows.head._3
    val nPrecSum = rows.map(r => (r._1, r._2)).distinct.map(_._2).sum
    assert(nPrecSum === types)
  }

  test("bigramRows emits nothing for 0/1-token docs and zips in order") {
    import spark.implicits._
    val docs = Seq((1L, ""), (2L, "solo"), (3L, "p q r")).toDF("doc_id", "text")
    val rows = NgramLm.bigramRows(docs, "doc_id", "text")
      .select("id", "w1", "w2").as[(Long, String, String)].collect().toSeq.sorted
    assert(rows === Seq((3L, "p", "q"), (3L, "q", "r")))
  }

  test("pmi on 'a b a b a c' matches hand-derived collocation scores") {
    import spark.implicits._
    // pairs: (a,b)x2 (b,a)x2 (a,c)x1; T=5; cL: a=3 b=2; cR: b=2 a=2 c=1
    val docs = Seq((1L, "a b a b a c")).toDF("doc_id", "text")
    val out = NgramLm.pmi(docs, "doc_id", "text", minCount = 1L)
      .select("w1", "w2", "pmi_micro").as[(String, String, Long)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(out(("a", "b")) === math.floor(math.log(2.0 * 5 / (3.0 * 2)) * 1e6 + 0.5).toLong)
    assert(out(("b", "a")) === math.floor(math.log(2.0 * 5 / (2.0 * 2)) * 1e6 + 0.5).toLong)
    assert(out(("a", "c")) === math.floor(math.log(1.0 * 5 / (3.0 * 1)) * 1e6 + 0.5).toLong)
    // min-count prunes the hapax pair but not the marginals it fed:
    // (a,c) still counted in cL(a) and T
    val pruned = NgramLm.pmi(docs, "doc_id", "text", minCount = 2L)
      .select("w1", "w2", "c_left", "n_pairs")
      .as[(String, String, Long, Long)].collect()
    assert(pruned.map(r => (r._1, r._2)).toSet === Set(("a", "b"), ("b", "a")))
    assert(pruned.forall(r => r._4 === 5L))
    assert(pruned.filter(_._1 == "a").forall(_._3 === 3L))
  }

  test("skipgramPmi on 'a b c d' matches hand-enumerated slot statistics") {
    import spark.implicits._
    // window=3 slots over [a,b,c,d]: k=1 {ab,bc,cd}, k=2 {ac,bd}, k=3 {ad}
    // → N=6, every c12=1; marginals (slots containing w): a=3 b=3 c=3 d=3
    val docs = Seq((1L, "a b c d")).toDF("doc_id", "text")
    val out = NgramLm.skipgramPmi(docs, "doc_id", "text", window = 3, minCount = 1L)
      .select("w1", "w2", "c12", "c_a", "c_b", "n_pairs", "pmi_micro")
      .as[(String, String, Long, Long, Long, Long, Long)].collect()
    assert(out.length === 6)
    assert(out.forall(r => r._3 === 1L && r._4 === 3L && r._5 === 3L && r._6 === 6L))
    // pmi = ln(4·1·6/(3·3)) for every pair, micro-snapped — computed here
    // with plain JDK math, not the operator's expression tree
    val exp = math.floor(math.log(4.0 * 1 * 6 / (3.0 * 3)) * 1e6 + 0.5).toLong
    assert(out.forall(_._7 === exp))
    // window=1 degrades to unordered adjacency: {ab,bc,cd}, N=3, cw=…
    // a=1 b=2 c=2 d=1; self-pairs (w,w) double-count into one marginal
    val adj = NgramLm.skipgramPmi(Seq((1L, "a a b")).toDF("doc_id", "text"),
        "doc_id", "text", window = 1, minCount = 1L)
      .select("w1", "w2", "c_a", "c_b", "n_pairs")
      .as[(String, String, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap
    // slots: (a,a), (a,b) → N=2; c_a: a appears in 2·1 + 1 = 3 slots-sides, b in 1
    assert(adj(("a", "a")) === ((3L, 3L, 2L)))
    assert(adj(("a", "b")) === ((3L, 1L, 2L)))
    // canonical ordering: no (b, a) key ever
    assert(!adj.contains(("b", "a")))
  }

  test("Sketch.registers matches a brute-force md5 register build") {
    import spark.implicits._
    val values = (0 until 200).map(i => s"v$i")
    val df = values.toDF("tok")
    val got = Sketch.registers(df, "tok", m = 16)
      .as[(Long, Int)].collect().toMap
    // independent construction: JDK MessageDigest, no Spark
    val md = java.security.MessageDigest.getInstance("MD5")
    val expected = values.map { v =>
      val hex = md.digest(v.getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString
      val h = java.lang.Long.parseLong(hex.take(15), 16)
      val bucket = h % 16
      val rest = h / 16
      val width = 56 // 60 - log2(16)
      val rho = if (rest == 0L) width + 1
        else width + 1 - (64 - java.lang.Long.numberOfLeadingZeros(rest))
      bucket -> rho
    }.groupBy(_._1).map { case (b, rs) => b -> rs.map(_._2).max }
    assert(got === expected)
  }

  test("sketches merge by register max and estimate within the HLL envelope") {
    import spark.implicits._
    val a = (0 until 300).map(i => s"a$i").toDF("tok")
    val b = (150 until 450).map(i => s"a$i").toDF("tok") // 150 overlap
    val m = 64
    def regs(df: org.apache.spark.sql.DataFrame) =
      Sketch.registers(df, "tok", m).as[(Long, Int)].collect().toMap
    val ra = regs(a); val rb = regs(b); val ru = regs(a.union(b))
    val merged = (ra.keySet ++ rb.keySet).map(k =>
      k -> math.max(ra.getOrElse(k, 0), rb.getOrElse(k, 0))).toMap
    assert(merged === ru, "union sketch must equal per-shard max-merge")
    // 450 true distinct; HLL sigma = 1.04/sqrt(64) = 13% — accept 4 sigma
    val est = Sketch.estimateFromRegisters(ru.toSeq, m)
    assert(est > 450 * 0.48 && est < 450 * 1.52, s"estimate $est implausible")
  }
}
