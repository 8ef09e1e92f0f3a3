package graft.graph

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.SparkSpec

class TrianglesSpec extends SparkSpec {

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default.withSize(14), Seed(seed))

  /** Brute-force per-node triangle counts over canonical (a<b) edges. */
  private def brute(edges: Set[(Long, Long)]): Map[Long, Long] = {
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val has = (x: Long, y: Long) => edges((math.min(x, y), math.max(x, y)))
    val counts = scala.collection.mutable.Map.empty[Long, Long]
    for {
      Seq(x, y, z) <- nodes.combinations(3)
      if has(x, y) && has(y, z) && has(x, z)
      n <- Seq(x, y, z)
    } counts(n) = counts.getOrElse(n, 0L) + 1L
    counts.toMap
  }

  test("triangle counts match brute force on known and random graphs") {
    import spark.implicits._
    // K4 plus a pendant: every K4 corner is in 3 triangles
    val k4 = Set((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 9L))
    val out = Triangles.triangleCounts(k4.toSeq.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(out === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // random graphs, including skewed ones (a hub node in most edges)
    (1 to 6).foreach { trial =>
      val n = 6 + trial
      val pairGen = for {
        a <- Gen.choose(0L, n.toLong); b <- Gen.choose(0L, n.toLong)
      } yield (math.min(a, b), math.max(a, b))
      val raw = sample(Gen.listOfN(n * 3, pairGen), 5000L + trial)
        .filter(e => e._1 != e._2).toSet
      val hub = (0L until n.toLong).map(i => (0L, i + 1)).toSet
      val edges = if (trial % 2 == 0) raw ++ hub else raw
      val got = Triangles.triangleCounts(edges.toSeq.toDF("a", "b"), "a", "b")
        .as[(Long, Long)].collect().toMap
      assert(got === brute(edges), s"trial=$trial edges=$edges")
    }
    // triangle-free graph → empty result
    val path = Set((1L, 2L), (2L, 3L), (3L, 4L))
    assert(Triangles.triangleCounts(path.toSeq.toDF("a", "b"), "a", "b")
      .count() === 0L)
  }

  test("triangle counts: merge tier (bounds 0) equals broadcast tier") {
    // the r20 sized dispatch (broadcast degree/closing tables under the
    // measured bound, merge-hinted SMJ past it) must be value-invisible:
    // force the merge tier with zero bounds and compare against the
    // default (broadcast) tier and brute force on a skewed graph
    import spark.implicits._
    val edges = (Set((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 9L), (5L, 6L), (5L, 7L), (6L, 7L)) ++
      (10L to 20L).map(i => (1L, i)).toSet).filter(e => e._1 != e._2)
    val df = edges.toSeq.toDF("a", "b")
    val viaMerge = Triangles.triangleCounts(df, "a", "b",
      maxBroadcastNodes = 0L, maxBroadcastEdges = 0L)
      .as[(Long, Long)].collect().toMap
    val viaBroadcast = Triangles.triangleCounts(df, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(viaMerge === brute(edges))
    assert(viaBroadcast === viaMerge)
  }

  test("co-occurrence edges: shared-bucket counting within blocks only") {
    import spark.implicits._
    val rows = Seq(
      // users 1,2 share buckets (x,1),(x,2),(y,1); user 3 shares only (x,1)
      (1L, "x", 1L), (1L, "x", 2L), (1L, "y", 1L),
      (2L, "x", 1L), (2L, "x", 2L), (2L, "y", 1L),
      (3L, "x", 1L), (3L, "z", 9L),
      // duplicate activity rows must not inflate the distinct bucket count
      (1L, "x", 1L), (2L, "x", 1L)
    ).toDF("id", "t", "hb")
    val e2 = Triangles.coOccurrenceEdges(rows, "id", Seq("t", "hb"), 2L)
      .as[(Long, Long, Long)].collect().toSet
    assert(e2 === Set((1L, 2L, 3L)))
    val e1 = Triangles.coOccurrenceEdges(rows, "id", Seq("t", "hb"), 1L)
      .as[(Long, Long, Long)].collect().toSet
    assert(e1 === Set((1L, 2L, 3L), (1L, 3L, 1L), (2L, 3L, 1L)))
  }
}
