package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.core.Tables
import graft.sim.Similarity

/** ANN quality: the scale paths trade recall for bounded work — this spec
  * MEASURES the trade on the sf0.01 fixture instead of leaving "recall < 1
  * by design" unquantified. Ground truth = brute-force top-k.
  */
class SimilaritySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"
  private def pred = col("vec_id") % 10 === 0

  private def topkSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] = {
    import spark.implicits._
    df.select($"query_id", $"vec_id").as[(Long, Long)].collect().toSet
  }

  lazy private val truth: Map[Long, Set[Long]] = {
    val emb = Tables.embeddings(spark, dir)
    topkSet(Similarity.bruteForceTopK(emb, emb.filter(pred), "vec_id", "embedding", 3))
      .groupMap(_._1)(_._2)
  }

  private def recallOf(ann: org.apache.spark.sql.DataFrame): Double = {
    val got = topkSet(ann).groupMap(_._1)(_._2)
    val hits = truth.toSeq.map { case (q, t) =>
      (t intersect got.getOrElse(q, Set.empty)).size.toDouble / t.size
    }
    hits.sum / hits.size
  }

  test("banded LSH ANN recall vs brute force is measured and non-trivial") {
    val emb = Tables.embeddings(spark, dir)
    val r = recallOf(Similarity.lshTopK(emb, "vec_id", "embedding",
      dims = 64, bands = 4, rowsPerBand = 5, k = 3, queryPred = pred))
    info(f"q39-shaped banded LSH recall@3 on sf0.01: $r%.3f")
    // random 64-dim embeddings are near-orthogonal — the hardest case for
    // hyperplane LSH. 4 bands × 5 bits scans ~1/8 of the corpus (the same
    // candidate budget as q43's nprobe=2/16 IVF); chance recall at that
    // budget is ~12.5%, so the floor asserts the sign buckets carry real
    // signal beyond their size
    assert(r > 0.2, f"LSH recall $r%.3f is no better than chance at its budget")
  }

  test("fixed-centroid IVF recall vs brute force is measured and non-trivial") {
    val emb = Tables.embeddings(spark, dir)
    val r = recallOf(Similarity.ivfTopK(emb, "vec_id", "embedding",
      dims = 64, centroids = 16, nprobe = 2, k = 3, queryPred = pred))
    info(f"q43-shaped IVF recall@3 (nprobe=2/16 cells) on sf0.01: $r%.3f")
    // nprobe/C = 1/8 of the corpus scanned; chance recall would be ~12.5%
    assert(r > 0.2, f"IVF recall $r%.3f is no better than probing random cells")
  }

  test("trained centroids: Lloyd passes improve cell balance, search stays well-formed") {
    val emb = Tables.embeddings(spark, dir)
    val seed = (0 until 16).map(c => Similarity.centroidVec(c, 64)).toArray
    val trained = Similarity.trainCentroids(emb, "vec_id", "embedding",
      dims = 64, centroids = 16, iterations = 2)
    val hSeed = Similarity.cellHistogram(emb, "vec_id", "embedding", seed)
    val hTrained = Similarity.cellHistogram(emb, "vec_id", "embedding", trained)
    val n = hSeed.values.sum
    assert(hTrained.values.sum === n, "training must not lose vectors")
    info(s"cell population max/nonempty: seed=${hSeed.values.max}/${hSeed.size} " +
      s"trained=${hTrained.values.max}/${hTrained.size} (N=$n)")
    // the scale claim: probe cost is bounded by the largest probed cell.
    // Lloyd does not strictly guarantee monotone max-cell shrinkage and
    // trained centroids are fp-order run-varying in final ulps, so assert
    // with slack: training must not make the worst cell MATERIALLY worse
    // (observed on this fixture: 44 -> 38)
    assert(hTrained.values.max <= (hSeed.values.max * 1.25).toLong,
      s"training materially worsened the largest cell: " +
        s"${hTrained.values.max} vs seed ${hSeed.values.max}")
    val r = recallOf(Similarity.ivfTopKWith(emb, "vec_id", "embedding",
      trained, nprobe = 2, k = 3, queryPred = pred))
    info(f"trained-IVF recall@3 (nprobe=2/16): $r%.3f")
    assert(r > 0.2, f"trained IVF recall $r%.3f below the chance floor")
  }

  test("raising nprobe monotonically recovers brute-force recall") {
    val emb = Tables.embeddings(spark, dir)
    val rs = Seq(1, 4, 16).map { np =>
      recallOf(Similarity.ivfTopK(emb, "vec_id", "embedding",
        dims = 64, centroids = 16, nprobe = np, k = 3, queryPred = pred))
    }
    info(s"IVF recall@3 by nprobe(1,4,16): ${rs.map(r => f"$r%.3f").mkString(", ")}")
    assert(rs(0) <= rs(1) + 1e-9 && rs(1) <= rs(2) + 1e-9,
      s"recall not monotone in nprobe: $rs")
    assert(math.abs(rs(2) - 1.0) < 1e-9,
      s"probing every cell must reproduce brute force exactly, got ${rs(2)}")
  }
}
