package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.sim.Similarity

/** Fixed-workload scaling measurements (SCALE.md §fixed-workload).
  *
  * Several registered ANN/audit shapes define their query set as a
  * RESIDUE CLASS of the corpus (`vec_id % 25 = 0`), so the workload
  * grows with the corpus and the TOTAL wall embeds an N·N_q term no
  * engine can remove — at 100 TB nobody queries with 4% of the corpus;
  * queries arrive from outside at a rate independent of corpus size.
  * This main measures those families at a FIXED query set across scale
  * tiers: the ×1 corpus's own residue class (`vec_id < IdStride`, i.e.
  * replica-0 ids only — by ScaleGen construction the SAME vectors exist
  * verbatim at every tier), so the per-N ratios isolate how cost scales
  * with CORPUS size at constant workload:
  *
  *   - adc_fixedq      exhaustive PQ ADC (q158 shape): expect ∝ N
  *                     (every query scans every code — linear, the
  *                     honest cost of exhaustive ADC)
  *   - ivfpq_fixedq    IVF-PQ ADC (q207 shape, √N centroid rule):
  *                     expect sublinear in N past the index build
  *   - recall_fixedq   IVF recall curve (q185 shape): expect ∝ N (the
  *                     brute-force truth pass is the definition of the
  *                     audit — run it on a sampled query budget, which
  *                     is exactly what this measures)
  *   - lshtopk_fixedq  banded LSH ANN (q39 shape, auto dispatch):
  *                     expect ~∝ N at fixed occupancy (signature scan)
  *                     with bounded per-query candidates
  *
  * Usage: ScaleStudy <dir> — prints one JSON line; 2 measured reps per
  * family (cold JIT excluded by taking the best), SPARK_GRAFT_SCALE_DIAG
  * narrates the tier decisions to stderr.
  */
object ScaleStudy {
  private def bestOf(reps: Int)(body: => Long): (Double, Long) = {
    var best = Double.MaxValue
    var rows = 0L
    for (_ <- 1 to reps) {
      val t0 = System.nanoTime()
      rows = body
      best = math.min(best, (System.nanoTime() - t0) / 1e9)
    }
    (best, rows)
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = ToolSession.local()
    val emb = Tables.embeddings(spark, dir).localCheckpoint(true)
    val n = emb.count()
    // replica-0 ids exist verbatim at every ScaleGen tier (and ARE the
    // whole corpus at ×1) — the fixed workload
    val fixedPred = col("vec_id") < ScaleGen.IdStride &&
      col("vec_id") % 25 === 0
    val kAuto = Similarity.adaptiveCentroids(n, 16)
    // build-once/serve-many split (SCALE.md §4): the serve row probes a
    // PREBUILT materialized index with the fixed query set — the number
    // that isolates per-query serving cost from the amortized N·K build
    val prebuilt = Similarity.ivfPqIndex(emb, "vec_id", "embedding",
      dims = 64, m = 4, ksub = 8, centroids = kAuto).localCheckpoint(true)
    val queries = emb.filter(fixedPred).localCheckpoint(true)
    val fams: Seq[(String, () => DataFrame)] = Seq(
      "adc_fixedq" -> (() => Similarity.pqAdcTopK(emb, "vec_id", "embedding",
        dims = 64, m = 4, ksub = 8, queryPred = fixedPred, k = 10)),
      "ivfpq_fixedq" -> (() => Similarity.ivfPqTopK(emb, "vec_id", "embedding",
        dims = 64, m = 4, ksub = 8,
        centroids = kAuto, nprobe = 2, k = 10,
        queryPred = fixedPred)),
      "ivfpq_build" -> (() => Similarity.ivfPqIndex(emb, "vec_id", "embedding",
        dims = 64, m = 4, ksub = 8, centroids = kAuto)),
      "ivfpq_serve" -> (() => Similarity.ivfPqProbe(prebuilt, queries,
        "vec_id", "embedding", dims = 64, m = 4, ksub = 8,
        centroids = kAuto, nprobe = 2, k = 10)),
      "recall_fixedq" -> (() => Similarity.ivfRecallCurve(emb, "vec_id",
        "embedding", dims = 64, centroids = 16, nprobes = Seq(1, 2, 4), k = 3,
        queryPred = fixedPred)),
      "lshtopk_fixedq" -> (() => Similarity.lshTopKAuto(emb, "vec_id",
        "embedding", dims = 64, bands = 4, floorRowsPerBand = 5, k = 3,
        queryPred = fixedPred)),
      // r13 trained-quantizer family at the √N deployment sizing: the
      // registered q211/q215/q216 shapes hold C=16 (their oracle
      // scale), but trainCentroidsExactMatrix/semanticDedupWith take
      // any C — at C≈√N the trainer stays linear-scan-bounded (C·d
      // driver rows per round) and SemDeDup's per-cell quadratic drops
      // from (N/16)² to (N/√N)² = N per cell — the paper's own knob
      "kmeans_train_sqrtn" -> (() => {
        val m = Similarity.trainCentroidsExactMatrix(emb, "vec_id",
          "embedding", dims = 64, centroids = kAuto, iterations = 2)
        import spark.implicits._
        Seq(m.length.toLong).toDF("c") // matrix is driver-side; row = C
      }),
      "semdedup_sqrtn" -> (() => Similarity.semanticDedupWith(emb,
        "vec_id", "embedding",
        Similarity.trainCentroidsExactMatrix(emb, "vec_id", "embedding",
          dims = 64, centroids = kAuto, iterations = 2),
        minCosine = 0.2)))
    val results = fams.map { case (name, mk) =>
      val (sec, rows) = bestOf(2)(mk().count())
      System.err.println(f"[scalestudy] $name n=$n best_s=$sec%.2f rows=$rows")
      name -> (sec, rows)
    }
    val qs = results.map { case (k, (s, r)) =>
      f""""$k":{"sec":$s%.3f,"rows":$r}""" }.mkString(",")
    val line = s"""{"metric":"scalestudy","n":$n,"dir":"$dir","families":{$qs}}"""
    try spark.stop() finally println(line)
  }
}
