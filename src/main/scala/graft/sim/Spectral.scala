package graft.sim

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Distributed second-moment statistics over an embedding column — the
  * PCA front-end: the corpus pays ONE scan producing the d×d covariance
  * matrix as (i, j) rows; everything after (eigenvectors, whitening,
  * drift alarms on top eigenvalues) operates on the d²-bounded result,
  * which is a LEGAL driver-side frame (bounded by dimensionality, never
  * by corpus size — the months-routing/centroids collect class).
  * (Reference scope note: the reference engine
  * (bcgov/nr-rfc-dischargeobs) has no embedding operators; this extends
  * the post-parity LLM-pipeline pack, SURVEY §2 extension table.)
  *
  * Numerics: per-row products micro-snap BEFORE the sum, so every
  * aggregate is an exact integer sum (order-independent, bit-identical
  * to the DuckDB oracle); the covariance combination is a fixed
  * double-op tail over those exact longs, double-FIRST where a product
  * of sums could overflow BIGINT (the PMI overflow doctrine). Exactness
  * bound: sums stay < 2^53 up to ~9e9 rows per cell — beyond that,
  * shard the corpus and average cell frames (cov is a linear statistic
  * of (n, sx, sy, sxy), so shard merge is exact integer addition).
  */
object Spectral {

  /** Upper-triangular covariance cells of `vecCol`: one row per dim
    * pair (i ≤ j) with the exact integer moments and the micro-snapped
    * covariance. Scale shape: Scan → two posexplodes (d² per input row
    * — the honest per-row flop count of any covariance) → ONE (i, j)
    * aggregation with map-side combine; the shuffle carries at most
    * d(d+1)/2 rows per map partition regardless of corpus size.
    */
  def covarianceMatrix(vectors: DataFrame, vecCol: String): DataFrame = {
    val v = vectors.select(col(vecCol).cast("array<double>").as("v"))
    val ex = v.select(col("v"), posexplode(col("v")).as(Seq("i", "xi")))
    val pairs = ex
      .select(col("i"), col("xi"), posexplode(col("v")).as(Seq("j", "xj")))
      .filter(col("j") >= col("i"))
      .withColumn("p", floor(col("xi") * col("xj") * lit(1e6) + lit(0.5))
        .cast("long"))
      .withColumn("xim", floor(col("xi") * lit(1e6) + lit(0.5)).cast("long"))
      .withColumn("xjm", floor(col("xj") * lit(1e6) + lit(0.5)).cast("long"))
    pairs.groupBy(col("i").cast("long").as("i"), col("j").cast("long").as("j"))
      .agg(count(lit(1)).as("n"),
        sum(col("p")).as("sxy"),
        sum(col("xim")).as("sx"),
        sum(col("xjm")).as("sy"))
      .withColumn("cov_micro",
        floor(col("sxy").cast("double") / col("n")
          - (col("sx").cast("double") / col("n"))
            * (col("sy").cast("double") / col("n")) / lit(1e6)
          + lit(0.5)).cast("long"))
  }

  /** Principal eigenvector (and eigenvalue, micro-units) of a
    * [[covarianceMatrix]] result via driver-side power iteration — the
    * d²-bounded tail of the distributed front-end (same contract as
    * `loadCentroids`: the collect is dimension-bounded by construction).
    * Deterministic: the start vector is uniform 1/√d, iterations are a
    * fixed sequential fold over the dense matrix, and the sign is
    * normalized so the largest-|component| coordinate is positive.
    * Returns (eigenvector, eigenvalue in micro score-units²).
    */
  def topEigenvector(cov: DataFrame, iterations: Int = 100,
                     tol: Double = 1e-12): (Array[Double], Double) = {
    val rows = cov.select(col("i"), col("j"), col("cov_micro")).collect()
    require(rows.nonEmpty, "empty covariance frame")
    val d = rows.iterator.map(r => math.max(r.getLong(0), r.getLong(1))).max.toInt + 1
    require(rows.length.toLong == d.toLong * (d + 1) / 2,
      s"covariance frame has ${rows.length} cells, expected full upper " +
        s"triangle ${d.toLong * (d + 1) / 2} for d=$d")
    val m = Array.ofDim[Double](d, d)
    rows.foreach { r: Row =>
      val (i, j, c) =
        (r.getLong(0).toInt, r.getLong(1).toInt, r.getLong(2).toDouble / 1e6)
      m(i)(j) = c; m(j)(i) = c
    }
    var vcur = Array.fill(d)(1.0 / math.sqrt(d.toDouble))
    var lambda = 0.0
    var it = 0
    var converged = false
    while (it < iterations && !converged) {
      val next = Array.tabulate(d) { i =>
        var s = 0.0; var j = 0
        while (j < d) { s += m(i)(j) * vcur(j); j += 1 }
        s
      }
      val nrm = math.sqrt(next.map(x => x * x).sum)
      require(nrm > 0.0, "power iteration collapsed to the zero vector " +
        "(matrix is zero or start vector is orthogonal to the range)")
      val unit = next.map(_ / nrm)
      val delta = unit.zip(vcur).map { case (a, b) => math.abs(a - b) }.max
      vcur = unit
      lambda = nrm
      converged = delta < tol
      it += 1
    }
    // sign convention: largest-|component| coordinate positive
    val pivot = vcur.indices.maxBy(i => (math.abs(vcur(i)), -i))
    val signed = if (vcur(pivot) < 0) vcur.map(-_) else vcur
    (signed, lambda * 1e6)
  }
}
