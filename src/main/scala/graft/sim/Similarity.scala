package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (builder brief).
  *
  * Baseline: brute-force cosine top-k — the query set is broadcast (it is
  * small by construction), so the scan over the vector table is a single
  * pass, no shuffle until the per-query top-k rank. Ranking uses the ROUNDED
  * cosine with an id tie-break so results are stable across fp-summation
  * orders (and across engines for the oracle).
  *
  * Scale path: random-hyperplane LSH bucketing — vectors hash to a
  * `planes`-bit signature; candidates share a signature bucket, cutting the
  * scan to bucket-mates. Planes are deterministic (seeded hash of
  * (plane, dim)), so signatures are reproducible anywhere.
  */
object Similarity {

  /** Elementwise dot product of two double-array columns (sequential
    * left-to-right accumulation — matches a SQL list_sum over the zipped
    * products).
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force top-k: for each query vector, the k nearest non-self
    * vectors by cosine. `queries` must be small (it is broadcast). Norms
    * are precomputed per VECTOR (once), not per pair — cuts the
    * dot-product work 3×.
    */
  def bruteForceTopK(vectors: DataFrame, queries: DataFrame,
                     idCol: String, vecCol: String, k: Int): DataFrame = {
    val v = vectors.select(col(idCol).as("vec_id"),
        col(vecCol).cast("array<double>").as("v"))
      .withColumn("vn", norm(col("v")))
    val q = queries.select(col(idCol).as("query_id"),
        col(vecCol).cast("array<double>").as("qv"))
      .withColumn("qn", norm(col("qv")))
    val scored = v.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .withColumn("cosine",
        round(dot(col("qv"), col("v")) / (col("qn") * col("vn")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id"), col("cosine"), col("rank"))
  }

  /** IVF-style ANN: a deterministic coarse quantizer (every `centroidStep`-th
    * vector is a centroid), each vector assigned to its nearest centroid,
    * queries probe the `nprobe` nearest centroid cells and rank only the
    * vectors inside them. The inverted-file structure is exactly a
    * cell-id column — at scale the vector table is bucketed/partitioned by
    * it, so a probe reads only its cells.
    */
  def ivfTopK(vectors: DataFrame, idCol: String, vecCol: String,
              centroidStep: Int, nprobe: Int, k: Int,
              queryPred: org.apache.spark.sql.Column): DataFrame = {
    val v = vectors.select(col(idCol).as("vec_id"),
        col(vecCol).cast("array<double>").as("v"))
      .withColumn("vn", norm(col("v")))
    val cents = v.filter(col("vec_id") % centroidStep === 0)
      .select(col("vec_id").as("cent_id"), col("v").as("cv"), col("vn").as("cn"))

    // assignment: nearest centroid per vector (rounded cosine, id tie-break)
    val wAssign = Window.partitionBy(col("vec_id"))
      .orderBy(col("ccos").desc, col("cent_id"))
    val assigned = v.join(broadcast(cents), lit(true))
      .withColumn("ccos", round(dot(col("cv"), col("v")) / (col("cn") * col("vn")), 6))
      .withColumn("crank", row_number().over(wAssign))
      .filter(col("crank") === 1)
      .select(col("vec_id"), col("v"), col("vn"), col("cent_id").as("cell"))

    // probe list: each query's nprobe nearest centroids
    val q = assigned.filter(queryPred)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("vn").as("qn"))
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("pcos").desc, col("cent_id"))
    val probes = q.join(broadcast(cents), lit(true))
      .withColumn("pcos", round(dot(col("cv"), col("qv")) / (col("cn") * col("qn")), 6))
      .withColumn("prank", row_number().over(wProbe))
      .filter(col("prank") <= nprobe)
      .select(col("query_id"), col("qv"), col("qn"), col("cent_id").as("cell"))

    // scan only the probed cells
    val wRank = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    probes.join(assigned, Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cosine",
        round(dot(col("qv"), col("v")) / (col("qn") * col("vn")), 6))
      .withColumn("rank", row_number().over(wRank))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id"), col("cosine"), col("rank"))
  }

  /** Deterministic pseudo-random hyperplane component for (plane p, dim d):
    * md5-derived integer mapped to [-1, 1). Engine-portable.
    */
  private def planeComponent(p: Int, d: Column): Column =
    (conv(substring(md5(concat(lit(p), lit("_"), d)), 1, 8), 16, 10)
      .cast("double") / lit(2147483648.0)) - 1.0

  /** LSH signature: `planes` sign bits of projections onto deterministic
    * hyperplanes. Vectors in the same bucket are ANN candidates.
    */
  def withLshSignature(df: DataFrame, vecCol: String, planes: Int): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    val proj = (0 until planes).map { p =>
      val products = transform(v,
        (x, i) => x * planeComponent(p, i))
      val s = aggregate(products, lit(0.0), (acc, x) => acc + x)
      when(s >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    df.withColumn("lsh_bucket", proj.reduce(_ + _))
  }

  /** ANN via LSH buckets: top-k among bucket-mates only. Same output shape
    * as bruteForceTopK; recall < 1 by construction (the scale/quality
    * trade), so it is bench-compared, not oracle-compared, against brute
    * force.
    */
  def lshTopK(vectors: DataFrame, idCol: String, vecCol: String,
              planes: Int, k: Int, queryPred: Column): DataFrame = {
    val sig = withLshSignature(vectors, vecCol, planes)
      .select(col(idCol).as("vec_id"), col(vecCol).cast("array<double>").as("v"),
              col("lsh_bucket"))
      .withColumn("vn", norm(col("v")))
    val q = sig.filter(queryPred)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
              col("vn").as("qn"), col("lsh_bucket"))
    val scored = sig.join(q, Seq("lsh_bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cosine",
        round(dot(col("qv"), col("v")) / (col("qn") * col("vn")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id"), col("cosine"), col("rank"))
  }
}
